"""WEAK-scaling evidence (Gustafson): data grows with the fleet.

Strong scaling (bench_scaling.py) holds the input fixed; real fleets
grow the corpus with the executor count. Here config A runs n_pages on
local-cluster[1,4] and config B runs 4*n_pages on local-cluster[4,4] —
per-core data identical. Weak-scaling efficiency = wall_A / wall_B
(1.0 = perfect: 4x the data on 4x the cores in the same time).

Usage: python tools/bench_weak_scaling.py [n_pages_small] [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, ".")

from bench_scaling import pinned_run  # noqa: E402

from biomedical_knowledge_graph_spark import fixtures  # noqa: E402
from biomedical_knowledge_graph_spark.session import new_session  # noqa: E402


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n_big = n_small * 4
    tmp = tempfile.mkdtemp(prefix="bkg_weak_")
    paths = {}
    try:
        spark = new_session("bkg-gen", master="local[16]")
        aliases = [a for a, _, _ in fixtures.synthetic_alias_specs(5000, seed=42)]
        for n in (n_small, n_big):
            p = os.path.join(tmp, f"pages_{n}")
            fixtures.generate_pages_distributed(
                spark, n, aliases, seed=42, partitions=128
            ).write.mode("overwrite").parquet(p)
            paths[n] = p
        spark.stop()

        configs = [
            (n_small, 4, "local-cluster[1,4,8192]"),
            (n_big, 16, "local-cluster[4,4,8192]"),
        ]
        walls: dict[int, list[float]] = {n: [] for n, _, _ in configs}
        stats: dict[int, dict] = {}
        for _ in range(reps):
            for n, cores, master in configs:
                r = pinned_run(cores, paths[n], master)
                walls[n].append(round(r["wall_s"], 2))
                stats[n] = r
                print(json.dumps({"pages": n, "cores": cores, **r}), flush=True)
        w_small = min(walls[n_small])
        w_big = min(walls[n_big])
        print(
            json.dumps(
                {
                    "mode": "weak-scaling",
                    "small": {
                        "pages": n_small,
                        "cores": 4,
                        "wall_s": w_small,
                        "all_walls_s": walls[n_small],
                        "pages_per_sec": round(n_small / w_small, 1),
                    },
                    "big": {
                        "pages": n_big,
                        "cores": 16,
                        "wall_s": w_big,
                        "all_walls_s": walls[n_big],
                        "pages_per_sec": round(n_big / w_big, 1),
                    },
                    "weak_scaling_efficiency": round(w_small / w_big, 3),
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
