"""Scaling-efficiency evidence (north_rule: throughput at N and 4N workers,
efficiency ≥ 0.8).

No real multi-executor cluster exists in this sandbox, so the contract is
evidenced the way BASELINE.md specifies: the SAME job on the SAME input at
local[8] vs local[32]. The job is the end-to-end KG pipeline
(pages parquet → extract → mention scan → link → canonicalize → co-occur →
triples) over a generated corpus that is written to parquet ONCE before any
timing, so both runs read identical bytes.

Writes BENCH.md and prints one JSON line.

Usage: python tools/bench_scaling.py [n_pages] [low_cpus] [high_cpus]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from biomedical_knowledge_graph_spark import fixtures  # noqa: E402
from biomedical_knowledge_graph_spark.plans.pipeline import build_kg  # noqa: E402
from biomedical_knowledge_graph_spark.session import new_session  # noqa: E402


def warm_python_workers(spark, threads: int) -> None:
    """Spawn + warm every Python worker (pandas/pyarrow imports) before the
    clock starts — worker cold-start is fixed overhead a long-running job
    amortizes, not part of steady-state throughput."""
    import pandas as pd

    def noop(batches):
        for b in batches:
            yield b

    df = spark.range(threads * 4).repartition(threads * 2)
    df.mapInPandas(noop, schema="id long").write.format("noop").mode(
        "overwrite"
    ).save()
    assert pd is not None


def timed_run(master: str, shuffle: int, pages_path: str, warm_reps: int = 1) -> tuple[float, int, int, int]:
    """Fresh session → warm workers + one untimed warm-up run (JIT/codegen)
    → one timed end-to-end pipeline run."""
    threads = int(master.split("[")[1].rstrip("]"))
    spark = new_session(
        "bkg-scaling",
        master=master,
        shuffle_partitions=shuffle,
        extra_conf={
            # default 64m advisory size lets AQE coalesce the pair shuffle
            # to fewer partitions than threads, capping reduce parallelism
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
            # the generated corpus is small on disk (~1 KB/page): with the
            # default 128m split size + 4m per-file open cost the whole scan
            # collapses to a handful of input tasks and the map stages
            # (extract + mention scan) cannot use the threads at all —
            # measured as a links phase that took the SAME wall at 4 and 16
            # threads. At 100 TB this is moot (any corpus yields thousands
            # of splits); locally the split size must shrink with the data.
            "spark.sql.files.maxPartitionBytes": str(1 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(64 * 1024),
        },
    )
    warm_python_workers(spark, threads)
    pages = spark.read.parquet(pages_path)
    n_pages = pages.count()
    dim = fixtures.synthetic_entity_dict_df(spark, 5000, seed=42)
    for _ in range(warm_reps):
        # small warm-up corpus run: JIT/codegen/AQE caches, not the data
        r = build_kg(spark, pages.limit(5000), dim, min_cooccur=3)
        r.triples.count()
        r.links.unpersist()
    t0 = time.time()
    result = build_kg(spark, pages, dim, min_cooccur=3)
    n_triples = result.triples.count()
    n_links = result.links.count()
    wall = time.time() - t0
    result.links.unpersist()
    return wall, n_pages, n_links, n_triples


def run_interleaved(
    configs: list[tuple[str, int]], pages_path: str, reps: int = 3
) -> dict[str, dict]:
    """Alternate configs per rep (ABAB...) so host-load drift on this shared
    box hits both equally; keep the MIN wall per config (noisy-neighbor
    interference only ever inflates)."""
    walls: dict[str, list[float]] = {m: [] for m, _ in configs}
    stats: dict[str, tuple[int, int, int]] = {}
    for _ in range(reps):
        for master, shuffle in configs:
            w, np_, nl, nt = timed_run(master, shuffle, pages_path)
            walls[master].append(w)
            stats[master] = (np_, nl, nt)
    out = {}
    for master, _ in configs:
        np_, nl, nt = stats[master]
        wall = min(walls[master])
        out[master] = {
            "master": master,
            "pages": np_,
            "links": nl,
            "triples": nt,
            "wall_s": round(wall, 2),
            "all_walls_s": [round(w, 2) for w in walls[master]],
            "pages_per_sec": round(np_ / wall, 1),
            "links_per_sec": round(nl / wall, 1),
        }
    return out


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    tmp = tempfile.mkdtemp(prefix="bkg_scaling_")
    pages_path = os.path.join(tmp, "pages")
    try:
        spark = new_session("bkg-gen", master=f"local[{high}]")
        aliases = [a for a, _, _ in fixtures.synthetic_alias_specs(5000, seed=42)]
        fixtures.generate_pages_distributed(
            spark, n_pages, aliases, seed=42, partitions=high * 8
        ).write.mode("overwrite").parquet(pages_path)

        # shuffle partitions ~6x threads: small per-task hash-agg state
        # (GC-friendly); AQE coalesces the small ones back
        results = run_interleaved(
            [(f"local[{low}]", low * 6), (f"local[{high}]", high * 6)],
            pages_path,
        )
        r_low = results[f"local[{low}]"]
        r_high = results[f"local[{high}]"]

        speedup = r_high["pages_per_sec"] / r_low["pages_per_sec"]
        efficiency = speedup / (high / low)
        out = {
            "n_pages": n_pages,
            "low": r_low,
            "high": r_high,
            "speedup": round(speedup, 3),
            "scale_factor": high / low,
            "scaling_efficiency": round(efficiency, 3),
        }
        print(json.dumps(out))

        with open("BENCH.md", "w") as f:
            f.write(
                f"""# BENCH — scaling-efficiency evidence (north_rule)

Same job, same input: end-to-end KG pipeline (extract → mention scan →
link → canonicalize → co-occurrence triples) over {n_pages:,} generated
pages (seed=42) written to parquet once and read by both configurations.
No real cluster exists in this sandbox, so N vs 4N executors is evidenced
as `local[{low}]` vs `local[{high}]` per BASELINE.md.

| config | wall (s) | pages/s | links/s | triples |
|---|---|---|---|---|
| local[{low}] (N) | {r_low['wall_s']} | {r_low['pages_per_sec']} | {r_low['links_per_sec']} | {r_low['triples']} |
| local[{high}] (4N) | {r_high['wall_s']} | {r_high['pages_per_sec']} | {r_high['links_per_sec']} | {r_high['triples']} |

- speedup {low}→{high} threads: **{speedup:.2f}×** (ideal {high/low:.0f}×)
- scaling efficiency: **{efficiency:.3f}** (target ≥ 0.8)
- outputs identical at both parallelism levels: {r_low['triples'] == r_high['triples']
    and r_low['links'] == r_high['links']}

Reproduce: `python tools/bench_scaling.py {n_pages} {low} {high}`
"""
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
