"""Persist-vs-rescan decision for remove_repeated_windows (VERDICT r6
item 3 / next-round #4).

Three shapes of the same operator over one pre-written 480 k-doc Zipf
corpus (the vocabulary-realistic generator from bench_dedup_scaling):

- none  — checkpoint=False: pure rescan, 4 corpus FileScans (the r6
          shape had 5; the spine/count derivation removed one for all
          shapes);
- arr   — checkpoint="arr": the token-array frame localCheckpointed at
          DISK_ONLY; one scan + split, the per-window md5 transform
          still runs twice;
- full  — checkpoint=True: window stream checkpointed too; md5 once,
          but the stored stream is corpus-sized.

Protocol: interleaved subprocess runs (none, arr, full) × reps, each a
fresh CPU-pinned session (taskset), min-of-reps per shape, forced
through a filter on a join-output column + count (the module's
documented count()-elimination trap). Prints one JSON line.

Usage: python tools/bench_windows_shapes.py [n_docs] [threads] [reps]
Internal: python tools/bench_windows_shapes.py --timed-run <threads> <shape> <path>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from biomedical_knowledge_graph_spark.session import new_session  # noqa: E402

SHAPES = {"none": False, "arr": "arr", "full": True}


def timed_run(threads: int, shape: str, path: str) -> dict:
    from biomedical_knowledge_graph_spark.operators.boilerplate import (
        remove_repeated_windows,
    )
    from tools.bench_dedup_scaling import _corpus_bytes

    spark = new_session(
        "bkg-windows-shapes",
        master=f"local[{threads}]",
        shuffle_partitions=threads * 6,
        extra_conf={
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
            "spark.sql.files.openCostInBytes": str(16 * 1024),
            "spark.sql.files.maxPartitionBytes": str(
                max(64 * 1024, _corpus_bytes(path) // (threads * 8))
            ),
        },
    )
    docs = spark.read.parquet(path)
    fn = lambda df: (  # noqa: E731
        remove_repeated_windows(df, w=8, min_count=2, checkpoint=SHAPES[shape])
        .filter(F.col("n_removed_tokens") >= 0)
    )
    warm = docs.limit(1000).repartition(threads * 2).persist()
    warm.count()
    fn(warm).count()
    warm.unpersist()
    t0 = time.time()
    n = fn(docs).count()
    wall = round(time.time() - t0, 2)
    spark.stop()
    return {"shape": shape, "rows": n, "wall_s": wall}


def pinned_run(threads: int, shape: str, path: str) -> dict:
    pin = os.environ.get("BKG_PIN", "1") != "0"
    cmd = [
        *(["taskset", "-c", f"0-{threads - 1}"] if pin else []),
        sys.executable,
        os.path.abspath(__file__),
        "--timed-run",
        str(threads),
        shape,
        path,
    ]
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd=os.getcwd(), check=True
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--timed-run":
        print(json.dumps(timed_run(int(sys.argv[2]), sys.argv[3], sys.argv[4])))
        return
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 480_000
    threads = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from tools.bench_dedup_scaling import generate_docs

    spark = new_session("bkg-windows-gen", master="local[16]")
    tmp = tempfile.mkdtemp(prefix="bkg_winshape_")
    path = os.path.join(tmp, "docs")
    generate_docs(spark, n_docs, path)
    spark.stop()

    walls: dict[str, list[float]] = {s: [] for s in SHAPES}
    rows: dict[str, int] = {}
    for rep in range(reps):
        for shape in SHAPES:
            r = pinned_run(threads, shape, path)
            walls[shape].append(r["wall_s"])
            rows[shape] = r["rows"]
            print(
                f"rep {rep} {shape}: {r['wall_s']} s ({r['rows']} rows)",
                file=sys.stderr,
            )
    assert len(set(rows.values())) == 1, f"output identity broken: {rows}"
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "threads": threads,
                "reps": reps,
                "walls": walls,
                "min_walls": {s: min(v) for s, v in walls.items()},
                "winner": min(walls, key=lambda s: min(walls[s])),
            }
        )
    )


if __name__ == "__main__":
    main()
