"""Strong-scaling evidence for the dedup family (VERDICT r5 item 7).

The round-5 480 k-page scaling campaign covered the KG pipeline only;
this tool runs the same quiet-window protocol — interleaved ABAB
CPU-pinned subprocess runs, min-of-reps, optional local-cluster masters
(separate executor JVMs) — for `minhash_dedup_pairs` and
`simhash_near_pairs` over a generated document corpus with injected
near-duplicates (10 % of docs re-emitted under a new id with a one-token
suffix, so the LSH candidate + verify stages do real work instead of
matching nothing).

The corpus is written to parquet ONCE before any timing so every run
reads identical bytes; pair counts are asserted identical across
parallelism levels (output identity, same rule as bench_scaling).

Timing forces with .count(): both ops end in inner joins / filters whose
cardinality feeds the count, so nothing is optimizer-eliminable (the
left-join-under-count elimination that bans .count() timing elsewhere
does not apply; cross-checked against a noop-sink force at calibration).

Usage: python tools/bench_dedup_scaling.py [n_pages] [low] [high] [reps]
Internal: python tools/bench_dedup_scaling.py --timed-run <threads> <path> [master]
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

from biomedical_knowledge_graph_spark import fixtures  # noqa: E402
from biomedical_knowledge_graph_spark.operators import dedup  # noqa: E402
from biomedical_knowledge_graph_spark.session import new_session  # noqa: E402
from tools.bench_scaling import cpu_ceiling  # noqa: E402


def generate_docs(spark, n_pages: int, out_path: str) -> None:
    aliases = [a for a, _, _ in fixtures.synthetic_alias_specs(5000, seed=42)]
    pages = fixtures.generate_pages_distributed(
        spark, n_pages, aliases, seed=42, partitions=64
    )
    # generate_pages_distributed drops the golden text column; the raw
    # html decoded as UTF-8 is a perfectly good dedup corpus (JVM decode,
    # no Python extractor in the timed path). Truncated to the synthetic
    # documents-table profile (~300 chars): minhash cost is linear in
    # shingle count (125 hash exprs per shingle), and full ~1.2 KB html
    # pages measured 0.37 core-s/doc — a page-count campaign at that
    # per-doc cost would take hours per 4-core rep
    text = F.substring(F.decode(F.col("html"), "utf-8"), 1, 320)
    base = pages.select(F.xxhash64("url").alias("doc_id"), text.alias("text"))
    dups = pages.filter(F.pmod(F.xxhash64("url"), F.lit(10)) == 0).select(
        F.xxhash64(F.concat(F.col("url"), F.lit("#dup"))).alias("doc_id"),
        F.concat(text, F.lit(" dupmarker")).alias("text"),
    )
    base.unionByName(dups).write.mode("overwrite").parquet(out_path)


def _corpus_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def timed_run(threads: int, docs_path: str, master: str | None = None) -> dict:
    extra = {}
    if master is None:
        master = f"local[{threads}]"
    else:
        mem_mb = master.rstrip("]").rsplit(",", 1)[-1]
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        extra = {
            "spark.executor.memory": f"{mem_mb}m",
            "spark.executorEnv.PYTHONPATH": repo,
        }
        os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
        os.environ.setdefault("BKG_DRIVER_MEM", "8g")
    spark = new_session(
        "bkg-dedup-scaling",
        master=master,
        shuffle_partitions=threads * 6,
        extra_conf={
            **extra,
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
            # split the scan so the EXPENSIVE map stage (125 hash exprs
            # per shingle) gets >= ~8 task waves per core at every
            # parallelism level: with a fixed 1 MB split the 5 k-page
            # calibration corpus yielded 22 input tasks, which
            # load-balances fine on 4 cores (5.5 waves) but terribly on
            # 16 (1.4 waves, stragglers idle half the cores) — measured
            # 0.47 scaling efficiency from the SPLIT COUNT alone. At
            # 100 TB this is moot (any corpus yields thousands of
            # splits); locally the split size must track corpus/cores.
            "spark.sql.files.maxPartitionBytes": str(
                max(64 * 1024, _corpus_bytes(docs_path) // (threads * 8))
            ),
            "spark.sql.files.openCostInBytes": str(16 * 1024),
        },
    )
    docs = spark.read.parquet(docs_path)
    n_docs = docs.count()
    ops = {
        "minhash": lambda df: dedup.minhash_dedup_pairs(df, threshold=0.8),
        "simhash": lambda df: dedup.simhash_near_pairs(df, max_hamming=6),
    }
    # untimed warm-up on a small slice: JIT/codegen/AQE caches. The slice
    # MUST be repartitioned — limit() collapses to one partition, and the
    # whole warm-up signature pipeline would run as a single task
    # (measured: 5 000 html docs of minhash on 1 core ≈ 20 min)
    warm = docs.limit(1000).repartition(threads * 2).persist()
    warm.count()
    for fn in ops.values():
        fn(warm).count()
    warm.unpersist()
    out: dict = {"docs": n_docs}
    for name, fn in ops.items():
        t0 = time.time()
        out[f"{name}_pairs"] = fn(docs).count()
        out[f"{name}_wall_s"] = round(time.time() - t0, 2)
    spark.stop()
    return out


def pinned_run(threads: int, docs_path: str, master: str | None = None) -> dict:
    pin = os.environ.get("BKG_PIN", "1") != "0"
    cmd = [
        *(["taskset", "-c", f"0-{threads - 1}"] if pin else []),
        sys.executable,
        os.path.abspath(__file__),
        "--timed-run",
        str(threads),
        docs_path,
        *([master] if master else []),
    ]
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd=os.getcwd(), check=True
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--timed-run":
        master = sys.argv[4] if len(sys.argv) > 4 else None
        print(json.dumps(timed_run(int(sys.argv[2]), sys.argv[3], master=master)))
        return

    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 480_000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    mode = os.environ.get("BKG_SCALING_MODE", "local")
    masters: dict[int, str] = {}
    if mode == "local-cluster":
        cpw = int(os.environ.get("BKG_LC_CORES_PER_WORKER", "4"))
        mem = int(os.environ.get("BKG_LC_WORKER_MB", "8192"))
        assert low % cpw == 0 and high % cpw == 0
        masters = {
            t: f"local-cluster[{t // cpw},{cpw},{mem}]" for t in (low, high)
        }

    tmp = tempfile.mkdtemp(prefix="bkg_dedup_scaling_")
    docs_path = os.path.join(tmp, "docs")
    try:
        spark = new_session("bkg-gen", master=f"local[{high}]")
        generate_docs(spark, n_pages, docs_path)
        spark.stop()

        ceiling = cpu_ceiling(low, high)
        runs: dict[int, list[dict]] = {low: [], high: []}
        for _ in range(reps):
            for t in (low, high):  # interleaved ABAB
                runs[t].append(pinned_run(t, docs_path, masters.get(t)))
        out: dict = {
            "n_pages": n_pages,
            "mode": mode,
            "masters": masters or None,
            "docs": runs[low][0]["docs"],
            "cpu_ceiling_speedup": round(ceiling, 2),
            "queries": {},
        }
        for op in ("minhash", "simhash"):
            for t in (low, high):
                pairs = {r[f"{op}_pairs"] for r in runs[t]}
                assert len(pairs) == 1, (op, t, pairs)
            assert (
                runs[low][0][f"{op}_pairs"] == runs[high][0][f"{op}_pairs"]
            ), op  # output identity across parallelism
            w_low = min(r[f"{op}_wall_s"] for r in runs[low])
            w_high = min(r[f"{op}_wall_s"] for r in runs[high])
            speedup = w_low / w_high
            out["queries"][op] = {
                "pairs": runs[low][0][f"{op}_pairs"],
                f"wall_{low}c_s": w_low,
                f"wall_{high}c_s": w_high,
                f"all_walls_{low}c": [r[f"{op}_wall_s"] for r in runs[low]],
                f"all_walls_{high}c": [r[f"{op}_wall_s"] for r in runs[high]],
                "speedup": round(speedup, 3),
                "scaling_efficiency": round(speedup / (high / low), 3),
                "efficiency_vs_ceiling": round(speedup / ceiling, 3),
            }
        print(json.dumps(out))
    finally:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
