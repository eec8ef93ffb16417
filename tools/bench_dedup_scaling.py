"""Strong-scaling evidence for the dedup family (VERDICT r5 item 7).

The round-5 480 k-page scaling campaign covered the KG pipeline only;
this tool runs the same quiet-window protocol — interleaved ABAB
CPU-pinned subprocess runs, min-of-reps, optional local-cluster masters
(separate executor JVMs) — for `minhash_dedup_pairs` and
`simhash_near_pairs` over a synthesized document corpus with injected
near-duplicates (10 % of docs re-emitted under a new id with a one-token
suffix, so the LSH candidate + verify stages do real work instead of
matching nothing).

Corpus realism matters for WHAT this measures: the first cut of this
tool reused the synthetic HTML pages truncated to a 320-char prefix, and
the tiny 512-word filler vocabulary made background 5-gram Jaccard so
high that LSH admitted 375 k candidate pairs for 44 k docs (8.5/doc,
~1e3 real) — the run timed a verify-join explosion no extracted-text
corpus exhibits, not the signature pipeline. Docs here are drawn from a
Zipf-ish mix (30 % of tokens from a 200-word common pool, 70 % from a
20 k-word pool) in ONE pure-JVM projection: background J ≈ 0.1 (admitted
by 25×5 banding with p ≈ 2e-4), injected dups J ≈ 0.97, candidate count
≈ dup count. Simhash gets an (default 8×) larger corpus than minhash:
its per-doc cost is ~100× smaller and a same-size corpus finishes in
seconds, measuring JVM startup instead of scaling.

The corpora are written to parquet ONCE before any timing so every run
reads identical bytes; pair counts are asserted identical across
parallelism levels (output identity, same rule as bench_scaling).

Timing forces with .count(): both ops end in inner joins / filters whose
cardinality feeds the count, so nothing is optimizer-eliminable (the
left-join-under-count elimination that bans .count() timing elsewhere
does not apply; cross-checked against a noop-sink force at calibration).

Usage: python tools/bench_dedup_scaling.py [n_docs] [low] [high] [reps]
Internal: python tools/bench_dedup_scaling.py --timed-run <threads> <minhash_path> <simhash_path> [master]
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

from biomedical_knowledge_graph_spark.operators import dedup  # noqa: E402
from biomedical_knowledge_graph_spark.session import new_session  # noqa: E402
from tools.bench_scaling import cpu_ceiling  # noqa: E402

TOKENS_PER_DOC = 60
COMMON_VOCAB = 200
RARE_VOCAB = 20_000
DUP_MOD = 10  # every DUP_MOD-th doc is re-emitted as a near-duplicate


def generate_docs(spark, n_docs: int, out_path: str) -> None:
    """(doc_id, text) corpus, one deterministic pure-JVM projection.

    Token j of doc i hashes (i, j); 30 % land in the common pool
    ('c0'..'c199'), the rest in the rare pool ('w0'..'w19999'). Every
    DUP_MOD-th doc is re-emitted under a fresh id with a one-token
    suffix (5-gram J ≈ 0.97 — found by a 0.8-threshold MinHash pass)."""
    tok = (
        "transform(sequence(1, {n}), j -> "
        "  CASE WHEN pmod(xxhash64(id, j), 10) < 3 "
        "       THEN concat('c', pmod(xxhash64(id, j, 1), {cv})) "
        "       ELSE concat('w', pmod(xxhash64(id, j, 2), {rv})) END)"
    ).format(n=TOKENS_PER_DOC, cv=COMMON_VOCAB, rv=RARE_VOCAB)
    text = F.array_join(F.expr(tok), " ")
    rng = spark.range(n_docs).repartition(64)
    base = rng.select(
        F.xxhash64(F.lit("b"), F.col("id")).alias("doc_id"),
        text.alias("text"),
    )
    dups = rng.filter(F.pmod(F.col("id"), F.lit(DUP_MOD)) == 0).select(
        F.xxhash64(F.lit("d"), F.col("id")).alias("doc_id"),
        F.concat(text, F.lit(" dupmarker")).alias("text"),
    )
    base.unionByName(dups).write.mode("overwrite").parquet(out_path)


def _corpus_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def timed_run(
    threads: int, minhash_path: str, simhash_path: str, master: str | None = None
) -> dict:
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
            "spark.sql.files.openCostInBytes": str(16 * 1024),
        },
    )
    from biomedical_knowledge_graph_spark.operators.boilerplate import (
        remove_repeated_windows,
    )

    ops = {
        "minhash": (
            minhash_path,
            lambda df: dedup.minhash_dedup_pairs(df, threshold=0.8),
        ),
        "simhash": (
            simhash_path,
            lambda df: dedup.simhash_near_pairs(df, max_hamming=6),
        ),
        # exact-substring window dedup shares the simhash corpus (its
        # per-doc cost sits between the two). The op ends in LEFT joins
        # against a distinct-id frame, which count() ELIMINATES (the
        # module-docstring trap measured live: 0.94 s "wall" for 1 M
        # docs was the distinct count alone) — the filter references a
        # join-output column so the whole pipeline must execute
        "windows": (
            simhash_path,
            lambda df: remove_repeated_windows(df, w=8, min_count=2)
            .filter(F.col("n_removed_tokens") >= 0),
        ),
    }
    wanted = os.environ.get("BKG_SCALING_OPS")
    if wanted:
        keep = {w.strip() for w in wanted.split(",")}
        ops = {k: v for k, v in ops.items() if k in keep}
    out: dict = {}
    for name, (path, fn) in ops.items():
        # split the scan so the EXPENSIVE map stage (125 hash exprs per
        # shingle for minhash) gets >= ~8 task waves per core at every
        # parallelism level: with a fixed 1 MB split the calibration
        # corpus yielded 22 input tasks — fine on 4 cores (5.5 waves),
        # terrible on 16 (1.4 waves, stragglers idle half the cores);
        # measured 0.47 scaling efficiency from the SPLIT COUNT alone. At
        # 100 TB this is moot (any corpus yields thousands of splits);
        # locally the split size must track corpus/cores.
        spark.conf.set(
            "spark.sql.files.maxPartitionBytes",
            str(max(64 * 1024, _corpus_bytes(path) // (threads * 8))),
        )
        docs = spark.read.parquet(path)
        out[f"{name}_docs"] = docs.count()
        # untimed warm-up on a small slice: JIT/codegen/AQE caches. The
        # slice MUST be repartitioned — limit() collapses to one
        # partition and the warm-up runs as a single task
        warm = docs.limit(1000).repartition(threads * 2).persist()
        warm.count()
        fn(warm).count()
        warm.unpersist()
        t0 = time.time()
        out[f"{name}_pairs"] = fn(docs).count()
        out[f"{name}_wall_s"] = round(time.time() - t0, 2)
    spark.stop()
    return out


def pinned_run(
    threads: int, minhash_path: str, simhash_path: str, master: str | None = None
) -> dict:
    pin = os.environ.get("BKG_PIN", "1") != "0"
    cmd = [
        *(["taskset", "-c", f"0-{threads - 1}"] if pin else []),
        sys.executable,
        os.path.abspath(__file__),
        "--timed-run",
        str(threads),
        minhash_path,
        simhash_path,
        *([master] if master else []),
    ]
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd=os.getcwd(), check=True
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--timed-run":
        master = sys.argv[5] if len(sys.argv) > 5 else None
        print(
            json.dumps(
                timed_run(int(sys.argv[2]), sys.argv[3], sys.argv[4], master=master)
            )
        )
        return

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 240_000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    simhash_mult = int(os.environ.get("BKG_SIMHASH_MULT", "8"))
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
    minhash_path = os.path.join(tmp, "docs_minhash")
    simhash_path = os.path.join(tmp, "docs_simhash")
    try:
        spark = new_session("bkg-gen", master=f"local[{high}]")
        generate_docs(spark, n_docs, minhash_path)
        generate_docs(spark, n_docs * simhash_mult, simhash_path)
        spark.stop()

        ceiling = cpu_ceiling(low, high)
        runs: dict[int, list[dict]] = {low: [], high: []}
        for _ in range(reps):
            for t in (low, high):  # interleaved ABAB
                runs[t].append(
                    pinned_run(t, minhash_path, simhash_path, masters.get(t))
                )
        out: dict = {
            "n_docs": n_docs,
            "simhash_mult": simhash_mult,
            "mode": mode,
            "masters": masters or None,
            "cpu_ceiling_speedup": round(ceiling, 2),
            "queries": {},
        }
        for op in ("minhash", "simhash", "windows"):
            if f"{op}_pairs" not in runs[low][0]:
                continue
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
                "docs": runs[low][0][f"{op}_docs"],
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
