"""Strong-scaling evidence for the round-7 selection operators:
`stratified_topk` (per-domain document cap) and `budget_select`
(token-budget corpus assembly) at two parallelism levels over a fixed
corpus — same CPU-pinned interleaved-subprocess harness as
bench_graph_lm_scaling / bench_dedup_scaling.

Inputs: the Zipf-ish document corpus (bench_dedup_scaling's generator),
augmented in ONE projection with a synthetic Zipf-skewed domain key
(floor(u² · n_domains) — quadratic concentration gives real head
domains, exactly the strata the bounded tree-merge must not die on) and
an integer score. Output identity asserted across parallelism levels
(kept/selected counts).

Usage: python tools/bench_selection_scaling.py [n_docs] [low] [high] [reps]
Internal: python tools/bench_selection_scaling.py --timed-run <threads> <docs_path>
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

N_DOMAINS = 20_000
TOPK = 20
BUDGET_FRACTION = 3  # budget = total_tokens // 3


def augmented(spark, docs_path):
    df = spark.read.parquet(docs_path)
    uni = "(pmod(xxhash64(doc_id), 1000000) / 1000000.0)"
    return df.select(
        "doc_id",
        F.expr(
            f"cast(floor(pow({uni}, 2) * {N_DOMAINS}) as long)"
        ).alias("domain"),
        F.expr("cast(length(text) as long)").alias("score"),
        F.expr(
            "cast(size(filter(split(text, ' '), t -> length(t) > 0)) as long)"
        ).alias("toks"),
    )


def timed_run(threads: int, docs_path: str) -> dict:
    from biomedical_knowledge_graph_spark.operators.sampling import (
        budget_select,
        stratified_topk,
    )
    from tools.bench_dedup_scaling import _corpus_bytes

    spark = new_session(
        "bkg-selection-scaling",
        master=f"local[{threads}]",
        shuffle_partitions=threads * 6,
        extra_conf={
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
            "spark.sql.files.openCostInBytes": str(16 * 1024),
            "spark.sql.files.maxPartitionBytes": str(
                max(64 * 1024, _corpus_bytes(docs_path) // (threads * 8))
            ),
        },
    )
    base = augmented(spark, docs_path)
    # budget as a literal so the timed op has no extra driver action
    total_toks = base.agg(F.sum("toks")).collect()[0][0]
    budget = int(total_toks) // BUDGET_FRACTION
    out: dict = {}
    ops = {
        "domain_topk": (
            lambda df: stratified_topk(
                df, "doc_id", "score", TOPK, "domain"
            ).filter(F.col("kept").cast("long") >= 0),
            lambda df: df.agg(
                F.count("*"), F.sum(F.col("kept").cast("long"))
            ).collect()[0],
        ),
        "budget_select": (
            lambda df: budget_select(
                df, "doc_id", "score", "toks", budget
            ).filter(F.col("selected").cast("long") >= 0),
            lambda df: df.agg(
                F.count("*"), F.sum(F.col("selected").cast("long"))
            ).collect()[0],
        ),
    }
    for name, (fn, identity) in ops.items():
        warm = base.limit(1000).repartition(threads * 2).persist()
        warm.count()
        fn(warm).count()
        warm.unpersist()
        t0 = time.time()
        n = fn(base).count()
        out[f"{name}_wall_s"] = round(time.time() - t0, 2)
        out[f"{name}_rows"] = n
        ident = identity(fn(base))
        out[f"{name}_identity"] = [int(v) for v in ident]
    spark.stop()
    return out


def pinned_run(threads: int, docs_path: str) -> dict:
    pin = os.environ.get("BKG_PIN", "1") != "0"
    cmd = [
        *(["taskset", "-c", f"0-{threads - 1}"] if pin else []),
        sys.executable,
        os.path.abspath(__file__),
        "--timed-run",
        str(threads),
        docs_path,
    ]
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd=os.getcwd(), check=True
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--timed-run":
        print(json.dumps(timed_run(int(sys.argv[2]), sys.argv[3])))
        return
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 480_000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    from tools.bench_dedup_scaling import generate_docs
    from tools.bench_scaling import cpu_ceiling

    reuse = os.environ.get("BKG_SELECTION_INPUTS")
    if reuse:
        docs_path = os.path.join(reuse, "docs")
    else:
        spark = new_session("bkg-selection-gen", master="local[16]")
        tmp = tempfile.mkdtemp(prefix="bkg_selection_")
        docs_path = os.path.join(tmp, "docs")
        generate_docs(spark, n_docs, docs_path)
        spark.stop()

    walls: dict[str, dict[int, list[float]]] = {}
    idents: dict[str, dict[int, list]] = {}
    for rep in range(reps):
        for threads in (low, high):
            r = pinned_run(threads, docs_path)
            for name in ("domain_topk", "budget_select"):
                walls.setdefault(name, {}).setdefault(threads, []).append(
                    r[f"{name}_wall_s"]
                )
                idents.setdefault(name, {}).setdefault(threads, []).append(
                    r[f"{name}_identity"]
                )
            print(f"rep {rep} x{threads}: {r}", file=sys.stderr)
    for name, per in idents.items():
        flat = [tuple(i) for lst in per.values() for i in lst]
        assert len(set(flat)) == 1, f"{name} output identity broken: {flat}"
    ceiling = cpu_ceiling(low, high)
    result = {
        "n_docs": n_docs,
        "low": low,
        "high": high,
        "ceiling": round(ceiling, 3),
        "ops": {},
    }
    for name, per in walls.items():
        sp = min(per[low]) / min(per[high])
        result["ops"][name] = {
            "walls_low": per[low],
            "walls_high": per[high],
            "speedup": round(sp, 3),
            "vs_ceiling": round(sp / ceiling, 3),
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
