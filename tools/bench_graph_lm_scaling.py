"""Strong-scaling evidence for the round-6 graph/LM family, post plan
fix (VERDICT r6 item 6): `triangle_counts` and `bigram_lm_scores` at two
parallelism levels over fixed inputs, quiet-window protocol (interleaved
CPU-pinned subprocess runs, min-of-reps, cpu_ceiling grading — the same
harness shape as bench_dedup_scaling).

Inputs, written once before any timing:

- LM: the Zipf-ish document corpus from bench_dedup_scaling (realistic
  head/tail vocabulary — bigram count tables get Zipf skew, the score
  join-back gets hot head-words);
- triangles: a power-law-ish undirected edge list synthesized in ONE
  JVM projection — endpoint ids drawn as floor(u^2 * N) over xxhash64
  uniforms, which concentrates degree on low ids (hub nodes) so the
  degree-ordering step has real skew to kill.

Output identity asserted across parallelism levels (row counts + total
triangle count / total scored bigrams).

Timing force: both ops end in left joins against id spines, which a
bare count() ELIMINATES (repo rule) — forced through a filter on a
join-output column.

Usage: python tools/bench_graph_lm_scaling.py [n_docs] [n_edges] [low] [high] [reps]
Internal: python tools/bench_graph_lm_scaling.py --timed-run <threads> <docs_path> <edges_path>
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


def generate_edges(spark, n_edges: int, n_nodes: int, out_path: str) -> None:
    """Power-law-ish edge list: each endpoint id = floor(u² · N) with u a
    deterministic xxhash64 uniform — quadratic concentration makes low
    ids hubs (max degree ~ √(edges per node-id slot) · N heavy head)."""
    uni = (
        "(pmod(xxhash64({src}), 1000000) / 1000000.0)"
    )
    spark.range(n_edges).select(
        F.expr(
            f"cast(floor(pow({uni.format(src='id * 2')}, 2) * {n_nodes}) as long)"
        ).alias("src"),
        F.expr(
            f"cast(floor(pow({uni.format(src='id * 2 + 1')}, 2) * {n_nodes}) as long)"
        ).alias("dst"),
    ).write.mode("overwrite").parquet(out_path)


def timed_run(threads: int, docs_path: str, edges_path: str) -> dict:
    from biomedical_knowledge_graph_spark.operators.lm import bigram_lm_scores
    from biomedical_knowledge_graph_spark.operators.triangles import (
        triangle_counts,
    )
    from tools.bench_dedup_scaling import _corpus_bytes

    spark = new_session(
        "bkg-graphlm-scaling",
        master=f"local[{threads}]",
        shuffle_partitions=threads * 6,
        extra_conf={
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
            "spark.sql.files.openCostInBytes": str(16 * 1024),
        },
    )
    out: dict = {}
    ops = {
        "lm": (
            docs_path,
            lambda df: bigram_lm_scores(df).filter(F.col("n_bigrams") >= 0),
            lambda df: df.agg(
                F.count("*"), F.sum("n_bigrams")
            ).collect()[0],
        ),
        "triangles": (
            edges_path,
            lambda df: triangle_counts(df).filter(F.col("triangles") >= 0),
            lambda df: df.agg(
                F.count("*"), F.sum("triangles")
            ).collect()[0],
        ),
    }
    wanted = os.environ.get("BKG_SCALING_OPS")
    if wanted:
        keep = {w.strip() for w in wanted.split(",")}
        ops = {k: v for k, v in ops.items() if k in keep}
    for name, (path, fn, identity) in ops.items():
        spark.conf.set(
            "spark.sql.files.maxPartitionBytes",
            str(max(64 * 1024, _corpus_bytes(path) // (threads * 8))),
        )
        df = spark.read.parquet(path)
        warm = df.limit(1000).repartition(threads * 2).persist()
        warm.count()
        fn(warm).count()
        warm.unpersist()
        t0 = time.time()
        n = fn(df).count()
        out[f"{name}_wall_s"] = round(time.time() - t0, 2)
        out[f"{name}_rows"] = n
        ident = identity(fn(df))
        out[f"{name}_identity"] = [int(v) for v in ident]
    spark.stop()
    return out


def pinned_run(threads: int, docs_path: str, edges_path: str) -> dict:
    pin = os.environ.get("BKG_PIN", "1") != "0"
    cmd = [
        *(["taskset", "-c", f"0-{threads - 1}"] if pin else []),
        sys.executable,
        os.path.abspath(__file__),
        "--timed-run",
        str(threads),
        docs_path,
        edges_path,
    ]
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd=os.getcwd(), check=True
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--timed-run":
        print(
            json.dumps(timed_run(int(sys.argv[2]), sys.argv[3], sys.argv[4]))
        )
        return
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 480_000
    n_edges = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000
    low = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    high = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    reps = int(sys.argv[5]) if len(sys.argv) > 5 else 2

    from tools.bench_dedup_scaling import generate_docs
    from tools.bench_scaling import cpu_ceiling

    reuse = os.environ.get("BKG_GRAPHLM_INPUTS")
    if reuse:
        # reuse a prior invocation's generated inputs (same n_docs/n_edges
        # — caller's responsibility) so A/B re-runs skip the ~4 min gen
        docs_path = os.path.join(reuse, "docs")
        edges_path = os.path.join(reuse, "edges")
    else:
        spark = new_session("bkg-graphlm-gen", master="local[16]")
        tmp = tempfile.mkdtemp(prefix="bkg_graphlm_")
        docs_path = os.path.join(tmp, "docs")
        edges_path = os.path.join(tmp, "edges")
        generate_docs(spark, n_docs, docs_path)
        generate_edges(spark, n_edges, n_edges // 10, edges_path)
        spark.stop()

    walls: dict[str, dict[int, list[float]]] = {}
    idents: dict[str, dict[int, list]] = {}
    for rep in range(reps):
        for threads in (low, high):
            r = pinned_run(threads, docs_path, edges_path)
            for name in ("lm", "triangles"):
                if f"{name}_wall_s" not in r:
                    continue
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
        "n_edges": n_edges,
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
