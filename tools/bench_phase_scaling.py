"""Per-phase scaling + ceiling bracket (round 4, VERDICT r3 item 6).

Measures, in one session (same host window):
  1. pure-CPU ceiling 4→16 procs (fixed total work) — upper bracket;
  2. memory-BANDWIDTH ceiling 4→16 procs (fixed total array traversal)
     — lower bracket: shuffle/hash/explode phases are bandwidth-bound;
  3. per-phase pipeline walls at 4 and 16 cores (local-cluster, separate
     executor JVMs), phases materialized independently, interleaved
     min-of-N;
  4. the Amdahl blend: predicted achievable speedup for THIS job's phase
     mix given each phase's nearest probe ceiling, vs the measured blend.

Usage: python tools/bench_phase_scaling.py [n_pages] [reps]
Internal: --phase-run <total_cores> <pages_path>
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, ".")


def _burn(_):
    x = 0
    for i in range(4_000_000):
        x += i * i
    return x


_MEM = None


def _stream(_):
    # fixed traversal over a process-local 128 MB array: bandwidth-bound
    global _MEM
    import numpy as np

    if _MEM is None:
        _MEM = np.ones(16 * 1024 * 1024, dtype=np.float64)
    s = 0.0
    for _i in range(4):
        s += float(_MEM.sum())
    return s


def probe(fn, procs_list, tasks: int = 64, reps: int = 2) -> dict:
    import multiprocessing as mp

    res = {}
    for procs in procs_list:
        best = 1e18
        for _ in range(reps):
            t0 = time.time()
            with mp.Pool(procs) as p:
                p.map(fn, range(tasks))
            best = min(best, time.time() - t0)
        res[procs] = round(best, 2)
    return res


def probe_weak(fn, procs_list, tasks_per_proc: int = 4, reps: int = 2) -> dict:
    """WEAK-scaling probe: total work scales WITH procs (tasks_per_proc
    fixed), so the ideal is equal wall at every size; res[hi]/res[lo] > 1
    is the box's own weak-scaling penalty (scheduling + shared cache/BW
    contention) — the ceiling the pipeline's weak efficiency is judged
    against."""
    import multiprocessing as mp

    res = {}
    for procs in procs_list:
        tasks = procs * tasks_per_proc
        best = 1e18
        for _ in range(reps):
            t0 = time.time()
            with mp.Pool(procs) as p:
                p.map(fn, range(tasks))
            best = min(best, time.time() - t0)
        res[procs] = round(best, 2)
    return res


def phase_run(total_cores: int, pages_path: str) -> dict:
    """One pipeline run with each phase persisted + counted separately.
    Runs in its own subprocess/session (local-cluster, 4-core workers)."""
    from pyspark.sql import functions as F

    from biomedical_knowledge_graph_spark import fixtures
    from biomedical_knowledge_graph_spark.operators.cooccurrence import (
        cooccurrence_edges,
    )
    from biomedical_knowledge_graph_spark.operators.extraction import (
        extract_pages,
    )
    from biomedical_knowledge_graph_spark.operators.linking import (
        link_mentions,
        resolve_obsolete,
    )
    from biomedical_knowledge_graph_spark.operators.mentions import (
        scan_mentions,
    )
    from biomedical_knowledge_graph_spark.session import new_session

    workers = total_cores // 4
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
    os.environ.setdefault("BKG_DRIVER_MEM", "8g")
    spark = new_session(
        "bkg-phase-scaling",
        master=f"local-cluster[{workers},4,8192]",
        shuffle_partitions=total_cores * 6,
        extra_conf={
            "spark.executor.memory": "8192m",
            "spark.executorEnv.PYTHONPATH": repo,
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
            "spark.sql.files.maxPartitionBytes": str(1024 * 1024),
            "spark.sql.files.openCostInBytes": str(64 * 1024),
        },
    )
    # warm python workers + JIT
    def _noop(b):
        yield from b

    spark.range(total_cores * 4).repartition(total_cores * 2).mapInPandas(
        _noop, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    pages = spark.read.parquet(pages_path).persist()
    pages.count()
    aliases = [a for a, _, _ in fixtures.synthetic_alias_specs(5000, seed=42)]
    dim = resolve_obsolete(
        fixtures.synthetic_entity_dict_df(spark, 5000, seed=42)
    )

    walls: dict[str, float] = {}

    def timed(name, df):
        t0 = time.time()
        p = df.persist()
        n = p.count()
        walls[name] = round(time.time() - t0, 2)
        return p, n

    mode = os.environ.get("BKG_PHASE_MODE", "fused")
    docs, _ = timed("extract", extract_pages(pages).filter(F.length("text") > 0))
    if mode == "fused":
        # round-4 production shape: scan+link+canonicalize+dedup in ONE
        # worker pass (scan_mentions_linked) — phases 'link' and
        # 'links_distinct' no longer exist as separate stages
        from biomedical_knowledge_graph_spark.plans.pipeline import (
            alias_component_map,
        )

        comp_map = alias_component_map(dim)
        link_rows = (
            dim.join(comp_map, "canonical_id")
            .select(
                F.lower("alias").alias("alias"), "resolved_id", "entity_type"
            )
            .collect()
        )
        link_map: dict = {}
        for r in link_rows:
            link_map.setdefault(r["alias"], []).append(
                (r["resolved_id"], r["entity_type"])
            )
        from biomedical_knowledge_graph_spark.operators.mentions import (
            scan_mentions_linked,
        )

        links, _ = timed(
            "scan_link_fused",
            scan_mentions_linked(
                docs, link_map, id_col="url", text_col="text"
            ).select(F.col("url"), F.col("entity_id").alias("canonical_id")),
        )
    else:
        mentions, _ = timed(
            "scan", scan_mentions(docs, aliases, id_col="url", text_col="text")
        )
        linked, _ = timed(
            "link",
            link_mentions(mentions, dim, id_col="url").filter(
                F.col("canonical_id").isNotNull()
            ),
        )
        links, _ = timed(
            "links_distinct", linked.select("url", "canonical_id").distinct()
        )
    t0 = time.time()
    n_triples = cooccurrence_edges(
        links,
        doc_col="url",
        ent_col="canonical_id",
        min_count=3,
        encode_ids=True,
        input_distinct=(mode == "fused"),
    ).count()
    walls["pairs"] = round(time.time() - t0, 2)
    walls["total"] = round(sum(walls.values()), 2)
    return {"cores": total_cores, "walls": walls, "triples": n_triples}


def weak_main() -> None:
    """Weak-scaling diagnosis (round 5, VERDICT r4 item 5): 4 cores on the
    base corpus vs 16 cores on 4x the corpus — per-core work nominally
    constant. Reports per-phase walls at both sizes, the box's own weak
    probes (CPU + membw, work scaled with procs), and the Amdahl blend of
    those probes for this job's phase mix — naming which phase's per-core
    work GROWS with corpus size (the pairs aggregate keyspace) and what
    the binding resource is.

    Usage: python tools/bench_phase_scaling.py --weak [base_pages] [reps]
    """
    base_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 120_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    # phase class -> probe, per the r4 bracket: extract/scan are
    # compute-bound (per-row Python/regex work), the pair explosion +
    # hash aggregate is memory-bandwidth-bound (shuffle/hash traffic)
    phase_probe = {"extract": "cpu", "scan_link_fused": "cpu", "pairs": "membw"}

    cpu_w = probe_weak(_burn, [4, 16])
    mem_w = probe_weak(_stream, [4, 16])
    probes = {"cpu_weak_probe_s": cpu_w, "membw_weak_probe_s": mem_w}
    print(json.dumps(probes), flush=True)

    from biomedical_knowledge_graph_spark import fixtures
    from biomedical_knowledge_graph_spark.session import new_session

    tmp = tempfile.mkdtemp(prefix="bkg_weak_")
    paths = {}
    try:
        spark = new_session("bkg-gen", master="local[16]")
        aliases = [a for a, _, _ in fixtures.synthetic_alias_specs(5000, seed=42)]
        for cores, n in ((4, base_pages), (16, base_pages * 4)):
            p = os.path.join(tmp, f"pages_{n}")
            fixtures.generate_pages_distributed(
                spark, n, aliases, seed=42, partitions=256
            ).write.mode("overwrite").parquet(p)
            paths[cores] = p
        spark.stop()

        best: dict[int, dict] = {}
        for _ in range(reps):
            for cores in (4, 16):  # interleaved ABAB
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--phase-run",
                     str(cores), paths[cores]],
                    capture_output=True, text=True, check=True,
                )
                r = json.loads(out.stdout.strip().splitlines()[-1])
                print(json.dumps(r), flush=True)
                cur = best.get(cores)
                if cur is None:
                    best[cores] = r
                else:
                    for k, v in r["walls"].items():
                        cur["walls"][k] = min(cur["walls"][k], v)
        lo, hi = best[4]["walls"], best[16]["walls"]
        # weak efficiency per phase: ideal is equal wall -> lo/hi
        per_phase_eff = {
            k: round(lo[k] / hi[k], 3) for k in lo if k != "total"
        }
        # blended achievable: each phase's predicted high wall is its low
        # wall divided by the box's own weak efficiency for its resource
        probe_eff = {
            "cpu": cpu_w[4] / cpu_w[16],
            "membw": mem_w[4] / mem_w[16],
        }
        pred_hi_total = sum(
            lo[k] / probe_eff[phase_probe.get(k, "cpu")]
            for k in lo
            if k != "total"
        )
        lo_total = sum(v for k, v in lo.items() if k != "total")
        hi_total = sum(v for k, v in hi.items() if k != "total")
        print(json.dumps({
            "base_pages": base_pages,
            "per_phase_low_4c": lo,
            "per_phase_high_16c_4x": hi,
            "per_phase_weak_eff": per_phase_eff,
            "probe_weak_eff": {k: round(v, 3) for k, v in probe_eff.items()},
            "weak_eff_measured": round(lo_total / hi_total, 3),
            "weak_eff_predicted_blend": round(lo_total / pred_hi_total, 3),
            "vs_achievable": round(
                (lo_total / hi_total) / (lo_total / pred_hi_total), 3
            ),
            "triples_low": best[4]["triples"],
            "triples_high": best[16]["triples"],
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--phase-run":
        print(json.dumps(phase_run(int(sys.argv[2]), sys.argv[3])))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--weak":
        weak_main()
        return

    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    print(
        json.dumps(
            {
                "cpu_probe_s": probe(_burn, [4, 16]),
                "membw_probe_s": probe(_stream, [4, 16]),
            }
        ),
        flush=True,
    )

    from biomedical_knowledge_graph_spark import fixtures
    from biomedical_knowledge_graph_spark.session import new_session

    tmp = tempfile.mkdtemp(prefix="bkg_phases_")
    pages_path = os.path.join(tmp, "pages")
    try:
        spark = new_session("bkg-gen", master="local[16]")
        aliases = [a for a, _, _ in fixtures.synthetic_alias_specs(5000, seed=42)]
        fixtures.generate_pages_distributed(
            spark, n_pages, aliases, seed=42, partitions=128
        ).write.mode("overwrite").parquet(pages_path)
        spark.stop()

        best: dict[int, dict] = {}
        for _ in range(reps):
            for cores in (4, 16):
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--phase-run",
                     str(cores), pages_path],
                    capture_output=True, text=True, check=True,
                )
                r = json.loads(out.stdout.strip().splitlines()[-1])
                print(json.dumps(r), flush=True)
                cur = best.get(cores)
                if cur is None:
                    best[cores] = r
                else:  # min-merge per phase
                    for k, v in r["walls"].items():
                        cur["walls"][k] = min(cur["walls"][k], v)
        lo, hi = best[4]["walls"], best[16]["walls"]
        speedups = {
            k: round(lo[k] / hi[k], 2) for k in lo if k != "total"
        }
        print(json.dumps({
            "per_phase_best_low": lo,
            "per_phase_best_high": hi,
            "per_phase_speedup_4_to_16": speedups,
            "outputs_equal": best[4]["triples"] == best[16]["triples"],
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
