"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full materialization of
every output column — a bare count() would let Catalyst prune the very
columns under test). Extra keys report the KG-pipeline throughput
(triples/sec) on a generated pages corpus; scaling-efficiency evidence
(local[8] vs local[32]) lives in tools/bench_scaling.py → BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from biomedical_knowledge_graph_spark.queries import REGISTRY  # noqa: E402
from biomedical_knowledge_graph_spark.session import get_spark  # noqa: E402

# dedup_ngram_jaccard is deliberately NOT headline: exact all-pairs shingle
# intersection is verification-grade (O(sum postings^2)); its scale path is
# dedup_minhash_lsh, which computes the same >=0.8-Jaccard pairs via banded
# signatures (365 s vs 24 s at sf0.1 on this box).
HEADLINE = [
    "kg_links",
    "kg_triples",
    "kg_connected_components",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "doc_lang_id",
    "ann_cosine_topk",
    "pricing_summary",
    "customer_order_degree",
    "segment_brand_overlap",
    "doc_quality",
    "lineitem_measures_unpivot",
    # round 2 scale-path additions
    "embedding_near_pairs_lsh",
    "ann_ivf_topk",
    "customer_evidence_matrix",
    "cluster_hierarchy_flags",
    "asof_last_purchase_before_error",
    # round 3 additions
    "ann_ivf_sampled_topk",
    "kg_golden_metrics",
]


def force(df) -> None:
    """Materialize every output column (noop sink; no driver collect)."""
    df.write.mode("overwrite").format("noop").save()


def _assert_headline_scalable() -> None:
    bad = [n for n in HEADLINE if REGISTRY[n].verification_only]
    assert not bad, f"verification-only queries must not be benchmarked: {bad}"


def main() -> None:
    _assert_headline_scalable()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="bkg-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) * 4,
        extra_conf={"spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m"},
    )

    # warm the JVM + every Python worker once so per-query numbers measure
    # the plan, not first-call initialization
    def _noop(batches):
        yield from batches

    spark.range(int(cpus) * 4).repartition(int(cpus) * 2).mapInPandas(
        _noop, schema="id long"
    ).write.format("noop").mode("overwrite").save()
    force(REGISTRY["pricing_summary"].fn(spark, sf_dir))

    # min-of-N per query: the host is shared and identical jobs vary 5-10x
    # run to run, so n=1 numbers are noise, not signal (reps interleaved so
    # one transient host stall cannot inflate every rep of one query)
    reps = int(os.environ.get("BKG_BENCH_REPS", "2"))
    timings = {name: float("inf") for name in HEADLINE}
    for _ in range(reps):
        for name in HEADLINE:
            t0 = time.time()
            force(REGISTRY[name].fn(spark, sf_dir))
            timings[name] = min(timings[name], round(time.time() - t0, 3))

    # KG-pipeline throughput: pages -> triples end-to-end on a generated
    # corpus (the north-rule metric)
    from biomedical_knowledge_graph_spark import fixtures
    from biomedical_knowledge_graph_spark.plans.pipeline import build_kg

    n_pages = int(os.environ.get("BKG_BENCH_PAGES", "20000"))
    aliases = [a for a, _, _ in fixtures.synthetic_alias_specs(5000, seed=42)]
    pages = fixtures.generate_pages_distributed(
        spark, n_pages, aliases, seed=42, partitions=int(cpus) * 4
    ).cache()
    pages.count()
    dim = fixtures.synthetic_entity_dict_df(spark, 5000, seed=42)
    pipe_walls = []
    n_triples = n_links = 0
    # min-of-3: the host is shared and BIMODAL (same run measured 15s and
    # 99s an hour apart) — a third rep materially improves the odds that
    # one rep lands in a quiet window
    for _ in range(3):
        t0 = time.time()
        # 'ac' strategy: the mention scan runs in per-core Python worker
        # processes (separate heaps) — measured faster AND better-scaling
        # than the single-JVM token-n-gram explode, whose allocation churn
        # plateaus near 2x in one shared heap (outputs are identical; both
        # strategies stay available and tested)
        result = build_kg(spark, pages, dim, min_cooccur=3, mention_strategy="ac")
        n_triples = result.triples.count()
        n_links = result.links.count()
        pipe_walls.append(time.time() - t0)
        result.links.unpersist()
    pipe_wall = min(pipe_walls)
    pages.unpersist()

    sf = sf_dir.rstrip("/").split("sf")[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    deltas = _deltas_vs_previous_round(timings, sf_val)
    # the full per-query delta detail goes on its OWN line, printed BEFORE
    # the contract line: the driver tail-captures a bounded window and
    # parses the final line, and r3's inline deltas pushed that line past
    # the window (BENCH_r03.json parsed: null). The final line keeps only
    # a compact regressions summary.
    if deltas is not None:
        print(json.dumps({"bench_deltas": deltas}))
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "pipeline": {
            "pages": n_pages,
            "links": n_links,
            "triples": n_triples,
            "wall_s": round(pipe_wall, 3),
            "triples_per_sec": round(n_triples / pipe_wall, 1),
            "pages_per_sec": round(n_pages / pipe_wall, 1),
        },
    }
    if deltas is not None:
        out["regressions"] = {
            "vs": deltas["baseline_file"],
            "names": deltas["regressions"],
        }
    print(json.dumps(out))


def _deltas_vs_previous_round(
    timings: dict[str, float], sf_val
) -> dict | None:
    """Round-over-round per-query deltas (VERDICT r2 item 10): compare this
    run's minima against the newest BENCH_r*.json and flag >1.5x as
    regressed — sub-second wobble on this shared host is noise, but the
    harness now computes the ratio itself instead of leaving it to the
    reader. BKG_PREV_BENCH overrides the baseline file."""
    import glob

    import re

    prev_path = os.environ.get("BKG_PREV_BENCH")
    if not prev_path:
        here = os.path.dirname(os.path.abspath(__file__))
        # sort by the NUMERIC round — lexicographic puts r10 before r9
        def _round_no(p: str) -> int:
            m = re.search(r"BENCH_r(\d+)\.json$", p)
            return int(m.group(1)) if m else -1

        cands = sorted(
            glob.glob(os.path.join(here, "BENCH_r*.json")), key=_round_no
        )
        prev_path = cands[-1] if cands else None
    if not prev_path or not os.path.exists(prev_path):
        return None
    try:
        with open(prev_path) as f:
            prev = json.load(f)
    except (OSError, json.JSONDecodeError):
        return None
    if isinstance(prev.get("parsed"), dict):
        # the driver's BENCH_r*.json wraps the bench line under "parsed"
        prev = prev["parsed"]
    elif isinstance(prev.get("tail"), str):
        # r3's inline deltas pushed the contract line past the driver's
        # tail-capture window (parsed: null) — recover per-query minima
        # from the raw tail: everything before '"sf":' is (a suffix of)
        # the queries dict, so name/number pairs there are query walls
        frag = prev["tail"].split('"sf":')[0]
        m_sf = re.search(r'"sf": ([0-9.]+)', prev["tail"])
        prev = {
            "sf": float(m_sf.group(1)) if m_sf else None,
            "queries": {
                k: float(v)
                for k, v in re.findall(r'"([a-z_0-9]+)": ([0-9.]+)', frag)
            },
        }
    if prev.get("sf") != sf_val:
        return None  # cross-SF ratios are meaningless
    prev_q = prev.get("queries") or {}
    per_query = {}
    for name, t in timings.items():
        p = prev_q.get(name)
        if p:
            per_query[name] = {
                "prev_s": p,
                "ratio": round(t / p, 2),
                "regressed": t > 1.5 * p,
            }
    return {
        "baseline_file": os.path.basename(prev_path),
        "queries": per_query,
        "regressions": sorted(
            n for n, d in per_query.items() if d["regressed"]
        ),
    }


if __name__ == "__main__":
    main()
