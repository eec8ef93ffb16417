"""Round-3 occupancy hardening: bounded cell work under pathological skew.

VERDICT r2 items 2/3 — fixed bucket spaces hide quadratic work inside hot
cells at corpus scale. These tests build the pathological inputs (a mass
of near-identical vectors / crowded simhash cells) and assert (a) the
split machinery bounds per-cell pair work and (b) outputs stay correct:
byte-equal for simhash (the complement re-banding is exactness-preserving
by pigeonhole), threshold-verified for sign-LSH.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from biomedical_knowledge_graph_spark.operators import dedup as D
from biomedical_knowledge_graph_spark.operators import similarity as S


# ---------------------------------------------------------------------------
# sign-LSH near pairs
# ---------------------------------------------------------------------------


def _clustered_vectors(spark, n=240, dim=8, seed=3):
    """One tight cluster: every vector is base + tiny noise → identical
    sign-bucket in (almost) every table — the worst case for fixed cells."""
    rng = np.random.RandomState(seed)
    base = rng.randn(dim)
    rows = [
        (int(i), (base + 1e-4 * rng.randn(dim)).astype(float).tolist())
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_lsh_cell_split_bounds_candidates(spark):
    df = _clustered_vectors(spark).persist()
    n = df.count()
    full_pairs = n * (n - 1) // 2
    # bucketize exactly as lsh_near_pairs does, via the public bucketer
    bucketed = S.lsh_bucket(df, dim=8, n_planes=6, seed=13).select(
        F.col("vec_id").alias("_vid"), F.lit(0).alias("tbl"),
        F.col("lsh_bucket").alias("bucket"),
    )
    # the whole cluster lands in one cell
    max_cell = (
        bucketed.groupBy("tbl", "bucket").count().agg(F.max("count")).first()[0]
    )
    assert max_cell == n
    cap = 20
    bounded = D  # noqa: F841  (clarity: cap applies below)
    cands = S._bounded_cell_candidates(bucketed, max_cell_size=cap)
    n_cands = cands.count()
    # un-split this would be the full quadratic pair set; the split keeps
    # per-subcell work ≤ ~cap²/2 across ceil(n/cap) subcells
    n_sub = -(-n // cap)
    assert 0 < n_cands < full_pairs
    assert n_cands <= n_sub * (2 * cap) * (2 * cap - 1) // 2
    df.unpersist()


def test_lsh_near_pairs_capped_still_finds_pairs(spark):
    df = _clustered_vectors(spark, n=120)
    out = S.lsh_near_pairs(
        df, dim=8, threshold=0.99, n_planes=6, n_tables=8, max_cell_size=16
    )
    rows = out.collect()
    # near-identical cluster → plenty of verified pairs survive the split
    # (table-salted subcells decorrelate across the 8 tables)
    assert len(rows) > 100
    assert all(r["score"] >= 0.99 for r in rows)
    # ids ordered, no dupes
    keys = [(r["id_a"], r["id_b"]) for r in rows]
    assert all(a < b for a, b in keys) and len(set(keys)) == len(keys)


def test_lsh_auto_planes_scale_with_corpus(spark):
    small = _clustered_vectors(spark, n=40)
    # n_planes=None → auto; just assert it runs and respects the floor
    out = S.lsh_near_pairs(
        small, dim=8, threshold=0.99, n_planes=None, n_tables=4
    )
    assert out.count() > 0


# ---------------------------------------------------------------------------
# simhash band re-banding (exactness-preserving split)
# ---------------------------------------------------------------------------


def test_band_layout_covers_all_bits():
    for total, bands in [(64, 7), (64, 8), (54, 7), (55, 7), (64, 13)]:
        layout = D._band_layout(total, bands)
        assert len(layout) == bands
        assert sum(w for _, w in layout) == total
        # contiguous, non-overlapping
        off = 0
        for o, w in layout:
            assert o == off and w >= 1
            off += w


def test_complement_bits_matches_python_reference(spark):
    vals = [0, -1, 123456789, -987654321012345, (1 << 62) + 12345]
    df = spark.createDataFrame([(v,) for v in vals], "sig bigint")
    for off, w in [(0, 10), (10, 9), (55, 9), (28, 9)]:
        got = [
            r["c"]
            for r in df.select(
                D._complement_bits(F.col("sig"), off, w).alias("c")
            ).collect()
        ]
        for v, g in zip(vals, got):
            u = v & ((1 << 64) - 1)
            if off + w >= 64:
                ref = u & ((1 << off) - 1)
            else:
                ref = ((u >> (off + w)) << off) | (u & ((1 << off) - 1))
            assert g == ref, (v, off, w)


def _crowded_docs(spark, n=80):
    """Docs sharing a large common token set with 1-2 varying tokens →
    simhashes within a few bits of each other → one crowded cell."""
    common = " ".join(f"tok{i}" for i in range(40))
    rows = [(i, f"{common} extra{i % 7} tail{i % 3}") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_simhash_split_is_exact(spark):
    docs = _crowded_docs(spark).persist()
    uncapped = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in D.simhash_near_pairs(docs, max_hamming=6).collect()
    }
    # brute-force ground truth (n is tiny)
    sig = D.simhash64(docs).persist()
    a = sig.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sa"))
    b = sig.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("sb"))
    brute = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
        .filter(F.col("hamming") <= 6)
        .select("id_a", "id_b", "hamming")
        .collect()
    }
    assert uncapped == brute
    # force the occupancy split (cap=2 → every crowded cell re-bands) and
    # require the SAME output: the complement re-banding is pigeonhole-exact
    capped = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in D.simhash_near_pairs(docs, max_hamming=6, max_cell_size=2).collect()
    }
    assert capped == brute
    # sanity: the pathological corpus really does crowd cells (split fired)
    layout = D._band_layout(64, 7)
    sliced = sig.select(
        "doc_id",
        *[
            F.shiftrightunsigned(F.col("simhash"), off)
            .bitwiseAND(F.lit((1 << w) - 1))
            .alias(f"s{i}")
            for i, (off, w) in enumerate(layout)
        ],
    )
    crowd = sliced.groupBy("s0").count().agg(F.max("count")).first()[0]
    assert crowd > 2
    sig.unpersist()
    docs.unpersist()


def test_simhash_minimal_bands_geometry(spark):
    # default now uses max_hamming+1 bands with unequal widths
    docs = _crowded_docs(spark, n=20)
    out7 = D.simhash_near_pairs(docs, max_hamming=6)  # 7 bands
    out8 = D.simhash_near_pairs(docs, max_hamming=6, bands=8)
    assert {tuple(r) for r in out7.collect()} == {
        tuple(r) for r in out8.collect()
    }


# ---------------------------------------------------------------------------
# sampled-centroid IVF
# ---------------------------------------------------------------------------


def test_sampled_centroids_deterministic_and_sane(spark):
    from biomedical_knowledge_graph_spark.sources.testdata import load

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    c1 = S.sampled_centroids(emb, k=8).collect()
    c2 = S.sampled_centroids(emb, k=8).collect()
    as_map = lambda rows: {r["cent_id"]: tuple(r["cvec"]) for r in rows}  # noqa: E731
    # bit-identical across runs (fixed-point Lloyd mean, no float-order drift)
    assert as_map(c1) == as_map(c2)
    assert len(c1) == 8 and all(len(r["cvec"]) == 64 for r in c1)


def test_ivf_sampled_recall_vs_exact(spark):
    from biomedical_knowledge_graph_spark.sources.testdata import load
    from pyspark.sql import functions as F

    emb = load(spark, "/root/testdata/sf0.001", "embeddings").persist()
    queries = emb.filter(F.col("vec_id") < 10)
    exact = S.cosine_topk(emb, queries, k=5)
    cents = S.sampled_centroids(emb, k=8).persist()
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}

    def recall(n_probe):
        ap = {
            (r["query_id"], r["neighbor_id"])
            for r in S.ivf_topk_from_centroids(
                emb, queries, cents, k=5, n_probe=n_probe
            ).collect()
        }
        return len(ex & ap) / len(ex)

    # multi-probe is the IVF recall knob: measured 0.32 / 0.52 / 0.68 at
    # probes 1/2/3 on this deterministic corpus (unclustered Gaussians are
    # the hard case for Voronoi cells) — assert the curve, with slack only
    # for future corpus regeneration, not for flakiness (all inputs fixed)
    r1, r2, r3 = recall(1), recall(2), recall(3)
    assert r1 >= 0.25 and r2 >= r1 and r3 >= r2
    assert r3 >= 0.6, (r1, r2, r3)
    cents.unpersist()
    emb.unpersist()


def test_lsh_multiprobe_recall_curve(spark):
    from biomedical_knowledge_graph_spark.sources.testdata import load
    from pyspark.sql import functions as F

    emb = load(spark, "/root/testdata/sf0.001", "embeddings").persist()
    queries = emb.filter(F.col("vec_id") < 10)
    ex = {
        (r["query_id"], r["neighbor_id"])
        for r in S.cosine_topk(emb, queries, k=5).collect()
    }

    def recall(n_probe):
        ap = {
            (r["query_id"], r["neighbor_id"])
            for r in S.lsh_topk(
                emb, queries, dim=64, k=5, n_planes=8, n_probe=n_probe
            ).collect()
        }
        return len(ex & ap) / len(ex)

    r1, r3 = recall(1), recall(3)
    # targeted low-margin flips must strictly add recall on this corpus
    assert r3 > r1, (r1, r3)
    emb.unpersist()
