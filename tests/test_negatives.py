"""Deterministic KG-embedding negative sampling (round 7)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from biomedical_knowledge_graph_spark.operators.negatives import (
    corrupt_tail_negatives,
)


def _triples(spark, n_rows=500, n_ent=50):
    return spark.createDataFrame(
        [(i, "rel%d" % (i % 3), (i * 7) % n_ent) for i in range(n_rows)],
        "subj long, pred string, obj long",
    )


def test_negatives_never_equal_positive_and_in_range(spark):
    df = _triples(spark)
    out = corrupt_tail_negatives(df, 50, k=3).collect()
    assert len(out) == 500 * 3
    for r in out:
        assert r.neg_obj != r.obj
        assert 0 <= r.neg_obj < 50
        assert 0 <= r.neg_idx < 3


def test_negatives_deterministic_and_partition_invariant(spark):
    df = _triples(spark)
    a = sorted(
        (r.subj, r.pred, r.obj, r.neg_idx, r.neg_obj)
        for r in corrupt_tail_negatives(df.repartition(1), 50, k=2).collect()
    )
    b = sorted(
        (r.subj, r.pred, r.obj, r.neg_idx, r.neg_obj)
        for r in corrupt_tail_negatives(df.repartition(13), 50, k=2).collect()
    )
    assert a == b
    # different neg_idx gives (almost always) a different corruption —
    # the per-i hash varies; pin that they are not all identical
    by_key = {}
    for s, p, o, i, n in a:
        by_key.setdefault((s, p, o), set()).add(n)
    assert sum(1 for v in by_key.values() if len(v) > 1) > 400


def test_negatives_broadcast_count_frame_matches_literal(spark):
    df = _triples(spark)
    cnt = spark.createDataFrame([(50,)], "n long")
    a = sorted(
        (r.subj, r.neg_idx, r.neg_obj)
        for r in corrupt_tail_negatives(df, cnt, k=2).collect()
    )
    b = sorted(
        (r.subj, r.neg_idx, r.neg_obj)
        for r in corrupt_tail_negatives(df, 50, k=2).collect()
    )
    assert a == b


def test_negatives_spread_over_entity_space(spark):
    # the md5 offset should hit most of a small entity space
    df = _triples(spark, n_rows=1000, n_ent=20)
    distinct_negs = (
        corrupt_tail_negatives(df, 20, k=2)
        .select("neg_obj").distinct().count()
    )
    assert distinct_negs == 20


def test_negatives_guards(spark):
    df = _triples(spark)
    with pytest.raises(ValueError, match="k must be positive"):
        corrupt_tail_negatives(df, 50, k=0)
    with pytest.raises(ValueError, match="entity_count must be >= 2"):
        corrupt_tail_negatives(df, 1)


def test_negatives_zero_shuffle_plan(spark):
    df = _triples(spark)
    plan = (
        corrupt_tail_negatives(df, 50, k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
