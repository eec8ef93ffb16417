"""Physical-plan audits: the optimizations SURVEY.md §4 promises must be
visible in `.explain()` output — broadcast joins where dims are small,
predicate pushdown into the parquet scan, no Python in JVM-only paths."""

from __future__ import annotations

from pyspark.sql import functions as F

from biomedical_knowledge_graph_spark import fixtures
from biomedical_knowledge_graph_spark.operators.linking import (
    link_mentions,
    resolve_obsolete,
)
from biomedical_knowledge_graph_spark.operators.mentions import (
    scan_mentions_token_join,
)


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_dictionary_link_is_broadcast(spark):
    docs = spark.createDataFrame(
        [(1, "alpha kinase here")], "doc_id long, text string"
    )
    dim = resolve_obsolete(fixtures.entity_dict_df(spark))
    mentions = scan_mentions_token_join(docs, dim)
    linked = link_mentions(mentions, dim, id_col="doc_id")
    plan = plan_of(linked)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # a dim join must never shuffle


def test_token_join_scan_has_no_python(spark, tmp_path):
    path = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "alpha kinase binds beta channel")], "doc_id long, text string"
    ).write.parquet(path)
    docs = spark.read.parquet(path)
    dim = resolve_obsolete(fixtures.entity_dict_df(spark))
    plan = plan_of(scan_mentions_token_join(docs, dim))
    # whole-stage codegen end to end: no Arrow/Python eval nodes
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan
    assert "BroadcastHashJoin" in plan  # dictionary never shuffles


def test_filter_pushdown_to_parquet(spark, tmp_path):
    path = str(tmp_path / "li")
    spark.createDataFrame(
        [(1, "A", 5.0), (2, "B", 6.0)], "k long, flag string, v double"
    ).write.parquet(path)
    df = spark.read.parquet(path).filter(F.col("flag") == "A").select("k")
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(flag), EqualTo(flag,A)]" in plan
    # column pruning: the scan must not read v
    assert "ReadSchema" in plan and "v:double" not in plan


def test_html_pruned_before_downstream(spark):
    from biomedical_knowledge_graph_spark.operators.extraction import (
        extract_pages,
    )

    pages = fixtures.pages_df(spark, n_pages=5, seed=1)
    docs = extract_pages(pages)
    assert "html" not in docs.columns
