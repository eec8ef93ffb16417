"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship KG dataflow (mention scan → link → co-occurrence
triples) on sf0.001; ``queries``/``oracle_sql`` expose every implemented
operator from SURVEY.md §2 with DuckDB oracles (see
biomedical_knowledge_graph_spark/queries.py for the registry).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from biomedical_knowledge_graph_spark.queries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: documents → entity links →
    co-occurrence (subj, pred, obj) triples."""
    return REGISTRY["kg_triples"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
