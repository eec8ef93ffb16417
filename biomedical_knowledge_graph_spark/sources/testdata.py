"""Loaders for the driver-generated testdata tables (TESTDATA.md) and the
embedded entity dictionary used by the documents-table KG queries.

The dictionary is 1:1 alias→entity (ambiguity/CC paths are exercised by the
fixtures dictionary in fixtures.py and by the lineitem-derived CC query);
it is the single source of truth for both the Spark queries and the DuckDB
oracle SQL (rendered as an inline VALUES CTE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(name)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# alias → (entity_id, entity_type); aliases are single lowercase tokens of
# the documents vocabulary, so word-boundary matching == ' alias ' containment
DOC_ENTITY_DICT: tuple[tuple[str, str, str], ...] = (
    ("join", "ENT:OP:JOIN", "operator"),
    ("scan", "ENT:OP:SCAN", "operator"),
    ("filter", "ENT:OP:FILTER", "operator"),
    ("sort", "ENT:OP:SORT", "operator"),
    ("merge", "ENT:OP:MERGE", "operator"),
    ("agg", "ENT:OP:AGG", "operator"),
    ("window", "ENT:OP:WINDOW", "operator"),
    ("table", "ENT:OBJ:TABLE", "object"),
    ("row", "ENT:OBJ:ROW", "object"),
    ("column", "ENT:OBJ:COLUMN", "object"),
    ("vector", "ENT:OBJ:VECTOR", "object"),
    ("customer", "ENT:ACT:CUSTOMER", "actor"),
    ("spark", "ENT:SYS:SPARK", "system"),
)


def doc_entity_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        list(DOC_ENTITY_DICT), "alias string, entity_id string, entity_type string"
    )


def doc_dict_cte() -> str:
    """The same dictionary as a DuckDB inline-VALUES CTE body."""
    rows = ", ".join(
        f"('{a}', '{e}', '{t}')" for a, e, t in DOC_ENTITY_DICT
    )
    return f"dict(alias, entity_id, entity_type) AS (VALUES {rows})"
