"""Driver-contract query registry.

One entry per implemented operator family from SURVEY.md §2, each with:
- a Spark callable ``(spark, sf_dir) -> DataFrame`` (the implementation
  under test, built on the operators package), and
- an equivalent ANSI-SQL oracle string for DuckDB over the same parquet
  tables (omitted for genuinely non-SQL-expressible ops → the driver
  records a rows-only check).

Column-name parity rule: every computed column is aliased identically in
both the Spark plan and the SQL. Float-safety rule: aggregate outputs are
integer-valued (counts, exact-integer sums, cents as bigint) or rounded to
a safe number of decimals so value hashes match bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from biomedical_knowledge_graph_spark.operators.components import (
    connected_components,
)
from biomedical_knowledge_graph_spark.operators.cooccurrence import (
    cooccurrence_edges,
)
from biomedical_knowledge_graph_spark.operators.mentions import scan_mentions
from biomedical_knowledge_graph_spark.sources.testdata import (
    DOC_ENTITY_DICT,
    doc_dict_cte,
    doc_entity_dim,
    load,
)


@dataclass
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    survey_ops: str  # SURVEY.md §2 rows this query covers


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None, survey_ops: str):
    def deco(fn):
        REGISTRY[name] = QueryDef(fn=fn, oracle=oracle, survey_ops=survey_ops)
        return fn

    return deco


# ---------------------------------------------------------------------------
# KG family over the documents table (the engine's own dataflow, §7.1)
# ---------------------------------------------------------------------------

_DICT_CTE = doc_dict_cte()


def _doc_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → distinct (doc_id, entity_id, entity_type) via the
    Arrow-batched Aho-Corasick scan + broadcast dictionary join."""
    docs = load(spark, sf_dir, "documents")
    dim = doc_entity_dim(spark)
    mentions = scan_mentions(
        docs, [a for a, _, _ in DOC_ENTITY_DICT], id_col="doc_id", text_col="text"
    )
    return (
        mentions.join(F.broadcast(dim), mentions["surface"] == dim["alias"])
        .select("doc_id", "entity_id", "entity_type")
        .distinct()
    )


@register(
    "kg_links",
    f"""
    WITH {_DICT_CTE}
    SELECT d.doc_id, t.entity_id, t.entity_type
    FROM documents d
    JOIN dict t ON (' ' || d.text || ' ') LIKE ('% ' || t.alias || ' %')
    """,
    "S1/J1/J8 — mention scan + broadcast dictionary link",
)
def kg_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _doc_links(spark, sf_dir)


@register(
    "kg_mention_freq",
    f"""
    WITH {_DICT_CTE}
    SELECT d.doc_id, t.entity_id,
           len(list_filter(string_split(d.text, ' '), x -> x = t.alias))
             AS mention_count
    FROM documents d
    JOIN dict t ON (' ' || d.text || ' ') LIKE ('% ' || t.alias || ' %')
    """,
    "A11 — per-(doc, entity) occurrence histogram",
)
def kg_mention_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    dim = doc_entity_dim(spark)
    mentions = scan_mentions(
        docs, [a for a, _, _ in DOC_ENTITY_DICT], id_col="doc_id", text_col="text"
    )
    return (
        mentions.join(F.broadcast(dim), mentions["surface"] == dim["alias"])
        .groupBy("doc_id", "entity_id")
        .agg(F.count("*").cast("long").alias("mention_count"))
    )


@register(
    "kg_entity_doc_counts",
    f"""
    WITH {_DICT_CTE},
    links AS (
      SELECT d.doc_id, t.entity_id, t.entity_type
      FROM documents d
      JOIN dict t ON (' ' || d.text || ' ') LIKE ('% ' || t.alias || ' %')
    )
    SELECT entity_id, entity_type, count(DISTINCT doc_id) AS doc_count
    FROM links GROUP BY entity_id, entity_type
    """,
    "A2 — node-table counts (golden metrics shape)",
)
def kg_entity_doc_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _doc_links(spark, sf_dir)
        .groupBy("entity_id", "entity_type")
        .agg(F.countDistinct("doc_id").alias("doc_count"))
    )


@register(
    "kg_triples",
    f"""
    WITH {_DICT_CTE},
    links AS (
      SELECT DISTINCT d.doc_id, t.entity_id
      FROM documents d
      JOIN dict t ON (' ' || d.text || ' ') LIKE ('% ' || t.alias || ' %')
    )
    SELECT a.entity_id AS subj, b.entity_id AS obj,
           count(DISTINCT a.doc_id) AS shared_docs,
           CASE WHEN count(DISTINCT a.doc_id) >= 300 THEN 'high'
                WHEN count(DISTINCT a.doc_id) >= 150 THEN 'medium'
                WHEN count(DISTINCT a.doc_id) >= 50 THEN 'low'
                ELSE 'weak' END AS confidence
    FROM links a JOIN links b
      ON a.doc_id = b.doc_id AND a.entity_id < b.entity_id
    GROUP BY a.entity_id, b.entity_id
    HAVING count(DISTINCT a.doc_id) >= 20
    """,
    "J6/A1/P6 — co-occurrence pair aggregation with confidence tiers",
)
def kg_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    links = _doc_links(spark, sf_dir)
    return cooccurrence_edges(
        links,
        doc_col="doc_id",
        ent_col="entity_id",
        min_count=20,
        tiers=((300, "high"), (150, "medium"), (50, "low"), (20, "weak")),
    )


@register(
    "kg_multimodal_entities",
    f"""
    WITH {_DICT_CTE},
    links AS (
      SELECT DISTINCT d.doc_id, d.lang, t.entity_id
      FROM documents d
      JOIN dict t ON (' ' || d.text || ' ') LIKE ('% ' || t.alias || ' %')
    )
    SELECT entity_id, count(DISTINCT lang) AS n_langs
    FROM links GROUP BY entity_id HAVING count(DISTINCT lang) >= 3
    """,
    "A4/J11 — multi-namespace (multi-modal) entity flags",
)
def kg_multimodal_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    links = _doc_links(spark, sf_dir).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    return (
        links.groupBy("entity_id")
        .agg(F.countDistinct("lang").alias("n_langs"))
        .filter(F.col("n_langs") >= 3)
    )


@register(
    "kg_connected_components",
    """
    WITH RECURSIVE lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2
      FROM lp a JOIN lp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 3
    ),
    sym AS (SELECT p1 AS a, p2 AS b FROM pairs
            UNION SELECT p2, p1 FROM pairs),
    reach(a, b) AS (
      SELECT a, b FROM sym
      UNION
      SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    )
    SELECT a AS node, least(a, min(b)) AS component
    FROM reach GROUP BY a
    """,
    "J5 — connected-components entity resolution over a linkage graph",
)
def kg_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    lp = li.select("l_orderkey", "l_partkey").distinct()
    a, b = lp.alias("a"), lp.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 3)
        .drop("c")
    )
    return connected_components(edges)


# ---------------------------------------------------------------------------
# Relational operator coverage over the TPC-H-ish tables
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_base_cents,
           count(DISTINCT l_orderkey) AS n_orders,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1997-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    "A2/A3/P1 — grouped aggregation with pushdown-friendly predicate",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1997-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("long").alias("sum_qty"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "sum_base_cents"
            ),
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "top_parts_by_orders",
    """
    SELECT l_partkey, count(DISTINCT l_orderkey) AS n_orders
    FROM lineitem GROUP BY l_partkey
    ORDER BY n_orders DESC, l_partkey LIMIT 10
    """,
    "W1 — ORDER BY count DESC LIMIT k (TakeOrderedAndProject)",
)
def top_parts_by_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(F.countDistinct("l_orderkey").alias("n_orders"))
        .orderBy(F.desc("n_orders"), F.asc("l_partkey"))
        .limit(10)
    )


@register(
    "suppliers_without_lineitems",
    """
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey)
    """,
    "SO1/J9 — anti-join set difference (missing-entity derivation)",
)
def suppliers_without_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    return s.join(
        li.select(F.col("l_suppkey").alias("s_suppkey")), "s_suppkey", "left_anti"
    ).select("s_suppkey", "s_name")


@register(
    "latest_event_per_user",
    """
    SELECT user_id, event_id, event_type
    FROM (
      SELECT user_id, event_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    "W2 — window dedup with priority (last-writer-wins)",
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


@register(
    "order_status_conditional_counts",
    """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_filled,
           CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_open,
           CAST(sum(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_big
    FROM orders GROUP BY o_orderpriority
    """,
    "A3 — conditional tallies (CASE WHEN ... THEN 1)",
)
def order_status_conditional_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias(
            "n_filled"
        ),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("n_open"),
        F.sum(F.when(F.col("o_totalprice") > 200000, 1).otherwise(0)).alias("n_big"),
    )


@register(
    "multi_status_customers",
    """
    SELECT o_custkey AS custkey, count(DISTINCT o_orderstatus) AS n_status
    FROM orders GROUP BY o_custkey
    HAVING count(DISTINCT o_orderstatus) > 1
    """,
    "A4 — collect distinct per key + size filter (multi-namespace genes)",
)
def multi_status_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.countDistinct("o_orderstatus").alias("n_status"))
        .filter(F.col("n_status") > 1)
    )


@register(
    "customer_order_degree",
    """
    SELECT c.c_custkey, c.c_mktsegment,
           count(DISTINCT o.o_orderkey) AS n_orders,
           count(DISTINCT l.l_partkey) AS n_parts
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_custkey, c.c_mktsegment
    """,
    "J12/A8 — edge-endpoint degree join (avg-degree stats input)",
)
def customer_order_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.countDistinct("l_partkey").alias("n_parts"),
        )
    )
