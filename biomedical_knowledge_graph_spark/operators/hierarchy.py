"""Cluster-hierarchy metadata (SURVEY.md §2 A6): per-node gene/child/parent
counts with derived is_leaf / is_root flags.

Reference semantics: kg_scripts/omics_nest_integration.py:60-108 — for every
cluster in gene_edges.source ∪ cluster_edges.source ∪ cluster_edges.target:
hierarchy level + id parsed from the 'Cluster<level>-<id>' name (-1 when the
name doesn't parse), gene_count = gene edges FROM the cluster, child count =
hierarchy edges FROM it, parent count = hierarchy edges INTO it, is_leaf =
no children, is_root = no parents.

Spark shape: three partial-aggregated groupBy counts joined back onto the
distinct node set (outer joins, coalesce 0) — each count is one map-side
combinable shuffle on the cluster key; no per-row Python. At 100 TB the node
set and the three count tables are all ≤ |distinct clusters| rows, so the
joins AQE-broadcast in practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CLUSTER_RE = r"^Cluster(\d+)-(\d+)$"


def cluster_hierarchy_flags(
    gene_edges: DataFrame,
    cluster_edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(cluster_name, hierarchy_level, cluster_id, gene_count,
    child_cluster_count, parent_cluster_count, is_leaf, is_root).

    ``gene_edges``: (src=cluster, dst=gene) membership rows;
    ``cluster_edges``: (src=parent, dst=child) hierarchy rows.
    """
    clusters = (
        gene_edges.select(F.col(src).alias("cluster_name"))
        .unionByName(cluster_edges.select(F.col(src).alias("cluster_name")))
        .unionByName(cluster_edges.select(F.col(dst).alias("cluster_name")))
        .distinct()
    )
    gene_counts = gene_edges.groupBy(F.col(src).alias("cluster_name")).agg(
        F.count("*").alias("_gc")
    )
    child_counts = cluster_edges.groupBy(F.col(src).alias("cluster_name")).agg(
        F.count("*").alias("_cc")
    )
    parent_counts = cluster_edges.groupBy(F.col(dst).alias("cluster_name")).agg(
        F.count("*").alias("_pc")
    )
    # coalesce(try_cast(...), -1): a non-matching name extracts '' and an
    # absurdly long digit run overflows int — BOTH cast to null and fall
    # back to the reference's -1 sentinel (one extraction per field, no
    # duplicated pattern / separate guard)
    sql_re = _CLUSTER_RE.replace("\\", "\\\\")  # SQL string literal escaping

    def parsed(group: int):
        return F.coalesce(
            F.expr(
                f"try_cast(regexp_extract(cluster_name,"
                f" '{sql_re}', {group}) AS int)"
            ),
            F.lit(-1),
        )

    return (
        clusters.join(gene_counts, "cluster_name", "left")
        .join(child_counts, "cluster_name", "left")
        .join(parent_counts, "cluster_name", "left")
        .select(
            "cluster_name",
            parsed(1).alias("hierarchy_level"),
            parsed(2).alias("cluster_id"),
            F.coalesce(F.col("_gc"), F.lit(0)).alias("gene_count"),
            F.coalesce(F.col("_cc"), F.lit(0)).alias("child_cluster_count"),
            F.coalesce(F.col("_pc"), F.lit(0)).alias("parent_cluster_count"),
        )
        .withColumn("is_leaf", F.col("child_cluster_count") == 0)
        .withColumn("is_root", F.col("parent_cluster_count") == 0)
    )
