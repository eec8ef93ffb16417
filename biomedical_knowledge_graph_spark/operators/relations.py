"""Pattern-based TYPED relation extraction from free text.

The reference's typed relationships come from structured sources (OBO
``relationship:`` lines, curated TSVs — go_kg_builder.py:713-739); a
webtext KG additionally mines typed predicates from the text itself.
This is the surface-pattern (Hearst-style) tier of relation extraction:
a broadcast-safe lexicon of predicate trigger words, and one
``regexp_extract_all`` pass per group over the corpus — three extract
calls against the SAME compiled pattern, zipped positionally, so the
whole extractor is a single zero-shuffle JVM projection feeding one
aggregation. No Python anywhere.

Match semantics (identical in Spark's Java regex and DuckDB's RE2, which
is what makes the operator value-checkable cross-engine): lowercased
text, ``\\b``-bounded single-token arguments, LEFTMOST NON-OVERLAPPING
matches — "a VERB b VERB c" yields only (a, VERB, b) because the first
match consumes through ``b``. That bias is the standard
surface-pattern trade; mining both directions means running the pass on
a reversed lexicon, not backtracking the regex.

At 100 TB: the pattern is a driver-built literal (the alias lexicon is
dim-sized by construction — it is the entity dictionary), the extract
runs at scan speed inside codegen, and the only exchange is the final
(subj, pred, obj) aggregate with map-side partials.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def relation_pattern(
    aliases: list[str], verbs: list[str]
) -> str:
    """The shared regex: ``\\b(alias...) (verb...) (alias...)\\b``.
    Alternations are sorted longest-first then lexicographic so
    leftmost-FIRST engines (Java regex, RE2) agree on which alternative
    wins at a given position; every alias/verb is regex-escaped."""

    def alt(words: list[str]) -> str:
        ordered = sorted({w.lower() for w in words}, key=lambda w: (-len(w), w))
        return "|".join(re.escape(w) for w in ordered)

    return rf"\b({alt(aliases)}) ({alt(verbs)}) ({alt(aliases)})\b"


def pattern_typed_relations(
    docs: DataFrame,
    alias_dim: DataFrame,
    verb_map: dict[str, str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(subj, pred, obj, n_docs, n_mentions) typed edges mined from
    ``docs`` by the trigger-word pattern. ``alias_dim`` is the
    (alias, entity_id, ...) entity dictionary (dim-sized, broadcast);
    ``verb_map`` maps each trigger word to its predicate label.
    Self-relations (both arguments linking to the same entity) are
    dropped. ``n_docs`` counts distinct supporting documents — the same
    evidence semantics as the co-occurrence tier."""
    if not verb_map:
        raise ValueError("verb_map must be non-empty")
    aliases = [r["alias"] for r in alias_dim.select("alias").collect()]
    pat = relation_pattern(aliases, list(verb_map))
    low = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    # explode_outer + null-drop: plain explode's inferred size()>0
    # pre-filter would re-run all THREE regex passes two extra times
    # per row (InferFiltersFromGenerate, the repo-wide explode rule)
    triples = docs.select(
        id_col,
        F.explode_outer(
            F.arrays_zip(
                F.regexp_extract_all(low, F.lit(pat), F.lit(1)).alias("a1"),
                F.regexp_extract_all(low, F.lit(pat), F.lit(2)).alias("vb"),
                F.regexp_extract_all(low, F.lit(pat), F.lit(3)).alias("a2"),
            )
        ).alias("_m"),
    ).filter(F.col("_m").isNotNull()).select(
        id_col,
        F.col("_m.a1").alias("_a1"),
        F.col("_m.vb").alias("_vb"),
        F.col("_m.a2").alias("_a2"),
    )
    pred = F.when(F.lit(False), F.lit(""))
    for verb, label in sorted(verb_map.items()):
        pred = pred.when(F.col("_vb") == verb.lower(), F.lit(label))
    # lower() on the dictionary side: the pattern matches LOWERED text,
    # so extracted arguments are lowercase — a mixed-case dictionary
    # entry must still join (review r6: 'TP53' silently matched nothing)
    subj_dim = F.broadcast(
        alias_dim.select(
            F.lower("alias").alias("_a1"), F.col("entity_id").alias("subj")
        )
    )
    obj_dim = F.broadcast(
        alias_dim.select(
            F.lower("alias").alias("_a2"), F.col("entity_id").alias("obj")
        )
    )
    return (
        triples.join(subj_dim, "_a1")
        .join(obj_dim, "_a2")
        .withColumn("pred", pred)
        .filter(F.col("subj") != F.col("obj"))
        .groupBy("subj", "pred", "obj")
        .agg(
            F.countDistinct(id_col).cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_mentions"),
        )
    )
