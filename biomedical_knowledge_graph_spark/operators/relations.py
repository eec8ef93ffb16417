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

Lexicon-size crossover (VERDICT r6 item 4): the regex path embeds the
WHOLE alias alternation as a plan literal — compiled per task thread,
shipped in every serialized plan, and linear-scanned per position by
the backtracking engine. That is the right shape for dictionary-sized
lexicons (≤ ~10⁴ aliases / ≤ ~256 KB of alternation); a million-alias
entity dictionary makes the single compiled pattern infeasible
(hundred-MB plan literals, minutes of Pattern.compile per executor)
while mentions.py's broadcast trie scanner handles exactly that scale.
``pattern_typed_relations(engine="auto")`` picks the trie route past
the crossover; both routes implement IDENTICAL match semantics
(leftmost non-overlapping, longest-first alternation, Java-``\\b``
anchors) and are pinned equal on shared lexicons by
tests/test_relations.py.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# past this many characters of alias alternation the compiled-regex plan
# literal stops being dim-shaped (see module docstring crossover note)
_REGEX_ALTERNATION_LIMIT = 256_000


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
    engine: str = "auto",
) -> DataFrame:
    """(subj, pred, obj, n_docs, n_mentions) typed edges mined from
    ``docs`` by the trigger-word pattern. ``alias_dim`` is the
    (alias, entity_id, ...) entity dictionary (dim-sized, broadcast);
    ``verb_map`` maps each trigger word to its predicate label.
    Self-relations (both arguments linking to the same entity) are
    dropped. ``n_docs`` counts distinct supporting documents — the same
    evidence semantics as the co-occurrence tier.

    ``engine``: "regex" (codegen'd three-group extract — dictionary-
    sized lexicons), "trie" (broadcast trie scan in an Arrow pass —
    large lexicons), or "auto" (regex until the alternation passes the
    documented crossover). Both engines implement identical match
    semantics; see the module docstring."""
    if not verb_map:
        raise ValueError("verb_map must be non-empty")
    if engine not in ("auto", "regex", "trie"):
        raise ValueError(f"unknown engine {engine!r}")
    aliases = [r["alias"] for r in alias_dim.select("alias").collect()]
    if engine == "auto":
        alt_chars = sum(len(a) + 1 for a in set(aliases))
        engine = "trie" if alt_chars > _REGEX_ALTERNATION_LIMIT else "regex"
    if engine == "trie":
        triples = _trie_triples(docs, aliases, verb_map, id_col, text_col)
    else:
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


def _is_word(ch: str) -> bool:
    return ch.isalnum() or ch == "_"


def _scan_triples(
    low: str,
    starts: dict[int, list[str]],
    verbs: list[str],
) -> list[tuple[str, str, str]]:
    """The large-lexicon matcher: EXACTLY Java regex semantics for
    ``\\b(alias...) (verb...) (alias...)\\b`` over ``low``, with alias
    occurrences precomputed by the trie scan (``starts``: position →
    aliases matching there, longest first — the order the alternation
    tries them). Leftmost scan; at each start the three groups backtrack
    in alternation order; the first full success wins and the scan
    resumes at its end (non-overlapping). ``\\b`` is the Java rule —
    word-ness differs across the boundary — applied to the matched
    text's first and last characters."""
    out: list[tuple[str, str, str]] = []
    n = len(low)
    p = 0
    while p < n:
        cands = starts.get(p)
        # \b before group 1: every alternative at p starts with low[p],
        # so the boundary test is alternative-independent
        if not cands or (p > 0 and _is_word(low[p - 1])) == _is_word(low[p]):
            p += 1
            continue
        hit_end = 0
        for a1 in cands:
            q = p + len(a1)
            if q >= n or low[q] != " ":
                continue
            for v in verbs:
                if not low.startswith(v, q + 1):
                    continue
                r = q + 1 + len(v)
                if r >= n or low[r] != " ":
                    continue
                for a2 in starts.get(r + 1, ()):
                    e = r + 1 + len(a2)
                    # \b after group 3
                    if _is_word(low[e - 1]) == (e < n and _is_word(low[e])):
                        continue
                    out.append((a1, v, a2))
                    hit_end = e
                    break
                if hit_end:
                    break
            if hit_end:
                break
        p = hit_end if hit_end else p + 1
    return out


def _trie_triples(
    docs: DataFrame,
    aliases: list[str],
    verb_map: dict[str, str],
    id_col: str,
    text_col: str,
) -> DataFrame:
    """(id, _a1, _vb, _a2) raw matches via the broadcast trie scanner —
    the large-lexicon route: the alias dictionary rides an executor
    broadcast (not a plan literal), occurrences come from mentions.py's
    C-speed RegexTrieScanner (word_boundary=False: interior group
    boundaries are the literal spaces, the outer ``\\b`` pair is applied
    by ``_scan_triples``), and the leftmost non-overlapping walk runs
    over precomputed per-position candidate lists. One Arrow pass, zero
    shuffle — the same plan shape as scan_mentions_linked."""
    from biomedical_knowledge_graph_spark.operators.mentions import (
        RegexTrieScanner,
    )

    spark = docs.sparkSession
    alias_list = sorted({a.lower() for a in aliases if a})
    verbs = sorted({v.lower() for v in verb_map}, key=lambda w: (-len(w), w))
    bc = spark.sparkContext.broadcast((alias_list, verbs))
    id_type = docs.schema[id_col].dataType.simpleString()

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        alias_l, verb_l = bc.value
        scanner = RegexTrieScanner(alias_l, word_boundary=False)
        for pdf in batches:
            ids, a1s, vbs, a2s = [], [], [], []
            for doc_id, text in zip(pdf[id_col].values, pdf[text_col].values):
                if not isinstance(text, str) or not text:
                    continue
                low = text.lower()
                starts: dict[int, list[str]] = {}
                for s, _e, pat in scanner.find_all(low):
                    starts.setdefault(s, []).append(pat)
                for lst in starts.values():
                    # alternation order: longest first (same-position
                    # aliases are text prefixes — lengths are unique)
                    lst.sort(key=len, reverse=True)
                for a1, v, a2 in _scan_triples(low, starts, verb_l):
                    ids.append(doc_id)
                    a1s.append(a1)
                    vbs.append(v)
                    a2s.append(a2)
            yield pd.DataFrame(
                {id_col: ids, "_a1": a1s, "_vb": vbs, "_a2": a2s}
            )

    return docs.select(id_col, text_col).mapInPandas(
        scan,
        schema=f"{id_col} {id_type}, _a1 string, _vb string, _a2 string",
    )
