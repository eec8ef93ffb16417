"""Text analysis for training-data pipelines: language-ID, quality scoring,
token counting, document fingerprinting. All pure built-in column functions
(whole-stage codegen; no Python in the hot path) so they run at scan speed
over a 100 TB corpus.

Reference analogues: token classification when-chains
(kg_scripts/omics_drug_integration.py:49-76), contains-chain standardization
(omics_viral_integration.py:73-138), regex normalization
(talisman_geneset_parser.py:266-288).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language marker lists (n-gram/stopword heuristic); deterministic
# and mirrored verbatim in the DuckDB oracle
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "y", "es"),
}


def tokens(text_col: str = "text") -> Column:
    """Whitespace tokens, empties dropped (JVM-side)."""
    return F.filter(F.split(F.col(text_col), " "), lambda t: F.length(t) > 0)


def token_count(text_col: str = "text") -> Column:
    return F.size(tokens(text_col)).cast("long")


def bpe_ish_token_count(text_col: str = "text") -> Column:
    """Sub-word-ish token count: word pieces of ≤4 chars (a BPE-style
    upper-bound estimator: ceil(len(word)/4) summed), pure arithmetic."""
    return F.aggregate(
        tokens(text_col),
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(t) / 4.0).cast("long"),
    )


def marker_hits(lang: str, text_col: str = "text") -> Column:
    """How many tokens are markers of ``lang``."""
    markers = LANG_MARKERS[lang]
    return F.size(
        F.filter(tokens(text_col), lambda t: t.isin(*markers))
    ).cast("long")


def predict_lang(text_col: str = "text") -> Column:
    """argmax over marker-hit counts, ties broken by language code order,
    'und' (undetermined) when no marker hits at all."""
    scored = None
    for lang in sorted(LANG_MARKERS):
        hits = marker_hits(lang, text_col)
        pair = F.struct(hits.alias("hits"), F.lit(lang).alias("lang"))
        scored = pair if scored is None else F.when(
            pair["hits"] > scored["hits"], pair
        ).otherwise(scored)
    return F.when(scored["hits"] > 0, scored["lang"]).otherwise(F.lit("und"))


def quality_score_col(text_col: str = "text") -> Column:
    """The composite quality score in [0, 1] (rounded 6 dp) as a reusable
    column expression — shared by quality_features and corpus_report so
    the formula exists once."""
    toks = tokens(text_col)
    n_tokens = F.size(toks).cast("long")
    distinct_ratio = F.round(
        F.size(F.array_distinct(toks)) / F.greatest(n_tokens, F.lit(1)), 6
    )
    stop_ratio = F.round(
        marker_hits("en", text_col) / F.greatest(n_tokens, F.lit(1)), 6
    )
    return F.round(
        F.least(n_tokens / F.lit(64.0), F.lit(1.0)) * 0.4
        + distinct_ratio * 0.4
        + F.least(stop_ratio * 5, F.lit(1.0)) * 0.2,
        6,
    )


def quality_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc quality indicators: n_chars, n_tokens, distinct-token ratio,
    mean token length, stopword ratio; composite score in [0,1] rounded to
    6 dp (single projection, one pass)."""
    toks = tokens(text_col)
    n_tokens = F.size(toks).cast("long")
    distinct_ratio = F.round(
        F.size(F.array_distinct(toks)) / F.greatest(n_tokens, F.lit(1)), 6
    )
    mean_tok_len = F.round(
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        )
        / F.greatest(n_tokens, F.lit(1)),
        6,
    )
    stop_ratio = F.round(
        marker_hits("en", text_col) / F.greatest(n_tokens, F.lit(1)), 6
    )
    score = quality_score_col(text_col)
    return df.select(
        id_col,
        F.length(text_col).cast("long").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        distinct_ratio.alias("distinct_ratio"),
        mean_tok_len.alias("mean_tok_len"),
        stop_ratio.alias("stop_ratio"),
        score.alias("quality_score"),
    )


# engine-portable PII patterns (verified: Java regex and DuckDB's RE2
# agree on every one, counts AND replacements; keep to this conservative
# class — no backrefs, no lookaround, which RE2 lacks)
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\d{3}-\d{3}-\d{4}", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def pii_scrub(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc PII detection + masking (the redaction pass every public
    webtext pipeline runs before training): counts per pattern class and
    the scrubbed text, patterns applied in PII_PATTERNS order (email
    before phone before ipv4 — order matters once a replacement rewrites
    the string, so it is part of the contract). Each count is computed
    on the PROGRESSIVELY scrubbed string, so ``n_<class>`` equals the
    number of ``<CLASS>`` tokens actually masked into ``scrubbed_text``
    (ADVICE r5: counting every class on the raw text would tally e.g. a
    phone-shaped substring inside an email local part that the email
    mask already consumed). One projection, pure JVM regex — scan
    speed, no shuffle."""
    counts = []
    scrubbed: Column = F.col(text_col)
    for name, pat, token in PII_PATTERNS:
        counts.append(
            F.regexp_count(scrubbed, F.lit(pat)).cast("long").alias(
                f"n_{name}"
            )
        )
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    return df.select(
        id_col,
        *counts,
        scrubbed.alias("scrubbed_text"),
    ).withColumn(
        "has_pii",
        sum((F.col(f"n_{name}") for name, _, _ in PII_PATTERNS), F.lit(0))
        > 0,
    )


def repetition_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dup_word_frac: float = 0.5,
    max_top_bigram_frac: float = 0.05,
) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021
    §A1.1 use duplicate-line and top-n-gram fractions to drop
    boilerplate/spam pages; this corpus has no line structure, so the
    word-level analogues): per doc

    - ``dup_word_frac``  = 1 − distinct_words / n_tokens
    - ``top_word_frac``  = count of the most frequent word / n_tokens
    - ``top_bigram_frac`` = count of the most frequent word bigram /
      n_bigrams
    - ``keep`` — passes both ``max_dup_word_frac`` and
      ``max_top_bigram_frac`` (evaluated on the 6-dp-rounded fractions so
      any engine computing the same ratios draws the same boundary).

    Compose with a minimum-length gate (quality_features' n_tokens), as
    Gopher does: a 2-token doc's single bigram is trivially its top
    bigram (frac 1.0), so the bigram rule is only meaningful past a
    length floor.

    Shape for 100 TB: one projection builds word + bigram grams JVM-side,
    one explode, then two hash aggregates — (doc, kind, gram) counts with
    map-side combine, then per-doc max/sum. No Python, no window, no
    driver state; the widest shuffle key is (doc, gram), which is as
    skew-free as the corpus itself."""
    toks = tokens(text_col)
    base = df.select(F.col(id_col), toks.alias("_w"))
    # words tagged 'w', bigrams tagged 'b'; the CASE guard avoids Spark's
    # descending sequence(1, 0) quirk on single-token docs (same as
    # dedup.shingle_sets), and zero-token docs re-enter via the left join
    # explode_OUTER + null-drop, not explode: InferFiltersFromGenerate
    # would otherwise pre-filter on `size(child) > 0` where child is this
    # whole gram-construction expression, re-evaluating it per doc (see
    # sampling.split_contamination for the measured cost of that rule)
    grams = (
        base.select(
            id_col,
            F.explode_outer(
                F.concat(
                    F.expr(
                        "transform(_w, t -> struct('w' as kind, t as gram))"
                    ),
                    F.expr(
                        "case when size(_w) >= 2 then "
                        "transform(sequence(1, size(_w) - 1), i -> "
                        "struct('b' as kind, concat(element_at(_w, i), ' ', "
                        "element_at(_w, i + 1)) as gram)) "
                        "else array() end"
                    ),
                )
            ).alias("g"),
        )
        .filter(F.col("g").isNotNull())
        .select(
            id_col, F.col("g.kind").alias("kind"), F.col("g.gram").alias("gram")
        )
    )
    counts = grams.groupBy(id_col, "kind", "gram").agg(
        F.count("*").alias("cnt")
    )
    w_cnt = F.when(F.col("kind") == "w", F.col("cnt"))
    b_cnt = F.when(F.col("kind") == "b", F.col("cnt"))
    stats = counts.groupBy(id_col).agg(
        F.coalesce(F.sum(w_cnt), F.lit(0)).cast("long").alias("n_tokens"),
        F.count(w_cnt).cast("long").alias("_n_distinct"),
        F.coalesce(F.max(w_cnt), F.lit(0)).cast("long").alias("_top_w"),
        F.coalesce(F.sum(b_cnt), F.lit(0)).cast("long").alias("_n_bi"),
        F.coalesce(F.max(b_cnt), F.lit(0)).cast("long").alias("_top_b"),
    )
    denom_w = F.greatest(F.col("n_tokens"), F.lit(1))
    denom_b = F.greatest(F.col("_n_bi"), F.lit(1))
    dup = F.round((F.col("n_tokens") - F.col("_n_distinct")) / denom_w, 6)
    top_w = F.round(F.col("_top_w") / denom_w, 6)
    top_b = F.round(F.col("_top_b") / denom_b, 6)
    featured = stats.select(
        id_col,
        "n_tokens",
        dup.alias("dup_word_frac"),
        top_w.alias("top_word_frac"),
        top_b.alias("top_bigram_frac"),
    ).withColumn(
        "keep",
        (F.col("dup_word_frac") <= max_dup_word_frac)
        & (F.col("top_bigram_frac") <= max_top_bigram_frac),
    )
    # zero-token docs never reach the gram explode; restore them with
    # all-zero features (kept: nothing repeats in an empty doc)
    return (
        base.select(id_col)
        .join(featured, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
            F.coalesce("dup_word_frac", F.lit(0.0)).alias("dup_word_frac"),
            F.coalesce("top_word_frac", F.lit(0.0)).alias("top_word_frac"),
            F.coalesce("top_bigram_frac", F.lit(0.0)).alias(
                "top_bigram_frac"
            ),
            F.coalesce("keep", F.lit(True)).alias("keep"),
        )
    )


def fingerprint(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram: int = 8,
    keep: int = 4,
) -> DataFrame:
    """Winnowing-style document fingerprint: the ``keep`` smallest md5
    digests over char-``gram``-grams (rolling-hash analogue; md5 keeps the
    DuckDB oracle bit-identical). Output: (id, fingerprint array<string>)."""
    # case-when guard: texts shorter than ``gram`` emit no grams (Spark's
    # sequence(1, 0) is the descending [1, 0], which would emit a phantom
    # gram at position 0 — same quirk as dedup.shingle_sets)
    grams = F.expr(
        f"case when length({text_col}) >= {gram} then "
        f"transform(sequence(1, length({text_col}) - {gram - 1}),"
        f" i -> md5(cast(substring({text_col}, i, {gram}) as binary)))"
        f" else array() end"
    )
    return df.select(
        id_col,
        F.slice(F.array_sort(F.array_distinct(grams)), 1, keep).alias(
            "fingerprint"
        ),
    )


# --- hashed linear quality classifier --------------------------------------

QC_SALT = "qc-v1"
QC_HEX_CHARS = 6  # 24-bit feature space
QC_WEIGHT_SPAN = 1 << 19  # weights in [-2^19, 2^19)
_QC_MULT = 2654435761  # Knuth multiplicative constant


def _hex_to_int_sql(hex_expr: str) -> str:
    """Engine-portable hex→int for the first QC_HEX_CHARS chars: both
    Spark SQL and DuckDB expose md5/substring/instr with identical
    semantics, so the SAME generated arithmetic runs on both (no conv()
    — DuckDB lacks it)."""
    terms = []
    for i in range(QC_HEX_CHARS):
        digit = (
            f"(instr('0123456789abcdef', "
            f"substring({hex_expr}, {i + 1}, 1)) - 1)"
        )
        terms.append(f"{digit} * {16 ** (QC_HEX_CHARS - 1 - i)}")
    return "(" + " + ".join(terms) + ")"


def qc_token_weight_sql(token_expr: str) -> str:
    """Integer weight of one token, as an engine-portable SQL fragment:
    feature id = first 24 md5 bits of (salt ':' token); weight = Knuth
    multiplicative scramble of the feature id mapped into
    [-QC_WEIGHT_SPAN, QC_WEIGHT_SPAN). Pure BIGINT arithmetic — any
    engine computes the identical weight, which is what makes the
    classifier's output value-checkable cross-engine."""
    feat = _hex_to_int_sql(
        f"md5(concat('{QC_SALT}:', {token_expr}))"
    )
    # plain %, not pmod (DuckDB has no pmod): the product is always
    # non-negative (24-bit feature × positive constant < 2^63), so both
    # engines' % agree
    return (
        f"((CAST({feat} AS BIGINT) * {_QC_MULT}) % "
        f"{2 * QC_WEIGHT_SPAN} - {QC_WEIGHT_SPAN})"
    )


def qc_logit_col(text_col: str = "text") -> Column:
    """The classifier's integer logit as a reusable column expression."""
    w = qc_token_weight_sql("t")
    ts = (
        f"filter(split(lower(coalesce({text_col}, '')), ' '), "
        f"t -> length(t) > 0)"
    )
    return F.expr(
        f"aggregate({ts}, CAST(0 AS BIGINT), (acc, t) -> acc + {w})"
    )


def hashed_linear_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Model-based quality filtering — the fastText-style linear
    classifier pass (CCNet / GPT-3 / LLaMA pipelines) that scores every
    document and gates training admission, expressed as ONE zero-shuffle
    JVM projection: score(doc) = Σ_tokens W[h(token)] / (n · span).

    The hashed-feature trick is the real production shape (a linear
    model over 2^24 hashed unigrams needs no vocabulary broadcast, just
    a weight array); the weight VALUES here are a deterministic
    multiplicative scramble of the feature id standing in for trained
    weights — swap ``qc_token_weight_sql`` for a lookup into a
    broadcast weight array to deploy a real model, the plan shape (one
    transform + aggregate over the token array, scan speed) is
    unchanged. All arithmetic is BIGINT until the final 6-dp division,
    so Spark and the DuckDB oracle agree bit-for-bit.

    Output: (id, n_tokens, logit_num, score ∈ [-1, 1], keep)."""
    logit = qc_logit_col(text_col)
    n = F.expr(
        f"size(filter(split(lower(coalesce({text_col}, '')), ' '), "
        f"t -> length(t) > 0))"
    )
    return df.select(
        id_col,
        n.cast("long").alias("n_tokens"),
        logit.alias("logit_num"),
        F.round(
            logit / (F.greatest(n, F.lit(1)) * F.lit(float(QC_WEIGHT_SPAN))),
            6,
        ).alias("score"),
        (logit >= 0).alias("keep"),
    )


def corpus_report(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-language corpus report card — the operational artifact a data
    team reviews before a training run, gluing the quality family into
    ONE fused projection + ONE aggregate:

    (lang, n_docs, n_dup_docs, n_pii_docs, n_keep, total_tokens,
    avg_quality) where lang is the predicted language, n_dup_docs counts
    documents beyond the first of each exact-content group (md5),
    n_pii_docs counts documents with any raw-text PII pattern hit
    (equivalent to pii_scrub's has_pii: a raw hit either survives to be
    masked or was consumed by an earlier class's mask — either way some
    class masked), n_keep is the hashed-linear-classifier gate, and
    avg_quality averages the composite heuristic score.

    Every per-doc signal is computed in the SAME scan projection (no
    joins between the family's frames), so the whole report is scan +
    one map-side-combinable groupBy(lang) — the report over 100 TB costs
    one pass."""
    any_pii = F.lit(False)
    for _, pat, _ in PII_PATTERNS:
        any_pii = any_pii | (F.regexp_count(F.col(text_col), F.lit(pat)) > 0)
    per_doc = df.select(
        predict_lang(text_col).alias("lang"),
        token_count(text_col).alias("_nt"),
        quality_score_col(text_col).alias("_q"),
        (qc_logit_col(text_col) >= 0).alias("_keep"),
        any_pii.alias("_pii"),
        # coalesce: NULL text hashes to NULL, which countDistinct skips —
        # every NULL-text doc (including the first) would count as a dup;
        # folding NULL into the empty-text group keeps 'docs beyond the
        # first of each group' semantics (ADVICE r6 item 5)
        F.md5(F.coalesce(F.col(text_col), F.lit("")).cast("binary")).alias(
            "_h"
        ),
    )
    return per_doc.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        (F.count("*") - F.countDistinct("_h")).cast("long").alias(
            "n_dup_docs"
        ),
        F.sum(F.col("_pii").cast("long")).alias("n_pii_docs"),
        F.sum(F.col("_keep").cast("long")).alias("n_keep"),
        F.sum("_nt").cast("long").alias("total_tokens"),
        F.round(F.avg("_q"), 6).alias("avg_quality"),
    )


def normalize_text(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Unicode text normalization — the first preprocessing pass of
    every multilingual webtext pipeline: NFC composition (so 'e'+U+0301
    and the precomposed 'é' stop being distinct dedup/link keys),
    control-character strip (C0 minus tab/newline, plus DEL) and
    space-run collapse, in that order. Output: (id, text_norm,
    n_chars_before, n_chars_after, changed).

    NFC needs a real Unicode database, which Spark SQL does not expose —
    this is the documented Arrow escape hatch: one mapInPandas pass
    (Python's unicodedata), all three steps fused so the corpus crosses
    Python once. The DuckDB oracle runs utf8proc's nfc_normalize + the
    identical regex chain — two INDEPENDENT Unicode implementations
    agreeing on the value check."""
    import re as _re
    import unicodedata as _ud
    from collections.abc import Iterator  # noqa: F401

    import pandas as pd

    ctrl = _re.compile("[\x00-\x08\x0b-\x1f\x7f]")
    spaces = _re.compile(" +")
    id_type = df.schema[id_col].dataType.simpleString()
    schema = (
        f"{id_col} {id_type}, text_norm string, n_chars_before long, "
        "n_chars_after long, changed boolean"
    )

    def norm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, t in zip(pdf[id_col].values, pdf[text_col]):
                raw = t if t is not None else ""
                out = spaces.sub(
                    " ", ctrl.sub("", _ud.normalize("NFC", raw))
                )
                rows.append(
                    (doc_id, out, len(raw), len(out), out != raw)
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "text_norm", "n_chars_before",
                         "n_chars_after", "changed"],
            )

    return df.select(id_col, text_col).mapInPandas(norm, schema=schema)
