"""Deterministic sequence packing for LLM pre-training batches (round 5).

Packed pre-training concatenates documents into a token stream and chunks
it at a fixed ``capacity`` (the context length); every doc needs a stable
(sequence, offset) assignment so shards can be materialized independently
and reproducibly. This is the concat-then-chunk flavor (docs may straddle
a chunk boundary — flagged, exactly like GPT-style packing); the no-split
greedy flavor is a sequential fold (each decision depends on the previous
reset) and is deliberately not offered: it cannot be expressed as a
partition-parallel plan without changing its semantics.

Scale shape: documents are bucketed (default: xxhash64 of the id, mod
``n_buckets``), and each bucket packs independently — one shuffle on the
bucket key, one in-task sort per bucket (the same single-task-per-group
trade stratified_exact_sample documents). ``n_buckets`` scales with the
cluster; the assignment is a pure function of (bucket membership, id
order, token counts), so re-running on any partitioning gives identical
output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    capacity: int = 2048,
    bucket_col: str | Column | None = None,
    n_buckets: int = 64,
    token_count_col: str | None = None,
) -> DataFrame:
    """Assign each doc a (bucket, seq_in_bucket, offset_in_seq).

    Within a bucket, docs are laid out in ``id_col`` order into a
    contiguous token stream; chunking that stream at ``capacity`` gives
    ``seq_in_bucket = floor(start / capacity)`` and ``offset_in_seq =
    start % capacity`` where ``start`` is the running token count of all
    earlier docs in the bucket. ``straddles`` marks docs crossing a chunk
    boundary (longer-than-capacity docs straddle by definition).

    ``bucket_col``: an explicit bucket column/expression (engine-portable
    oracles pass e.g. ``id % B``); default is ``pmod(xxhash64(id),
    n_buckets)``. ``token_count_col``: use a precomputed length column
    instead of whitespace-counting ``text_col``.

    ``id_col`` must be unique (it is the total order within a bucket);
    duplicate ids would make the cumsum order — and thus the assignment —
    partition-dependent.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive: {capacity}")
    if bucket_col is None and n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive: {n_buckets}")
    if token_count_col is not None:
        # fail fast on null/negative counts: a null row would silently be
        # skipped by the window sum (shifting every later doc's offset)
        # and poison its own assignment with nulls
        raw = F.col(token_count_col)
        n_tokens = F.when(
            raw.isNull() | (raw < 0),
            F.raise_error(
                F.concat(
                    F.lit(
                        f"pack_sequences: {token_count_col} must be a "
                        "non-negative count, got "
                    ),
                    F.coalesce(raw.cast("string"), F.lit("NULL")),
                )
            ).cast("long"),
        ).otherwise(raw.cast("long"))
    else:
        from biomedical_knowledge_graph_spark.operators.textstats import (
            token_count,
        )

        n_tokens = token_count(text_col)
    if bucket_col is None:
        bucket = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets))
    elif isinstance(bucket_col, str):
        bucket = F.col(bucket_col)
    else:
        bucket = bucket_col
    base = df.select(
        F.col(id_col),
        bucket.cast("long").alias("bucket"),
        n_tokens.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    # integer `div`, not float `/`: exact for any 64-bit running total
    return base.withColumn("_start", start).select(
        id_col,
        "bucket",
        "n_tokens",
        F.expr(f"_start div {int(capacity)}L").alias("seq_in_bucket"),
        (F.col("_start") % capacity).cast("long").alias("offset_in_seq"),
        ((F.col("_start") % capacity) + F.col("n_tokens") > capacity).alias(
            "straddles"
        ),
    )


def chunk_windows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 64,
    stride: int = 32,
) -> DataFrame:
    """Overlapping context-window chunking — the other standard
    pre-training chunker (pack_sequences is concat-then-chunk across
    docs; this one slides a ``window``-token frame WITHIN each doc at
    ``stride``-token steps, the HF-style `return_overflowing_tokens`
    shape). Output: one row per chunk —
    (id, chunk_idx, n_tokens, chunk_text) — chunks start at token
    offsets 0, stride, 2·stride, … while the offset is inside the doc,
    so every token is covered and the final chunk may be short; empty
    docs emit no rows.

    Pure zero-shuffle projection (tokenize → per-row index sequence →
    slice/join per index → one explode): chunk count is
    ceil(n_tokens / stride) per doc, data volume grows by ~window/stride
    exactly as the training recipe demands, and no state crosses rows.
    The index sequence is guarded for empty docs — Spark's
    sequence(0, -1) is DESCENDING [0, -1], not empty."""
    if window <= 0 or stride <= 0 or stride > window:
        raise ValueError(
            f"need 0 < stride <= window: window={window} stride={stride}"
        )
    ts = (
        f"filter(split(coalesce({text_col}, ''), ' '), "
        f"t -> length(t) > 0)"
    )
    n = f"size({ts})"
    # ceil(n / stride) starts; CASE-guarded: sequence(0, -1) descends
    starts = (
        f"CASE WHEN {n} = 0 THEN array() ELSE "
        f"sequence(0, cast(({n} + {stride} - 1) div {stride} as int) - 1) "
        f"END"
    )
    chunk = F.expr(
        f"transform({starts}, i -> struct("
        f"cast(i as bigint) as chunk_idx, "
        f"cast(least({window}, {n} - i * {stride}) as bigint) as n_tokens, "
        f"array_join(slice({ts}, i * {stride} + 1, {window}), ' ') "
        f"as chunk_text))"
    )
    return (
        df.select(id_col, F.explode_outer(chunk).alias("_c"))
        .filter(F.col("_c").isNotNull())
        .select(
            id_col,
            F.col("_c.chunk_idx").alias("chunk_idx"),
            F.col("_c.n_tokens").alias("n_tokens"),
            F.col("_c.chunk_text").alias("chunk_text"),
        )
    )
