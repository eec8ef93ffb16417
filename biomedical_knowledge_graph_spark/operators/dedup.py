"""Document deduplication for large-scale training-data pipelines.

The reference deduplicates *edges* by anti-join on a compound key
(kg_scripts/go_kg_builder.py:1317-1343) and *nodes* by consolidation
(go_kg_builder.py:1381-1440). A 10¹²-document corpus additionally needs
document-level dedup; this module provides the standard ladder:

- exact: hash-groupBy on content digest (one shuffle on the digest);
- n-gram Jaccard: exact set similarity via inverted shingle index
  (correct but O(sum of postings²) — small/verification scale);
- MinHash + LSH: banded signatures → candidate buckets → exact verify
  (the 100 TB path: shuffle is O(docs × bands), pairs only within buckets);
- SimHash: 64-bit fingerprints, hamming-band join for near-dup candidates;
- embedding cosine near-dup: see similarity.py.

All hash choices are md5-based where oracle parity matters (DuckDB and
Spark produce identical md5 hex) and xxhash64 where only determinism
matters (JVM-side, no Python).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_duplicate_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Groups of byte-identical documents: (content_hash, keep_id, n_docs,
    doc_ids). ``keep_id`` = min id (deterministic survivor choice, mirroring
    the reference's survivor rule in gene consolidation)."""
    return (
        df.select(id_col, F.md5(F.col(text_col).cast("binary")).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_docs"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
    )


# ---------------------------------------------------------------------------
# character shingles + exact Jaccard (verification-grade)
# ---------------------------------------------------------------------------


def shingle_sets(
    df: DataFrame, id_col: str, text_col: str, n: int = 5
) -> DataFrame:
    """(id, shingle) distinct char-n-gram rows, built with JVM-side array
    functions (sequence → transform → explode), no Python.

    Texts shorter than ``n`` emit NO shingles (sequence(1, 0) in Spark is the
    descending range [1, 0], which would otherwise yield a phantom shingle at
    position 0; an explicit case-when guards it so the DuckDB oracle's
    exclusive range(...) semantics match)."""
    return df.select(
        id_col,
        F.explode(
            F.array_distinct(
                F.expr(
                    f"case when length({text_col}) >= {n} then "
                    f"transform(sequence(1, length({text_col}) - {n - 1}),"
                    f" i -> substring({text_col}, i, {n})) else array() end"
                )
            )
        ).alias("shingle"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact all-pairs Jaccard ≥ threshold over char-n-gram sets:
    (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded to 6 dp.

    Inverted-index join: |pairs| is bounded by co-occurring shingles, not
    |docs|². At corpus scale, gate with MinHash-LSH first
    (minhash_lsh_candidates) and use this only to verify candidates."""
    sh = shingle_sets(df, id_col, text_col, n)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    sz_a = sizes.select(
        F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a")
    )
    sz_b = sizes.select(
        F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b")
    )
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            ),
        )
        .filter(
            F.col("inter")
            >= F.ceil(F.lit(threshold) * (F.col("sz_a") + F.col("sz_b")) / (1 + threshold))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH (the scale path)
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _hash_params(num_hashes: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_hashes, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=num_hashes, dtype=np.int64)
    return a, b


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    num_hashes: int = 128,
    seed: int = 7,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(id, signature array<long>) — shingle → xxhash64 → k universal-hash
    minima, computed vectorized in numpy over Arrow batches.

    ``shingles``: optionally reuse a precomputed (id, shingle) frame (the
    LSH+verify pipeline shares one scan between signatures and exact
    verification)."""
    sh = (
        shingles
        if shingles is not None
        else shingle_sets(df, id_col, text_col, n)
    ).withColumn("h", F.xxhash64("shingle"))
    grouped = sh.groupBy(id_col).agg(F.collect_list("h").alias("hashes"))
    a_params, b_params = _hash_params(num_hashes, seed)
    id_type = df.schema[id_col].dataType.simpleString()

    def sign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        a = a_params.astype(np.uint64)
        b = b_params.astype(np.uint64)
        for pdf in batches:
            ids, sigs = [], []
            for doc_id, hashes in zip(pdf[id_col].values, pdf["hashes"].values):
                x = np.asarray(hashes, dtype=np.uint64)[:, None]  # (s, 1)
                vals = (x * a + b) % np.uint64(_MERSENNE)  # (s, k)
                sigs.append(vals.min(axis=0).astype(np.int64))
                ids.append(doc_id)
            yield pd.DataFrame({id_col: ids, "signature": sigs})

    return grouped.mapInPandas(
        sign, schema=f"{id_col} {id_type}, signature array<bigint>"
    )


_M31 = (1 << 31) - 1  # Mersenne prime 2^31-1: (a*h31+b) fits a long


def minhash_signatures_jvm(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    num_hashes: int = 128,
    seed: int = 7,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(id, signature array<long>) computed entirely JVM-side: shingle →
    xxhash64 masked to 31 bits → ``num_hashes`` universal-hash minima as
    plain MIN aggregates.

    Scale shape vs the Arrow variant (minhash_signatures): no
    ``collect_list`` — the shuffle carries ONE partial row of
    ``num_hashes`` longs per (doc, map-partition) thanks to map-side
    combine, instead of every shingle hash of every document; no Python
    worker round-trip. The hash family differs (31-bit universe vs 61-bit)
    but LSH band semantics and the exact verify are unchanged, so output
    pairs are identical in distribution and exactly verified either way.
    """
    sh = (
        shingles
        if shingles is not None
        else shingle_sets(df, id_col, text_col, n)
    ).withColumn("h", F.xxhash64("shingle").bitwiseAND(F.lit(_M31)))
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _M31, size=num_hashes).astype(np.int64)
    b = rng.randint(0, _M31, size=num_hashes).astype(np.int64)
    aggs = [
        F.min((F.col("h") * int(a[i]) + int(b[i])) % _M31).alias(f"_m{i}")
        for i in range(num_hashes)
    ]
    grouped = sh.groupBy(id_col).agg(*aggs)
    return grouped.select(
        id_col,
        F.array(*[F.col(f"_m{i}") for i in range(num_hashes)]).alias(
            "signature"
        ),
    )


def minhash_lsh_candidates(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 32,
    rows_per_band: int = 4,
) -> DataFrame:
    """Banded LSH: (id_a, id_b) candidate pairs, id_a < id_b. One shuffle on
    (band, band-slice hash); pairs emerge only inside buckets."""
    sliced = signatures.select(
        id_col,
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), b -> struct(b as band, "
                f"xxhash64(to_json(struct(slice(signature, b * {rows_per_band}"
                f" + 1, {rows_per_band})))) as bucket))"
            )
        ).alias("bb"),
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = sliced.alias("a")
    b = sliced.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.8,
    num_hashes: int = 125,
    bands: int = 25,
    rows_per_band: int = 5,
    seed: int = 7,
) -> DataFrame:
    """LSH candidates → exact-Jaccard verification ≥ threshold.

    Band geometry trades candidate volume against recall: 25 bands × 5 rows
    misses a J=0.8 pair with p = (1-0.8⁵)²⁵ ≈ 5e-5 while admitting a
    background J=0.3 pair with p ≈ 0.06 (4 rows would admit 26% of the
    background — ruinous on corpora where random pairs are moderately
    similar). An exact-preserving size-ratio prefilter
    (J ≥ t ⇒ min(sz)/max(sz) ≥ t) prunes candidates before the
    array-intersect verification."""
    # one shingle scan feeds both the signatures and the exact verify
    sh = shingle_sets(df, id_col, text_col, n).persist()
    try:
        return _minhash_dedup_pairs_impl(
            sh, id_col, threshold, num_hashes, bands, rows_per_band, seed, df,
            text_col, n,
        )
    finally:
        # the impl eagerly materializes (localCheckpoint) before returning,
        # so the cached shingle scan is released here instead of leaking
        # across repeated calls in one session (bench reps, oracle harness)
        sh.unpersist()


def _minhash_dedup_pairs_impl(
    sh: DataFrame,
    id_col: str,
    threshold: float,
    num_hashes: int,
    bands: int,
    rows_per_band: int,
    seed: int,
    df: DataFrame,
    text_col: str,
    n: int,
) -> DataFrame:
    cands = minhash_lsh_candidates(
        minhash_signatures(
            df, id_col, text_col, n, num_hashes, seed, shingles=sh
        ),
        id_col,
        bands,
        rows_per_band,
    )
    # size-ratio prefilter first (tiny sizes table; J ≥ t forces
    # min(sz)/max(sz) ≥ t) before any per-shingle work
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    survivors = (
        cands.join(
            sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a")),
            "id_a",
        )
        .join(
            sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b")),
            "id_b",
        )
        .filter(
            F.least(F.col("sz_a"), F.col("sz_b"))
            / F.greatest(F.col("sz_a"), F.col("sz_b"))
            >= threshold
        )
    )
    # postings-restricted exact verify: replicate each survivor pair across
    # side-a's postings, keep the shingles side b also has, count. Row size
    # stays one-shingle-per-row no matter how large a document is (a
    # collect_set + array_intersect verify would build multi-MB array rows
    # for giant docs); volume is Σ over survivor pairs of sz_a — bounded by
    # the LSH + size-ratio gates, not by the corpus.
    pair_postings = survivors.join(
        sh.select(F.col(id_col).alias("id_a"), "shingle"), "id_a"
    )
    shared = pair_postings.join(
        sh.select(F.col(id_col).alias("id_b"), "shingle"), ["id_b", "shingle"]
    )
    result = (
        shared.groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.count("*").alias("_inter"))
        .withColumn(
            "jaccard",
            F.round(
                F.col("_inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("_inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    # eager: materialize the (small) verified-pairs result and truncate
    # lineage so the caller can unpersist the shared shingle scan
    return result.localCheckpoint(eager=True)


# ---------------------------------------------------------------------------
# SimHash (md5-based for oracle parity)
# ---------------------------------------------------------------------------


def simhash_bits(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64
) -> DataFrame:
    """(id, b0..b{bits-1}) simhash bits over whitespace tokens: bit j is 1
    iff sum over tokens of (2·bit_j(md5(token)) - 1) > 0. Pure built-ins
    (explode + 64 conditional sums in one hash aggregate).

    The md5 is hoisted into one projection and decoded as TWO 32-bit halves
    (8 hex chars each) rather than 16 single hex digits — each token pays
    one md5 + two convs, and every bit is a shift+mask on a long; Catalyst
    does not CSE across aggregate expressions, so the hoist matters."""
    toks = df.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).filter(F.length("tok") > 0)
    halves = F.expr(
        "transform(sequence(0, 1), h -> "
        "cast(conv(substring(md5(cast(tok as binary)), h * 8 + 1, 8), 16, 10)"
        " as bigint))"
    )
    with_digits = toks.select(id_col, halves.alias("_halves"))

    def bit(j: int):
        half = F.col("_halves").getItem(j // 32)
        return F.shiftright(half, 31 - (j % 32)).bitwiseAND(F.lit(1)).cast("int")

    aggs = [
        (F.sum(bit(j) * 2 - 1) > 0).cast("int").alias(f"b{j}")
        for j in range(bits)
    ]
    return with_digits.groupBy(id_col).agg(*aggs)


def simhash64(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash bigint) — bits packed into one signed 64-bit value."""
    bits = simhash_bits(df, id_col, text_col, 64)
    packed = None
    for j in range(64):
        term = F.shiftleft(F.col(f"b{j}").cast("long"), 63 - j)
        packed = term if packed is None else packed + term
    # bit 0 at the sign position makes this wrap negative — intended (64-bit)
    return bits.select(id_col, packed.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 6,
    bands: int | None = None,
) -> DataFrame:
    """(id_a, id_b, hamming ≤ max_hamming). Candidate generation by banding
    the 64-bit fingerprint into ``bands`` slices; by pigeonhole any pair
    with hamming < bands agrees on ≥1 slice, so bands defaults to
    max_hamming + 1 (rounded up to a divisor of 64) for exact recall.
    Exact hamming then via bit_count(xor) on the candidates."""
    if bands is None:
        bands = next(b for b in (1, 2, 4, 8, 16, 32) if b > max_hamming)
    if 64 % bands or bands <= max_hamming:
        raise ValueError("bands must divide 64 and exceed max_hamming")
    sig = simhash64(df, id_col, text_col)
    width = 64 // bands
    sliced = sig.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(
                            F.col("simhash"), i * width
                        ).bitwiseAND(F.lit((1 << width) - 1)).alias("slice"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bs"),
    ).select(id_col, "simhash", "bs.band", "bs.slice")
    a, b = sliced.alias("a"), sliced.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.slice") == F.col("b.slice"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    return (
        cands.withColumn(
            "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
