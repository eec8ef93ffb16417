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
from dataclasses import dataclass

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
    num_hashes: int = 125,
    seed: int = 7,
    shingles: DataFrame | None = None,
    with_size: bool = False,
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
            ids, sigs, szs = [], [], []
            for doc_id, hashes in zip(pdf[id_col].values, pdf["hashes"].values):
                x = np.asarray(hashes, dtype=np.uint64)[:, None]  # (s, 1)
                vals = (x * a + b) % np.uint64(_MERSENNE)  # (s, k)
                sigs.append(vals.min(axis=0).astype(np.int64))
                ids.append(doc_id)
                szs.append(len(hashes))
            out = {id_col: ids, "signature": sigs}
            if with_size:
                # shingle rows are distinct per doc → the hash-list length
                # IS the shingle-set size
                out["sz"] = szs
            yield pd.DataFrame(out)

    schema = f"{id_col} {id_type}, signature array<bigint>"
    if with_size:
        schema += ", sz bigint"
    return grouped.mapInPandas(sign, schema=schema)


_M31 = (1 << 31) - 1  # Mersenne prime 2^31-1: (a*h31+b) fits a long


def minhash_signatures_jvm(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    num_hashes: int = 125,
    seed: int = 7,
    shingles: DataFrame | None = None,
    with_size: bool = False,
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
    if with_size:
        # shingle rows are already distinct per doc, so count(*) IS the
        # shingle-set size — the 126th aggregate of the SAME hash
        # aggregate, free vs the separate sh.groupBy(id).count() pass
        # the verifier used to run (twice: once per join side)
        aggs.append(F.count("*").alias("sz"))
    grouped = sh.groupBy(id_col).agg(*aggs)
    out_cols = [
        F.col(id_col),
        F.array(*[F.col(f"_m{i}") for i in range(num_hashes)]).alias(
            "signature"
        ),
    ]
    if with_size:
        out_cols.append(F.col("sz"))
    return grouped.select(*out_cols)


def minhash_signatures_oph(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    num_hashes: int = 125,
    seed: int = 7,
    shingles: DataFrame | None = None,
    with_size: bool = False,
) -> DataFrame:
    """(id, signature array<long>) via densified ONE-PERMUTATION hashing
    (Li/Owen/Zhang OPH + Shrivastava-Li rotation densification).

    Classic k-hash MinHash pays k universal-hash evaluations per shingle —
    either 125 aggregate expressions per row (the "jvm" impl: measured
    4.4 s at sf0.1) or a collect_list that ships EVERY shingle hash
    through the shuffle (the "arrow" impl). OPH hashes each shingle ONCE:
    the hash's high bits pick one of k bins, its low bits are the value,
    and the signature is the per-(doc, bin) MIN — one map-side-combinable
    aggregate whose shuffle carries at most k partial mins per (doc,
    map-partition), then one dim-sized compaction. Empty bins (docs with
    few shingles) are filled by cyclic rotation borrowing from the next
    filled bin, offsetting the borrowed value by the distance so borrowed
    slots don't manufacture band collisions; the tiny densification step
    runs in one Arrow batch over doc-sized rows (k-length arrays).

    Banding/verification are unchanged — candidates still exact-verified,
    so output pairs are exact regardless of the sketch's variance profile
    (slightly higher per-band variance than independent hashes, standard
    for OPH)."""
    k = num_hashes
    sh = (
        shingles
        if shingles is not None
        else shingle_sets(df, id_col, text_col, n)
    ).withColumn("_h", F.xxhash64("shingle", F.lit(seed)))
    binned = sh.select(
        id_col,
        F.pmod(F.shiftrightunsigned("_h", 32), F.lit(k)).alias("_bin"),
        F.col("_h").bitwiseAND(F.lit((1 << 32) - 1)).alias("_v"),
    )
    mins = binned.groupBy(id_col, "_bin").agg(
        F.min("_v").alias("_mv"), F.count("*").alias("_c")
    )
    compact = mins.groupBy(id_col).agg(
        F.collect_list(F.struct("_bin", "_mv")).alias("_bm"),
        # per-bin counts sum to the (distinct) shingle-set size
        F.sum("_c").alias("_sz"),
    )
    id_type = df.schema[id_col].dataType.simpleString()

    def densify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sigs = [], []
            for doc_id, bm in zip(pdf[id_col].values, pdf["_bm"].values):
                dense = np.full(k, -1, dtype=np.int64)
                for e in bm:
                    dense[e["_bin"]] = e["_mv"]
                empty = np.where(dense < 0)[0]
                if len(empty):
                    # rotation densification: borrow from the next filled
                    # bin (cyclic), offset by the travel distance so two
                    # docs sharing a source bin but differing in which
                    # bins are empty don't collide spuriously
                    filled = np.where(dense >= 0)[0]
                    for j in empty:
                        d = (filled - j) % k
                        src = filled[np.argmin(d)]
                        dense[j] = dense[src] + int((src - j) % k)
                ids.append(doc_id)
                sigs.append(dense)
            out = {id_col: ids, "signature": sigs}
            if with_size:
                out["sz"] = pdf["_sz"].values
            yield pd.DataFrame(out)

    schema = f"{id_col} {id_type}, signature array<bigint>"
    if with_size:
        schema += ", sz bigint"
    return compact.mapInPandas(densify, schema=schema)


def banded_memberships(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 25,
    rows_per_band: int = 5,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(id, band, bucket) LSH band memberships — the bucket is xxhash64
    over the band's signature slice (buckets are only compared for
    equality, so any deterministic content hash works). This is the row
    shape the incremental index stores: a corpus's band table keyed by
    (band, bucket) is the join target new documents probe.

    ``bands × rows_per_band`` must equal the signature length: ``slice``
    past the array end yields a SHORT slice, so a mismatched geometry
    silently hashes truncated bands (far more false candidates) instead
    of erroring. Defaults match the family's 125-hash 25×5 geometry
    (review r6: the old 32×4 default truncated band 31 to one element
    when applied to standard 125-hash signatures). A per-row guard
    (ADVICE r6 item 1) raises on any length mismatch — one O(1)
    ``size()`` comparison per row, never a silent truncated hash."""
    n_req = bands * rows_per_band
    guarded = signatures.withColumn(
        "signature",
        F.expr(
            f"CASE WHEN size(signature) = {n_req} THEN signature "
            f"ELSE raise_error(concat('banded_memberships: signature "
            f"length ', cast(size(signature) AS string), ' != bands*"
            f"rows_per_band = {n_req}')) END"
        ),
    )
    return guarded.select(
        id_col,
        *carry,
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), b -> struct(b as band, "
                f"xxhash64(slice(signature, b * {rows_per_band}"
                f" + 1, {rows_per_band})) as bucket))"
            )
        ).alias("bb"),
    ).select(
        id_col,
        *carry,
        F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
    )


def minhash_lsh_candidates(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 25,
    rows_per_band: int = 5,
    size_ratio_at_least: float | None = None,
) -> DataFrame:
    """Banded LSH: (id_a, id_b) candidate pairs, id_a < id_b. One shuffle on
    (band, band-slice hash); pairs emerge only inside buckets.

    Buckets hash the band slice DIRECTLY (``xxhash64`` over the sliced
    array): buckets are only ever compared for equality, so any
    deterministic content hash yields the identical candidate set — the
    earlier ``to_json`` round-trip built a throwaway JSON string per
    (doc, band) just to feed the hash.

    Pairs are emitted from a per-cell sorted id array (groupBy + the same
    codegen'd posexplode/slice-explode idiom as cooccurrence_edges), NOT
    a self-join: a self-join on the banded frame has no exchange to
    reuse, so Spark recomputes the ENTIRE upstream signature pipeline —
    corpus scan, shingling, the k MIN aggregates — once per join side
    (verified: FileScan x2, HashAggregate x6 in the joined plan; the
    local wall hides it in idle cores, a busy cluster pays double CPU).
    The group-by shape computes signatures once. Per-cell arrays are one
    id per member (8 bytes x occupancy); the quadratic candidate volume
    streams out of the generators exactly as it streamed out of the
    join, and a degenerate exact-dup mega-cell should be collapsed by
    exact dedup upstream under either shape.

    ``size_ratio_at_least`` (round 8): when the signature frame carries
    a per-doc ``sz`` column (``with_size=True`` in the signature impl —
    a free extra aggregate), the sizes ride the cell arrays and the
    size-ratio prefilter (J >= t ⇒ min(sz)/max(sz) >= t, exact) runs
    INSIDE the pair generator, BEFORE the candidate-dedup exchange —
    the same filter-before-distinct move simhash_near_pairs uses for
    hamming. The verifier then reads sz_a/sz_b off the candidate rows
    instead of re-aggregating the postings once per join side (two full
    postings passes removed). Output columns become
    (id_a, id_b, sz_a, sz_b); None keeps the classic (id_a, id_b)."""
    if size_ratio_at_least is None:
        sliced = banded_memberships(signatures, id_col, bands, rows_per_band)
        cells = (
            sliced.groupBy("band", "bucket")
            .agg(F.sort_array(F.collect_list(id_col)).alias("_ids"))
            .filter(F.size("_ids") >= 2)
        )
        return (
            cells.select("_ids", F.posexplode("_ids").alias("_i", "_x"))
            .select(
                F.col("_x").alias("id_a"),
                F.explode(
                    F.expr("slice(_ids, _i + 2, size(_ids))")
                ).alias("id_b"),
            )
            # a duplicated input id landing twice in one cell would emit
            # an (x, x) self-pair under positional slicing (the old
            # self-join's strict id_a < id_b excluded it); keep the old
            # semantics
            .filter(F.col("id_a") != F.col("id_b"))
            .distinct()
        )
    sliced = banded_memberships(
        signatures, id_col, bands, rows_per_band, carry=("sz",)
    )
    cells = (
        sliced.groupBy("band", "bucket")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(id_col).alias("i"), "sz"))
            ).alias("_ms")
        )
        .filter(F.size("_ms") >= 2)
    )
    return (
        cells.select("_ms", F.posexplode("_ms").alias("_i", "_x"))
        .select(
            F.col("_x.i").alias("id_a"),
            F.col("_x.sz").alias("sz_a"),
            F.explode(F.expr("slice(_ms, _i + 2, size(_ms))")).alias("_y"),
        )
        .select(
            "id_a",
            "sz_a",
            F.col("_y.i").alias("id_b"),
            F.col("_y.sz").alias("sz_b"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
        # exact-preserving prefilter BEFORE the dedup exchange: far-sized
        # pairs never reach the shuffle
        .filter(
            F.least(F.col("sz_a"), F.col("sz_b"))
            / F.greatest(F.col("sz_a"), F.col("sz_b"))
            >= size_ratio_at_least
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
    signature_impl: str | None = None,
) -> DataFrame:
    """LSH candidates → exact-Jaccard verification ≥ threshold.

    Band geometry trades candidate volume against recall: 25 bands × 5 rows
    misses a J=0.8 pair with p = (1-0.8⁵)²⁵ ≈ 5e-5 while admitting a
    background J=0.3 pair with p ≈ 0.06 (4 rows would admit 26% of the
    background — ruinous on corpora where random pairs are moderately
    similar). An exact-preserving size-ratio prefilter
    (J ≥ t ⇒ min(sz)/max(sz) ≥ t) prunes candidates before the
    array-intersect verification.

    ``signature_impl`` — no variant dominates; measured on short- AND
    long-doc corpora (tools/bench_minhash_variants.py + BENCH.md app. 2;
    all exact after verification):
    - "jvm" (default): k universal hashes as k MIN aggregates — ONE wide
      partial row (k longs) per (doc, map-partition): the smallest
      shuffle in every regime, independent of doc length; pays k
      expressions per shingle row of compute (2-2.6× the others).
    - "oph": densified one-permutation hashing — one hash per shingle,
      per-(doc, bin) MIN rows: compute on par with arrow, shuffle
      doc-length-independent but ~5× jvm's bytes (k small keyed rows per
      doc) — the pick when the cluster is compute-bound.
    - "arrow": every shingle hash collect_list'd through the shuffle —
      cheapest compute, shuffle grows LINEARLY with doc length: fine on
      one box, first casualty on a network.
    Env BKG_MINHASH_IMPL overrides for A/B benching without code
    changes."""
    import os

    if signature_impl is None:
        signature_impl = os.environ.get("BKG_MINHASH_IMPL", "jvm")
    if signature_impl not in ("jvm", "arrow", "oph"):
        raise ValueError(f"unknown signature_impl {signature_impl!r}")
    # one shingle scan feeds both the signatures and the exact verify
    sh = shingle_sets(df, id_col, text_col, n).persist()
    try:
        return _minhash_dedup_pairs_impl(
            sh, id_col, threshold, num_hashes, bands, rows_per_band, seed, df,
            text_col, n, signature_impl,
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
    signature_impl: str = "jvm",
) -> DataFrame:
    sign_fn = {
        "jvm": minhash_signatures_jvm,
        "arrow": minhash_signatures,
        "oph": minhash_signatures_oph,
    }[signature_impl]
    # round 8: sizes are computed as one extra aggregate of the
    # signature pass and ride the banded cells, so the ratio prefilter
    # runs before the candidate distinct and the verifier never
    # re-aggregates the postings for sizes (was two more full passes
    # over the shingle cache — one per join side)
    cands = minhash_lsh_candidates(
        sign_fn(
            df, id_col, text_col, n, num_hashes, seed, shingles=sh,
            with_size=True,
        ),
        id_col,
        bands,
        rows_per_band,
        size_ratio_at_least=threshold,
    )
    result = verify_pairs(cands, sh, id_col, threshold)
    # eager: materialize the (small) verified-pairs result and truncate
    # lineage so the caller can unpersist the shared shingle scan
    return result.localCheckpoint(eager=True)


def verify_pairs(
    cands: DataFrame,
    sh: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.8,
    sizes: DataFrame | None = None,
) -> DataFrame:
    """Exact-Jaccard verification of (id_a, id_b) candidate pairs against
    a shingle-postings frame ``sh`` (id, shingle): size-ratio prefilter,
    then the postings-restricted intersection count. Returns
    (id_a, id_b, jaccard ≥ threshold). Shared by the batch and
    incremental MinHash paths; pass precomputed ``sizes`` (id, sz) when
    they are already stored (the incremental index) so the prefilter
    does not re-aggregate the postings. Candidates that already carry
    ``sz_a``/``sz_b`` columns (round 8 — the inline size-threaded path
    of ``minhash_lsh_candidates``) skip both sizes joins AND the ratio
    prefilter, which was applied inside the pair generator."""
    if "sz_a" in cands.columns and "sz_b" in cands.columns:
        survivors = cands
    else:
        # size-ratio prefilter first (tiny sizes table; J ≥ t forces
        # min(sz)/max(sz) ≥ t) before any per-shingle work
        if sizes is None:
            sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
        survivors = (
            cands.join(
                sizes.select(
                    F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a")
                ),
                "id_a",
            )
            .join(
                sizes.select(
                    F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b")
                ),
                "id_b",
            )
            .filter(
                F.least(F.col("sz_a"), F.col("sz_b"))
                / F.greatest(F.col("sz_a"), F.col("sz_b"))
                >= threshold
            )
        )
    sh_a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    sh_b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    # postings-restricted exact verify: replicate each survivor pair across
    # side-a's postings, keep the shingles side b also has, count. Row size
    # stays one-shingle-per-row no matter how large a document is (a
    # collect_set + array_intersect verify would build multi-MB array rows
    # for giant docs); volume is Σ over survivor pairs of sz_a — bounded by
    # the LSH + size-ratio gates, not by the corpus.
    #
    # Join strategy is pinned to SHUFFLE_HASH: both verify joins are
    # partitioned exchanges, never a broadcast of an unbounded side. Left
    # to the optimizer at bench scale, the whole postings table fits under
    # the autoBroadcast threshold and Catalyst broadcasts the
    # MULTI-MILLION-ROW postings against the streamed pair list — the
    # relation build serializes millions of rows and the probe stage's
    # parallelism gets AQE-coalesced down to the pair list's byte size
    # (measured: 44 CPU-s in 6 tasks, the pipeline's scaling bottleneck).
    # The reverse hint (broadcast the pair side) is no better a plan: the
    # candidate list is O(duplicates) — corpus-shaped, not dim-shaped —
    # so at 100 TB it cannot be a broadcast either. Shuffle-hash on the
    # postings build side is the shape that survives every scale; AQE can
    # still demote a genuinely-tiny side to a broadcast at runtime.
    pair_postings = sh_a.join(survivors.hint("shuffle_hash"), "id_a")
    shared = pair_postings.join(sh_b.hint("shuffle_hash"), ["id_b", "shingle"])
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
    return result


# ---------------------------------------------------------------------------
# Incremental MinHash dedup: new documents vs an existing corpus index
# ---------------------------------------------------------------------------


@dataclass
class MinHashIndex:
    """The persisted state an incremental dedup pipeline maintains for an
    already-ingested corpus: LSH band memberships, shingle postings and
    per-doc shingle counts. At 100 TB each frame is a stored table —
    ``bands`` bucketed by (band, bucket) and ``postings`` by the id — so
    the incremental joins co-locate against them and only the NEW side
    shuffles; locally they are plain DataFrames with identical semantics.
    Build once with ``minhash_index``; grow by unioning a new batch's
    index (the frames are append-only row sets)."""

    bands: DataFrame  # (id, band, bucket)
    postings: DataFrame  # (id, shingle)
    sizes: DataFrame  # (id, sz) — stored so verify never re-aggregates

    def union(self, other: "MinHashIndex") -> "MinHashIndex":
        return MinHashIndex(
            bands=self.bands.unionByName(other.bands),
            postings=self.postings.unionByName(other.postings),
            sizes=self.sizes.unionByName(other.sizes),
        )

    def unpersist(self) -> None:
        """Release the shared shingle cache of a persist=True index."""
        self.postings.unpersist()


def minhash_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    num_hashes: int = 125,
    bands: int = 25,
    rows_per_band: int = 5,
    seed: int = 7,
    signature_impl: str = "jvm",
    persist: bool = False,
) -> MinHashIndex:
    """Build the incremental-dedup index for a corpus (one signature pass
    — the same cost as the map side of ``minhash_dedup_pairs``).

    ``persist=True`` caches the shared shingle scan so the index's three
    frames (all derived from it) do not each recompute the corpus
    shingling when the incremental verify references them — the same
    recompute-per-reference trap minhash_lsh_candidates documents. Use
    it whenever the index lives only as in-session derived plans (demos,
    tests, the registry query) and release with ``index.unpersist()``;
    a PRODUCTION index is three stored tables (write the frames once,
    read them per batch), where re-reading is a scan, not a recompute,
    and no cache is wanted.

    Round 8: ``persist=True`` additionally eager-checkpoints the
    SIGNATURE frame (doc-count × k longs — tiny) with the per-doc
    shingle size as its free extra aggregate, and derives BOTH ``bands``
    and ``sizes`` from it. Before, ``sizes`` was its own full
    corpus-postings aggregate and every consumer of ``bands`` re-ran
    the whole k-MIN signature aggregate from the shingle cache; now the
    corpus pays one shingling pass + one signature pass, total. The
    persist=False path keeps the lazy frames (a production pipeline
    stores each frame once and never re-derives)."""
    sign_fn = {
        "jvm": minhash_signatures_jvm,
        "arrow": minhash_signatures,
        "oph": minhash_signatures_oph,
    }[signature_impl]
    sh = shingle_sets(df, id_col, text_col, n)
    if persist:
        sh = sh.persist()
        sigs = sign_fn(
            df, id_col, text_col, n, num_hashes, seed, shingles=sh,
            with_size=True,
        ).localCheckpoint(eager=True)
        return MinHashIndex(
            bands=banded_memberships(sigs, id_col, bands, rows_per_band),
            postings=sh,
            sizes=sigs.select(id_col, "sz"),
        )
    sigs = sign_fn(df, id_col, text_col, n, num_hashes, seed, shingles=sh)
    return MinHashIndex(
        bands=banded_memberships(sigs, id_col, bands, rows_per_band),
        postings=sh,
        sizes=sh.groupBy(id_col).agg(F.count("*").alias("sz")),
    )


def minhash_dedup_pairs_incremental(
    new_df: DataFrame,
    index: MinHashIndex,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.8,
    num_hashes: int = 125,
    bands: int = 25,
    rows_per_band: int = 5,
    seed: int = 7,
    signature_impl: str = "jvm",
) -> DataFrame:
    """Near-duplicate pairs TOUCHING a new document batch — new-vs-corpus
    and new-vs-new, never corpus-vs-corpus — against a prebuilt
    ``MinHashIndex``. This is the ingest-time shape of dedup at scale:
    re-pairing the whole corpus per batch is O(corpus); this is
    O(batch + matched buckets + touched postings).

    Plan: one signature pass over the batch only; new-vs-corpus
    candidates from an equi-join of the batch's band memberships against
    the stored band table on (band, bucket) — with the index bucketed by
    that key only the batch side shuffles; new-vs-new candidates from
    the per-cell array emission (same as batch mode); both verified by
    ``verify_pairs`` against corpus ∪ batch postings, where the
    postings joins touch only surviving candidates' rows. Pairs are
    canonicalized (id_a < id_b). Precondition: batch ids are disjoint
    from corpus ids.

    Output: (id_a, id_b, jaccard) — identical contract to
    ``minhash_dedup_pairs`` restricted to pairs with ≥1 new side."""
    sign_fn = {
        "jvm": minhash_signatures_jvm,
        "arrow": minhash_signatures,
        "oph": minhash_signatures_oph,
    }[signature_impl]
    sh_new = shingle_sets(new_df, id_col, text_col, n).persist()
    try:
        # round 8: sign ONCE with the per-doc size as the free extra
        # aggregate, eager-checkpoint the (batch-doc × k longs) frame,
        # and derive band memberships AND batch sizes from it — before,
        # the new-vs-corpus join and the new-vs-new cells each re-ran
        # the whole batch k-MIN signature aggregate, and the verifier's
        # sizes union re-aggregated the batch postings a third time
        sigs_new = sign_fn(
            new_df, id_col, text_col, n, num_hashes, seed, shingles=sh_new,
            with_size=True,
        ).localCheckpoint(eager=True)
        banded_new = banded_memberships(sigs_new, id_col, bands, rows_per_band)
        # new-vs-corpus: probe the stored band table. The index side joins
        # on its storage key; shuffle_hash (not broadcast) — the batch's
        # memberships are batch-sized, the index corpus-sized, neither is
        # a dim.
        new_old = (
            banded_new.select(
                "band", "bucket", F.col(id_col).alias("_id_new")
            )
            .hint("shuffle_hash")
            .join(
                index.bands.select(
                    "band", "bucket", F.col(id_col).alias("_id_old")
                ),
                ["band", "bucket"],
            )
            .select(
                F.least("_id_new", "_id_old").alias("id_a"),
                F.greatest("_id_new", "_id_old").alias("id_b"),
            )
            .filter(F.col("id_a") != F.col("id_b"))
            .distinct()
        )
        # new-vs-new: standard per-cell emission within the batch, built
        # from the SAME checkpointed membership frame as the corpus join
        # (minhash_lsh_candidates(sigs_new) would re-band — and re-run
        # the signature aggregate — from scratch)
        cells = (
            banded_new.groupBy("band", "bucket")
            .agg(F.sort_array(F.collect_list(id_col)).alias("_ids"))
            .filter(F.size("_ids") >= 2)
        )
        new_new = (
            cells.select("_ids", F.posexplode("_ids").alias("_i", "_x"))
            .select(
                F.col("_x").alias("id_a"),
                F.explode(
                    F.expr("slice(_ids, _i + 2, size(_ids))")
                ).alias("id_b"),
            )
            .filter(F.col("id_a") != F.col("id_b"))
            .distinct()
        )
        cands = new_old.unionByName(new_new).distinct()
        sh_all = index.postings.unionByName(sh_new)
        # round 8: the verifier references sizes TWICE (sz_a and sz_b
        # join sides) and Catalyst does not CSE across references, so a
        # lazy union here re-runs its inputs once per side; the batch
        # half now reads the checkpointed signature frame (free), and
        # the doc-count-sized union is materialized once
        sizes_all = index.sizes.unionByName(
            sigs_new.select(id_col, "sz")
        ).localCheckpoint(eager=True)
        result = verify_pairs(cands, sh_all, id_col, threshold, sizes=sizes_all)
        return result.localCheckpoint(eager=True)
    finally:
        sh_new.unpersist()


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


def _band_layout(total_bits: int, bands: int) -> list[tuple[int, int]]:
    """(offset, width) per band over ``total_bits``, widths as equal as
    possible (unequal widths are fine for pigeonhole — only the COUNT of
    bands matters), widest first from bit 0."""
    base, rem = divmod(total_bits, bands)
    widths = [base + 1] * rem + [base] * (bands - rem)
    out, off = [], 0
    for w in widths:
        out.append((off, w))
        off += w
    return out


def _complement_bits(sig, offset: int, width: int):
    """The 64-width bits of ``sig`` with the [offset, offset+width) field
    removed, packed into the low bits of a long (pure JVM shifts)."""
    low = sig.bitwiseAND(F.lit((1 << offset) - 1)) if offset else F.lit(0)
    if offset + width >= 64:
        # JVM shifts mask the count to 6 bits, so >>> 64 would be a no-op;
        # the field reaches the top bit → there IS no high part
        high = F.lit(0).cast("long")
    else:
        high = F.shiftleft(F.shiftrightunsigned(sig, offset + width), offset)
    return high.bitwiseOR(low) if offset else high


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 6,
    bands: int | None = None,
    max_cell_size: int = 64,
) -> DataFrame:
    """(id_a, id_b, hamming ≤ max_hamming). Candidate generation by banding
    the 64-bit fingerprint into ``bands`` slices; by pigeonhole any pair
    with hamming < bands agrees on ≥1 slice, so bands defaults to the
    minimal max_hamming + 1 (unequal widths allowed — round-3: the old
    power-of-two rounding forced 8 bands × 8 bits = 256 buckets/band; 7
    bands gives 9-10-bit slices = 512-1024 buckets and fewer candidate
    rows). Exact hamming then via bit_count(xor) on the candidates.

    Occupancy guard (VERDICT r2 item 3 — real-corpus simhash bits are
    biased, so (band, slice) cells skew; and even UNIFORM fingerprints
    overflow the ~2^(64/bands) buckets once the corpus outgrows them,
    making unsplit candidate volume quadratic in corpus size): cells
    larger than ``max_cell_size`` are RE-BANDED on the complement bits —
    splitting a cell of size C costs (max_hamming+1)·C extra keyed rows
    while not splitting costs ~C²/2 pair emissions, so the break-even is
    C ≈ 2·(max_hamming+1) and the default threshold sits at 64 (the old
    100 k default never fired below mega-corpus scale; measured at 440 k
    uniform docs it left 1.2 B candidate pairs where 64 leaves ~tens of
    millions). A pair with
    hamming ≤ h agreeing on band b differs in ≤ h of the other 64-w bits,
    so splitting those into h+1 sub-slices pigeonholes again; membership
    key becomes (band, slice, sub_band, sub_slice). Recall stays EXACT
    while expected cell occupancy drops by ~2^sub_width (128-512× for the
    default geometry) at the cost of (h+1)× row replication *within the
    oversized cells only* (with the 64 default that is most cells on a
    large corpus — the guard is the primary candidate-volume mechanism,
    not just a skew escape hatch). Truly identical fingerprints can't be split by
    any scheme — their pair count is the query's own output size — but
    near-miss crowding (the biased-bit case) is dispersed exactly."""
    if bands is None:
        bands = max_hamming + 1
    if not (max_hamming < bands <= 64):
        raise ValueError("bands must exceed max_hamming (and be <= 64)")
    sig = simhash64(df, id_col, text_col)
    layout = _band_layout(64, bands)
    sliced = sig.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), off)
                        .bitwiseAND(F.lit((1 << w) - 1))
                        .alias("slice"),
                    )
                    for i, (off, w) in enumerate(layout)
                ]
            )
        ).alias("bs"),
    ).select(id_col, "simhash", "bs.band", "bs.slice")

    # ---- occupancy guard: sub-band the complement bits of oversized cells.
    # Cell size comes from a WINDOW count over (band, slice), not a
    # separate aggregate + broadcast join: the probe branch recomputed the
    # whole simhash pipeline (corpus scan + 64 bit-sums) a second time —
    # the window keeps the lineage linear, and its (band, slice) exchange
    # doubles as the clustering the downstream cell groupBy needs (a
    # hash partitioning on a PREFIX of the group key already co-locates
    # every group, so no second exchange)
    from pyspark.sql import Window as _W

    tagged = sliced.withColumn(
        "_csz",
        F.count("*").over(_W.partitionBy("band", "slice")),
    )
    n_sub = max_hamming + 1
    # per-band complement layout: 64 - band_width bits split into n_sub
    sub_exprs = []
    for i, (off, w) in enumerate(layout):
        comp = _complement_bits(F.col("simhash"), off, w)
        sub_layout = _band_layout(64 - w, n_sub)
        subs = F.array(
            *[
                F.struct(
                    F.lit(j).alias("sub_band"),
                    F.shiftrightunsigned(comp, soff)
                    .bitwiseAND(F.lit((1 << sw) - 1))
                    .alias("sub_slice"),
                )
                for j, (soff, sw) in enumerate(sub_layout)
            ]
        )
        sub_exprs.append(F.when(F.col("band") == i, subs))
    sub_for_band = F.coalesce(*sub_exprs)
    # normal rows stay single with a sentinel sub key; oversized rows fan
    # out ×(max_hamming+1) into their sub-band memberships
    keyed = tagged.select(
        id_col,
        "simhash",
        "band",
        "slice",
        F.explode(
            F.when(
                F.col("_csz") <= max_cell_size,
                F.array(
                    F.struct(
                        F.lit(-1).alias("sub_band"),
                        F.lit(-1).cast("long").alias("sub_slice"),
                    )
                ),
            ).otherwise(sub_for_band)
        ).alias("sb"),
    ).select(
        id_col, "simhash", "band", "slice", "sb.sub_band", "sb.sub_slice"
    )
    # pair emission from per-cell sorted (id, simhash) arrays — same
    # rationale as minhash_lsh_candidates: a self-join recomputes the
    # whole simhash pipeline per side (no exchange to reuse), the
    # groupBy computes it once and the quadratic candidates stream out
    # of codegen'd generators
    cells = (
        keyed.groupBy("band", "slice", "sub_band", "sub_slice")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(id_col).alias("i"),
                        F.col("simhash").alias("s"),
                    )
                )
            ).alias("_m")
        )
        .filter(F.size("_m") >= 2)
    )
    cands = (
        cells.select("_m", F.posexplode("_m").alias("_i", "_x"))
        .select(
            F.col("_x.i").alias("id_a"),
            F.col("_x.s").alias("sig_a"),
            F.explode(F.expr("slice(_m, _i + 2, size(_m))")).alias("_y"),
        )
        .select(
            "id_a",
            "sig_a",
            F.col("_y.i").alias("id_b"),
            F.col("_y.s").alias("sig_b"),
        )
        # exclude (x, x) self-pairs from duplicated input ids — see
        # minhash_lsh_candidates for the rationale
        .filter(F.col("id_a") != F.col("id_b"))
        # exact-hamming filter BEFORE the distinct: far pairs dominate
        # the candidate stream (uniform fingerprints put n/2^band_width
        # docs in every cell, so candidate volume grows quadratically
        # until the occupancy guard splits the cells), and bit_count(xor)
        # is a two-instruction codegen expression — filtering first keeps
        # the dedup exchange at true-pair volume instead of candidate
        # volume (measured 41 M -> ~dup-count rows at 440 k docs)
        .withColumn(
            "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )
    return cands
