"""Deterministic train/val/test splitting and exact stratified sampling
(round 5).

Every training-data pipeline needs (a) a STABLE split assignment — the
same document must land in the same split on every run, on any cluster,
regardless of partitioning, or eval sets silently contaminate training —
and (b) reproducible sub-sampling, usually stratified so small strata
(languages, sources) are not washed out. The reference has no analogue;
both are built Spark-first with zero Python UDFs.

Determinism comes from content hashing, not RNG: ``md5(salt ":" id)``'s
first 8 hex chars are a uniform draw in [0, 16^8) that Spark and any
ANSI-SQL oracle compute identically (both emit lowercase hex, and hex
strings of equal length compare like the integers they encode). Split
boundaries are cumulative-fraction thresholds embedded as hex literals
(``fraction_to_hex``), so assignment is a pure per-row projection — no
shuffle, no state, trivially 100 TB-safe, and re-runnable on a corpus
that grows between runs without reshuffling old rows across splits.

Stratified sampling comes in the two standard flavors:

- ``in_sample_col`` (threshold flag): ``hash < fraction`` — also a pure
  projection, approximate per-stratum counts (binomial), the 100 TB
  default.
- ``stratified_exact_sample``: exactly ``ceil(fraction · n)`` rows per
  stratum, taken as the lowest hashes via one ``row_number`` window per
  stratum (ties broken by id, so the pick is total-order deterministic).
  One shuffle on the stratum key; each stratum is ranked by a single
  task, which is the standard top-k-per-group trade — use the threshold
  flag instead when single strata exceed a task's comfort zone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.storagelevel import StorageLevel

HEX_SPACE = 16 ** 8


def fraction_to_hex(fraction: float) -> str:
    """Cumulative fraction → 8-char lowercase hex threshold literal."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction out of range: {fraction}")
    return format(min(int(fraction * HEX_SPACE), HEX_SPACE - 1), "08x")


def hash_hex(id_col: str | Column, salt: str) -> Column:
    """First 8 hex chars of md5(salt ':' id) — uniform, engine-portable."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.substring(
        F.md5(F.concat(F.lit(f"{salt}:"), col.cast("string"))), 1, 8
    )


def split_col(
    id_col: str | Column,
    splits: tuple[tuple[str, float], ...] = (
        ("train", 0.90),
        ("val", 0.05),
        ("test", 0.05),
    ),
    salt: str = "split-v1",
) -> Column:
    """Deterministic split label: cumulative hex-threshold CASE chain."""
    fracs = [f for _, f in splits]
    if abs(sum(fracs) - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1: {fracs}")
    hx = hash_hex(id_col, salt)
    expr: Column | None = None
    cum = 0.0
    for name, frac in splits[:-1]:
        cum += frac
        cond = hx < F.lit(fraction_to_hex(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = splits[-1][0]
    return (F.lit(last) if expr is None else expr.otherwise(last)).alias(
        "split"
    )


def in_sample_col(
    id_col: str | Column, fraction: float, salt: str = "sample-v1"
) -> Column:
    """Approximate-fraction sample flag — pure projection, the scale path."""
    return (hash_hex(id_col, salt) < F.lit(fraction_to_hex(fraction))).alias(
        "in_sample"
    )


def stratified_exact_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    fraction: float,
    salt: str = "sample-v1",
    flag_name: str = "in_sample",
) -> DataFrame:
    """Flag exactly ``ceil(fraction · n)`` rows per stratum (lowest
    hashes, id tie-break). Adds ``flag_name`` boolean; one shuffle on the
    stratum key. ``fraction`` is interpreted as the exact rational
    ``num/den`` from its repr, so ceil is integer-exact and oracleable:
    ceil(n·num/den) = (n·num + den − 1) div den. The denominator is
    capped at 10**6 (nearest rational within 1e-12 of any such float),
    which bounds the quota product n·num under 2**63 for strata up to
    ~9.2e12 rows instead of overflowing at n ≈ 2**63/10**16 for repr-long
    fractions like 1/3.
    """
    from fractions import Fraction

    frac = Fraction(str(fraction)).limit_denominator(10**6)
    reserved = {"_hx", "_n", "_rk"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"stratified_exact_sample uses temp columns {sorted(reserved)} "
            "already present in the input — rename them first"
        )
    hx = hash_hex(id_col, salt).alias("_hx")
    w = Window.partitionBy(stratum_col)
    rk = F.row_number().over(
        w.orderBy(F.col("_hx"), F.col(id_col))
    )
    quota = F.expr(
        f"(cast(_n as bigint) * {frac.numerator}L"
        f" + {frac.denominator - 1}L) div {frac.denominator}L"
    )
    return (
        df.withColumn("_hx", hx)
        .withColumn("_n", F.count("*").over(w))
        .withColumn("_rk", rk)
        .withColumn(flag_name, F.col("_rk") <= quota)
        .drop("_hx", "_n", "_rk")
    )


_KNUTH = 2654435761  # Knuth's multiplicative constant
_M31_SAMPLING = (1 << 31) - 1


def weighted_priority_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    stratum_col: str | None = None,
    scale: int = 10**6,
    flag_name: str = "picked",
) -> DataFrame:
    """Deterministic weight-biased top-k selection (per stratum):
    quality-weighted data picking — the selection step of
    quality-curriculum / data-mixture pipelines, where higher-weight
    documents must be chosen preferentially but the pick must be a pure
    function of the data (re-runnable on any cluster, any partitioning).

    priority = (h(id) · scale) div max(weight, 1) with h a multiplicative
    integer hash — all BIGINT arithmetic, so ANY engine computes the
    identical pick (no float pow as in Efraimidis–Spirakis keys, whose
    cross-engine bit-stability is not guaranteed). Doubling a doc's
    weight halves its expected priority; the k smallest (priority, id)
    per stratum win. Weights must be non-negative integers (scale floats
    yourself — that keeps the contract exact); a NULL or negative weight,
    or a NULL / non-integer-castable id, raises at execution time rather
    than silently diverging across engines (Spark's greatest() skips
    NULLs where DuckDB's propagates them). ``id_col`` must be unique —
    it is the total tie-break order, so a duplicated id would make the
    k-th pick ambiguous (same precondition as pack_sequences).

    Plan (VERDICT r5 item 6): bounded top-k, NOT a full window sort,
    as a TREE MERGE whose every aggregation buffer is bounded: level 1
    groups by (stratum, partition, hash-chunk) so no collect_list
    buffer exceeds ~1/64th of a task's rows (review r6: grouping by
    partition alone let one buffer hold the whole partition), then
    per-partition, per-partition-bucket and per-stratum merge levels
    each flatten ≤ a few·k-key arrays and re-slice to k, so no merge
    buffer grows with the fleet; the k-th smallest surviving key is the
    stratum's admission threshold, broadcast back for a struct-compare
    flag. The (priority, id) keys cross the first exchange once — the
    honest cost of any exact method without a partial-truncating
    aggregate, and still far less than the window sort's full-row
    shuffle + whole-stratum sort. Equality with the window-sort
    reference implementation is pinned in tests/test_sampling.py."""
    if k <= 0:
        raise ValueError(f"k must be positive: {k}")
    reserved = {"_h", "_w", "_prio", "_key", "_pid", "_chunk", "_pb",
                "_top", "_topk", "_thr", f"_thr_{stratum_col}",
                flag_name} & set(df.columns)
    if reserved:
        raise ValueError(
            f"weighted_priority_sample uses temp columns (or would "
            f"overwrite output column {flag_name!r}) already present in "
            f"the input: {sorted(reserved)} — rename them first"
        )
    # try_cast, not cast: under ANSI mode a plain cast of a malformed id
    # would throw CAST_INVALID_INPUT before this guard's message fires
    raw_id = F.col(id_col).try_cast("long")
    id_ok = F.when(
        raw_id.isNull(),
        F.raise_error(
            F.concat(
                F.lit(
                    f"weighted_priority_sample: {id_col} must be a "
                    "non-null integer-castable id, got "
                ),
                F.coalesce(F.col(id_col).cast("string"), F.lit("NULL")),
            )
        ).cast("long"),
    ).otherwise(raw_id)
    raw_w = F.col(weight_col)
    w_ok = F.when(
        raw_w.isNull() | (raw_w < 0),
        F.raise_error(
            F.concat(
                F.lit(
                    f"weighted_priority_sample: {weight_col} must be a "
                    "non-negative weight, got "
                ),
                F.coalesce(raw_w.cast("string"), F.lit("NULL")),
            )
        ).cast("long"),
    ).otherwise(F.greatest(raw_w.cast("long"), F.lit(1).cast("long")))
    h = (id_ok % _M31_SAMPLING) * _KNUTH % _M31_SAMPLING
    parts = [stratum_col] if stratum_col is not None else []
    base = (
        df.withColumn("_h", h)
        .withColumn("_w", w_ok)
        .withColumn("_prio", F.expr(f"(_h * {int(scale)}L) div _w"))
    )
    key = F.struct(F.col("_prio").alias("p"), F.col(id_col).alias("i"))
    return _tree_topk_flag(base, key, parts, k, stratum_col, flag_name).drop(
        "_h", "_w", "_prio"
    )


def _tree_topk_flag(
    base: DataFrame,
    key: Column,
    parts: list,
    k: int,
    stratum_col: str | None,
    flag_name: str,
) -> DataFrame:
    """Shared bounded-buffer tree-merge top-k: flag the rows whose
    ``key`` (a struct (p, i) with i a unique tie-break id — the k
    SMALLEST keys win) is within each stratum's top k. Every
    aggregation buffer is bounded (see weighted_priority_sample's
    docstring for the level-by-level ledger); the k-th surviving key
    per stratum is broadcast back as the admission threshold."""

    def merge_level(frame: DataFrame, keys: list) -> DataFrame:
        return frame.groupBy(*keys).agg(
            F.slice(
                F.sort_array(F.flatten(F.collect_list("_top"))), 1, k
            ).alias("_top")
        )

    l1 = (
        base.select(*parts, key.alias("_key"))
        .withColumn("_pid", F.spark_partition_id())
        # hash-chunk the level-1 groups: bounds every collect_list
        # buffer at ~rows/64 per task instead of the whole partition.
        # Chunk on a hash of the UNIQUE id, not the priority: duplicated
        # priorities (e.g. weights so large _prio collapses to 0) would
        # put an entire partition back into one chunk (ADVICE r6 item 3)
        .withColumn("_chunk", F.pmod(F.xxhash64(F.col("_key.i")), F.lit(64)))
        .groupBy(*parts, "_pid", "_chunk")
        .agg(F.slice(F.sort_array(F.collect_list("_key")), 1, k).alias("_top"))
    )
    l2 = merge_level(l1, [*parts, "_pid"])  # ≤ 64 arrays in
    # the partition-bucket level only bounds anything once the job has
    # more tasks than buckets — below that it is pure added latency
    # (measured ~0.25 s of extra stages at bench scale), so the tree
    # deepens adaptively with the actual input parallelism
    if base.rdd.getNumPartitions() > 1024:
        l3 = merge_level(  # ≤ (tasks/1024) arrays in
            l2.withColumn("_pb", F.pmod(F.col("_pid"), F.lit(1024))),
            [*parts, "_pb"],
        )
    else:
        l3 = l2
    thresholds = (
        merge_level(l3, parts)  # ≤ 1024 arrays in
        # k-th smallest key per stratum (or the max when the stratum has
        # fewer than k rows — then every row is admitted, as it should
        # be); empty-input guard: element_at(_, 0) is an error, the
        # global-aggregate path always emits one row even on zero rows
        .select(
            *[F.col(p).alias(f"_thr_{p}") for p in parts],
            F.when(
                F.size("_top") > 0,
                F.element_at("_top", F.size("_top")),
            ).alias("_thr"),
        )
    )
    if parts:
        # eqNullSafe: Window.partitionBy treats NULL stratum values as a
        # group of their own; a plain equi-join would drop them
        cond = F.col(stratum_col).eqNullSafe(F.col(f"_thr_{stratum_col}"))
        joined = base.join(F.broadcast(thresholds), cond, "left").drop(
            f"_thr_{stratum_col}"
        )
    else:
        joined = base.crossJoin(F.broadcast(thresholds))
    return joined.withColumn(flag_name, key <= F.col("_thr")).drop("_thr")


def stratified_topk(
    df: DataFrame,
    id_col: str,
    order_col: str,
    k: int,
    stratum_col: str | None = None,
    descending: bool = True,
    flag_name: str = "kept",
    impl: str = "tree",
) -> DataFrame:
    """Exact top-k per stratum by an EXPLICIT score column — the
    per-domain document cap of RefinedWeb-style webtext pipelines (keep
    the k best documents per registrable domain so head domains cannot
    dominate the corpus), and the generic "best k per group" selection
    step anywhere a full window sort would not survive corpus scale.

    ``impl="tree"`` (default): the same bounded-buffer tree merge as
    weighted_priority_sample (every collect_list buffer capped, the k-th
    surviving (score, id) key per stratum broadcast back as the
    admission threshold) — only (stratum, score, id) KEY STRUCTS ever
    cross an exchange; the document rows themselves never shuffle. A
    window row_number shuffles FULL rows and its whole-stratum sort
    makes hot strata (head domains) the last reducer.

    ``impl="window"``: plain row_number — ONE full-row shuffle and
    fewer stages. Measured crossover (1.92 M docs × ~270 B text,
    20 k domains, 16 cores): window 4.2 s / 626 MB shuffled vs tree
    7.7 s / 287 MB — the window's fewer stages win wall when rows are
    narrow, but its shuffle bytes grow with document size while the
    tree's stay key-sized (at 2–4 KB web docs the same corpus would
    shuffle ~6–12 GB through the window against the tree's constant
    ~0.3 GB), and one head domain still lands on one reducer. Use
    "window" for narrow/dim-sized frames, "tree" for corpora.

    Ties break on ``id_col`` ascending, so the pick is a pure function
    of the data: equal to row_number() OVER (PARTITION BY stratum ORDER
    BY score DESC|ASC, id) <= k in any engine, for both impls.
    ``order_col`` must be non-null and integer-castable (scale floats
    yourself — the exactness contract; same rule as
    weighted_priority_sample's weights); ``id_col`` must be unique and
    integer-castable."""
    if k <= 0:
        raise ValueError(f"k must be positive: {k}")
    if impl not in ("tree", "window"):
        raise ValueError(f"impl must be 'tree' or 'window': {impl!r}")
    reserved = {"_s", "_key", "_pid", "_chunk", "_pb", "_top", "_thr",
                f"_thr_{stratum_col}", flag_name} & set(df.columns)
    if reserved:
        raise ValueError(
            f"stratified_topk uses temp columns (or would overwrite "
            f"output column {flag_name!r}) already present in the "
            f"input: {sorted(reserved)} — rename them first"
        )
    raw_s = F.col(order_col).try_cast("long")
    s_ok = F.when(
        raw_s.isNull(),
        F.raise_error(
            F.concat(
                F.lit(
                    f"stratified_topk: {order_col} must be a non-null "
                    "integer-castable score, got "
                ),
                F.coalesce(F.col(order_col).cast("string"), F.lit("NULL")),
            )
        ).cast("long"),
    ).otherwise(raw_s)
    parts = [stratum_col] if stratum_col is not None else []
    base = df.withColumn("_s", -s_ok if descending else s_ok)
    if impl == "window":
        w = Window.partitionBy(*parts).orderBy(
            F.col("_s").asc(), F.col(id_col).asc()
        )
        return base.withColumn(
            flag_name, F.row_number().over(w) <= k
        ).drop("_s")
    key = F.struct(F.col("_s").alias("p"), F.col(id_col).alias("i"))
    return _tree_topk_flag(base, key, parts, k, stratum_col, flag_name).drop(
        "_s"
    )


def split_contamination(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    splits: tuple[tuple[str, float], ...] = (
        ("train", 0.90),
        ("val", 0.05),
        ("test", 0.05),
    ),
    salt: str = "split-v1",
    eval_split: str = "test",
    train_split: str = "train",
    gram: int = 8,
    keep: int = 4,
) -> DataFrame:
    """Train/eval decontamination check: for every ``eval_split`` document,
    how many of its winnowed fingerprint grams (textstats.fingerprint —
    the ``keep`` smallest md5 char-``gram``-gram digests) also occur in
    ANY ``train_split`` document. Output per eval doc: ``n_fingerprint``,
    ``n_overlap``, ``contaminated`` (n_overlap > 0).

    Every serious eval pipeline runs this join (an eval set sharing
    verbatim n-grams with training data inflates benchmarks); the
    fingerprint restriction is what makes it 100 TB-shaped. ONE scan of
    the corpus (fingerprints computed once per doc), ONE shuffle of the
    gram postings — ``keep`` 16-byte digests per doc no matter how long
    the doc, so the shuffle is corpus-row-sized, not text-sized. A WINDOW
    max over each gram partition attaches the any-train flag to every
    posting in place — no join back, no second scan, and never a
    per-gram posting ARRAY: a boilerplate gram shared by much of the
    eval split costs a spillable sorted run inside WindowExec, not one
    giant in-memory aggregation buffer (plan shape pinned in
    tests/test_plans.py). Then eval postings count per doc. No broadcast
    barrier, so eval-set size never has to fit in driver memory. A final
    doc_id-projection pass restores eval docs whose text is shorter than
    ``gram`` (empty fingerprint)."""
    from biomedical_knowledge_graph_spark.operators.textstats import (
        fingerprint,
    )

    split = split_col(id_col, splits, salt)
    fp = fingerprint(
        df.filter(split.isin(eval_split, train_split)),
        id_col,
        text_col,
        gram=gram,
        keep=keep,
    )
    # the split label is a pure function of the id (md5 threshold), so it
    # re-projects after the fingerprint instead of joining anything back.
    # explode_OUTER, not explode: InferFiltersFromGenerate turns a plain
    # explode into a pre-Generate filter `size(child) > 0 AND
    # isnotnull(child)`, and after projection collapse `child` is the
    # whole md5-transform fingerprint expression — evaluated THREE times
    # per doc (the explode stage measured 5.7 s vs 3.4 s for the
    # projection alone at sf0.1). The
    # outer variant infers no filter; the null row an empty fingerprint
    # produces is dropped by a cheap post-generate predicate instead.
    grams = fp.select(
        id_col, split, F.explode_outer("fingerprint").alias("gram")
    ).filter(F.col("gram").isNotNull())
    in_train = F.max(
        (F.col("split") == train_split).cast("int")
    ).over(Window.partitionBy("gram"))
    per_doc = (
        grams.withColumn("_in_train", in_train)
        .filter(F.col("split") == eval_split)
        # fingerprint grams are distinct within a doc, so rows per doc =
        # fingerprint size and the overlap is a plain conditional sum
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_fingerprint"),
            F.sum("_in_train").cast("long").alias("n_overlap"),
        )
    )
    eval_ids = df.select(id_col, split).filter(
        F.col("split") == eval_split
    )
    return (
        eval_ids.join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_fingerprint", F.lit(0))
            .cast("long")
            .alias("n_fingerprint"),
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def budget_select(
    df: DataFrame,
    id_col: str,
    score_col: str,
    tokens_col: str,
    budget: int,
    flag_name: str = "selected",
) -> DataFrame:
    """Token-budget corpus assembly: flag the highest-scoring documents
    whose cumulative token count fits a global budget — the greedy
    knapsack that builds a fixed-size training mix from a scored corpus
    (take the best docs first, stop when the token budget is spent).
    A row is selected iff the running sum of ``tokens_col`` over the
    global order (score DESC, id ASC), INCLUDING the row itself, is
    ≤ ``budget`` — exactly
    ``sum(tokens) OVER (ORDER BY score DESC, id) <= budget``.

    The global running sum is computed scalably, NOT with a bare
    unpartitioned window (one reducer sorting the corpus):

    1. ``repartitionByRange`` on (score DESC, id) — the range
       partitioner's sampled boundaries balance partitions even when one
       score value dominates, because the unique id disambiguates;
    2. running sum WITHIN each partition — a window partitioned by
       ``spark_partition_id()``, every partition range-bounded;
    3. partition token totals (a numPartitions-sized frame) prefix-summed
       by one single-task window over that DIM-SIZED frame and broadcast
       back as per-partition offsets.

    Selection = offset + within-partition running sum ≤ budget, a pure
    function of the data (partition boundaries cancel out of the sum).

    Shuffle ledger: two corpus-row exchanges — the range repartition,
    then the window's hash(_pid) exchange (the rows are ALREADY
    co-located by _pid, but Catalyst cannot be told a derived column
    equals the physical partition id, so the window re-shuffles them;
    the exchange is perfectly balanced by construction) — plus two
    dim-sized ones (totals aggregate, offsets broadcast).
    ``tokens_col`` must be non-null and non-negative integer-castable,
    ``score_col`` non-null integer-castable, ``id_col`` unique — the
    same exactness contract as the other selection operators."""
    if budget < 0:
        raise ValueError(f"budget must be non-negative: {budget}")
    reserved = {"_pid", "_cum", "_ptot", "_off", "_tok", "_sc",
                flag_name} & set(df.columns)
    if reserved:
        raise ValueError(
            f"budget_select uses temp columns (or would overwrite output "
            f"column {flag_name!r}) already present in the input: "
            f"{sorted(reserved)} — rename them first"
        )
    raw_t = F.col(tokens_col).try_cast("long")
    t_ok = F.when(
        raw_t.isNull() | (raw_t < 0),
        F.raise_error(
            F.concat(
                F.lit(
                    f"budget_select: {tokens_col} must be a non-null "
                    "non-negative integer-castable count, got "
                ),
                F.coalesce(F.col(tokens_col).cast("string"), F.lit("NULL")),
            )
        ).cast("long"),
    ).otherwise(raw_t)
    raw_s = F.col(score_col).try_cast("long")
    s_ok = F.when(
        raw_s.isNull(),
        F.raise_error(
            F.concat(
                F.lit(
                    f"budget_select: {score_col} must be a non-null "
                    "integer-castable score, got "
                ),
                F.coalesce(F.col(score_col).cast("string"), F.lit("NULL")),
            )
        ).cast("long"),
    ).otherwise(raw_s)
    n_parts = df.rdd.getNumPartitions()
    ranged = (
        df.withColumn("_tok", t_ok)
        .withColumn("_sc", s_ok)
        .repartitionByRange(
            n_parts, F.col("_sc").desc(), F.col(id_col).asc()
        )
        .withColumn("_pid", F.spark_partition_id())
    )
    win = (
        Window.partitionBy("_pid")
        .orderBy(F.col("_sc").desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # REQUIRED for correctness, not a perf nicety: the windowed frame
    # feeds both the result join and the partition-totals aggregate, and
    # an unpersisted repartitionByRange re-SAMPLES its boundaries per
    # consuming branch — two executions can assign different _pids and
    # the offsets would not match the rows they offset. Store once
    # (DISK_ONLY: corpus-sized), read from both branches.
    within = ranged.withColumn(
        "_cum", F.sum("_tok").over(win)
    ).localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
    totals = within.groupBy("_pid").agg(F.sum("_tok").alias("_ptot"))
    # numPartitions-sized frame: the one single-task window in the plan
    # runs over ≤ numPartitions rows, never corpus rows
    off_win = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.select(
        "_pid",
        (F.sum("_ptot").over(off_win) - F.col("_ptot")).alias("_off"),
    )
    return (
        within.join(F.broadcast(offsets), "_pid")
        .withColumn(flag_name, (F.col("_off") + F.col("_cum")) <= budget)
        .drop("_pid", "_cum", "_off", "_tok", "_sc")
    )
