"""As-of join — a custom operator Spark lacks natively (the canonical
example of the applyInPandas escape hatch; preference order per the build
guide: compose built-ins → applyInPandas → mapPartitions).

Semantics: for each left row, attach the latest right row with
right.ts <= left.ts within the same key (pandas ``merge_asof`` backward
mode; ties on equal timestamps match).

Implementation: both sides are unioned with a side tag and co-partitioned
by key in ONE shuffle; each group is merge_asof'ed in an Arrow batch.
Group size bounds executor memory — a single giant key should be
range-bucketed first at true scale; AQE cannot split an applyInPandas
group.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_value_cols: list[str],
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join. Output columns: all left columns, then
    ``{ts}{suffix}`` (matched right timestamp; null when no right row is at
    or before the left timestamp) and ``{col}{suffix}`` for each right
    value column."""
    lcols = list(left.columns)
    out_fields = [
        f"`{f.name}` {f.dataType.simpleString()}" for f in left.schema.fields
    ]
    rtypes = {f.name: f.dataType for f in right.schema.fields}
    out_fields.append(f"`{ts}{suffix}` {rtypes[ts].simpleString()}")
    for c in right_value_cols:
        out_fields.append(f"`{c}{suffix}` {rtypes[c].simpleString()}")
    out_schema = ", ".join(out_fields)

    l2 = left.withColumn("_side", F.lit(0))
    r2 = right.select(key, ts, *right_value_cols).withColumn("_side", F.lit(1))
    for c in lcols:
        if c not in r2.columns:
            r2 = r2.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    for c in right_value_cols:
        if c not in l2.columns:
            l2 = l2.withColumn(c, F.lit(None).cast(rtypes[c]))
    both = l2.unionByName(r2.select(*l2.columns))

    renames = {ts: f"{ts}{suffix}", **{c: f"{c}{suffix}" for c in right_value_cols}}
    out_cols = [*lcols, f"{ts}{suffix}", *[f"{c}{suffix}" for c in right_value_cols]]

    def per_key(pdf: pd.DataFrame) -> pd.DataFrame:
        lp = pdf[pdf["_side"] == 0].sort_values(ts, kind="mergesort")
        if lp.empty:
            return pd.DataFrame({c: pd.Series(dtype=object) for c in out_cols})
        rp = (
            pdf[pdf["_side"] == 1]
            .sort_values(ts, kind="mergesort")[[ts, *right_value_cols]]
            .rename(columns=renames)
        )
        return pd.merge_asof(
            lp[lcols],
            rp,
            left_on=ts,
            right_on=f"{ts}{suffix}",
            direction="backward",
        )

    return both.groupBy(key).applyInPandas(per_key, schema=out_schema)


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_value_cols: list[str],
    suffix: str = "_right",
    n_buckets: int = 16,
    hot_threshold: int = 500_000,
    cold_groups: int | None = None,
) -> DataFrame:
    """As-of join that stays scale-safe under a giant key.

    ``asof_join`` groups by key alone, so one hot key (one user producing
    ~all events) lands in one applyInPandas group = one task = one executor
    OOM; AQE cannot split a pandas group. Here keys whose row count exceeds
    ``hot_threshold`` are additionally range-bucketed on time: global ts
    cut points (approxQuantile over both sides, one pass) split a hot key
    into ≤ ``n_buckets`` groups, so per-group size is bounded by the time
    distribution, not the key distribution.

    ONLY hot keys are bucketed: bucketing everything multiplies the pandas
    group count by n_buckets and the per-group Python invocation overhead
    dominates (measured 6× slower on a uniform key distribution); normal
    keys keep their single group, and the hot-key table (keys above the
    threshold — tiny by the definition of skew) rides a broadcast join.

    Boundary rule: a left row early in bucket b may need the latest right
    row from an earlier bucket, so for every (hot key, earlier-bucket) the
    last right row is replicated forward into each later bucket and deduped
    to the latest per (key, target-bucket) before the merge — ≤ one carried
    right row per (key, bucket). Output and semantics are identical to
    ``asof_join`` (backward, ties match).

    Group-count design (round 3): pandas invocation overhead is per
    GROUP, and grouping cold keys individually makes the group count the
    key cardinality — ~15 k Python crossings at sf0.1 and millions at
    corpus scale. ``merge_asof(by=key)`` matches per-key inside one
    frame, so correctness only needs "a left row and all right rows that
    can match it share a group" — ANY coarser grouping is valid. Cold
    keys therefore hash-coalesce into ``cold_groups`` composite groups
    (default 4× defaultParallelism; per-group size ≈ total/groups, skew-
    free since every member is below hot_threshold) and hot (key, bucket)
    units hash into a disjoint id space. Pandas crossings drop from
    O(#keys) to O(parallelism) — measured 8.8 s → 2.75 s on the sf0.1
    headline — and the per-group merge stays a single sorted
    ``merge_asof(by=)``.
    """
    lcols = list(left.columns)
    out_fields = [
        f"`{f.name}` {f.dataType.simpleString()}" for f in left.schema.fields
    ]
    rtypes = {f.name: f.dataType for f in right.schema.fields}
    out_fields.append(f"`{ts}{suffix}` {rtypes[ts].simpleString()}")
    for c in right_value_cols:
        out_fields.append(f"`{c}{suffix}` {rtypes[c].simpleString()}")
    out_schema = ", ".join(out_fields)

    # hot keys: row count over both sides above the threshold — tiny table
    # by the definition of skew; broadcast-tagged onto every row
    counts = (
        left.select(key)
        .unionByName(right.select(key))
        .groupBy(key)
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") > hot_threshold)
        .select(key, F.lit(True).alias("_hot"))
    )

    # global time cut points from both sides (timestamps → epoch micros;
    # TIMESTAMP_NTZ needs an explicit cast before unix_micros)
    micros = f"unix_micros(cast(`{ts}` AS timestamp))"
    both_ts = left.select(F.expr(micros).alias("_t")).unionByName(
        right.select(F.expr(micros).alias("_t"))
    )
    probs = [i / n_buckets for i in range(1, n_buckets)]
    # n_buckets=1 degenerates to plain per-key grouping (empty probs would
    # NPE inside approxQuantile)
    cuts = (
        sorted(set(both_ts.approxQuantile("_t", probs, 0.001))) if probs else []
    )
    if cuts:
        arr = ", ".join(f"{int(c)}L" for c in cuts)
        raw_bucket = F.expr(f"size(filter(array({arr}), b -> b <= {micros}))")
    else:
        raw_bucket = F.lit(0)
    # cold keys stay in ONE group (bucket 0): bucketing everything would
    # multiply the pandas group count and its per-group Python overhead
    is_hot = F.coalesce(F.col("_hot"), F.lit(False))
    bucket_expr = F.when(is_hot, raw_bucket).otherwise(F.lit(0))

    l2 = (
        left.join(F.broadcast(counts), key, "left")
        .withColumn("_side", F.lit(0))
        .withColumn("_bkt", bucket_expr)
        .drop("_hot")
    )
    r_tagged = right.select(key, ts, *right_value_cols).join(
        F.broadcast(counts), key, "left"
    )
    r_base = r_tagged.withColumn("_bkt", bucket_expr).drop("_hot")
    # forward replication (hot keys only): last right row per (key, bucket),
    # carried into every later bucket, deduped to the latest per
    # (key, target bucket)
    from pyspark.sql import Window

    r_hot = r_tagged.filter(F.coalesce(F.col("_hot"), F.lit(False))).withColumn(
        "_bkt", raw_bucket
    ).drop("_hot")
    w = Window.partitionBy(key, "_bkt").orderBy(F.desc(ts))
    last_per = (
        r_hot.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    # guard: sequence(n, n-1) is the DESCENDING [n, n-1] in Spark — the last
    # bucket must replicate to no one, not back onto itself
    carried = (
        last_per.withColumn(
            "_tgt",
            F.explode(
                F.expr(
                    f"case when _bkt < {n_buckets - 1} then "
                    f"sequence(_bkt + 1, {n_buckets - 1}) else array() end"
                )
            ),
        )
        .drop("_bkt")
        .withColumnRenamed("_tgt", "_bkt")
    )
    w2 = Window.partitionBy(key, "_bkt").orderBy(F.desc(ts))
    carried = (
        carried.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    r2 = r_base.unionByName(carried).withColumn("_side", F.lit(1))
    for c in lcols:
        if c not in r2.columns:
            r2 = r2.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    for c in right_value_cols:
        if c not in l2.columns:
            l2 = l2.withColumn(c, F.lit(None).cast(rtypes[c]))
    both = l2.unionByName(r2.select(*l2.columns))

    # composite group id: cold keys hash-coalesce (merge_asof(by=) keeps
    # per-key semantics inside the group); hot (key, bucket) units live in
    # a disjoint id range — a hash collision there only merges two groups,
    # never changes results, because the by-key merge is key-exact
    if cold_groups is None:
        cold_groups = left.sparkSession.sparkContext.defaultParallelism * 4
    grp = F.when(
        is_hot,
        F.lit(cold_groups)
        + F.pmod(F.xxhash64(F.col(key), F.col("_bkt")), F.lit(1 << 30)),
    ).otherwise(F.pmod(F.xxhash64(F.col(key)), F.lit(cold_groups)))
    both = both.join(F.broadcast(counts), key, "left").withColumn(
        "_grp", grp
    ).drop("_hot")

    renames = {ts: f"{ts}{suffix}", **{c: f"{c}{suffix}" for c in right_value_cols}}
    out_cols = [*lcols, f"{ts}{suffix}", *[f"{c}{suffix}" for c in right_value_cols]]

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        lp = pdf[pdf["_side"] == 0].sort_values(ts, kind="mergesort")
        if lp.empty:
            return pd.DataFrame({c: pd.Series(dtype=object) for c in out_cols})
        rp = (
            pdf[pdf["_side"] == 1]
            .sort_values(ts, kind="mergesort")[[key, ts, *right_value_cols]]
            .rename(columns=renames)
        )
        if rp.empty:
            out = lp[lcols].copy()
            for c in [f"{ts}{suffix}", *[f"{c}{suffix}" for c in right_value_cols]]:
                out[c] = None
            return out
        return pd.merge_asof(
            lp[lcols],
            rp,
            left_on=ts,
            right_on=f"{ts}{suffix}",
            by=key,
            direction="backward",
        )

    return both.groupBy("_grp").applyInPandas(per_group, schema=out_schema)
