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
