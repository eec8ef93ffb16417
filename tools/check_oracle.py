"""Local replica of the driver's correctness gate: run every registry query
on Spark and its oracle on DuckDB at sf0.01, compare row counts, column
names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from biomedical_knowledge_graph_spark.queries import REGISTRY  # noqa: E402
from biomedical_knowledge_graph_spark.session import get_spark  # noqa: E402
from biomedical_knowledge_graph_spark.sources.testdata import TABLES  # noqa: E402


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].round(6)
        elif str(pdf[c].dtype).startswith("datetime"):
            pdf[c] = pdf[c].astype("datetime64[us]")
        if pdf[c].dtype.kind in "iu":
            pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values(list(pdf.columns), ignore_index=True)


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> str:
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return f"SCHEMA MISMATCH spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
    # dtype parity BEFORE normalization — a duckdb HUGEINT/float64 against a
    # Spark int64 may value-hash differently in the driver even if equal
    for c in sorted(spark_pdf.columns):
        ks, ko = spark_pdf[c].dtype.kind, oracle_pdf[c].dtype.kind
        if ks != ko:
            return f"DTYPE MISMATCH col={c} spark={spark_pdf[c].dtype} oracle={oracle_pdf[c].dtype}"
    if len(spark_pdf) != len(oracle_pdf):
        return f"ROWCOUNT MISMATCH spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if a[c].dtype.kind == "f":
            bad = [
                i
                for i in range(len(av))
                if not (
                    (math.isnan(av[i]) and math.isnan(bv[i]))
                    or abs(av[i] - bv[i]) <= 1e-9 * max(1.0, abs(bv[i]))
                )
            ]
        else:
            bad = [
                i
                for i in range(len(av))
                if not (
                    (pd.isna(av[i]) and pd.isna(bv[i])) or av[i] == bv[i]
                )
            ]
        if bad:
            i = bad[0]
            return (
                f"VALUE MISMATCH col={c} at {len(bad)} rows; first: "
                f"spark={a.iloc[i].to_dict()} oracle={b.iloc[i].to_dict()}"
            )
    return "OK"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(REGISTRY)
    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    failures = 0
    for name in names:
        q = REGISTRY[name]
        try:
            spark_pdf = q.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"{name:35s} SPARK ERROR: {e}")
            failures += 1
            continue
        if q.oracle is None:
            print(f"{name:35s} rows-only: {len(spark_pdf)} rows")
            continue
        try:
            oracle_pdf = con.sql(q.oracle).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name:35s} ORACLE ERROR: {e}")
            failures += 1
            continue
        verdict = compare(name, spark_pdf, oracle_pdf)
        print(f"{name:35s} {verdict}  ({len(spark_pdf)} rows)")
        if verdict != "OK":
            failures += 1
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
