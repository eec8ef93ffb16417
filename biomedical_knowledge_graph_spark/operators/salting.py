"""Skew-key salting utility (SURVEY.md §4 "skew handling").

AQE skew-join splitting handles moderately skewed *sort-merge* joins; for
extreme hub keys (head domains, high-frequency entities per the north_rule)
we salt explicitly: the skewed side gets a random-but-deterministic salt in
[0, n), the replicated side is exploded across all n salts, and the join key
becomes (key, salt). Deterministic salting (hash of a stable column, not
rand()) keeps reruns reproducible — a requirement of the resume contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salt_skewed(
    fact: DataFrame,
    replicated: DataFrame,
    key: str,
    salt_from: str,
    n_salts: int = 16,
    salt_col: str = "_salt",
) -> tuple[DataFrame, DataFrame]:
    """Return (salted_fact, exploded_replicated) ready to equi-join on
    [key, salt_col].

    ``salt_from`` is a stable column on the fact side (e.g. doc id) hashed
    to pick the salt — deterministic across runs, unlike ``F.rand()``."""
    salted = fact.withColumn(
        salt_col, F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts)).cast("int")
    )
    # NB: a generator (explode) cannot be nested inside another expression
    # (e.g. .cast) — explode first, the sequence of int literals is already
    # int-typed
    exploded = replicated.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted, exploded
