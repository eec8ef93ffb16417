"""Deterministic negative sampling for KG-embedding training.

TransE-family embedding trainers (the standard consumers of a
(subj, pred, obj) triple table like this engine's kg_triples output)
need k corrupted triples per positive: same subject and predicate, the
object replaced by a pseudo-random OTHER entity. At corpus scale the
sampling must be (a) a pure projection — no shuffle, no RNG state, no
driver loop — and (b) a pure function of the triple, so any re-run on
any cluster regenerates the identical training set (the same
reproducibility contract as sampling.py's split assignment).

Corruption rule (all BIGINT, engine-portable — the md5/instr arithmetic
family of textstats.qc_token_weight_sql):

    h        = first 12 md5 hex chars of 'neg-v1:subj:pred:obj:i'  (48 bits)
    neg_obj  = (obj + 1 + h % (n-1)) % n

The offset lives in [1, n-1], so ``neg_obj != obj`` by construction —
the rejection-free form of "draw until different". Entities are assumed
densely indexed [0, n); ``n`` rides a broadcast 1-row cross-join (the
vocab-scalar idiom — never a driver action), or a plain literal when
the caller already knows it.

The sampled negative may collide with ANOTHER true triple (the standard
"unfiltered" negative-sampling setting); filtering against the positive
set is one anti-join on (subj, pred, neg_obj) left to the caller, since
most trainers skip it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NEG_SALT = "neg-v1"
_HEX_CHARS = 12  # 48 bits: h % (n-1) is unbiased-enough and < 2^63


def _hex_to_int_sql(hex_expr: str, chars: int) -> str:
    """Engine-portable hex→int (Spark SQL and DuckDB share
    md5/substring/instr semantics; no conv() — DuckDB lacks it)."""
    terms = []
    for i in range(chars):
        digit = (
            f"(instr('0123456789abcdef', "
            f"substring({hex_expr}, {i + 1}, 1)) - 1)"
        )
        # CAST the power to BIGINT (portably — no 123L suffix in DuckDB):
        # an INT digit times an INT-ranged power literal overflows INT
        # under Spark's ANSI mode from 16^7 up
        terms.append(f"{digit} * CAST({16 ** (chars - 1 - i)} AS BIGINT)")
    return "(" + " + ".join(terms) + ")"


def negative_hash_sql(subj: str, pred: str, obj: str, idx: str) -> str:
    """The corruption hash as a SQL fragment shared verbatim with the
    DuckDB oracle."""
    return _hex_to_int_sql(
        f"md5(concat('{NEG_SALT}:', CAST({subj} AS STRING), ':', "
        f"CAST({pred} AS STRING), ':', CAST({obj} AS STRING), ':', "
        f"CAST({idx} AS STRING)))",
        _HEX_CHARS,
    )


def corrupt_tail_negatives(
    triples: DataFrame,
    entity_count: int | DataFrame,
    k: int = 2,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """k corrupted-tail triples per positive: output = input columns plus
    ``neg_idx`` (0..k-1) and ``neg_obj``. ``obj`` must be a dense entity
    index in [0, n); ``entity_count`` is n, as an int or a 1-row
    DataFrame with column ``n`` (broadcast in — the scale path when n
    comes from data)."""
    if k <= 0:
        raise ValueError(f"k must be positive: {k}")
    base = triples.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("neg_idx")
    )
    if isinstance(entity_count, DataFrame):
        base = base.crossJoin(F.broadcast(entity_count))
        n = F.col("n")
        drop_n = ["n"]
    else:
        if entity_count < 2:
            raise ValueError(
                f"entity_count must be >= 2 to corrupt: {entity_count}"
            )
        n = F.lit(int(entity_count))
        drop_n = []
    h = F.expr(negative_hash_sql(subj, pred, obj, "neg_idx"))
    # plain %, not pmod: every operand is provably non-negative, so
    # Spark and DuckDB agree (DuckDB has no pmod)
    neg = (F.col(obj) + 1 + h % (n - 1)) % n
    return base.withColumn("neg_obj", neg.cast("long")).drop(*drop_n)
