"""Skew mitigation: key salting for hot-key aggregations and joins.

AQE's skew-join splitting handles most cases at runtime
(spark.sql.adaptive.skewJoin.enabled, on in session.py); salting is
the explicit fallback when one key dominates so heavily that even
split shuffle blocks overload (the classic power-law hot key at
100 TB).

Pattern: aggregate in two stages — first on (key, salt) so the hot
key's rows spread over N reducers, then on key to combine the partial
results. Works for any algebraic aggregate; the decimal-exact sums
(functions/stable.py) stay exact through both stages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16, col_name: str = "_salt") -> DataFrame:
    """Add a salt in [0, n_salts) that spreads EVERY row, including
    identical duplicates of a hot key.

    Hashing row contents would map duplicate rows (the defining shape
    of a pathological hot key) to one salt bucket and defeat the
    spread; a per-row id does not. The id is partition-dependent, so
    salt VALUES vary between runs — callers must only use the salt as
    an opaque spreading key (salted_sum's result is salt-invariant:
    decimal addition is associative/commutative)."""
    return df.withColumn(
        col_name, F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )


def salted_sum(
    df: DataFrame,
    key: str,
    value: Column,
    out: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage exact sum over a (possibly) hot key: spread each key
    over n_salts reducers, then combine. Exact integer (two-limb
    decimal) staging, so the result is identical to the direct
    wide-domain sum regardless of split — and cross-engine portable
    out to |x| < 2^40·1e9 (r14: stable.py::dsum_wide's quantize/split
    program, carried as the (Σh, Σl) limb pair through BOTH stages
    and recombined only at the end; the r13 DECIMAL(27,6) staging
    inherited dsum's input-cast drift above ~5e9)."""
    from map_reduce_subnet_spark.functions.stable import (
        WIDE_SHIFT,
        _finite,
        _wide_limbs,
    )

    scale = float(2**WIDE_SHIFT)
    h, l = _wide_limbs(_finite(value), WIDE_SHIFT)
    salted = with_salt(df, n_salts)
    stage1 = salted.groupBy(key, "_salt").agg(
        F.sum(h).alias("_ph"), F.sum(l).alias("_pl")
    )
    return stage1.groupBy(key).agg(
        (
            (
                F.sum("_ph").cast("double") * F.lit(scale)
                + F.sum("_pl").cast("double")
            )
            / F.lit(1e6)
        ).alias(out)
    )
