"""Hash-stable numeric helpers for the differential oracle.

The correctness harness value-hashes Spark results against DuckDB.
Floating-point SUM/AVG over large inputs is order-dependent (different
partial-aggregation trees ⇒ different low bits; at sf0.1 a SUM of 600k
~5e4-magnitude doubles can drift ~1e-2 between engines), so rounding
alone cannot make the hash deterministic at scale.

Strategy (applied identically on both sides):
    1. per-row arithmetic stays in double (IEEE-deterministic: same
       expression, same operand order ⇒ bit-identical in both engines);
    2. cast the summand to ``DECIMAL(27,6)`` *before* SUM — decimal
       addition is exact integer arithmetic, so the aggregate is
       order-independent and scale-independent;
    3. cast the exact decimal result back to DOUBLE for the output
       schema (nearest-double of an exact value is deterministic).

This mirrors the reference's exact-match oracle discipline (reference
neurons/validator.py:138-141 scores only exact responses) without
giving up distributed partial aggregation: decimal sums still combine
map-side (HashAggregate partial → final), so the factor-K bandwidth
win of partial aggregation (reference README.md:20,22) is preserved.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 21 integer digits + 6 fraction digits: exact for |x| < 1e21 summands;
# Spark widens sum(decimal(27,6)) within decimal(38,6) bounds for ~1e11
# rows per group — ample at 100 TB.
SUM_DECIMAL = "decimal(27,6)"


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent SUM: decimal-exact, surfaced as double."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(SUM_DECIMAL)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent AVG: exact decimal sum / count, as double."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(SUM_DECIMAL)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def dstddev(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent sample stddev via exact decimal moments.

    sqrt((Σx² − (Σx)²/n) / (n−1)) with both sums decimal-exact; the
    final double arithmetic is deterministic given identical inputs.
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.count(c).cast("double")
    sx = F.sum(c.cast(SUM_DECIMAL)).cast("double")
    # x² in double first (deterministic per-row), then exact sum at
    # scale 6 — cast rounds identically (half-up) in Spark and DuckDB.
    sxx = F.sum((c * c).cast(SUM_DECIMAL)).cast("double")
    var = (sxx - (sx * sx) / n) / (n - F.lit(1.0))
    out = F.round(F.sqrt(var), 6)
    return out.alias(alias) if alias else out


def sql_dsum(expr: str) -> str:
    """DuckDB mirror of :func:`dsum` for oracle strings."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(27,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB mirror of :func:`davg`."""
    return f"(CAST(SUM(CAST(({expr}) AS DECIMAL(27,6))) AS DOUBLE) / COUNT({expr}))"


def sql_dstddev(expr: str) -> str:
    """DuckDB mirror of :func:`dstddev`."""
    sx = f"CAST(SUM(CAST(({expr}) AS DECIMAL(27,6))) AS DOUBLE)"
    sxx = f"CAST(SUM(CAST((({expr}) * ({expr})) AS DECIMAL(27,6))) AS DOUBLE)"
    n = f"CAST(COUNT({expr}) AS DOUBLE)"
    return f"ROUND(SQRT((({sxx}) - ({sx}) * ({sx}) / ({n})) / (({n}) - 1.0)), 6)"
