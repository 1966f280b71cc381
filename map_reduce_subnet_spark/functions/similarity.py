"""Vector-similarity column builders (embedding column = array<float>).

Used by the family-K similarity/dedup queries. Everything here is
built-in higher-order functions over array columns — JVM-side, no
Python UDFs — so the dot products run inside codegen and scale with
partitioning, not with driver memory.

Scale design (100 TB): brute-force cosine is the correctness baseline;
the LSH/IVF variants bucket vectors so candidate generation is a
hash-partition join on bucket id instead of a cross join. See
operators/llm.py for the query-level composition.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two float-array columns.

    Elements are cast to double BEFORE the multiply (float×float
    truncates the product to float32 and diverges from engines that
    promote first — DuckDB's list_dot_product does); accumulation is a
    left-to-right double fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    """L2 norm of a float-array column (double promotion first)."""
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two float-array columns.

    try_divide: a zero-norm vector would otherwise RAISE
    DIVIDE_BY_ZERO under Spark 4's default ANSI mode (not produce
    NaN) and abort the whole job; NULL instead, which every
    threshold/ordering consumer drops naturally."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def sign_sketch(a: Column, n_bits: int = 16) -> Column:
    """Sign-bit sketch of the first ``n_bits`` components — a
    deterministic random-hyperplane LSH stand-in (axis-aligned
    hyperplanes). Vectors with high cosine share most sign bits, so
    bucketing on bands of this sketch yields near-dup candidates
    without a cross join.

    Returns LONG: a 32-bit sketch in an int would shiftleft into the
    sign bit and flip negative."""
    # try_element_at: out-of-range gives NULL (ANSI element_at raises),
    # so short/empty vectors degrade to 0-bits instead of crashing
    bit = lambda i: F.when(F.try_element_at(a, F.lit(i + 1)) >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))  # noqa: E731
    out = F.lit(0).cast("long")
    for i in range(n_bits):
        out = F.shiftleft(out, 1) + bit(i)
    return out
