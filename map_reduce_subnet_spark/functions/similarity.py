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


def sign_sketch(a: Column, n_bits: int = 16, seed: int = 42) -> Column:
    """Random-hyperplane sign sketch (SimHash for vectors): bit i is
    the sign of ⟨a, h_i⟩ where h_i is a deterministic Rademacher (±1)
    hyperplane seeded by xxhash64(seed, i, component_index). Every
    component contributes to every bit — unlike an axis-aligned
    first-n-components sketch, correlated leading dimensions in real
    embeddings cannot unbalance the buckets. Vectors with high cosine
    share most sign bits, so bucketing on bands of this sketch yields
    near-dup candidates without a cross join.

    Pure built-in HOFs (one aggregate per bit, JVM-side codegen):
    per-row cost is O(n_bits × dim) multiply-adds, no Python, no
    shuffle. Returns LONG: a 32-bit sketch in an int would shiftleft
    into the sign bit and flip negative. An empty/NULL-ish vector
    projects to 0 on every hyperplane (all-ones sketch) instead of
    crashing."""

    def proj(i: int) -> Column:
        # transform's two-arg lambda receives (element, 0-based index);
        # the hash of (seed, bit, index) gives the ±1 hyperplane entry
        return F.aggregate(
            F.transform(
                a,
                lambda x, j: x.cast("double")
                * F.when(
                    F.pmod(F.xxhash64(F.lit(seed), F.lit(i), j), F.lit(2)) == 0,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0)),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    out = F.lit(0).cast("long")
    for i in range(n_bits):
        bit = (
            F.when(proj(i) >= 0, F.lit(1).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
        out = F.shiftleft(out, 1) + bit
    return out
