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


def centroid_array(cents_df) -> Column:
    """Collapse a tiny centroid frame (cent_id, cent) into ONE row
    holding array<struct<cent_id, cent>> sorted by cent_id — the
    broadcast side of shuffle-free assignment (nearest_centroid).
    The single-partition exchange this agg implies moves only the
    centroid rows (8 here), never the corpus."""
    return cents_df.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("cent_id"), F.col("cent")))
        ).alias("cents")
    )


def nearest_centroid(vec: Column, cents: Column) -> Column:
    """Argmax-cosine centroid assignment as a single per-row fold —
    struct<cos double, cent_id long> of the centroid nearest to
    ``vec`` out of an array<struct<cent_id, cent>> column (sorted by
    cent_id, see centroid_array).

    This replaces the row_number()-over-Window argmax, which forced a
    full hash shuffle of corpus×n_centroids rows just to reduce
    n_centroids rows per key: here the centroids ride a broadcast
    one-row frame and the argmax runs inside the row — ZERO exchanges
    on the corpus path, the plan that survives 100 TB.

    Tie/edge semantics exactly match the old
    (cos desc, cent_id asc) window order: each cosine is computed
    once (transform), the fold keeps the EARLIEST (lowest cent_id) on
    exact ties via strict >, Spark orders NaN above every real so a
    NaN cosine wins just as it led the desc sort, a NULL cosine
    (zero-norm side, try_divide) loses to any real value, and an
    all-NULL row yields the first centroid with cos NULL — the
    nulls-last desc window picked the same.

    Caller contract (invariant #13): pass ``vec`` and ``cents`` as
    PLAIN column references (every registry caller does) — ``vec`` is
    captured inside the transform lambda, and a captured non-trivial
    expression re-evaluates once per centroid element; a computed
    vector must be materialized through a projection first."""
    scored = F.transform(
        cents,
        lambda c: F.struct(
            cosine(vec, c["cent"]).alias("cos"),
            c["cent_id"].cast("long").alias("cent_id"),
        ),
    )
    return F.aggregate(
        scored,
        F.struct(
            F.lit(None).cast("double").alias("cos"),
            F.lit(None).cast("long").alias("cent_id"),
        ),
        lambda acc, x: F.when(
            acc["cent_id"].isNull()  # seed with the first element
            | (x["cos"] > acc["cos"])  # strict: earliest wins ties
            | (acc["cos"].isNull() & x["cos"].isNotNull()),
            x,
        ).otherwise(acc),
    )


def int8_dequantized(col: Column) -> Column:
    """Symmetric per-vector int8 quantize→dequantize roundtrip
    (scale = max|x| / 127, dequantize = round(x / scale) · scale) as a
    pure array transform — JVM-side, no Python. The column this
    returns is what a deployment that stores its corpus quantized
    actually searches over, so recall measurements
    (sim_quantized_recall, sim_ann_recall's lsh_int8_quant leg) run
    their candidate generation AND scoring on it. A zero vector keeps
    scale 0 and dequantizes to zeros instead of dividing by zero.

    LET-BINDING, load-bearing (r12 HOF audit — invariant #13, the
    shingles() lesson): ``scale`` embeds array_max over the WHOLE
    vector, and an expression captured inside a HOF lambda
    re-evaluates PER ELEMENT — the previous form recomputed the
    array_max pass for every component, O(dim²) multiply-abs per row
    (64× waste at dim 64; 1024-dim production embeddings pay 1M ops
    per row instead of 1k). Binding scale once as a lambda variable
    (transform over a one-element array, the SQL-level let) makes the
    roundtrip linear; output identical (equivalence + linearity pins
    in tests/test_properties.py)."""

    def _dq(scale: Column) -> Column:
        return F.when(
            scale == F.lit(0.0), F.transform(col, lambda x: F.lit(0.0))
        ).otherwise(
            F.transform(
                col, lambda x: F.round(x.cast("double") / scale) * scale
            )
        )

    absmax = F.array_max(F.transform(col, lambda x: F.abs(x.cast("double"))))
    return F.flatten(F.transform(F.array(absmax / F.lit(127.0)), _dq))


def hyperplane_matrix(
    dim: int, n_bits: int, seed: int = 42
) -> list[list[float]]:
    """Deterministic Rademacher (±1) hyperplane entries, indexed
    [component j][bit i]. A 32-bit integer avalanche mix (xxhash-style
    finalizer constants) — pure Python arithmetic, so the matrix is
    bit-stable across platforms and library versions and cheap enough
    to materialize at plan-build time (dim × n_bits literals)."""
    cols = []
    for j in range(dim):
        col = []
        for i in range(n_bits):
            x = (
                i * 0x9E3779B1 + j * 0x85EBCA6B + seed * 0xC2B2AE35
            ) & 0xFFFFFFFF
            x ^= x >> 16
            x = (x * 0x045D9F3B) & 0xFFFFFFFF
            x ^= x >> 16
            col.append(1.0 if x & 1 else -1.0)
        cols.append(col)
    return cols


def sign_sketch(
    a: Column,
    n_bits: int = 16,
    seed: int = 42,
    max_dim: int = 64,
    matrix: Column | None = None,
) -> Column:
    """Random-hyperplane sign sketch (SimHash for vectors): bit i is
    the sign of ⟨a, h_i⟩ where h_i is a deterministic Rademacher (±1)
    hyperplane (hyperplane_matrix). Every component contributes to
    every bit — unlike an axis-aligned first-n-components sketch,
    correlated leading dimensions in real embeddings cannot unbalance
    the buckets. Vectors with high cosine share most sign bits, so
    bucketing on bands of this sketch yields near-dup candidates
    without a cross join.

    All n_bits projections accumulate in ONE aggregate pass (array
    state, zip_with add), so per-row work is O(dim × n_bits)
    multiply-adds and nothing is hashed at runtime (computing the
    entries per row — xxhash64 per (bit, component) — measured
    ~5 ms/row at 64×64). ``max_dim`` is the component budget (set it
    to the embedding dim of the deployment); components beyond it
    don't contribute.

    Pass ``matrix`` (an array<array<double>> column, e.g. a
    broadcast-joined one-row frame built from hyperplane_matrix) for
    production sketch widths: inlining 64×64 entries as plan literals
    makes analysis/codegen the dominant cost (~6.6 s vs ~1.4 s for
    2000 rows, measured) — as DATA the plan stays small. With
    ``matrix=None`` the literal form is used, which is fine for small
    n_bits × max_dim.

    Returns LONG: a 32-bit sketch in an int would shiftleft into the
    sign bit and flip negative. An empty vector projects to 0 on every
    hyperplane (all-ones sketch) instead of crashing; a NULL *element*
    inside the vector is coalesced to 0.0 (no contribution), so a
    vector with one missing component still sketches from its
    remaining components instead of collapsing to a degenerate
    all-zero-projection bucket."""
    M = (
        matrix
        if matrix is not None
        else F.array(
            *[
                F.array(*[F.lit(v) for v in col])
                for col in hyperplane_matrix(max_dim, n_bits, seed)
            ]
        )
    )
    zeros = F.array_repeat(F.lit(0.0), n_bits)
    # per component j: its contribution vector x_j * H[j][*] (NULL past
    # max_dim → coalesce to zeros, i.e. no contribution)
    contribs = F.transform(
        a,
        lambda x, j: F.coalesce(
            F.transform(
                F.try_element_at(M, j + F.lit(1)),
                lambda h: F.coalesce(x.cast("double"), F.lit(0.0)) * h,
            ),
            zeros,
        ),
    )
    projs = F.aggregate(
        contribs, zeros, lambda acc, c: F.zip_with(acc, c, lambda p, q: p + q)
    )
    return F.aggregate(
        projs,
        F.lit(0).cast("long"),
        lambda acc, p: F.shiftleft(acc, 1)
        + F.when(p >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")),
    )


def band_struct_array(sk: Column, n_bits: int, band_bits: int) -> Column:
    """Array of (band, bucket) structs cut from a sign sketch — the
    banding step of sketch-LSH (band count = n_bits / band_bits,
    bucket = that band's bits). Shared by the LSH top-k, the recall
    harness and the near-dup queries so the band arithmetic cannot
    drift between them."""
    mask = (1 << band_bits) - 1
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(sk, b * band_bits)
                .bitwiseAND(F.lit(mask))
                .alias("bucket"),
            )
            for b in range(n_bits // band_bits)
        ]
    )


def perturbed_buckets(bucket: Column, band_bits: int) -> Column:
    """The bucket plus every Hamming-distance-1 neighbor (band_bits
    single-bit flips) — multi-probe LSH (Lv et al., VLDB 2007): a
    near neighbor whose sketch differs in exactly one bit of a band
    lands one flip away, so probing the perturbed buckets lifts
    recall without adding hash tables. Candidate cost rises by
    (band_bits + 1)x bucket occupancy, still corpus-size-independent."""
    return F.array(
        bucket, *[bucket.bitwiseXOR(F.lit(1 << i)) for i in range(band_bits)]
    )
