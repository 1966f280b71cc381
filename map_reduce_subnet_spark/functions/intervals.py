"""Binned interval algebra — the shuffle-safe plans for interval
workloads at 100 TB.

The naive interval-overlap join is a cross join with a theta
predicate — quadratic in corpus size. The standard scale rewrite
(used by every distributed range-join implementation) is time
binning: explode each interval into the fixed-width buckets it
covers, equi-join on the bucket (hash-shuffleable), and re-check the
exact predicate on the co-bucketed candidates. The subtlety is
exactly-once semantics: two overlapping intervals can share MANY
buckets. Rather than a distinct (an extra shuffle over the result),
each pair is attributed to the single bucket containing
GREATEST(start_a, start_b) — an instant that provably lies inside any
non-empty overlap, so every overlapping pair survives in exactly one
bucket and non-overlapping pairs in none.

Grounding: the staleness-overlap test of reference
neurons/validator.py:166-170, generalized from point-in-window to
interval×interval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_buckets(df: DataFrame, s: str, e: str, width: int) -> DataFrame:
    """Add a ``bucket`` column exploding [s, e] (inclusive, integer
    units) into the width-sized buckets the interval covers.

    Fan-out is ceil(len/width)+1 rows per interval — bounded when
    interval length is bounded, the analogue of the LSH band caps.
    Floor division (F.floor on true division) keeps negative
    coordinates correct (integer ``/`` in Spark truncates toward
    zero, which mis-buckets negatives)."""
    return df.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col(s) / width).cast("long"),
                F.floor(F.col(e) / width).cast("long"),
            )
        ).alias("bucket"),
    )


def overlap_join(
    a: DataFrame,
    b: DataFrame,
    width: int,
    a_cols: tuple[str, str, str] = ("a_id", "a_s", "a_e"),
    b_cols: tuple[str, str, str] = ("b_id", "b_s", "b_e"),
) -> DataFrame:
    """Exactly-once interval-overlap join of (id, start, end) frames.

    Both sides explode into buckets, equi-join on the bucket, then
    keep a candidate pair iff the closed intervals truly overlap AND
    the bucket is the one containing GREATEST(starts). Output columns:
    both ids plus ``overlap`` = LEAST(ends) − GREATEST(starts).

    The join is a plain hash-partitioned equi join: it survives any
    scale where per-bucket occupancy is bounded (pick ``width`` near
    the typical interval length — too small multiplies fan-out, too
    large multiplies candidates, same trade as LSH band width)."""
    a_id, a_s, a_e = a_cols
    b_id, b_s, b_e = b_cols
    ax = explode_buckets(a, a_s, a_e, width)
    bx = explode_buckets(b, b_s, b_e, width)
    g_start = F.greatest(F.col(a_s), F.col(b_s))
    return (
        ax.join(bx, "bucket")
        .where(
            (F.col(a_s) <= F.col(b_e))
            & (F.col(b_s) <= F.col(a_e))
            & (F.col("bucket") == F.floor(g_start / width).cast("long"))
        )
        .select(
            a_id,
            b_id,
            (F.least(F.col(a_e), F.col(b_e)) - g_start).alias("overlap"),
        )
    )
