"""Scale smoke: the flagship plan shape over 10M generated rows with
closed-form expected values.

The fixtures top out at 600k rows; this test runs the same
partial-agg → shuffle → final-agg shape over spark.range(10M) where
every aggregate has an analytic answer — no oracle engine needed, and
the decimal-exact sums must hit the closed form EXACTLY.
"""

from __future__ import annotations

import pyspark.sql.functions as F

N = 10_000_000
K = 8  # groups


def test_flagship_shape_10m_rows_exact(spark):
    df = (
        spark.range(N)
        .withColumn("g", (F.col("id") % K).cast("int"))
        .withColumn("v", F.col("id").cast("double") / 100.0)
    )
    got = {
        r["g"]: r
        for r in df.groupBy("g")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("v").cast("decimal(27,6)")).cast("double").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    assert len(got) == K
    per_group = N // K
    for g in range(K):
        # ids in group g: g, g+K, g+2K, ... ; v = id/100
        # sum = (per_group*g + K*per_group*(per_group-1)/2) / 100
        total_ids = per_group * g + K * per_group * (per_group - 1) // 2
        # v = id/100 has at most 2 decimals -> decimal(27,6) sums exactly
        expect_s = total_ids / 100.0
        row = got[g]
        assert row["n"] == per_group
        assert row["s"] == expect_s, f"group {g}: {row['s']} != {expect_s}"
        assert row["mn"] == g / 100.0
        assert row["mx"] == (N - K + g) / 100.0


def test_window_shape_wide_groups(spark):
    """Partitioned window over 1M rows x 100 groups: rank of each row
    within its group has a closed form when values are the row ids."""
    from pyspark.sql import Window

    n, k = 1_000_000, 100
    df = spark.range(n).withColumn("g", (F.col("id") % k).cast("int"))
    w = Window.partitionBy("g").orderBy("id")
    ranked = df.withColumn("rn", F.row_number().over(w))
    # row_number of id within group g = id div k + 1
    bad = ranked.where(
        F.col("rn") != (F.col("id") / k).cast("long") + 1
    ).count()
    assert bad == 0
