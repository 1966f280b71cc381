"""Null-semantics differential tests.

The fixtures carry no NULLs, so these tests inject them (NULLIF on a
value-dependent predicate) and check the classically divergent corners
against DuckDB: grouping by a null key, equi-joins never matching on
null, aggregate null-skipping, and null ordering inside window sorts.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from map_reduce_subnet_spark.sources.tables import load_table
from tests.conftest import SF_DIR, assert_frames_match


def test_group_by_null_key(spark, ddb):
    """NULL is a group of its own in both engines."""
    li = load_table(spark, SF_DIR, "lineitem")
    got = (
        li.withColumn("flag", F.nullif(F.col("l_returnflag"), F.lit("A")))
        .groupBy("flag")
        .agg(F.count("*").alias("n"), F.count("flag").alias("n_nonnull"))
        .toPandas()
    )
    want = ddb.sql(
        """
        SELECT NULLIF(l_returnflag, 'A') AS flag,
               COUNT(*) AS n, COUNT(NULLIF(l_returnflag, 'A')) AS n_nonnull
        FROM lineitem GROUP BY 1
        """
    ).df()
    assert_frames_match(got, want, "group_by_null_key")


def test_join_on_null_never_matches(spark, ddb):
    """Equi-join keys that are NULL match nothing (not even NULL)."""
    o = load_table(spark, SF_DIR, "orders")
    cu = load_table(spark, SF_DIR, "customer")
    o_nulled = o.withColumn(
        "k", F.when(F.col("o_orderkey") % 3 == 0, None).otherwise(F.col("o_custkey"))
    )
    got = (
        o_nulled.join(cu, o_nulled.k == cu.c_custkey, "left")
        .groupBy()
        .agg(
            F.count("*").alias("n_rows"),
            F.count("c_custkey").alias("n_matched"),
        )
        .toPandas()
    )
    want = ddb.sql(
        """
        SELECT COUNT(*) AS n_rows, COUNT(c_custkey) AS n_matched
        FROM (SELECT CASE WHEN o_orderkey % 3 = 0 THEN NULL
                          ELSE o_custkey END AS k
              FROM orders) o
        LEFT JOIN customer ON o.k = c_custkey
        """
    ).df()
    assert_frames_match(got, want, "join_null_never_matches")


def test_aggregates_skip_nulls(spark, ddb):
    """SUM/AVG/MIN ignore NULLs; COUNT(*) does not; all-null group
    sums are NULL (not 0)."""
    li = load_table(spark, SF_DIR, "lineitem")
    got = (
        li.withColumn("q", F.nullif(F.col("l_quantity") > 25, F.lit(False)))
        .withColumn(
            "v", F.when(F.col("l_quantity") > 25, F.col("l_extendedprice"))
        )
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.count("v").alias("n_v"),
            F.sum(F.col("v").cast("decimal(27,6)")).cast("double").alias("s"),
            F.min("v").alias("mn"),
        )
        .toPandas()
    )
    want = ddb.sql(
        """
        SELECT l_returnflag, COUNT(*) AS n, COUNT(v) AS n_v,
               CAST(SUM(CAST(v AS DECIMAL(27,6))) AS DOUBLE) AS s, MIN(v) AS mn
        FROM (SELECT l_returnflag,
                     CASE WHEN l_quantity > 25 THEN l_extendedprice END AS v
              FROM lineitem)
        GROUP BY l_returnflag
        """
    ).df()
    assert_frames_match(got, want, "aggregates_skip_nulls")


def test_window_null_ordering(spark, ddb):
    """NULLS FIRST/LAST must be pinned explicitly — engine defaults
    differ (Spark: nulls first ASC; DuckDB: nulls last ASC)."""
    from pyspark.sql import Window

    ev = load_table(spark, SF_DIR, "events")
    nulled = ev.withColumn(
        "v", F.when(F.col("event_id") % 5 == 0, None).otherwise(F.col("value"))
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("v").asc_nulls_last(), F.col("event_id")
    )
    got = nulled.select(
        "event_id", F.row_number().over(w).alias("rn")
    ).toPandas()
    want = ddb.sql(
        """
        SELECT event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY CASE WHEN event_id % 5 = 0 THEN NULL
                                                ELSE value END ASC NULLS LAST,
                                           event_id) AS rn
        FROM events
        """
    ).df()
    assert_frames_match(got, want, "window_null_ordering")
