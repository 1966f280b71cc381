"""Family G — set operations (SURVEY.md §2.2.G).

Grounding: merging chunk streams (reference README.md:20 → union),
snapshot overlap across resyncs (reference neurons/miner.py:179-180 →
intersect), deregistration diff (reference neurons/miner.py:96-98 →
except), redundant chunk dedup (reference README.md:18 → distinct /
keep-one-per-key).

Dedup is expressed as row_number()=1 rather than dropDuplicates():
dropDuplicates keeps an arbitrary row per key (first seen per task —
nondeterministic under shuffle), row_number pins which row survives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from map_reduce_subnet_spark.operators.registry import query
from map_reduce_subnet_spark.sources.tables import load_table


@query(
    "setop_union_all",
    oracle="""
SELECT event_id, event_type, value FROM events WHERE event_type = 'click'
UNION ALL
SELECT event_id, event_type, value FROM events WHERE event_type = 'view'
""",
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union of two slices (merging chunk streams)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    return ev.where(F.col("event_type") == "click").unionByName(
        ev.where(F.col("event_type") == "view")
    )


@query(
    "setop_intersect",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'
""",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers active in both periods (set semantics)."""
    o = load_table(spark, sf_dir, "orders")
    early = o.where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    ).select("o_custkey")
    late = o.where(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    ).select("o_custkey")
    return early.intersect(late)


@query(
    "setop_except",
    oracle="""
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-07-01'
EXCEPT
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-07-01' AND o_orderdate < TIMESTAMP '1996-01-01'
""",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn: customers ordering in H1-1995 but not H2-1995."""
    o = load_table(spark, sf_dir, "orders")
    h1 = o.where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"))
    ).select("o_custkey")
    h2 = o.where(
        (F.col("o_orderdate") >= F.lit("1995-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    ).select("o_custkey")
    # subtract == EXCEPT DISTINCT (set semantics, matching the oracle)
    return h1.subtract(h2)


@query(
    "setop_dedup",
    oracle="""
SELECT l_orderkey, l_linenumber, l_partkey
FROM (
    SELECT l_orderkey, l_linenumber, l_partkey,
           ROW_NUMBER() OVER (PARTITION BY l_orderkey
                              ORDER BY l_linenumber, l_partkey) AS rn
    FROM lineitem
) WHERE rn = 1
""",
)
def setop_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep exactly one row per key, deterministically (redundant-chunk
    dedup). The sort key covers every output column: even when rows tie
    on the full key, the surviving values are identical — survivor
    choice can never depend on shuffle order."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
    return (
        li.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("l_orderkey", "l_linenumber", "l_partkey")
    )


@query(
    "setop_except_all",
    oracle="""
SELECT user_id FROM events WHERE event_type <> 'purchase'
EXCEPT ALL
SELECT user_id FROM events WHERE event_type = 'click'
""",
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (EXCEPT ALL): per-value multiplicities
    subtract instead of collapsing to set semantics — the form that
    preserves counts when diffing two event feeds (a plain EXCEPT
    would hide how MANY occurrences disappeared). Spark plans it as
    one aggregate per side + a multiplicity join, all
    partial-aggregated."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") != "purchase").select("user_id")
    b = ev.where(F.col("event_type") == "click").select("user_id")
    return a.exceptAll(b)


@query(
    "setop_intersect_all",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT ALL
SELECT user_id FROM events WHERE event_type = 'view'
""",
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersection (INTERSECT ALL): keeps min(count_a,
    count_b) copies per value — the overlap measure that answers "how
    many click events came from users who also view" with
    multiplicity, not just membership."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "click").select("user_id")
    b = ev.where(F.col("event_type") == "view").select("user_id")
    return a.intersectAll(b)
