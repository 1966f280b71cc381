"""Warehouse-maintenance operators: argmax selection, upsert/merge,
tiered non-equi lookup, cogrouped transforms, sketch percentiles.

Grounding: "latest state wins" resync (reference neurons/validator.py:
166-168 — the metagraph snapshot replacing stale rows is an upsert),
stake-tier request classes (reference neurons/miner.py:117-137), and
the per-peer join of request and response streams (reference
neurons/validator.py:120-141 — the cogroup shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from map_reduce_subnet_spark.operators.registry import query
from map_reduce_subnet_spark.sources.tables import load_table


@query(
    "agg_max_by",
    oracle="""
SELECT l_returnflag, l_orderkey AS top_order, l_extendedprice AS top_price
FROM (
    SELECT l_returnflag, l_orderkey, l_extendedprice,
           ROW_NUMBER() OVER (PARTITION BY l_returnflag
                              ORDER BY l_extendedprice DESC, l_orderkey DESC)
               AS rn
    FROM lineitem
) WHERE rn = 1
""",
)
def agg_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmax per group with a DETERMINISTIC tie-break: max_by over a
    (price, orderkey) struct — bare max_by(x, price) picks an arbitrary
    row among equal prices, which shuffle order would decide."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr(
            "max_by(l_orderkey, struct(l_extendedprice, l_orderkey))"
        ).alias("top_order"),
        F.max("l_extendedprice").alias("top_price"),
    )


@query(
    "merge_upsert",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM (
    SELECT o_orderkey, o_orderstatus, o_totalprice, src,
           ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY src DESC)
               AS rn
    FROM (
        SELECT o_orderkey, o_orderstatus, o_totalprice, 0 AS src
        FROM orders
        UNION ALL
        SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice * 1.1
               AS o_totalprice, 1 AS src
        FROM orders WHERE o_orderkey % 10 = 0
    )
) WHERE rn = 1
""",
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-style MERGE: an updates stream (10% of keys, restated
    price) upserted over the base — union with a source marker, latest
    wins per key via row_number. This is the "resync replaces stale
    state" semantic (validator.py:166-168) as a batch merge; one
    shuffle on the merge key."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    base = o.withColumn("src", F.lit(0))
    updates = (
        o.where(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            F.lit("U").alias("o_orderstatus"),
            (F.col("o_totalprice") * 1.1).alias("o_totalprice"),
            F.lit(1).alias("src"),
        )
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.desc("src"))
    return (
        base.unionByName(updates)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )


@query(
    "join_broadcast_nested_loop",
    oracle="""
SELECT event_id, value, tier
FROM events
JOIN (VALUES (0.0, 50.0, 'low'), (50.0, 150.0, 'mid'),
             (150.0, 1e9, 'high')) t(lo, hi, tier)
  ON value >= lo AND value < hi
""",
)
def join_broadcast_nested_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure non-equi join (no equi component) against a 3-row tier
    table: compiles to BroadcastNestedLoopJoin — acceptable ONLY
    because the build side is a literal handful of rows (stake-tier
    classes, miner.py:117-137). Fact × fact non-equi joins must route
    through the range-join formulation instead (join_theta_range)."""
    ev = load_table(spark, sf_dir, "events")
    tiers = F.broadcast(
        spark.createDataFrame(
            [(0.0, 50.0, "low"), (50.0, 150.0, "mid"), (150.0, 1e9, "high")],
            "lo double, hi double, tier string",
        )
    )
    return ev.join(
        tiers, (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi"))
    ).select("event_id", "value", "tier")


@query(
    "udtf_cogrouped_map",
    oracle="""
WITH keys AS (
    SELECT o_custkey AS key_id FROM orders
    UNION
    SELECT user_id AS key_id FROM events
)
SELECT key_id,
       (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = keys.key_id)
           AS n_orders,
       (SELECT COUNT(*) FROM events e WHERE e.user_id = keys.key_id)
           AS n_events
FROM keys
""",
)
def udtf_cogrouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped UDTF: orders and events cogrouped on the customer
    key, one Python call per key with BOTH sides as Arrow tables (the
    validator's request/response pairing, validator.py:120-141).
    Arrow-native ``applyInArrow`` — same cogrouped contract as
    applyInPandas, minus the per-group pandas conversion that
    dominates across ~15k mostly-tiny groups (7× faster at sf0.1).
    Closure-serialized like every shipped UDF."""

    def pair_counts(key, orders_t, events_t):
        import pyarrow as pa

        k = key[0].as_py() if hasattr(key[0], "as_py") else key[0]
        return pa.table(
            {
                "key_id": pa.array([k], pa.int64()),
                "n_orders": pa.array([orders_t.num_rows], pa.int64()),
                "n_events": pa.array([events_t.num_rows], pa.int64()),
            }
        )

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key_id"), "o_orderkey"
    )
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("key_id"), "event_id"
    )
    return (
        o.groupBy("key_id")
        .cogroup(ev.groupBy("key_id"))
        .applyInArrow(
            pair_counts, schema="key_id long, n_orders long, n_events long"
        )
    )


@query("agg_approx_percentile")  # rows-only: sketch, not exactly reproducible in SQL
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (KLL-style sketch) — the unbounded-
    cardinality path where exact percentile's full sort is too
    expensive; sketches merge map-side like HLL."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr(
            "approx_percentile(l_extendedprice, array(0.5, 0.9), 1000)"
        ).alias("pcts")
    ).select(
        "l_returnflag",
        F.element_at("pcts", 1).alias("p50_approx"),
        F.element_at("pcts", 2).alias("p90_approx"),
    )
