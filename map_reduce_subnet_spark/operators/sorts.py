"""Family F — sorts / limits / top-k (SURVEY.md §2.2.F).

Grounding: priority ordering "higher values processed first"
(reference neurons/miner.py:127-137).

Scale note: global top-k compiles to TakeOrderedAndProject — each
partition keeps only its local top-k, the driver merges k·P rows —
no global sort materializes. ``sort_multi_key`` is a real global sort
(range-partitioned exchange); the oracle hash is order-insensitive so
it verifies values, while the plan exercises the sort operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_subnet_spark.operators.registry import query
from map_reduce_subnet_spark.sources.tables import load_table


@query(
    "sort_multi_key",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders
ORDER BY o_orderstatus, o_totalprice DESC
""",
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global sort (range partitioning + per-partition sort)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_orderstatus", "o_totalprice").orderBy(
        "o_orderstatus", F.desc("o_totalprice")
    )


@query(
    "limit_topk",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by price (deterministic via o_orderkey tiebreak)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )
