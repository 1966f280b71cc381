"""Family B — projection / filter / predicates (SURVEY.md §2.2.B).

Grounding: scalar ×2 map (reference neurons/miner.py:140-147),
conditional scoring (reference neurons/validator.py:138-141),
membership blacklist (reference neurons/miner.py:107-123), nullable
response fields (reference template/protocol.py:57), deserialize-to-int
casting (reference template/protocol.py:59-75).

All expressions are built-in column functions — whole-stage codegen
keeps them JVM-side; per-row double arithmetic is IEEE-deterministic so
no hash stabilization is needed here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_subnet_spark.operators.registry import query
from map_reduce_subnet_spark.sources.tables import load_table


@query(
    "project_arith",
    oracle="""
SELECT l_orderkey,
       l_linenumber,
       l_extendedprice * (1 - l_discount) AS revenue,
       l_quantity * 2 AS qty_x2
FROM lineitem
""",
)
def project_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row arithmetic map (the reference's ×2 transform)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        (F.col("l_quantity") * 2).alias("qty_x2"),
    )


@query(
    "project_conditional",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000 THEN 'high'
            WHEN o_totalprice > 150000 THEN 'mid'
            ELSE 'low' END AS bucket
FROM orders
""",
)
def project_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE bucketing (the oracle-compare conditional score)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 150000, "mid")
        .otherwise("low")
        .alias("bucket"),
    )


@query(
    "filter_membership",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
""",
)
def filter_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-set membership (the blacklist allow-list)."""
    c = load_table(spark, sf_dir, "customer")
    return c.where(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")).select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "filter_compound",
    oracle="""
SELECT l_orderkey, l_linenumber
FROM lineitem
WHERE (l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 25)
   OR (l_returnflag = 'R' AND NOT l_linestatus = 'F')
""",
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT predicate tree."""
    li = load_table(spark, sf_dir, "lineitem")
    cond = (
        F.col("l_discount").between(0.05, 0.07) & (F.col("l_quantity") < 25)
    ) | ((F.col("l_returnflag") == "R") & ~(F.col("l_linestatus") == "F"))
    return li.where(cond).select("l_orderkey", "l_linenumber")


@query(
    "filter_null_semantics",
    oracle="""
SELECT l_orderkey,
       l_linenumber,
       COALESCE(NULLIF(l_discount, 0.0), -1.0) AS disc_or_flag
FROM lineitem
WHERE NULLIF(l_discount, 0.0) IS NULL OR l_discount >= 0.06
""",
)
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL handling: NULLIF / IS NULL / COALESCE (Optional fields)."""
    li = load_table(spark, sf_dir, "lineitem")
    nz = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.where(nz.isNull() | (F.col("l_discount") >= 0.06)).select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(nz, F.lit(-1.0)).alias("disc_or_flag"),
    )


@query(
    "project_cast",
    oracle="""
SELECT o_orderkey,
       CAST(FLOOR(o_totalprice) AS BIGINT) AS price_int,
       CAST(o_orderkey AS VARCHAR) AS key_str,
       CAST(CAST(o_orderkey AS VARCHAR) AS DOUBLE) AS key_dbl
FROM orders
""",
)
def project_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """string↔int↔double casts. FLOOR before the int cast because
    double→int rounding differs between engines (Spark truncates,
    DuckDB rounds); FLOOR pins the semantics."""
    o = load_table(spark, sf_dir, "orders")
    key_str = F.col("o_orderkey").cast("string")
    return o.select(
        "o_orderkey",
        F.floor("o_totalprice").cast("long").alias("price_int"),
        key_str.alias("key_str"),
        key_str.cast("double").alias("key_dbl"),
    )
