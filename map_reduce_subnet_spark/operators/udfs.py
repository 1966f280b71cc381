"""Family J — UDF / UDAF / UDTF surface (SURVEY.md §2.2.J).

Grounding: the reference's extension point is ``axon.attach(forward_fn,
blacklist_fn, priority_fn)`` (reference neurons/miner.py:156-160) —
arbitrary Python callables plugged into the pipeline. The Spark
equivalents are Arrow-batched pandas UDFs: scalar (forward_fn,
reference neurons/miner.py:140-147), grouped-aggregate (the keyed
reduce, reference README.md:20) and grouped-map (per-peer scoring,
reference neurons/validator.py:134-146).

Performance: every UDF here is Arrow-vectorized (pandas_udf for
scalar/agg, Arrow-native applyInArrow for the grouped map — no
per-group pandas conversion) — one Python roundtrip per batch, never
per row. They exist to exercise the extension surface; equivalent
built-in paths are registered in families B/D and are what a
cost-conscious caller uses.

Note: pandas_udf objects are created inside the query functions, not
at module import — parsing the return-type DDL requires an active
SparkSession, and this package must import session-free.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from map_reduce_subnet_spark.operators.registry import query
from map_reduce_subnet_spark.sources.tables import load_table


@query(
    "udf_scalar",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity * 2 AS qty_x2
FROM lineitem
""",
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF ×2 — per-row double arithmetic is exact, so
    the plain-SQL oracle hash-matches."""

    @pandas_udf("double")
    def times_two(x: pd.Series) -> pd.Series:
        # the reference's forward transform: output = input * 2
        # (reference neurons/miner.py:146)
        return x * 2.0

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber", times_two("l_quantity").alias("qty_x2")
    )


# Operand domain for the weighted mean (r13 out-of-domain round,
# measured by scripts/overflow_probe.py): a row participates only when
# |price·qty| < 1e15 (which also bounds |qty|, since prices are >= 1
# cent in every corpus — and the oracle guards qty explicitly anyway).
# Beyond it the engines diverged ASYMMETRICALLY: the oracle's
# DECIMAL(27,6) cast of the product aborted in DuckDB at >= 1e21 while
# the UDF's float sum sailed on, and between ~5e9 and 1e21 the float
# sum's relative error (~n·ulp) can exceed the ROUND(4) absorption
# that the fixture-scale agreement relies on. Out-of-domain rows are
# dropped like non-finite observations — from numerator AND
# denominator — on BOTH sides.
UDAF_PRODUCT_DOMAIN = 1e15


@query(
    "udaf_grouped_agg",
    oracle=f"""
WITH ok AS (
    SELECT l_returnflag, l_extendedprice, l_quantity
    FROM lineitem
    WHERE ABS(l_extendedprice * l_quantity) < {UDAF_PRODUCT_DOMAIN!r}
      AND ABS(l_quantity) < {UDAF_PRODUCT_DOMAIN!r}
)
SELECT l_returnflag,
       ROUND(CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(27,6))) AS DOUBLE)
             / CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE), 4)
           AS weighted_avg_price
FROM ok
GROUP BY l_returnflag
""",
)
def udaf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF: quantity-weighted mean price.
    Rounded to 4 decimals on both sides — the UDF's float sum and the
    oracle's exact decimal quotient agree well past that precision
    INSIDE the UDAF_PRODUCT_DOMAIN operand guard (see the constant);
    out-of-domain and non-finite rows are dropped identically on both
    sides. The guard is a row FILTER applied before grouping on both
    engines (not a per-row NULL inside the aggregate), so a group
    whose every row is out-of-domain vanishes identically from both
    outputs. The comparison drops NaN/±Inf too: both engines order
    NaN greater than every value, so ABS(·) < 1e15 is false for them
    (the stable.py::_bounded truth table)."""

    @pandas_udf("double")
    def weighted_mean(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    li = load_table(spark, sf_dir, "lineitem")
    dom = F.lit(UDAF_PRODUCT_DOMAIN)
    return (
        li.where(
            (F.abs(F.col("l_extendedprice") * F.col("l_quantity")) < dom)
            & (F.abs(F.col("l_quantity")) < dom)
        )
        .groupBy("l_returnflag")
        .agg(weighted_mean("l_extendedprice", "l_quantity").alias("wavg"))
        .select("l_returnflag", F.round("wavg", 4).alias("weighted_avg_price"))
    )


@query(
    "udtf_grouped_map",
    oracle="""
SELECT o_orderkey, o_custkey,
       ROUND(o_totalprice /
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6)))
                        OVER (PARTITION BY o_custkey) AS DOUBLE), 2), 6)
           AS share
FROM orders
""",
)
def udtf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map UDTF: per-group L1 normalization, verified against
    the built-in window formulation. Arrow-native ``applyInArrow`` —
    the same grouped-map contract as applyInPandas but without the
    per-group Arrow→pandas→Arrow conversion, which dominates when
    groups are small and numerous (~15k customer groups here: 7×
    faster than the pandas form at sf0.1; the pandas flavor of the
    surface stays exercised by stateful_ema's applyInPandasWithState
    and the multimodal mapInPandas stages).

    The UDF is a closure, NOT a module-level function: cloudpickle
    ships closures by value, while module-level functions are pickled
    by reference and executors would need this package on their
    sys.path (the grading driver's workers don't have it).
    """

    def normalize_group(t):
        # per-peer score normalization (reference neurons/validator.py:
        # 151). Prices carry 2 decimals, so rounding the float total to
        # 2 recovers the exact decimal total — the denominator matches
        # the oracle's decimal-exact sum regardless of summation order.
        # pc.round(mode=half_to_even) == numpy/pandas .round — the
        # same convention the oracle was validated against.
        import pyarrow as pa
        import pyarrow.compute as pc

        vals = t.column("o_totalprice")
        total = round(pc.sum(vals).as_py(), 2)
        share = pc.round(pc.divide(vals, pa.scalar(total, pa.float64())), 6)
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_custkey": t.column("o_custkey"),
                "share": share,
            }
        )

    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").applyInArrow(
        normalize_group, schema="o_orderkey long, o_custkey long, share double"
    )


@query(
    "udtf_python_lateral",
    oracle="""
SELECT doc_id, chunk_start,
       array_to_string(string_split(text, ' ')[chunk_start:chunk_start+49], ' ')
           AS chunk
FROM (
    SELECT doc_id, text,
           unnest(range(1, len(string_split(text, ' ')) + 1, 40)) AS chunk_start
    FROM documents
)
""",
)
def udtf_python_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL Python UDTF (Spark 4 ``@udtf``) applied with a LATERAL
    join: each document row fans out to its 50-token/stride-40 chunks
    through a user-defined table function — the per-row one-to-many
    expansion surface a pipeline reaches for when the expansion logic
    is genuinely imperative (parsers, tokenizers, segmenters). Output
    is bit-identical to the built-in text_chunking (same oracle), so
    the UDTF path is differentially checked against both DuckDB and
    the JVM-side formulation.

    The UDTF class is defined INSIDE the query (cloudpickle then
    ships it by value — a module-level class pickles by reference and
    breaks on workers without this repo on sys.path). Scale: the
    lateral join is row-local (no shuffle); Arrow batches carry rows
    to the Python worker exactly like any other Python-backed stage.
    Prefer text_chunking's pure-JVM form where the logic fits
    built-ins — this operator is the escape hatch, and the bench
    prices the difference."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_start bigint, chunk string")
    class ChunkUDTF:
        def eval(self, text: str):
            words = (text or "").split(" ")
            for s in range(0, len(words), 40):
                yield s + 1, " ".join(words[s : s + 50])

    spark.udtf.register("mrs_chunk_udtf", ChunkUDTF)
    d = load_table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("mrs_udtf_docs")
    try:
        out = spark.sql(
            """
            SELECT d.doc_id, c.chunk_start, c.chunk
            FROM mrs_udtf_docs d, LATERAL mrs_chunk_udtf(d.text) c
            """
        ).localCheckpoint(eager=True)
    finally:
        spark.catalog.dropTempView("mrs_udtf_docs")
    return out
