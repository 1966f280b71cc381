"""Family E — window functions (SURVEY.md §2.2.E).

Grounding: priority ordering by stake (reference neurons/miner.py:
127-137), uid position lookup (reference neurons/miner.py:101),
prior-score reads and cumulative score folds (reference
neurons/validator.py:146), weight normalization percentiles (reference
neurons/validator.py:151), every-N-steps cadence frames (reference
neurons/validator.py:149,170).

All windows are PARTITIONED (per-nation / per-customer / per-user) —
no global single-partition window appears on a fact table, so each
plan scales: the only data movement is one shuffle on the partition
key. Window sums go through decimal casts (functions/stable.py
rationale) so sliding-frame summation order can't drift the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from map_reduce_subnet_spark.functions.stable import (
    SUM_DECIMAL,
    _bounded,
    _finite,
    _sql_bounded,
    _sql_finite,
)
from map_reduce_subnet_spark.operators.registry import query
from map_reduce_subnet_spark.sources.tables import load_table


@query(
    "window_rank_stake",
    oracle="""
SELECT s_suppkey, s_name,
       RANK() OVER (ORDER BY s_acctbal DESC) AS rnk
FROM supplier
""",
)
def window_rank_stake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority rank by account balance (stake-priority queue). Global
    window is safe here: supplier is a bounded dim table."""
    su = load_table(spark, sf_dir, "supplier")
    w = Window.orderBy(F.desc("s_acctbal"))
    # cast: Spark rank emits INT, DuckDB BIGINT (NOTES dtype gotcha)
    return su.select(
        "s_suppkey", "s_name", F.rank().over(w).cast("long").alias("rnk")
    )


@query(
    "window_row_number",
    oracle="""
SELECT c_custkey, c_nationkey,
       ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS uid
FROM customer
""",
)
def window_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-partition numbering (hotkeys.index → uid)."""
    cu = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_custkey")
    # cast: Spark row_number emits INT, DuckDB BIGINT
    return cu.select(
        "c_custkey",
        "c_nationkey",
        F.row_number().over(w).cast("long").alias("uid"),
    )


@query(
    "window_topk_per_group",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice
FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders
) WHERE rn <= 3
""",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer ("higher values processed first").
    o_orderkey tiebreak makes the selection deterministic."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@query(
    "window_lag_delta",
    oracle="""
SELECT event_id, user_id,
       value - LAG(value) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS delta
FROM events
""",
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta vs previous event per user (prior-score read)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


@query(
    "window_running_sum",
    oracle="""
SELECT o_orderkey, o_custkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS running_total
FROM orders
""",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue per customer (scores accumulating across
    steps)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast(SUM_DECIMAL))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )


@query(
    "window_moving_avg",
    oracle=f"""
SELECT event_id, user_id,
       CAST(SUM(CAST({_sql_finite('value')} AS DECIMAL(27,6)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
       / COUNT({_sql_finite('value')})
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
       AS mavg
FROM events
""",
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average of event values (EMA-smoothing intent).
    Expressed as decimal-sum / count so sliding-frame arithmetic is
    engine-independent; non-finite observations are dropped from both
    the sum AND the count (the stable.py drop-non-finite convention —
    an unguarded COUNT diluted the average that the decimal cast had
    already dropped from the numerator)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    fv = _finite(F.col("value"))
    mavg = (
        F.sum(fv.cast(SUM_DECIMAL)).over(w).cast("double")
        / F.count(fv).over(w)
    )
    return ev.select("event_id", "user_id", mavg.alias("mavg"))


@query(
    "window_range_frame",
    oracle="""
SELECT o_orderkey, o_custkey, d,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6)))
            OVER (PARTITION BY o_custkey ORDER BY d
                  RANGE BETWEEN 7 PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS sum_7d
FROM (SELECT o_orderkey, o_custkey, o_totalprice,
             date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS d
      FROM orders)
""",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day RANGE frame per customer (blocktime-window cadence).
    Dates are mapped to integer day offsets so the range bound is a
    plain numeric frame in both engines."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        # cast: Spark datediff emits INT, DuckDB date_diff BIGINT
        "d",
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("date")
        ).cast("long"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("d")
        .rangeBetween(-7, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "d",
        F.sum(F.col("o_totalprice").cast(SUM_DECIMAL))
        .over(w)
        .cast("double")
        .alias("sum_7d"),
    )


@query(
    "window_first_last",
    oracle="""
SELECT o_orderkey, o_custkey,
       FIRST_VALUE(o_orderkey) OVER w AS first_order,
       LAST_VALUE(o_orderkey)
           OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS last_order,
       NTH_VALUE(o_orderkey, 2) OVER w AS second_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth order per customer timeline. LAST_VALUE takes the
    full-partition frame (the default running frame would return the
    current row); ordering carries the o_orderkey tiebreak."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


@query(
    "window_percent_rank",
    oracle="""
SELECT c_custkey, c_nationkey,
       PERCENT_RANK() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal, c_custkey) AS pct,
       NTILE(4) OVER (PARTITION BY c_nationkey
                      ORDER BY c_acctbal, c_custkey) AS quartile
FROM customer
""",
)
def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile + quartile of per-nation balances (weight
    normalization as a distribution)."""
    cu = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return cu.select(
        "c_custkey",
        "c_nationkey",
        # not rounded: k/(n-1) is the same double on both engines,
        # while ROUND diverges on exact-half rationals
        F.percent_rank().over(w).alias("pct"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@query(
    "window_ntile_cume",
    oracle="""
SELECT l_orderkey, l_linenumber, l_returnflag,
       NTILE(4) OVER w AS quartile,
       CUME_DIST() OVER w AS cd
FROM lineitem
WINDOW w AS (PARTITION BY l_returnflag
             ORDER BY l_extendedprice, l_orderkey, l_linenumber)
""",
)
def window_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile assignment + cumulative distribution per return-flag
    group (the remaining ranking-family members next to rank /
    percent_rank / row_number). The ORDER BY is made total with the
    unique (orderkey, linenumber) tail, so ntile bucket boundaries and
    cume_dist peer groups are identical across engines — with ties
    left in, the two engines could split boundary rows differently.
    cume_dist over a total order is row_position / n, a pure integer
    division both engines evaluate to the same double."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        # cast: Spark ntile emits INT, DuckDB NTILE BIGINT — align the
        # schemas so dtype-strict comparisons can't flag a false diff
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.cume_dist().over(w).alias("cd"),
    )


@query(
    "window_zscore_anomaly",
    oracle=f"""
WITH fin AS (
    -- drop-non-finite convention (stable.py): NaN/±Inf contribute to
    -- neither the moments nor n; the raw value still flows to z below
    SELECT event_type, {_sql_finite('value')} AS fv FROM events
), stats AS (
    SELECT event_type,
           ROUND(CAST(SUM(CAST(fv AS DECIMAL(27,6))) AS DOUBLE)
                 / CAST(COUNT(fv) AS DOUBLE), 6) AS mean_v,
           ROUND(SQRT((CAST(SUM(CAST(fv * fv AS DECIMAL(27,6))) AS DOUBLE)
                       - CAST(SUM(CAST(fv AS DECIMAL(27,6))) AS DOUBLE)
                         * CAST(SUM(CAST(fv AS DECIMAL(27,6))) AS DOUBLE)
                         / CAST(COUNT(fv) AS DOUBLE))
                      / NULLIF(CAST(COUNT(fv) AS DOUBLE) - 1.0, 0.0)), 6)
               AS sd_v
    FROM fin
    GROUP BY event_type
)
SELECT e.event_id, e.event_type, e.value,
       (e.value - s.mean_v) / NULLIF(s.sd_v, 0.0) AS z
FROM events e
JOIN stats s ON e.event_type = s.event_type
WHERE ABS((e.value - s.mean_v) / NULLIF(s.sd_v, 0.0)) > 2.5
""",
)
def window_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier flagging: events whose value sits > 2.5 sample
    standard deviations from its event_type's mean (the scoring-outlier
    cut of reference neurons/validator.py:130-136, where mis-scored
    responses are cut before the weight fold).

    Scale shape: per-type moments come from ONE partial-aggregated
    pass (decimal-exact sums, so the mean/sd are order-independent —
    see functions/stable.py), the tiny stats frame broadcasts back
    onto the fact scan, and the z computation + threshold run
    scan-side with zero additional shuffles. The mean/sd are rounded
    at 6dp IDENTICALLY in both engines and z is the same double
    program after that, so the emitted z hashes bit-exact. A window
    (AVG() OVER (PARTITION BY type)) would express the same thing but
    shuffle the whole fact table; the broadcast-stats form is the
    100 TB plan."""
    ev = load_table(spark, sf_dir, "events")
    # drop-non-finite (stable.py convention): moments and n over the
    # finite observations only; the raw value still feeds z, so an Inf
    # event flags as an outlier (z = inf) instead of poisoning the sd
    fv = _finite(F.col("value"))
    n = F.count(fv).cast("double")
    sx = F.sum(fv.cast(SUM_DECIMAL)).cast("double")
    sxx = F.sum((fv * fv).cast(SUM_DECIMAL)).cast("double")
    # NULLIF twice (invariant #10, constant-corpus catch): an n=1
    # type has no sample sd (n-1 == 0) and a constant type has
    # sd == 0 — both make z undefined, so the row filters out as
    # not-an-outlier on BOTH engines instead of ANSI-aborting Spark
    stats = ev.groupBy("event_type").agg(
        F.round(sx / n, 6).alias("mean_v"),
        F.round(
            F.sqrt(
                (sxx - sx * sx / n)
                / F.nullif(n - F.lit(1.0), F.lit(0.0))
            ),
            6,
        ).alias("sd_v"),
    )
    z = (F.col("value") - F.col("mean_v")) / F.nullif(
        F.col("sd_v"), F.lit(0.0)
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .where(F.abs(z) > F.lit(2.5))
        .select("event_id", "event_type", "value", z.alias("z"))
    )


# Operand domain for the centi-quantization (r13 out-of-domain round,
# measured by scripts/overflow_probe.py; tightened r14 per ADVICE):
# the docstring's exact-dyadic interpolation proof needs not just
# |cv| ≤ 2^53 but every interpolation OPERAND exact — including b−a
# for adjacent order statistics, which can reach 2·max|cv|. The r13
# bound (9e13 → |cv| ≤ 9e15) left b−a up to 1.8e16 > 2^53, a 1-ulp
# cross-engine divergence band near the domain edge. |value| < 4.5e13
# keeps |cv| ≤ 4.5e15 and b−a ≤ 9e15 < 2^53, so cv, b−a, and every
# interpolation step are exactly representable doubles over the WHOLE
# admitted domain. (The original asymmetry — DuckDB raising on INT64
# casts at |value| ≥ ~9.2e16 while Spark's long conversion wrapped —
# is a fortiori closed by the tighter bound.)
ROLLQ_VALUE_DOMAIN = 4.5e13


@query(
    "window_rolling_quantiles",
    oracle=f"""
WITH q AS (
    -- drop-non-finite + magnitude guard (stable.py convention): a
    -- NaN/Inf or out-of-domain value has no EXACT centi-quantization
    -- — cv is NULL and both engines' window quantiles skip NULLs
    -- (see ROLLQ_VALUE_DOMAIN above)
    SELECT event_id, user_id, ts, value,
           CAST(FLOOR({_sql_bounded('value', ROLLQ_VALUE_DOMAIN)} * 100)
                AS BIGINT) AS cv
    FROM events
)
SELECT event_id, user_id, cv,
       quantile_cont(cv, 0.25) OVER w AS roll_p25,
       quantile_cont(cv, 0.50) OVER w AS roll_med,
       quantile_cont(cv, 0.75) OVER w AS roll_p75
FROM q
WINDOW w AS (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
)
""",
)
def window_rolling_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING QUANTILES over a sliding row frame: per user, the
    25th/50th/75th percentile of the last 7 events' (centi-quantized)
    values — the robust-statistics sibling of window_moving_avg, the
    shape behind rolling-median outlier masks and streaming IQR
    monitors where a mean would chase the outliers it should flag.

    Exactness, with no tolerance band: the input is quantized to an
    INTEGER (floor(value·100) — floor of an identical double program
    is identical) and the probed quantiles are DYADIC (1/4, 1/2,
    3/4), so every interpolation step — frac = p·(n−1)'s fractional
    part (dyadic), frac·(b−a) (dyadic × small integer), and the
    final sum — is EXACT float arithmetic; the ROLLQ_VALUE_DOMAIN
    guard pins |cv| ≤ 4.5e15 so that cv AND the order-statistic
    difference b−a (≤ 2·max|cv| = 9e15 < 2^53) stay exactly
    representable over the whole admitted operand domain, not just
    fixture magnitudes. Exact arithmetic makes
    the result independent of which algebraically-equivalent
    interpolation formula each engine uses (a + f·(b−a) vs
    (1−f)·a + f·b), which is precisely what rounds 1-ulp
    cross-engine drift off the table. A non-dyadic p (0.9) or raw
    double inputs would NOT be safe — that is the documented
    boundary of this pattern.

    Scale shape: one shuffle on user_id, then one Sort +
    WindowExec evaluating all three quantiles over the SAME frame
    (one frame buffer, bounded at 7 rows per partition position —
    constant memory per key, no whole-partition materialization
    like an unbounded frame would need)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        # guarded quantization (see ROLLQ_VALUE_DOMAIN): NULL cv for
        # non-finite or out-of-domain values; percentile() skips
        # NULLs like DuckDB's quantile_cont
        F.floor(_bounded(F.col("value"), ROLLQ_VALUE_DOMAIN) * 100)
        .cast("long")
        .alias("cv"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "cv",
        F.expr("percentile(cv, 0.25)").over(w).alias("roll_p25"),
        F.expr("percentile(cv, 0.50)").over(w).alias("roll_med"),
        F.expr("percentile(cv, 0.75)").over(w).alias("roll_p75"),
    )
