"""Family D — aggregations (SURVEY.md §2.2.D).

Grounding: reduce = "aggregate the chunks … send the sum of total
chunks" (reference README.md:20); partial-then-final aggregation is the
reference's factor-K bandwidth claim (reference README.md:22); L1
normalization (reference neurons/validator.py:151); EMA score fold
(reference neurons/validator.py:109,146).

All sums/avgs go through the decimal-exact helpers in
functions/stable.py so the value-hash is order-independent — Spark's
partial+final HashAggregate stays fully distributed (map-side combine
preserved, the factor-K win).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from map_reduce_subnet_spark.functions.stable import (
    _finite,
    _sql_finite,
    davg,
    dstddev,
    dsum,
    dsum_wide,
    sql_davg,
    sql_dstddev,
    sql_dsum,
    sql_dsum_wide,
)
from map_reduce_subnet_spark.operators.registry import query
from map_reduce_subnet_spark.sources.tables import load_table


@query(
    "agg_reduce_sum",
    oracle=f"""
SELECT l_returnflag,
       l_linestatus,
       {sql_dsum('l_quantity')} AS sum_qty,
       {sql_dsum('l_extendedprice')} AS sum_base_price,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {sql_davg('l_quantity')} AS avg_qty,
       {sql_davg('l_extendedprice')} AS avg_price,
       {sql_davg('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def agg_reduce_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship: TPC-H Q1-shaped keyed reduce (scan → filter →
    project → partial agg → shuffle on (returnflag, linestatus) → final
    agg). This is the reference's map (chunk/scatter ≈ partition/
    shuffle, README.md:20) and reduce (keyed sum) in one plan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "agg_global",
    oracle=f"""
SELECT COUNT(*) AS n_rows,
       {sql_dsum_wide('l_quantity')} AS sum_qty,
       {sql_dsum_wide('l_extendedprice')} AS sum_price,
       {sql_davg('l_discount')} AS avg_disc
FROM lineitem
""",
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grand totals, no grouping (the normalize denominator).

    r14: the two unrounded sums carry the wide-domain two-limb
    program (stable.py::dsum_wide) — exact cross-engine out to the
    |x| < ~1.1e21 band edge, where dsum's DECIMAL(27,6) input cast
    drifted in the last 2 ulps at raw ~1e20 (the r13 EXTREME_DRIFT
    pin, now cleared). avg_disc keeps davg: l_discount is a [0,1]
    ratio column, 9 decades inside dsum's measured-exact band."""
    return load_table(spark, sf_dir, "lineitem").agg(
        F.count("*").alias("n_rows"),
        dsum_wide("l_quantity", "sum_qty"),
        dsum_wide("l_extendedprice", "sum_price"),
        davg("l_discount", "avg_disc"),
    )


@query(
    "agg_minmax_stats",
    oracle=f"""
SELECT l_returnflag,
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price,
       {sql_davg('l_extendedprice')} AS avg_price,
       {sql_dstddev('l_extendedprice')} AS std_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_minmax_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max/avg/stddev per group (metagraph health-stats shape)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            davg("l_extendedprice", "avg_price"),
            dstddev("l_extendedprice", "std_price"),
        )
    )


@query(
    "agg_count_distinct",
    oracle="""
SELECT o_orderstatus,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
""",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct per group (expands to a two-phase agg in Spark)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
        )
    )


@query(
    "agg_approx_distinct",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users_exact,
       TRUE AS approx_ok
FROM events
GROUP BY event_type
""",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct — the 100 TB path where exact distinct
    would shuffle every key. Sketches merge map-side (no full shuffle).

    BOUND-CHECKED oracle (r7, VERDICT r6 #5): the sketch estimate
    itself is implementation-specific, so instead of hashing it the
    query emits the EXACT count (the anchor DuckDB reproduces) plus
    an in-tolerance boolean — |approx − exact| ≤ max(3, 5%·exact),
    5× headroom over the requested rsd=0.01 — which the oracle pins
    to TRUE. A sketch drifting out of its error bound now fails the
    driver's hash, not just a local golden test. The exact leg exists
    only for this verification harness; the production path at scale
    is the sketch alone.

    TWO-LEVEL SPELLING (r15 optimization, guide §2.3 "aggregate
    before you shuffle"): combining approx_count_distinct with
    countDistinct in ONE agg makes Spark's distinct-rewrite key the
    HLL partial by (event_type, user_id) — at rsd=0.01 that is a
    1639-word (~13 KB) sketch PER DISTINCT PAIR, all shuffled
    (~1.3 GB at sf0.1; measured 3.0 s isolated, plan committed at
    plans/r15/agg_approx_distinct_before.txt node (2)). Deduplicating
    the pairs FIRST and sketching the deduplicated set shuffles
    16-byte pair rows instead: HLL registers are a max over hashed
    values, so duplicates cannot move them — the estimate is
    BIT-IDENTICAL — and count(user_id) over the deduplicated pairs is
    exactly countDistinct (both ignore NULLs; an all-NULL group still
    survives as its (event_type, NULL) pair row, so no group is
    dropped). Measured 3.04 s → 0.5 s at sf0.1; output hash unchanged
    (diffcheck MATCH at sf0.01 and sf0.1).
    """
    pairs = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
    )
    per = pairs.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("n_approx"),
        F.count("user_id").alias("n_users_exact"),
    )
    tol = F.greatest(F.lit(3.0), F.col("n_users_exact") * 0.05)
    return per.select(
        "event_type",
        "n_users_exact",
        (
            F.abs(F.col("n_approx") - F.col("n_users_exact")).cast("double")
            <= tol
        ).alias("approx_ok"),
    )


@query(
    "agg_having",
    oracle=f"""
SELECT o_custkey, {sql_dsum('o_totalprice')} AS total_spent
FROM orders
GROUP BY o_custkey
HAVING {sql_dsum('o_totalprice')} > 1500000.0
""",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group + post-aggregation filter (HAVING)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(dsum("o_totalprice", "total_spent"))
        .where(F.col("total_spent") > 1500000.0)
    )


@query(
    "agg_rollup",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity')} AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals (chunk → peer → grand total, README.md:20)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity", "sum_qty"), F.count("*").alias("n_rows"))
    )


@query(
    "agg_cube",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority,
       {sql_dsum('o_totalprice')} AS sum_price,
       COUNT(*) AS n_orders
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cube over two dims."""
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(dsum("o_totalprice", "sum_price"), F.count("*").alias("n_orders"))
    )


@query(
    "agg_grouping_sets",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum_wide('l_extendedprice')} AS sum_price
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via the native DataFrame API (no temp
    view — a fixed view name would collide if the harness ever runs
    queries concurrently on one session). The unrounded sum is
    wide-domain (dsum_wide, r14 — clears the r13 EXTREME_DRIFT pin at
    raw ~1e20)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(dsum_wide("l_extendedprice", "sum_price"))


@query(
    "agg_distinct_arg",
    oracle=f"""
SELECT l_returnflag,
       CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_distinct_qty,
       COUNT(DISTINCT l_suppkey) AS n_suppliers
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_distinct_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sum(DISTINCT ...) — dedup of redundant chunks before the reduce."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.sum_distinct(F.col("l_quantity").cast("decimal(27,6)"))
            .cast("double")
            .alias("sum_distinct_qty"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
        )
    )


@query(
    "agg_normalize_l1",
    oracle=f"""
SELECT o_orderkey,
       o_custkey,
       ROUND(o_totalprice / CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6)))
             OVER (PARTITION BY o_custkey) AS DOUBLE), 6) AS share
FROM orders
""",
)
def agg_normalize_l1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row share of its group total — the reference's L1 weight
    normalization (validator.py:151) keyed per peer group. Partitioned
    window (no global single-partition window), so it scales.
    """
    w = Window.partitionBy("o_custkey")
    denom = F.sum(F.col("o_totalprice").cast("decimal(27,6)")).over(w).cast("double")
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") / denom, 6).alias("share"),
    )


@query(
    "agg_ema",
    oracle="""
WITH per_bin AS (
  SELECT user_id, CAST(ts AS DATE) AS bin,
         list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
                                  COALESCE(list(CAST(0.9 AS DOUBLE)
                                                ORDER BY ts, event_id)
                                           FILTER (WHERE value IS NOT NULL),
                                           [])),
                     (acc, x) -> acc * x) AS a,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                  COALESCE(list(value ORDER BY ts, event_id)
                                           FILTER (WHERE value IS NOT NULL),
                                           [])),
                     (acc, x) -> acc * 0.9 + x * 0.1) AS t,
         COUNT(*) AS n
  FROM events
  GROUP BY user_id, CAST(ts AS DATE)
)
SELECT user_id, ROUND(m.a * 1.0 + m.t, 6) AS ema, n_events
FROM (
  SELECT user_id,
         list_reduce(
             list_prepend(struct_pack(a := CAST(1.0 AS DOUBLE),
                                      t := CAST(0.0 AS DOUBLE)),
                          list(struct_pack(a := a, t := t) ORDER BY bin)),
             (acc, x) -> struct_pack(a := x.a * acc.a,
                                     t := x.a * acc.t + x.t)) AS m,
         CAST(SUM(n) AS BIGINT) AS n_events
  FROM per_bin
  GROUP BY user_id
)
""",
)
def agg_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EMA of event values ordered by ts, α=0.9 (the
    reference's score fold, validator.py:146: s ← α·s + (1−α)·x,
    seeded with 1.0 like torch.ones_like at validator.py:110).

    Scale shape — TWO-LEVEL BINNED FOLD (the join_asof_binned pattern):
    each event is the linear map s → 0.9·s + 0.1·x, and linear maps
    compose, so a (user, day) bin folds to the pair (a, t) with
    s → a·s + t (a = ∏0.9, t = the bin's fold from 0). Level 1 groups
    by (user_id, day) — partitions bounded by per-day event rate, so
    one hot user with years of history never becomes one giant
    collect_list row in one task (the pre-r6 single-level form did
    exactly that). Level 2 folds the per-day pairs in day order —
    bins per user = history span in days, ~1000× smaller than events.
    Both levels stay JVM-side (collect_list + F.aggregate, no Python).

    Bit-exact with the oracle BY CONSTRUCTION: the DuckDB SQL spells
    out the IDENTICAL two-level computation (same bin cut, same
    seeds, same left-to-right IEEE mul/add sequence — a is a repeated
    0.9 product, never pow(), whose libm results could differ), so
    both engines execute the same float program. In exact arithmetic
    the binned fold equals the sequential one; in doubles they differ
    ~1e-15, which is why the oracle mirrors the binning instead of
    the naive single fold.

    NULL semantics (pinned by the micro-corpus differential): a NULL
    value is a SKIPPED observation — the SQL-aggregate convention
    (SUM/AVG ignore NULLs), spelled as an explicit filter before the
    fold on BOTH engines. The filter is mandatory on the Spark side
    even under propagate-NULL semantics: the fold's seed struct has
    non-nullable fields, and writing the NULL-poisoned accumulator
    into a non-nullable field silently materializes 0.0 — zeroing
    the whole bin's contribution rather than propagating."""
    ev = load_table(spark, sf_dir, "events")
    pairs = F.filter(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("ts"), F.col("event_id"), F.col("value"))
            )
        ),
        lambda x: x["value"].isNotNull(),
    )
    seg = F.aggregate(
        pairs,
        F.struct(
            F.lit(1.0).cast("double").alias("a"),
            F.lit(0.0).cast("double").alias("t"),
        ),
        lambda acc, x: F.struct(
            (acc["a"] * F.lit(0.9)).alias("a"),
            (acc["t"] * F.lit(0.9) + x["value"] * F.lit(0.1)).alias("t"),
        ),
    )
    per_bin = (
        ev.withColumn("bin", F.col("ts").cast("date"))
        .groupBy("user_id", "bin")
        .agg(seg.alias("seg"), F.count("*").alias("n"))
    )
    bins = F.array_sort(F.collect_list(F.struct(F.col("bin"), F.col("seg"))))
    # level 2 COMPOSES the per-day maps ((a2,t2)∘(a1,t1) =
    # (a2·a1, a2·t1 + t2)) and applies the result to the 1.0 seed at
    # the end — the same float program the oracle runs
    m = F.aggregate(
        bins,
        F.struct(
            F.lit(1.0).cast("double").alias("a"),
            F.lit(0.0).cast("double").alias("t"),
        ),
        lambda acc, b: F.struct(
            (b["seg"]["a"] * acc["a"]).alias("a"),
            (b["seg"]["a"] * acc["t"] + b["seg"]["t"]).alias("t"),
        ),
    )
    ema = m["a"] * F.lit(1.0) + m["t"]
    return per_bin.groupBy("user_id").agg(
        F.round(ema, 6).alias("ema"),
        F.sum("n").alias("n_events"),
    )


@query(
    "agg_salted_hotkey",
    oracle=f"""
SELECT CASE WHEN l_quantity <= 45 THEN 'hot' ELSE l_linestatus END AS k,
       {sql_dsum_wide('l_extendedprice')} AS total
FROM lineitem
GROUP BY 1
""",
)
def agg_salted_hotkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted aggregation over a deliberately skewed key (~90% of
    lineitem lands on one 'hot' value) — the power-law hot-key story
    at 100 TB made driver-visible: functions/skew.py::salted_sum
    spreads each key over 16 salt buckets (stage 1) then combines the
    partials (stage 2). Exact two-limb integer staging (r14:
    stable.py::dsum_wide's quantize/split carried through both
    stages) makes the two-stage result EXACTLY equal to the direct
    wide-domain SUM, which is what the oracle runs — salting is a
    physical re-plan, not an approximation.

    Self-lint: the plan must contain TWO shuffle exchanges (the
    (key, salt) spread and the key combine) — one would mean the salt
    stage collapsed and the hot key is back on a single reducer.
    """
    from map_reduce_subnet_spark.functions.skew import salted_sum
    from map_reduce_subnet_spark.plans import count_exchanges

    li = load_table(spark, sf_dir, "lineitem")
    keyed = li.select(
        F.when(F.col("l_quantity") <= 45, F.lit("hot"))
        .otherwise(F.col("l_linestatus"))
        .alias("k"),
        "l_extendedprice",
    )
    out = salted_sum(keyed, "k", F.col("l_extendedprice"), "total", n_salts=16)
    n_ex = count_exchanges(out)
    if n_ex != 2:
        raise RuntimeError(
            f"agg_salted_hotkey: expected 2 exchanges (salt spread + "
            f"combine), plan has {n_ex} — the salt stage collapsed"
        )
    return out


def hll_rollup_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row frame (n_exact, est_direct, est_merged): the two-level
    DataSketches HLL rollup next to the one-shot sketch and the exact
    count. Shared by agg_hll_sketch_merge (which bound-checks it) and
    the golden test (which pins the raw estimates)."""
    cu = load_table(spark, sf_dir, "customer")
    per_nation = cu.groupBy("c_nationkey").agg(
        F.hll_sketch_agg("c_custkey").alias("sk")
    )
    merged = per_nation.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_merged")
    )
    direct = cu.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("c_custkey")).alias(
            "est_direct"
        ),
        F.countDistinct("c_custkey").alias("n_exact"),
    )
    return direct.crossJoin(merged).select(
        "n_exact", "est_direct", "est_merged"
    )


@query(
    "agg_hll_sketch_merge",
    oracle="""
SELECT COUNT(DISTINCT c_custkey) AS n_exact,
       TRUE AS direct_ok,
       TRUE AS merged_ok
FROM customer
""",
)
def agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE distinct-count sketches (Apache DataSketches HLL,
    F.hll_sketch_agg / hll_union_agg) — the pattern that makes
    distinct counts composable at 100 TB: build one sketch per
    partition/day/nation ONCE, then answer any rollup by unioning
    sketches instead of rescanning raw data. agg_approx_distinct
    shows the one-shot estimator; this shows the two-level form a
    warehouse actually materializes (per-nation sketches → global
    union).

    BOUND-CHECKED oracle (r7, VERDICT r6 #5): the estimates are
    sketch-impl-specific, so the query emits the exact count plus two
    booleans — each estimate within max(3, 2%·exact) of exact, the
    same tolerance the golden test has pinned since r5 — and the
    oracle requires both TRUE. Sketch-union lossiness exceeding the
    bound now fails the driver hash. The raw estimates stay visible
    through hll_rollup_estimates (golden-pinned for determinism)."""
    est = hll_rollup_estimates(spark, sf_dir)
    tol = F.greatest(F.lit(3.0), F.col("n_exact") * 0.02)
    return est.select(
        "n_exact",
        (
            F.abs(F.col("est_direct") - F.col("n_exact")).cast("double")
            <= tol
        ).alias("direct_ok"),
        (
            F.abs(F.col("est_merged") - F.col("n_exact")).cast("double")
            <= tol
        ).alias("merged_ok"),
    )


@query(
    "agg_mode_deterministic",
    oracle="""
SELECT user_id, event_type AS mode_type, c AS mode_count
FROM (
    SELECT user_id, event_type, COUNT(*) AS c,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY COUNT(*) DESC, event_type) AS rn
    FROM events
    GROUP BY user_id, event_type
)
WHERE rn = 1
""",
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent value per group (mode), with a PINNED tie-break
    (highest count, then lexicographic value) — F.mode deliberately
    not used: its tie behavior is engine-internal and
    non-deterministic across plans, which would make the result
    unhashable. Counts partial-aggregate; the per-group argmax is one
    partitioned window over group-cardinality rows."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count("*").alias("c")
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("c"), F.asc("event_type"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_type"),
            F.col("c").alias("mode_count"),
        )
    )


@query(
    "agg_histogram",
    oracle=f"""
SELECT CAST(FLOOR(l_extendedprice / 5000.0) AS BIGINT) AS bin,
       CAST(FLOOR(l_extendedprice / 5000.0) AS BIGINT) * 5000.0 AS bin_lo,
       COUNT(*) AS n_rows,
       {sql_dsum('l_extendedprice')} AS sum_price
FROM lineitem
GROUP BY 1, 2
""",
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of l_extendedprice (5000-wide bins) — the
    value-distribution profile a scoring loop summarizes before
    re-weighting (reference neurons/validator.py:130-136 folds raw
    scores the same way before normalizing).

    Scale shape: the bin key is computed scan-side, so the groupBy
    partial-aggregates map-side down to O(n_bins) rows per task before
    the shuffle — the cheapest possible distribution sketch. The bin
    arithmetic (double divide, FLOOR, cast) is the identical float
    program in both engines, so bin assignment is bit-deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    bin_col = F.floor(F.col("l_extendedprice") / F.lit(5000.0)).cast("long")
    return (
        li.select(
            bin_col.alias("bin"),
            F.col("l_extendedprice"),
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("n_rows"),
            dsum("l_extendedprice", "sum_price"),
        )
        .select(
            "bin",
            (F.col("bin") * F.lit(5000.0)).alias("bin_lo"),
            "n_rows",
            "sum_price",
        )
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_s,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY 1
""",
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact daily distinct users via mergeable roaring-style bitmaps
    (bitmap_bucket_number / bitmap_construct_agg / bitmap_count) —
    the scalable exact-distinct pattern. Generalizes the reference's
    per-round distinct-peer accounting (reference README.md:18,
    neurons/validator.py:120-141) to an arbitrary-cardinality key.

    Why not COUNT(DISTINCT)? A plain distinct-count shuffles every
    raw (day, user_id) pair to the reducer. The bitmap form
    partial-aggregates map-side into fixed 4 KiB bitmap segments per
    (day, id-bucket), so the shuffle carries O(days × buckets)
    bitmaps instead of O(rows) values, the segments OR together
    associatively (mergeable across partitions, stages, or days),
    and the final count is a popcount — the same mergeability story
    as the HLL sketch rollup (agg_hll_sketch_merge) but EXACT. At
    100 TB the shuffle volume is the bitmap universe, not the event
    count. The result equals COUNT(DISTINCT user_id), which is
    exactly what the oracle checks.
    """
    e = load_table(spark, sf_dir, "events")
    day = F.unix_timestamp(F.date_trunc("day", F.col("ts"))).cast("long")
    return (
        e.select(day.alias("day_s"), "user_id")
        .groupBy("day_s", F.expr("bitmap_bucket_number(user_id)").alias("bkt"))
        .agg(
            F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias(
                "bm"
            )
        )
        .groupBy("day_s")
        .agg(F.sum(F.expr("bitmap_count(bm)")).cast("long").alias("n_users"))
    )


@query(
    "agg_cms_heavy_hitters",
    oracle="""
SELECT user_id, n_events, TRUE AS cms_ok
FROM (
    SELECT user_id, COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    ORDER BY n_events DESC, user_id
    LIMIT 10
)
""",
)
def agg_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters — the third mergeable sketch
    next to HLL (distinct) and KLL (percentiles): per-partition CMS
    tables merge associatively map-side, so at 100 TB per-key
    frequencies come from unioning fixed-size (width x depth) integer
    tables instead of shuffling raw keys; any key's count is then
    answerable from the merged sketch alone (the reference's per-peer
    request accounting, README.md:18, as a sketch).

    BOUND-CHECKED oracle (r7 sketch-trio pattern): emits the exact
    top-10 users by event count (deterministic count-then-id order,
    reproduced by the oracle) plus a boolean pinning the CMS
    guarantee — the sketch NEVER undercounts and overcounts by at
    most eps*N (+1 slack), checked by probing the merged sketch
    driver-side through Spark's public CountMinSketch.readFrom API
    (seed fixed, so the outcome is deterministic per fixture). The
    exact pass exists for the oracle; the production path at scale
    keeps only the sketch.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id")
    top = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(10)
    )
    rows = top.collect()  # 10 rows
    [sk] = ev.agg(
        F.expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").alias("sk"),
        F.count("*").alias("n_total"),
    ).collect()
    # Engine-portability note (r7 advice): this probes the sketch via
    # the py4j bridge, which does not exist under Spark Connect. If a
    # public SQL-side read path for count_min_sketch lands in a future
    # Spark (e.g. a cms_estimate() expression), switch the probe to
    # F.expr over the sketch column and drop this bridge call; until
    # then the bridge is the only way to evaluate the guarantee, and
    # the collected sketch is a fixed 0.001x0.99 table, not data.
    cms = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(sk["sk"])
    )
    slack = 0.001 * sk["n_total"] + 1.0
    data = [
        (
            r["user_id"],
            r["n_events"],
            bool(
                r["n_events"]
                <= cms.estimateCount(int(r["user_id"]))
                <= r["n_events"] + slack
            ),
        )
        for r in rows
    ]
    return spark.createDataFrame(
        data, "user_id long, n_events long, cms_ok boolean"
    )


@query(
    "agg_robust_mad",
    oracle="""
WITH med AS (
    SELECT l_returnflag,
           quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) AS med
    FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag, m.med,
       quantile_cont(ABS(CAST(l.l_extendedprice AS DOUBLE) - m.med), 0.5)
           AS mad
FROM lineitem l JOIN med m ON l.l_returnflag = m.l_returnflag
GROUP BY l.l_returnflag, m.med
""",
)
def agg_robust_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust dispersion per group: the MEDIAN ABSOLUTE DEVIATION
    (median of |x - median|) — the outlier-resistant sibling of
    stddev that anomaly detection reaches for when heavy tails would
    poison the moments (the z-score query's robust counterpart).

    Two passes by necessity (the inner median must exist before
    deviations do): per-group exact median (partial-buffered
    percentile, tiny output) BROADCAST back over the fact scan, then
    the deviation median. The fact table shuffles twice on the group
    key and never joins shuffled — the broadcast keeps pass two
    scan-local. Deviations are double arithmetic on an explicitly
    double-cast column so both engines run the identical IEEE
    program; the interpolated percentile itself is bit-exact across
    engines (the agg_percentile parity)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_extendedprice").cast("double").alias("x")
    )
    med = li.groupBy("l_returnflag").agg(
        F.expr("percentile(x, 0.5D)").alias("med")
    )
    return (
        li.join(F.broadcast(med), "l_returnflag")
        .select(
            "l_returnflag",
            "med",
            F.abs(F.col("x") - F.col("med")).alias("dev"),
        )
        .groupBy("l_returnflag", "med")
        .agg(F.expr("percentile(dev, 0.5D)").alias("mad"))
    )


@query(
    "agg_skew_kurtosis",
    oracle="""
WITH q AS (
    -- DECIMAL(9,0) is the operand-domain precondition (r13): integer
    -- → decimal casts are exact on both engines, |q| < 1e9 keeps q⁴
    -- inside DECIMAL(38,0) / DuckDB's width-36 product type, and a
    -- quantity at |q| >= 1e9 aborts the cast LOUDLY and symmetrically
    -- (the band-edge refusal posture). The r12 probe measured the
    -- previous INT64 power sums aborting at |q| ~ 1.7e8 (q⁴ > 2^63)
    -- on both engines — a refusal 3 decades before the domain edge.
    -- The outer widen to width 19 is exact and forces DuckDB's
    -- decimal multiply onto HUGEINT storage (width <= 18 operands
    -- multiply in raw INT64 there and overflow at ~9.2e18).
    SELECT l_returnflag,
           CAST(CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(9,0))
                AS DECIMAL(19,0)) AS qd
    FROM lineitem
), sums AS (
    SELECT l_returnflag, COUNT(*) AS n,
           SUM(qd) AS s1, SUM(qd * qd) AS s2,
           SUM((qd * qd) * qd) AS s3,
           SUM((qd * qd) * (qd * qd)) AS s4
    FROM q GROUP BY l_returnflag
), m AS (
    SELECT l_returnflag, n,
           CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
           CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
           CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
           CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
    FROM sums
), c AS (
    SELECT l_returnflag, n, mean,
           r2 - mean * mean AS m2,
           r3 - 3.0 * mean * r2 + 2.0 * ((mean * mean) * mean) AS m3,
           r4 - 4.0 * mean * r3 + 6.0 * (mean * mean) * r2
              - 3.0 * ((mean * mean) * (mean * mean)) AS m4
    FROM m
)
SELECT l_returnflag, n, mean,
       m3 / NULLIF(m2 * sqrt(m2), 0.0) AS skewness,
       m4 / NULLIF(m2 * m2, 0.0) - 3.0 AS excess_kurtosis
FROM c
""",
)
def agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population SKEWNESS and excess KURTOSIS per group — the 3rd
    and 4th standardized moments that tell a data-quality pipeline
    whether a metric's distribution is lopsided or heavy-tailed
    before anyone trusts its mean ± stddev.

    Built from explicit raw power sums rather than the engines'
    skewness()/kurtosis() built-ins, deliberately: the built-ins
    disagree across engines on bias correction (sample g1 vs
    Fisher-Pearson G1), which makes them un-oracle-able, and their
    one-pass moment updates are float-order-dependent. Here the
    integer-valued measure (BIGINT-cast, then DECIMAL(9,0) — the r13
    operand-domain precondition) yields EXACT decimal-integer sums
    Σq..Σq⁴ that any reduction order reproduces: integer→decimal
    casts are exact on both engines (no float scaling step, so the
    double→decimal divergence band never applies), decimal products
    are exact integer arithmetic, and |q| < 1e9 keeps q⁴ within the
    width-38/width-36 product types — a quantity beyond the domain
    aborts the cast loudly and SYMMETRICALLY (the r12 probe measured
    the previous INT64 sums overflowing at |q| ~ 1.7e8 instead). The central-moment conversion
    (m2 = r2 − mean², m3/m4 via the binomial expansion, powers
    spelled as explicit products — no libm pow) is then an identical
    scalar float program on identical operands in both engines, hence
    bit-exact. NOTE the boundary, learned the hard way: decimal-
    quantizing full-precision per-row doubles (the dsum pattern on
    (x−mean)ᵏ) is NOT portable — double→decimal rounding diverges
    between engines on near-tie low bits; integer inputs sidestep
    the round entirely.

    Scale shape: one scan, map-side partial aggregation of five
    integer sums, one shuffle on the 3-value group key. (The textbook
    caveat that raw-moment formulas cancel catastrophically applies
    when m2 ≪ mean² by many orders — not the regime here, and
    determinism, not ulp-accuracy, is what the oracle enforces.)
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        # DECIMAL(9,0) = the operand-domain precondition (see oracle
        # comment): q⁴ stays exact decimal integer arithmetic up to
        # |q| < 1e9, loud symmetric abort beyond
        F.col("l_quantity").cast("long").cast("decimal(9,0)").alias("qd"),
    )
    sums = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("qd").alias("s1"),
        F.sum(F.col("qd") * F.col("qd")).alias("s2"),
        F.sum((F.col("qd") * F.col("qd")) * F.col("qd")).alias("s3"),
        F.sum(
            (F.col("qd") * F.col("qd")) * (F.col("qd") * F.col("qd"))
        ).alias("s4"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / nd
    r2 = F.col("s2").cast("double") / nd
    r3 = F.col("s3").cast("double") / nd
    r4 = F.col("s4").cast("double") / nd
    m = sums.select(
        "l_returnflag",
        "n",
        mean.alias("mean"),
        r2.alias("r2"),
        r3.alias("r3"),
        r4.alias("r4"),
    )
    mc = F.col("mean")
    m2 = F.col("r2") - mc * mc
    m3 = (
        F.col("r3")
        - F.lit(3.0) * mc * F.col("r2")
        + F.lit(2.0) * ((mc * mc) * mc)
    )
    m4 = (
        F.col("r4")
        - F.lit(4.0) * mc * F.col("r3")
        + F.lit(6.0) * (mc * mc) * F.col("r2")
        - F.lit(3.0) * ((mc * mc) * (mc * mc))
    )
    c = m.select("l_returnflag", "n", "mean", m2.alias("m2"),
                 m3.alias("m3"), m4.alias("m4"))
    return c.select(
        "l_returnflag",
        "n",
        "mean",
        # NULLIF: a constant group has m2 == 0 exactly (integer-sum
        # arithmetic) and skew/kurtosis are undefined — NULL on both
        # engines, never an ANSI DIVIDE_BY_ZERO (invariant #10)
        (
            F.col("m3")
            / F.nullif(F.col("m2") * F.sqrt("m2"), F.lit(0.0))
        ).alias("skewness"),
        (
            F.col("m4") / F.nullif(F.col("m2") * F.col("m2"), F.lit(0.0))
            - F.lit(3.0)
        ).alias("excess_kurtosis"),
    )


DECAY_MAX_SHIFT = 62  # 1<<n stays in int64; weights below 2^-62 round to 0


@query(
    "agg_time_decay",
    oracle=f"""
WITH daily AS (
    SELECT user_id, value, event_id,
           -- floor(double division), NOT BIGINT //: DuckDB's integer
           -- // TRUNCATES toward zero while Spark's floor(µs/day)
           -- FLOORS — they diverge left of 1970 (negative-domain
           -- corpus catch, r10; NOTES invariant #12). The double
           -- program is exact: |epoch_us| < 2^53.
           CAST(floor(CAST(epoch_us(ts) AS DOUBLE)
                      / CAST(86400000000 AS DOUBLE)) AS BIGINT) AS day
    FROM events
), anchored AS (
    SELECT user_id, value, day,
           LEAST(MAX(day) OVER (PARTITION BY user_id) - day,
                 {DECAY_MAX_SHIFT}) AS delta
    FROM daily
)
SELECT user_id,
       COUNT(*) AS n_events,
       MAX(day) AS last_day,
       {sql_dsum('value / CAST((CAST(1 AS BIGINT) << delta) AS DOUBLE)')}
           AS decay_sum
FROM anchored
GROUP BY user_id
""",
)
def agg_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPONENTIAL TIME-DECAY aggregate per user (half-life = 1 day):
    each event contributes value x 0.5^(days before the user's most
    recent event) — the recency-weighted engagement score every
    ranking/feature pipeline keeps (and the time-indexed
    generalization of the reference validator's per-round EMA fold,
    reference neurons/validator.py:109,146: EMA weights by ROUND
    count, this weights by ELAPSED TIME, so irregular event gaps
    decay correctly instead of counting each event as one step).

    Exactness (the agg_ema discipline, without iteration): the decay
    weight is 2^-delta with INTEGER delta, built as division by a
    shifted int64 — a power-of-two division only changes the float's
    exponent, so value/2^delta is IEEE-EXACT on both engines, and
    the per-user sum goes through the decimal-stabilized dsum so it
    is order-independent. No libm pow/exp anywhere. delta caps at
    {DECAY_MAX_SHIFT} (shift stays in int64; a 2^-62 weight is below
    the 6dp sum quantum anyway — the cap is the deterministic
    version of 'too old to matter').

    Day-bucket exactness domain (ADVICE r10, the oracle's "exact"
    comment softened to its real bounds): the floor(double-division)
    day bucket is EXACT only while |epoch_us| < 2^53 — about ±285
    years of epoch (~years 1685-2255). Outside that the int64→double
    conversion may round before the divide; both engines then run
    the IDENTICAL rounded double program, so the Spark-vs-DuckDB
    differential still matches even where the bucket is no longer
    the true calendar day.

    Scale shape: one shuffle on user_id for the per-user anchor
    (MAX day window); the groupBy reuses the window's hash
    partitioning (no second exchange — same-key stages co-locate),
    partial+final agg preserved. At 100 TB this is the standard
    window+agg pair every per-entity feature job runs."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.select(
        "user_id",
        "value",
        F.floor(F.unix_micros(F.col("ts")) / F.lit(86400000000))
        .cast("long")
        .alias("day"),
    )
    w = Window.partitionBy("user_id")
    anchored = daily.select(
        "user_id",
        "value",
        "day",
        F.least(
            F.max("day").over(w) - F.col("day"), F.lit(DECAY_MAX_SHIFT)
        ).alias("delta"),
    )
    # F.shiftleft requires a literal bit count; the SQL form takes a
    # column
    term = F.col("value") / F.expr(
        "cast(shiftleft(cast(1 as bigint), cast(delta as int)) as double)"
    )
    out = anchored.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.max("day").alias("last_day"),
        dsum(term, "decay_sum"),
    )
    from map_reduce_subnet_spark.plans import count_exchanges

    n_ex = count_exchanges(out)
    if n_ex > 1:
        raise AssertionError(
            "agg_time_decay: the groupBy must reuse the window's "
            f"user_id partitioning (1 exchange), plan has {n_ex}"
        )
    return out


@query(
    "agg_trend_ols",
    oracle=f"""
WITH daily AS (
    SELECT event_type,
           -- floor(double division), NOT BIGINT // (truncates on
           -- negatives — see agg_time_decay / NOTES invariant #12)
           CAST(floor(CAST(epoch_us(ts) AS DOUBLE)
                      / CAST(86400000000 AS DOUBLE)) AS BIGINT) AS day,
           -- operand-domain precondition (r13): the measure is
           -- quantized to DECIMAL(15,6) — exact inside the measured
           -- |x| <= 1e9 cross-engine cast band, LOUD symmetric abort
           -- beyond it — and the x·y / y² summands are then decimal
           -- × decimal products (exact integer arithmetic, identical
           -- in both engines), never a double→decimal cast of a
           -- product that can cross the band (the r12 mid-band
           -- divergence this rewrite closes). v6 = the measure in
           -- integer MICRO-UNITS: inner cast = the loud domain,
           -- widen to width 19 (forces DuckDB's decimal multiply
           -- onto HUGEINT storage — width <= 18 operands multiply in
           -- raw INT64 there and overflow at unscaled ~9.2e18),
           -- ×1e6 then scale-0 recast, all exact. Scale-0 matters at
           -- the OUTPUT boundary too: DuckDB converts decimal→double
           -- as (double)unscaled / 10^scale — a double rounding that
           -- diverges from Spark's correctly-rounded conversion at
           -- 1 ulp for large scale-6/12 sums — while a scale-0
           -- decimal→double is one correctly-rounded conversion on
           -- both engines, and the explicit /1e6 (/1e12) afterwards
           -- is the identical IEEE op on both sides.
           CAST(CAST(CAST({_sql_finite('value')} AS DECIMAL(15,6))
                     AS DECIMAL(19,6)) * 1000000 AS DECIMAL(19,0)) AS v6
    FROM events
), sums AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(day) AS BIGINT) AS sx,
           CAST(SUM(day * day) AS BIGINT) AS sxx,
           CAST(SUM(v6) AS DOUBLE) / 1e6 AS sy,
           CAST(SUM(CAST(day AS DECIMAL(19,0)) * v6) AS DOUBLE) / 1e6
               AS sxy,
           CAST(SUM(v6 * v6) AS DOUBLE) / 1e12 AS syy
    FROM daily GROUP BY event_type
)
SELECT event_type, n,
       (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
           / NULLIF(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0) AS slope,
       (sy - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
              / NULLIF(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0))
            * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept,
       ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy))
           / NULLIF((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * (CAST(n AS DOUBLE) * syy - sy * sy), 0.0) AS r_squared
FROM sums
""",
)
def agg_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-GROUP OLS TREND — closed-form least-squares of value
    against event day per event_type: slope (the drift-per-day a
    monitoring dashboard alerts on — the time-axis complement of
    text_source_drift_jsd's distribution-axis drift), intercept, and
    r² (how linear the drift actually is). The same
    exact-power-sums-then-closed-form discipline as text_zipf_slope
    and agg_skew_kurtosis, generalized to a two-variable regression.

    Exactness (r13 rewrite): x = integer day (exact int64 sums for
    Σx, Σx²); the measure is quantized ONCE to DECIMAL(15,6) — exact
    inside the measured |x| ≤ 1e9 cross-engine cast band, loud
    symmetric abort beyond (the operand-domain precondition) — and
    Σy, Σxy, Σy² are then decimal×decimal sums (exact integer
    arithmetic, order-independent, identical in both engines);
    slope/intercept/r² are one fixed expression tree of those sums —
    bit-exact across engines, no iterative fitting anywhere. The r12
    mid-band probe caught the previous spelling (dsum of the DOUBLE
    product day·value) diverging at raw ~1e8: the product summand
    crossed the double→decimal cast band and the cancellation form
    n·Σxy − Σx·Σy amplified the ulp drift; multiplying IN decimal
    removes the product cast entirely.

    Degenerate groups (tie-corpus differential catch, late r9): a
    group whose observations all share one day has zero x-variance —
    the denominator n·Σx²−(Σx)² is exactly 0 (it is built from exact
    int64 sums, so both engines agree on the zero) and the slope is
    statistically undefined. Convention: NULL, the REGR_SLOPE
    behavior — spelled NULLIF(den, 0) on BOTH engines so neither
    ANSI-errors (Spark) nor silently infs (the zero-variance r²
    denominator likewise). Intercept inherits NULL through the slope
    term. A 100 TB corpus always has some single-day group; the
    fixtures never do, which is why only the tie-stress corpus
    caught it.

    Scale shape: ONE partial+final aggregate — six running sums with
    map-side combine, a handful of rows to the final stage; this is
    the textbook 'regression as an aggregate' plan that costs the
    same as a COUNT at 100 TB. Grounding: per-round moving score
    statistics (reference neurons/validator.py:134-151)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.select(
        "event_type",
        F.floor(F.unix_micros(F.col("ts")) / F.lit(86400000000))
        .cast("long")
        .alias("day"),
        # v6 = measure in integer micro-units: the DECIMAL(15,6)
        # quantization is the operand-domain precondition (exact for
        # |value| < 1e9, loud symmetric cast abort beyond); ×1e6 +
        # scale-0 recast keeps every downstream sum at scale 0, whose
        # decimal→double output cast is a SINGLE correctly-rounded
        # conversion on both engines (see oracle comment)
        (_finite(F.col("value")).cast("decimal(15,6)") * F.lit(1000000))
        .cast("decimal(19,0)")
        .alias("v6"),
    )
    dd = F.col("day").cast("decimal(12,0)")
    sums = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("day").alias("sx"),
        F.sum(F.col("day") * F.col("day")).alias("sxx"),
        # decimal×decimal summands: exact, order-independent,
        # band-proof (never a double→decimal cast of a product);
        # the /1e6 and /1e12 descale divisions are the identical
        # IEEE double op on both engines
        (F.sum("v6").cast("double") / F.lit(1e6)).alias("sy"),
        (F.sum(dd * F.col("v6")).cast("double") / F.lit(1e6)).alias("sxy"),
        (F.sum(F.col("v6") * F.col("v6")).cast("double") / F.lit(1e12))
        .alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    num = n * F.col("sxy") - sx * F.col("sy")
    # NULLIF, not a raw divide: zero x-variance (every row on one
    # day) must yield NULL, never an ANSI DIVIDE_BY_ZERO
    den = F.nullif(n * sxx - sx * sx, F.lit(0.0))
    slope = num / den
    r2_den = F.nullif(
        (n * sxx - sx * sx)
        * (n * F.col("syy") - F.col("sy") * F.col("sy")),
        F.lit(0.0),
    )
    return sums.select(
        "event_type",
        "n",
        slope.alias("slope"),
        ((F.col("sy") - slope * sx) / n).alias("intercept"),
        ((num * num) / r2_den).alias("r_squared"),
    )
