"""Analytics extensions beyond the literal SURVEY §2.2 inventory:
pivot/unpivot reshaping, exact percentiles, ordered string aggregation,
and correlation — the remainder of a production analytics surface.

Grounding: these are the closure of the reference's columnar state
table (reference neurons/miner.py:181-188 — metagraph columns reshaped
per-uid) and score-statistics reporting (reference
neurons/validator.py:144-151) over standard warehouse reshaping ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from map_reduce_subnet_spark.functions.stable import (
    dsum,
    dsum_wide,
    sql_dsum,
    sql_dsum_wide,
)
from map_reduce_subnet_spark.plans.inspect import count_exchanges
from map_reduce_subnet_spark.operators.registry import query
from map_reduce_subnet_spark.sources.tables import load_table


@query(
    "agg_pivot",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(CASE WHEN l_linestatus = 'F' THEN l_quantity END
                     AS DECIMAL(27,6))) AS DOUBLE) AS F,
       CAST(SUM(CAST(CASE WHEN l_linestatus = 'O' THEN l_quantity END
                     AS DECIMAL(27,6))) AS DOUBLE) AS O,
       CAST(SUM(CAST(CASE WHEN l_linestatus = 'P' THEN l_quantity END
                     AS DECIMAL(27,6))) AS DOUBLE) AS P
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one column per linestatus, decimal-exact sums. Pivot
    values are DECLARED (not discovered) — at scale, discovery would
    need an extra pass and produce an unbounded schema."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O", "P"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(27,6)")).cast("double"))
    )


@query(
    "agg_unpivot",
    oracle="""
SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS val
FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_extendedprice' AS metric,
       l_extendedprice AS val
FROM lineitem
""",
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide metrics → long (metric, val) rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice"],
        "metric",
        "val",
    )


@query(
    "agg_percentile",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS p50,
       quantile_cont(l_extendedprice, 0.9) AS p90,
       quantile_cont(l_extendedprice, 0.99) AS p99
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (p50/p90/p99). Both engines use
    linear interpolation on the sorted values — bit-exact parity.
    The approximate path for unbounded cardinality is
    approx_percentile (same shape as agg_approx_distinct's HLL).

    One array-argument percentile call, not three scalar ones: each
    scalar percentile aggregate buffers the group's values
    independently, so the three-call form pays the per-group value
    buffer (the operator's real cost) three times over."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "percentile(l_extendedprice, array(0.5D, 0.9D, 0.99D))"
            ).alias("ps")
        )
        .select(
            "l_returnflag",
            F.col("ps")[0].alias("p50"),
            F.col("ps")[1].alias("p90"),
            F.col("ps")[2].alias("p99"),
        )
    )


@query(
    "agg_string_agg",
    oracle="""
SELECT l_orderkey,
       string_agg(CAST(l_linenumber AS VARCHAR), ','
                  ORDER BY CAST(l_linenumber AS VARCHAR)) AS lines
FROM lineitem
GROUP BY l_orderkey
""",
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: collect, SORT (determinism under
    shuffle), join — the portable listagg."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.concat_ws(
            ",",
            F.array_sort(F.collect_list(F.col("l_linenumber").cast("string"))),
        ).alias("lines")
    )


# Operand-domain precondition for agg_corr (r13 out-of-domain round):
# both measures are quantized to DECIMAL(15,6), which (a) is exact —
# the double→decimal cast was measured identical across engines for
# |x| ≤ 1e9 (stable.py::SUM_DECIMAL band notes) and DECIMAL(15,6)
# admits exactly that range — and (b) IS the loud precondition: a
# finite measure at |x| ≥ 1e9 aborts the cast on BOTH engines (Spark
# ANSI NUMERIC_VALUE_OUT_OF_RANGE, DuckDB ConversionException), the
# symmetric-refusal posture of the decimal band edge, instead of the
# silent mid-band drift the r12 probe measured when the PRODUCT
# summands (qty·price ~1e12 at raw 1e8) crossed the cast-divergence
# band and the cancellation closed form amplified it.
CORR_FACTOR_DECIMAL = "DECIMAL(15,6)"


@query(
    "agg_corr",
    oracle=f"""
WITH p AS (
    -- x6/y6 = the measures in integer MICRO-UNITS: the inner
    -- DECIMAL(15,6) cast is the loud |x| < 1e9 domain precondition;
    -- the widen to width 19 forces DuckDB's decimal multiply onto
    -- HUGEINT storage (width <= 18 operands multiply in raw INT64
    -- there and overflow at unscaled ~9.2e18); ×1e6 + scale-0 recast
    -- keeps every sum at scale 0, whose decimal→double output cast
    -- is a SINGLE correctly-rounded conversion on both engines
    -- (DuckDB double-rounds scale-s decimals via
    -- (double)unscaled / 10^s) — the /1e6 descale afterwards is the
    -- identical IEEE op on both sides
    SELECT l_returnflag,
           CASE WHEN ISFINITE(l_quantity) AND ISFINITE(l_extendedprice)
                THEN CAST(CAST(CAST(l_quantity AS {CORR_FACTOR_DECIMAL})
                               AS DECIMAL(19,6)) * 1000000
                          AS DECIMAL(19,0)) END AS x6,
           CASE WHEN ISFINITE(l_quantity) AND ISFINITE(l_extendedprice)
                THEN CAST(CAST(CAST(l_extendedprice
                                    AS {CORR_FACTOR_DECIMAL})
                               AS DECIMAL(19,6)) * 1000000
                          AS DECIMAL(19,0)) END AS y6
    FROM lineitem
), sums AS (
    SELECT l_returnflag,
           CAST(COUNT(x6) AS DOUBLE) AS n,
           CAST(SUM(x6) AS DOUBLE) / 1e6 AS sx,
           CAST(SUM(y6) AS DOUBLE) / 1e6 AS sy,
           CAST(SUM(x6 * x6) AS DOUBLE) / 1e12 AS sxx,
           CAST(SUM(y6 * y6) AS DOUBLE) / 1e12 AS syy,
           CAST(SUM(x6 * y6) AS DOUBLE) / 1e12 AS sxy,
           -- exact integer compare: TRUE iff the group is constant
           -- in that measure (restores the built-ins' exact-zero
           -- variance for constant groups, which the double closed
           -- form cannot guarantee under cancellation)
           (MIN(x6) = MAX(x6)) AS const_x,
           (MIN(y6) = MAX(y6)) AS const_y
    FROM p GROUP BY l_returnflag
), v AS (
    SELECT l_returnflag, n, sx, sy, sxy,
           -- GREATEST clamp: near-constant groups can round the
           -- cancellation form a hair below zero; identical double
           -- program both sides, clamped identically
           CASE WHEN const_x THEN 0.0
                ELSE GREATEST(n * sxx - sx * sx, 0.0) END AS vx,
           CASE WHEN const_y THEN 0.0
                ELSE GREATEST(n * syy - sy * sy, 0.0) END AS vy
    FROM sums
)
SELECT l_returnflag,
       ROUND((n * sxy - sx * sy)
             / NULLIF(sqrt(vx) * sqrt(vy), 0.0), 9) AS qty_price_corr,
       ROUND((sxy - sx * sy / n) / NULLIF(n - 1.0, 0.0), 4)
           AS qty_price_covar
FROM v
""",
)
def agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation / covariance per group, from EXACT decimal
    co-moment sums (r13 rewrite): both measures are carried as
    integer MICRO-UNITS — cast through DECIMAL(15,6) per row (exact
    inside the measured |x| ≤ 1e9 cross-engine cast band;
    CORR_FACTOR_DECIMAL is also the loud operand-domain precondition
    beyond it), ×1e6, recast to scale 0 — so the five sums
    Σx Σy Σx² Σy² Σxy are exact decimal-integer arithmetic
    (order-independent, identical in both engines), their
    decimal→double OUTPUT casts are single correctly-rounded
    conversions on both sides (a scale-s sum is double-rounded in
    DuckDB via (double)unscaled/10^s), the /1e6 (/1e12) descales are
    the identical IEEE op, and the closed forms then run as one fixed
    double program on identical operands, hence bit-exact. The r9 built-in
    covar_samp/stddev_samp spelling agreed only to ~1 ulp (one-pass
    co-moment recurrences are float-order-dependent) and the r12
    mid-band probe measured it diverging at raw ~1e8, where the
    product summands crossed the cast band and the cancellation form
    n·Σxy − Σx·Σy amplified the drift past the output rounding.

    Conventions preserved from the r9 spelling: zero-variance groups
    → NULL corr (NULLIF, never ANSI DIVIDE_BY_ZERO — invariant #10);
    n=1 groups → NULL covar (sample convention, NULLIF(n−1)); a row
    participates only when BOTH measures are finite (pairwise drop —
    the covar_samp NULL-pair rule extended to NaN/±Inf, symmetric on
    both engines).

    Scale shape: one scan, five map-side partial decimal sums, one
    shuffle on the group key — regression-as-an-aggregate, same cost
    as a COUNT at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    from map_reduce_subnet_spark.functions.stable import _finite

    xf = _finite(F.col("l_quantity"))
    yf = _finite(F.col("l_extendedprice"))
    pair_ok = xf.isNotNull() & yf.isNotNull()
    dec = CORR_FACTOR_DECIMAL.lower()
    mega = F.lit(1000000)
    p = li.select(
        "l_returnflag",
        # integer micro-units (see oracle comment): domain-checked
        # decimal cast, ×1e6, scale-0 recast — all exact
        (F.when(pair_ok, F.col("l_quantity")).cast(dec) * mega)
        .cast("decimal(19,0)")
        .alias("x6"),
        (F.when(pair_ok, F.col("l_extendedprice")).cast(dec) * mega)
        .cast("decimal(19,0)")
        .alias("y6"),
    )
    sums = p.groupBy("l_returnflag").agg(
        F.count("x6").cast("double").alias("n"),
        (F.sum("x6").cast("double") / F.lit(1e6)).alias("sx"),
        (F.sum("y6").cast("double") / F.lit(1e6)).alias("sy"),
        (F.sum(F.col("x6") * F.col("x6")).cast("double") / F.lit(1e12))
        .alias("sxx"),
        (F.sum(F.col("y6") * F.col("y6")).cast("double") / F.lit(1e12))
        .alias("syy"),
        (F.sum(F.col("x6") * F.col("y6")).cast("double") / F.lit(1e12))
        .alias("sxy"),
        # exact integer compare (see oracle comment): constant group
        # ⇒ exact-zero variance, like the built-ins guaranteed
        (F.min("x6") == F.max("x6")).alias("const_x"),
        (F.min("y6") == F.max("y6")).alias("const_y"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    zero = F.lit(0.0)
    vx = F.when(F.col("const_x"), zero).otherwise(
        F.greatest(n * sxx - sx * sx, zero)
    )
    vy = F.when(F.col("const_y"), zero).otherwise(
        F.greatest(n * syy - sy * sy, zero)
    )
    v = sums.select(
        "l_returnflag", "n", "sx", "sy", "sxy",
        vx.alias("vx"), vy.alias("vy"),
    )
    corr = (n * sxy - sx * sy) / F.nullif(
        F.sqrt("vx") * F.sqrt("vy"), zero
    )
    covar = (sxy - sx * sy / n) / F.nullif(n - F.lit(1.0), zero)
    return v.select(
        "l_returnflag",
        F.round(corr, 9).alias("qty_price_corr"),
        F.round(covar, 4).alias("qty_price_covar"),
    )


def _pagerank_oracle(n_iters: int = 5) -> str:
    """Generate the DuckDB twin of graph_pagerank: the iteration count
    is FIXED, so the 'iterative' fixpoint unrolls into chained CTEs
    running the bit-identical float program — per-edge contribution
    rank*p in double, quantized via CAST(.. AS DECIMAL(27,6)) (the
    dsum discipline, order-independent), damped update
    (1.0-0.85)/n + 0.85*s in the same operation sequence the Spark
    side executes. This is what promotes PageRank from rows-only to a
    full differential oracle."""
    iters = []
    prev = "r0"
    for i in range(1, n_iters + 1):
        iters.append(f"""
r{i} AS (
    SELECT n.src,
           (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
             + CAST(0.85 AS DOUBLE) * COALESCE(s.s, CAST(0.0 AS DOUBLE))
             AS rank
    FROM nodes n
    CROSS JOIN nn
    LEFT JOIN (
        SELECT t.dst AS src,
               CAST(SUM(CAST(r.rank * t.p AS DECIMAL(27,6))) AS DOUBLE) AS s
        FROM {prev} r JOIN trans t ON r.src = t.src
        GROUP BY t.dst
    ) s ON n.src = s.src
)""")
        prev = f"r{i}"
    return f"""
WITH cs AS (
    SELECT o.o_custkey AS cust, l.l_suppkey + 10000000 AS supp,
           COUNT(*) AS w
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
), edges AS (
    SELECT cust AS src, supp AS dst, w FROM cs
    UNION ALL
    SELECT supp AS src, cust AS dst, w FROM cs
), ow AS (
    SELECT src, SUM(w) AS ow FROM edges GROUP BY src
), trans AS (
    SELECT e.src, e.dst, CAST(e.w AS DOUBLE) / CAST(o.ow AS DOUBLE) AS p
    FROM edges e JOIN ow o ON e.src = o.src
), nodes AS (
    SELECT DISTINCT src FROM edges
), nn AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes
), r0 AS (
    SELECT src, CAST(1.0 AS DOUBLE) / nn.n AS rank FROM nodes, nn
),{",".join(iters)}
SELECT src AS node_id,
       CASE WHEN src >= 10000000 THEN 'supplier' ELSE 'customer' END
           AS kind,
       rank
FROM {prev}
ORDER BY rank DESC, node_id ASC
LIMIT 20
"""


@query("graph_pagerank", oracle=_pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the customer–supplier trade graph
    (lineitem ⋈ orders gives cust↔supp edges weighted by line count;
    suppliers offset into their own id space) — the "dominant peer"
    centrality of reference README.md:18 computed honestly instead of
    by degree. 5 damped iterations (d = 0.85), undirected bipartite
    (each edge contributes both directions).

    Scale shape per iteration: contributions = ranks ⋈ edges on the
    source node (hash equi-join) → groupBy(dst) with map-side partial
    aggregation; each contribution is decimal-quantized (dsum) so the
    reduce is order-independent ⇒ deterministic ranks ⇒ golden-
    pinnable (tests pin numpy power-iteration parity). Ranks are
    checkpointed per iteration (stable_checkpoint, the dedup_cluster
    pattern) so iteration i's plan doesn't replay iterations 0..i-1;
    nothing iteration-sized ever reaches the driver. Dangling nodes
    cannot occur (every node has ≥1 edge by construction), so the
    damping term needs no dangling-mass correction."""
    from map_reduce_subnet_spark.functions.checkpoint import (
        stable_checkpoint,
    )
    from map_reduce_subnet_spark.functions.stable import SUM_DECIMAL

    supp_offset = 10_000_000
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("o_custkey").alias("cust"),
            (F.col("l_suppkey") + supp_offset).alias("supp"),
        )
        .agg(F.count("*").alias("w"))
    )
    edges = cs.select(
        F.col("cust").alias("src"), F.col("supp").alias("dst"), "w"
    ).unionByName(
        cs.select(
            F.col("supp").alias("src"), F.col("cust").alias("dst"), "w"
        )
    )
    out_w = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    # normalized transition weight, fixed once (edges are iteration-
    # invariant — checkpoint severs the build lineage)
    trans = stable_checkpoint(
        edges.join(out_w, "src").select(
            "src", "dst", (F.col("w") / F.col("ow")).alias("p")
        )
    )
    # r16 opt (guide §2.4 — don't recompute what a checkpoint already
    # materialized): the node set used to be distinct(src) over edges,
    # which re-derived the whole lineitem⋈orders + groupBy subtree a
    # second time AFTER trans had just materialized it. trans has
    # exactly the same src set (it is edges ⋈ out_w on src, and out_w
    # contains every src of edges by construction, so the inner join
    # preserves every src) — distinct over the checkpointed trans
    # blocks instead. Interleaved A/B min-of-5: 6.32 → 5.05 s.
    # (A cs-level checkpoint was ALSO tried and was a net LOSS — it
    # changed trans's partition layout and slowed all 5 iterations;
    # measured full-query A/B 5.84 → 7.05 s, kept out.)
    nodes = stable_checkpoint(trans.select("src").distinct())
    n_nodes = nodes.count()
    if n_nodes == 0:  # empty corpus: no edges, typed empty result
        return spark.createDataFrame(
            [], "node_id long, kind string, rank double"
        )
    ranks = nodes.select("src", F.lit(1.0 / n_nodes).alias("rank"))
    d = 0.85
    # r15 opt (guide §2.4 "remove shuffles/joins outright"): instead of
    # LEFT-joining nodes back onto the contribution aggregate to
    # resurrect nodes with no inbound mass, union one exact-zero
    # contribution row per node INTO the aggregate — the zero rows ride
    # the same single exchange, every node is guaranteed a group, and
    # the per-iteration join disappears. Σ(decimal)+0 is the same exact
    # decimal, so ranks are bit-identical (verified: variant
    # .equals(old) over all 5 iterations; diffcheck MATCH).
    zero = nodes.select("src", F.lit(0.0).alias("c"))
    for _ in range(5):
        contrib = (
            ranks.join(trans, "src")
            .select(
                F.col("dst").alias("src"),
                (F.col("rank") * F.col("p")).alias("c"),
            )
            .unionByName(zero)
            .groupBy("src")
            .agg(F.sum(F.col("c").cast(SUM_DECIMAL)).cast("double").alias("s"))
        )
        # per-iteration checkpoint: measured FASTER than batching two
        # iterations per checkpoint (the deeper plan re-executes the
        # join inside one job and loses AQE's per-stage
        # coalescing) — don't "optimize" this without re-measuring
        ranks = stable_checkpoint(
            contrib.select(
                "src",
                (
                    F.lit((1.0 - d) / n_nodes) + F.lit(d) * F.col("s")
                ).alias("rank"),
            )
        )
    return (
        ranks.select(
            F.col("src").alias("node_id"),
            F.when(F.col("src") >= supp_offset, F.lit("supplier"))
            .otherwise(F.lit("customer"))
            .alias("kind"),
            # unrounded: identical float programs are bit-exact across
            # engines, ROUND itself is what diverges on exact halves
            "rank",
        )
        .orderBy(F.desc("rank"), F.asc("node_id"))
        .limit(20)
    )


@query(
    "funnel_conversion",
    oracle="""
WITH v AS (
    SELECT user_id, MIN(ts) AS t_view FROM events
    WHERE event_type = 'view' GROUP BY user_id
), c AS (
    SELECT e.user_id, MIN(e.ts) AS t_click
    FROM events e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'click' AND e.ts > v.t_view
    GROUP BY e.user_id
), p AS (
    SELECT e.user_id, MIN(e.ts) AS t_buy
    FROM events e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase' AND e.ts > c.t_click
    GROUP BY e.user_id
)
SELECT stage, n_users,
       CAST(n_users AS DOUBLE)
         / NULLIF(CAST((SELECT COUNT(*) FROM v) AS DOUBLE), 0.0)
           AS frac_of_entry
FROM (
    SELECT 'view' AS stage, (SELECT COUNT(*) FROM v) AS n_users
    UNION ALL
    SELECT 'click', (SELECT COUNT(*) FROM c)
    UNION ALL
    SELECT 'purchase', (SELECT COUNT(*) FROM p)
)
""",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users who viewed, then clicked
    AFTER their first view, then purchased AFTER that first
    qualifying click (the reference's request→response→score
    progression, reference neurons/validator.py:120-141, as the
    product-analytics funnel every event warehouse ships).

    ORDERED semantics (each stage must happen after the previous
    stage's first qualifying event — strict >) is what makes this a
    real funnel rather than three independent filters.

    Scale shape (r7 rewrite, VERDICT r6 #8): the r6 form chained
    three per-stage groupBys + two equi-joins, scanning events three
    times. This form scans events ONCE and moves the fact through
    ONE user_id exchange: three chained unbounded window MINs over
    the same partitioning (Catalyst plans one Exchange+Sort feeding
    all three Window operators — t_click's predicate reads t_view,
    so they can't fuse into one Window, but they share the layout),
    then a per-user collapse that REUSES the window's partitioning
    (no second fact exchange — the plan lint pins exactly 2
    exchanges: the user_id shuffle and the final one-row scalar
    aggregate), then stack() to the 3-row stage layout. NULL
    propagation does the stage gating for free: ts > NULL is NULL,
    so a user with no view never acquires a click or purchase."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "t_view",
            F.min(
                F.when(F.col("event_type") == "view", F.col("ts"))
            ).over(w),
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") > F.col("t_view")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t_buy",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t_click")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    # Window values are constant per user, so first() is deterministic;
    # the groupBy reuses the window's hash partitioning (no exchange).
    per_user = staged.groupBy("user_id").agg(
        F.first("t_view").alias("t_view"),
        F.first("t_click").alias("t_click"),
        F.first("t_buy").alias("t_buy"),
    )
    tot = per_user.agg(
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_click"),
        F.count("t_buy").alias("n_buy"),
    )
    out = tot.selectExpr(
        "stack(3, 'view', n_view, 'click', n_click, "
        "'purchase', n_buy) as (stage, n_users)",
        "n_view",
    ).select(
        "stage",
        "n_users",
        # NULLIF(n_view): an event slice with zero entry-stage users is
        # legitimate at 100 TB; the fraction is undefined there, never
        # an ANSI abort (NOTES invariant #10; r10 degenerate sweep)
        (
            F.col("n_users").cast("double")
            / F.nullif(F.col("n_view").cast("double"), F.lit(0.0))
        ).alias("frac_of_entry"),
    )
    n_ex = count_exchanges(out)
    if n_ex != 2:
        raise RuntimeError(
            f"funnel_conversion: expected 2 exchanges (user_id window "
            f"shuffle + one-row scalar agg), plan has {n_ex} — the "
            "per-user collapse stopped reusing the window partitioning"
        )
    return out


@query(
    "retention_cohort",
    oracle="""
WITH firsts AS (
    SELECT user_id,
           CAST(epoch(date_trunc('week', MIN(ts))) AS BIGINT) AS cohort_s
    FROM events GROUP BY user_id
), activity AS (
    SELECT DISTINCT user_id,
           CAST(epoch(date_trunc('week', ts)) AS BIGINT) AS week_s
    FROM events
)
SELECT f.cohort_s AS cohort_week,
       (a.week_s - f.cohort_s) // 604800 AS week_offset,
       COUNT(*) AS n_users
FROM activity a JOIN firsts f ON a.user_id = f.user_id
GROUP BY 1, 2
""",
)
def retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week,
    counted in each subsequent week they return (the weeks-since-
    signup triangle every growth dashboard draws; the reference's
    staleness window, neurons/validator.py:166-170, asks the same
    "seen again since?" question per peer).

    Week arithmetic runs on epoch SECONDS (BIGINT) — date_trunc week
    is Monday-aligned in both engines, and the offset is an exact
    integer division of the second delta, immune to timestamp
    representation. Scale shape: first-week is a partial-aggregated
    per-user MIN; activity is a per-user-week distinct (both shuffle
    on user_id and combine map-side); the final matrix groupBy is
    O(cohorts × offsets) rows. Counting rows of the distinct
    activity⋈cohort join needs no countDistinct at the matrix level."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.unix_timestamp(F.date_trunc("week", F.min("ts"))).alias(
            "cohort_s"
        )
    )
    activity = ev.select(
        "user_id",
        F.unix_timestamp(F.date_trunc("week", F.col("ts"))).alias("week_s"),
    ).distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            F.col("cohort_s").alias("cohort_week"),
            ((F.col("week_s") - F.col("cohort_s")) / 604800)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


@query(
    "sql_pipe_syntax",
    oracle=f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
       {sql_dsum("l_extendedprice")} AS sum_price
FROM lineitem
WHERE l_quantity < 25
GROUP BY l_returnflag, l_linestatus
HAVING COUNT(*) > 100
""",
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL PIPE syntax (`|>`): the same
    scan → filter → aggregate → post-filter program written as a
    linear pipeline instead of nested SELECT clauses — the modern SQL
    authoring surface. Catalyst produces the identical plan as the
    clause form (pipe stages are pure sugar over the same logical
    operators: pushdown, partial aggregation and the HAVING-style
    post-filter all behave exactly as in agg_having), and the oracle
    is plain ANSI SQL — semantics, not syntax, are the contract. The
    decimal-exact sum keeps the aggregate order-independent across
    engines (functions/stable.py)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "mrs_pipe_lineitem"
    )
    try:
        out = spark.sql(
            """
            FROM mrs_pipe_lineitem
            |> WHERE l_quantity < 25
            |> AGGREGATE COUNT(*) AS n_rows,
                         CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6)))
                              AS DOUBLE) AS sum_price
               GROUP BY l_returnflag, l_linestatus
            |> WHERE n_rows > 100
            |> SELECT l_returnflag, l_linestatus, n_rows, sum_price
            """
        ).localCheckpoint(eager=True)
    finally:
        spark.catalog.dropTempView("mrs_pipe_lineitem")
    return out


@query(
    "observe_metrics",
    oracle=f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_discounted,
       {sql_dsum_wide("l_extendedprice")} AS sum_price
FROM lineitem
""",
)
def observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-attached OBSERVED METRICS (df.observe + Observation):
    pipeline-health counters — row count, rule-violation count, a
    control-total sum — ride the SAME scan as the main action instead
    of paying a second pass, which is how a production pipeline
    instruments itself at 100 TB (a separate metrics query would
    double the I/O). The action is a noop-sink write (scans every
    row, writes nothing); the observed values are then surfaced as a
    one-row frame and differentially checked against computing the
    same aggregates the ordinary way — proving the side channel
    reports exactly what a dedicated query would."""
    from pyspark.sql import Observation

    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation()
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("l_discount") > 0.05).cast("long")).alias(
            "n_discounted"
        ),
        # wide-domain sum (r14): observed metrics allow arithmetic
        # over multiple aggregates, so the two-limb recombine rides
        # the side channel unchanged (clears the r13 EXTREME_DRIFT
        # pin at raw ~1e20)
        dsum_wide("l_extendedprice", "sum_price"),
    )
    observed.write.format("noop").mode("overwrite").save()
    row = obs.get
    return spark.createDataFrame(
        [(row["n_rows"], row["n_discounted"], row["sum_price"])],
        "n_rows long, n_discounted long, sum_price double",
    )


@query(
    "window_cumulative_uniques",
    oracle="""
WITH firsts AS (
    SELECT user_id,
           MIN(CAST(epoch(date_trunc('day', ts)) AS BIGINT)) AS first_day_s
    FROM events GROUP BY user_id
), daily AS (
    SELECT first_day_s AS day_epoch_s, COUNT(*) AS new_users
    FROM firsts GROUP BY first_day_s
)
SELECT day_epoch_s, new_users,
       CAST(SUM(new_users) OVER (ORDER BY day_epoch_s) AS BIGINT)
           AS cum_users
FROM daily
""",
)
def window_cumulative_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative DISTINCT users by day — the growth-dashboard metric
    a naive COUNT(DISTINCT) OVER (ORDER BY day) cannot express in
    Spark (distinct window aggregates are unsupported) and would be
    quadratic anyway. The scale formulation: distinct-ness collapses
    to each user's FIRST day (one per-user MIN, map-side combined),
    daily new-user counts aggregate those firsts, and the cumulative
    sum is a window over the DAY-cardinality frame — the unbounded
    running sum touches dozens of rows, never the fact table.

    Scale shape: one shuffle on user_id (partial-agg'd MIN), one tiny
    shuffle on day, and a single-partition window over O(days) rows —
    the same two-level collapse that makes agg_bitmap_distinct's
    per-day exact distincts mergeable. Days travel as BIGINT epoch
    seconds (the retention_cohort representation-free discipline —
    DATE columns hit cross-engine pandas dtype mismatches)."""
    ev = load_table(spark, sf_dir, "events")
    firsts = (
        ev.select(
            "user_id",
            F.expr("unix_micros(date_trunc('day', ts)) div 1000000").alias(
                "d"
            ),
        )
        .groupBy("user_id")
        .agg(F.min("d").alias("first_day_s"))
    )
    daily = firsts.groupBy(F.col("first_day_s").alias("day_epoch_s")).agg(
        F.count("*").alias("new_users")
    )
    w = Window.orderBy("day_epoch_s").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return daily.select(
        "day_epoch_s",
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cum_users"),
    )


@query(
    "agg_gini_concentration",
    oracle=f"""
WITH rev AS (
    SELECT l_suppkey,
           {sql_dsum_wide('l_extendedprice * (1 - l_discount)')}
               AS revenue
    FROM lineitem GROUP BY l_suppkey
), ranked AS (
    SELECT revenue,
           ROW_NUMBER() OVER (ORDER BY revenue, l_suppkey) AS i,
           COUNT(*) OVER () AS n
    FROM rev
), sums AS (
    SELECT CAST(MAX(n) AS BIGINT) AS n_suppliers,
           {sql_dsum_wide('revenue')} AS total_revenue,
           -- rank-weighted sum at shift 45: i·revenue can sit
           -- n_suppliers× above the largest revenue, so the limb
           -- split needs the wider exactness band (edge ~3.5e22)
           {sql_dsum_wide('i * revenue', 45)} AS iw
    FROM ranked
)
SELECT n_suppliers, total_revenue,
       CAST(2.0 AS DOUBLE) * iw
           / (CAST(n_suppliers AS DOUBLE) * total_revenue)
           - (CAST(n_suppliers AS DOUBLE) + CAST(1.0 AS DOUBLE))
             / CAST(n_suppliers AS DOUBLE) AS gini
FROM sums
""",
)
def agg_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic-concentration measurement: the GINI coefficient of
    per-supplier revenue — the reference's dominant-peer worry
    (README.md:18) as a single auditable number (0 = uniform load,
    →1 = one supplier carries everything). Uses the sorted-rank
    identity G = 2·Σ(i·x_(i))/(n·Σx) − (n+1)/n, so the whole
    computation is one partial-agg'd revenue rollup, one sort of the
    SUPPLIER-cardinality frame (never the fact table), and a scalar
    aggregate. Rank-weighted and plain sums are wide-domain two-limb
    quantized (stable.py::dsum_wide, r14 — order-independent AND
    cross-engine exact out to the band edge, clearing the r13
    EXTREME_DRIFT pin; the rank-weighted sum uses shift 45 because
    i·revenue can sit n_suppliers× above the largest revenue); the
    closing expression is the identical IEEE double program in both
    engines.

    The global row_number window runs over suppliers (10k at sf1),
    not lineitems — the bounded-dimension exception the window-scale
    rule allows (SCALE.md §E)."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            dsum_wide(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
            )
        )
    )
    w = Window.orderBy("revenue", "l_suppkey")
    ranked = rev.select(
        "revenue",
        F.row_number().over(w).alias("i"),
    )
    agg = ranked.agg(
        F.count("*").alias("n_suppliers"),
        dsum_wide("revenue", "total_revenue"),
        dsum_wide(F.col("i") * F.col("revenue"), "iw", shift=45),
    )
    nd = F.col("n_suppliers").cast("double")
    return agg.select(
        "n_suppliers",
        "total_revenue",
        (
            F.lit(2.0) * F.col("iw") / (nd * F.col("total_revenue"))
            - (nd + F.lit(1.0)) / nd
        ).alias("gini"),
    )


def _triangle_oracle() -> str:
    from map_reduce_subnet_spark.operators.llm import _minhash_ctes

    return f"""
WITH {_minhash_ctes()},
tri AS (
    SELECT e1.a_id AS a, e1.b_id AS b, e2.b_id AS c
    FROM mh_pairs e1
    JOIN mh_pairs e2 ON e1.b_id = e2.a_id
    JOIN mh_pairs e3 ON e3.a_id = e1.a_id AND e3.b_id = e2.b_id
),
deg AS (
    SELECT id, COUNT(*) AS deg FROM (
        SELECT a_id AS id FROM mh_pairs
        UNION ALL SELECT b_id AS id FROM mh_pairs
    ) GROUP BY id
),
ntri AS (
    SELECT id, COUNT(*) AS tri FROM (
        SELECT a AS id FROM tri
        UNION ALL SELECT b AS id FROM tri
        UNION ALL SELECT c AS id FROM tri
    ) GROUP BY id
),
pernode AS (
    SELECT d.id AS node_id, d.deg AS deg,
           COALESCE(n.tri, CAST(0 AS BIGINT)) AS tri
    FROM deg d LEFT JOIN ntri n ON n.id = d.id
),
tot AS (
    SELECT (SELECT COUNT(*) FROM mh_pairs) AS n_edges,
           (SELECT COUNT(*) FROM tri) AS n_tri,
           (SELECT COALESCE(SUM((deg * (deg - 1)) // 2), CAST(0 AS BIGINT))
            FROM deg) AS n_wedges
)
SELECT node_id, deg, tri,
       CASE WHEN deg < 2 THEN 0.0
            ELSE CAST(tri AS DOUBLE)
                 / (CAST(deg AS DOUBLE) * CAST(deg - 1 AS DOUBLE) / 2.0)
       END AS local_cc
FROM pernode
UNION ALL
SELECT CAST(-1 AS BIGINT) AS node_id, n_edges AS deg, n_tri AS tri,
       CASE WHEN n_wedges = 0 THEN 0.0
            ELSE CAST(3 * n_tri AS DOUBLE) / CAST(n_wedges AS DOUBLE)
       END AS local_cc
FROM tot
"""


@query("graph_triangle_count", oracle=_triangle_oracle())
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + clustering coefficients over the MinHash
    near-dup candidate graph: per node its degree, the number of
    triangles through it, and its local clustering coefficient
    (tri / C(deg,2)); one sentinel row (node_id = -1) carries the
    global view — edge count, total triangles, and the global
    (transitivity) coefficient 3·T / wedges. On a dedup candidate
    graph this measures how clique-like the duplicate neighborhoods
    are — near-1 local coefficients mean banding found coherent
    duplicate clusters, not hub-and-spoke hash collisions — the
    standard diagnostic before trusting connected components as
    cluster ids (graph_pagerank's centrality sibling; grounding:
    reference README.md:18's "dominant peer" analysis).

    Scale shape (the canonical MapReduce triangle enumeration, but as
    three declarative self-joins Catalyst plans with hash exchanges):
    edges are canonical a<b so each triangle a<b<c is emitted exactly
    once by joining edge(a,b)⋈edge(b,c) on the middle vertex and
    closing with edge(a,c). Cost is O(Σ deg²) wedge candidates — on a
    capped candidate graph (LSH_BUCKET_CAP bounds every bucket, so
    degrees are bounded) this cannot degenerate into the all-pairs
    blowup; the pair table is the materialized-once fixture artifact
    (_candidate_pairs_cached), so no MinHash re-computation. No
    driver-side iteration at all — one job, three shuffles on vertex
    keys.
    """
    from map_reduce_subnet_spark.functions.checkpoint import (
        stable_checkpoint,
    )
    from map_reduce_subnet_spark.operators.llm import (
        _candidate_pairs_cached,
    )

    pairs = _candidate_pairs_cached(spark, sf_dir)
    e1, e2, e3 = pairs.alias("e1"), pairs.alias("e2"), pairs.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b_id") == F.col("e2.a_id"))
        .join(
            e3,
            (F.col("e3.a_id") == F.col("e1.a_id"))
            & (F.col("e3.b_id") == F.col("e2.b_id")),
        )
        .select(
            F.col("e1.a_id").alias("a"),
            F.col("e1.b_id").alias("b"),
            F.col("e2.b_id").alias("c"),
        )
    )
    tri = stable_checkpoint(tri)
    deg = (
        pairs.select(F.col("a_id").alias("id"))
        .unionAll(pairs.select(F.col("b_id").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    ntri = (
        tri.select(F.col("a").alias("id"))
        .unionAll(tri.select(F.col("b").alias("id")))
        .unionAll(tri.select(F.col("c").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("tri"))
    )
    pernode = deg.join(ntri, "id", "left").select(
        F.col("id").alias("node_id"),
        "deg",
        F.coalesce(F.col("tri"), F.lit(0).cast("long")).alias("tri"),
        F.when(F.col("deg") < 2, F.lit(0.0))
        .otherwise(
            F.coalesce(F.col("tri"), F.lit(0).cast("long")).cast("double")
            / (
                F.col("deg").cast("double")
                * (F.col("deg") - 1).cast("double")
                / F.lit(2.0)
            )
        )
        .alias("local_cc"),
    )
    totals = (
        deg.agg(
            F.coalesce(
                F.sum(F.col("deg") * (F.col("deg") - 1) / 2).cast("long"),
                F.lit(0).cast("long"),
            ).alias("n_wedges")
        )
        .crossJoin(pairs.agg(F.count("*").alias("n_edges")))
        .crossJoin(tri.agg(F.count("*").alias("n_tri")))
        .select(
            F.lit(-1).cast("long").alias("node_id"),
            F.col("n_edges").alias("deg"),
            F.col("n_tri").alias("tri"),
            F.when(F.col("n_wedges") == 0, F.lit(0.0))
            .otherwise(
                (F.lit(3) * F.col("n_tri")).cast("double")
                / F.col("n_wedges").cast("double")
            )
            .alias("local_cc"),
        )
    )
    return pernode.unionByName(totals)


def _mi_oracle() -> str:
    from map_reduce_subnet_spark.functions.stable import portable_ln_stages

    stages = list(
        zip(
            portable_ln_stages("nm", "a_", "duckdb"),
            portable_ln_stages("dn", "b_", "duckdb"),
        )
    )
    ctes = []
    prev = "joined"
    for i, ((an, ae), (bn, be)) in enumerate(stages):
        name = f"p{i}"
        ctes.append(
            f"{name} AS (SELECT *, {ae} AS {an}, {be} AS {bn} FROM {prev})"
        )
        prev = name
    chain = ",\n".join(ctes)
    return f"""
WITH cells AS (
    SELECT event_type AS et, CAST(user_id % 8 AS BIGINT) AS bucket,
           COUNT(*) AS c_xy
    FROM events GROUP BY 1, 2
), cx AS (
    SELECT et, CAST(SUM(c_xy) AS BIGINT) AS c_x FROM cells GROUP BY et
), cy AS (
    SELECT bucket, CAST(SUM(c_xy) AS BIGINT) AS c_y
    FROM cells GROUP BY bucket
), tot AS (
    SELECT CAST(SUM(c_xy) AS BIGINT) AS n FROM cells
), joined AS (
    SELECT c.et, c.bucket, c.c_xy,
           c.c_xy * t.n AS nm, cx.c_x * cy.c_y AS dn, t.n AS n
    FROM cells c
    JOIN cx ON cx.et = c.et
    JOIN cy ON cy.bucket = c.bucket
    CROSS JOIN tot t
),
{chain},
scored AS (
    SELECT et, bucket, c_xy, (a_ln - b_ln) AS pmi,
           (CAST(c_xy AS DOUBLE) / CAST(n AS DOUBLE)) * (a_ln - b_ln)
               AS contrib
    FROM {prev}
)
SELECT et, bucket, c_xy, pmi FROM scored
UNION ALL
SELECT '__all__' AS et, CAST(-1 AS BIGINT) AS bucket,
       (SELECT n FROM tot) AS c_xy,
       (SELECT list_reduce(list(contrib ORDER BY et, bucket),
                           (acc, x) -> acc + x)
        FROM scored) AS pmi
"""


@query("agg_mutual_information", oracle=_mi_oracle())
def agg_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MUTUAL INFORMATION between event type and user cohort
    (user_id % 8) — the dependence diagnostic a feature pipeline runs
    before trusting two columns as independent (feature selection,
    leakage hunts, stratification checks): per contingency cell its
    pointwise MI ln(p(x,y) / (p(x)p(y))), plus a sentinel row
    ('__all__', -1) carrying the full MI Σ p(x,y)·PMI in nats.

    Hash-exact across engines, twice over: each cell's PMI is
    ln(c_xy·N) − ln(c_x·c_y) — both arguments positive BIGINTs
    (products < 2^63 at any realistic scale), so the PORTABLE ln
    applies directly; and the cross-cell MI sum — 24 float terms
    whose addition order engines would otherwise choose differently —
    is a SORTED FOLD (collect, sort by cell key, reduce left-to-
    right), the exactness trick for small float reductions where
    decimal quantization would re-introduce the double→decimal
    rounding trap on computed doubles (the agg_skew_kurtosis lesson).

    Scale shape: ONE shuffle builds the contingency cells with
    map-side partial counts; margins and the fold run on the
    |X|·|Y|-cell frame (24 rows — driver-free, but trivially sized),
    which is the standard two-level rollup any MI job uses at 100 TB.
    """
    from map_reduce_subnet_spark.functions.stable import (
        portable_ln_stages,
    )

    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.col("event_type").alias("et"),
        (F.col("user_id") % 8).cast("long").alias("bucket"),
    ).agg(F.count("*").alias("c_xy"))
    cx = cells.groupBy("et").agg(F.sum("c_xy").alias("c_x"))
    cy = cells.groupBy("bucket").agg(F.sum("c_xy").alias("c_y"))
    tot = cells.agg(F.sum("c_xy").alias("n"))
    joined = (
        cells.join(cx, "et")
        .join(cy, "bucket")
        .crossJoin(F.broadcast(tot))
        .select(
            "et",
            "bucket",
            "c_xy",
            (F.col("c_xy") * F.col("n")).alias("nm"),
            (F.col("c_x") * F.col("c_y")).alias("dn"),
            "n",
        )
    )
    for name, expr in portable_ln_stages(
        "nm", "a_", "spark"
    ) + portable_ln_stages("dn", "b_", "spark"):
        joined = joined.withColumn(name, F.expr(expr))
    scored = joined.select(
        "et",
        "bucket",
        "c_xy",
        (F.col("a_ln") - F.col("b_ln")).alias("pmi"),
        (
            (F.col("c_xy").cast("double") / F.col("n").cast("double"))
            * (F.col("a_ln") - F.col("b_ln"))
        ).alias("contrib"),
        "n",
    )
    total = scored.agg(
        F.max("n").alias("n"),
        F.expr(
            "aggregate(transform(array_sort(collect_list("
            "struct(et, bucket, contrib))), s -> s.contrib), "
            "cast(0 as double), (acc, x) -> acc + x)"
        ).alias("mi"),
    ).select(
        F.lit("__all__").alias("et"),
        F.lit(-1).cast("long").alias("bucket"),
        F.col("n").alias("c_xy"),
        F.col("mi").alias("pmi"),
    )
    return scored.select("et", "bucket", "c_xy", "pmi").unionByName(total)


KCORE_K = 2
KCORE_MAX_ROUNDS = 20


def _kcore_oracle(rounds: int, k: int) -> str:
    from map_reduce_subnet_spark.operators.llm import _minhash_ctes

    ctes = [
        """e0 AS MATERIALIZED (
    SELECT a_id AS src, b_id AS dst FROM mh_pairs
    UNION ALL SELECT b_id AS src, a_id AS dst FROM mh_pairs)"""
    ]
    for t in range(rounds):
        ctes.append(f"""a{t} AS MATERIALIZED (
    SELECT src FROM e{t} GROUP BY src HAVING COUNT(*) >= {k})""")
        ctes.append(f"""e{t + 1} AS MATERIALIZED (
    SELECT e.src, e.dst FROM e{t} e
    JOIN a{t} x ON e.src = x.src
    JOIN a{t} y ON e.dst = y.src)""")
    joined = ",\n".join(ctes)
    return f"""
WITH {_minhash_ctes()},
{joined}
SELECT src AS node_id, COUNT(*) AS core_deg
FROM e{rounds} GROUP BY src
"""


@query("graph_kcore", oracle=_kcore_oracle(KCORE_MAX_ROUNDS, KCORE_K))
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-CORE of the MinHash candidate graph — iterative degree
    peeling (Matula-Beck): repeatedly delete nodes with fewer than 2
    surviving neighbors until a fixpoint; what remains is the maximal
    subgraph where every node keeps >=2 in-core neighbors, with its
    in-core degree. On a dedup candidate graph the 2-core is the
    CYCLE-BEARING part — nodes held by at least two independent
    duplicate relations — while the peeled fringe is the
    hub-and-spoke / chain periphery a conservative dedup pass treats
    with less confidence; the peel is also the standard preprocessor
    before clique-ish analyses (graph_triangle_count's triangles all
    live inside the 2-core, by definition). Completes the graph
    family: centrality (pagerank), components (dedup_cluster),
    closure (triangles), and now coreness.

    Iteration discipline = dedup_cluster's: each round is one
    distributed degree count + two semi-joins, the frame is
    checkpointed per round (flat lineage), the driver reads ONE
    scalar (surviving-edge count — monotone non-increasing, so an
    unchanged count IS the fixpoint), and round exhaustion without a
    fixpoint RAISES rather than emitting a half-peeled core. The
    oracle unrolls the bounded peel into MATERIALIZED CTE rounds —
    past-fixpoint rounds are no-ops, so the unroll is exact.

    Scale shape per round: one shuffle on the node key for degrees +
    semi-joins that reuse the same partitioning; O(edges) per round,
    O(log-ish peel depth) rounds on real graphs. Capped bucket widths
    bound the degree distribution, so no round has a hot reducer."""
    from map_reduce_subnet_spark.functions.checkpoint import (
        stable_checkpoint,
    )
    from map_reduce_subnet_spark.operators.llm import (
        _candidate_pairs_cached,
    )

    pairs = _candidate_pairs_cached(spark, sf_dir)
    edges = stable_checkpoint(
        pairs.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
        .unionAll(
            pairs.select(
                F.col("b_id").alias("src"), F.col("a_id").alias("dst")
            )
        )
    )
    prev_edges = None
    # KCORE_MAX_ROUNDS + 1 iterations: fixpoint DETECTION costs one
    # extra confirming no-op round beyond the last productive peel,
    # so a graph whose peel needs exactly KCORE_MAX_ROUNDS productive
    # rounds (which the oracle's unroll still matches — past-fixpoint
    # CTE rounds are no-ops) must not spuriously raise (ADVICE r8).
    for _ in range(KCORE_MAX_ROUNDS + 1):
        alive = (
            edges.groupBy("src")
            .agg(F.count("*").alias("deg"))
            .where(F.col("deg") >= KCORE_K)
            .select("src")
        )
        edges = stable_checkpoint(
            edges.join(alive, "src", "left_semi").join(
                alive.withColumnRenamed("src", "dst"), "dst", "left_semi"
            )
        )
        n = edges.count()
        if n == prev_edges:
            break
        prev_edges = n
    else:
        raise RuntimeError(
            f"graph_kcore did not reach a fixpoint in {KCORE_MAX_ROUNDS} "
            "rounds — peel depth exceeds the unrolled oracle; raising "
            "rather than emitting a half-peeled core"
        )
    return edges.groupBy(F.col("src").alias("node_id")).agg(
        F.count("*").alias("core_deg")
    )


@query(
    "diag_skew_report",
    oracle="""
WITH counts AS (
    SELECT o_custkey AS key, COUNT(*) AS cnt
    FROM orders GROUP BY o_custkey
), hist AS (
    SELECT cnt, COUNT(*) AS n_keys_at FROM counts GROUP BY cnt
), cum AS (
    SELECT cnt, n_keys_at,
           SUM(n_keys_at) OVER (
               ORDER BY cnt ROWS UNBOUNDED PRECEDING
           ) AS cum_keys
    FROM hist
), tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(cnt) AS BIGINT) AS total_rows,
           CAST(MAX(cnt) AS BIGINT) AS max_cnt
    FROM counts
), qs AS (
    SELECT
        (SELECT MIN(cnt) FROM cum, tot
         WHERE cum_keys * 2 >= n_keys) AS p50_cnt,
        (SELECT MIN(cnt) FROM cum, tot
         WHERE cum_keys * 10 >= n_keys * 9) AS p90_cnt,
        (SELECT MIN(cnt) FROM cum, tot
         WHERE cum_keys * 100 >= n_keys * 99) AS p99_cnt
), hot AS (
    SELECT MIN(key) AS hottest_key FROM counts, tot WHERE cnt = max_cnt
)
SELECT n_keys, total_rows, max_cnt, hottest_key,
       CAST(p50_cnt AS BIGINT) AS p50_cnt,
       CAST(p90_cnt AS BIGINT) AS p90_cnt,
       CAST(p99_cnt AS BIGINT) AS p99_cnt,
       CAST(max_cnt AS DOUBLE)
           / (CAST(total_rows AS DOUBLE) / CAST(n_keys AS DOUBLE))
           AS skew_factor,
       CAST(CEIL(CAST(max_cnt AS DOUBLE)
                 / CAST(GREATEST(p90_cnt, 1) AS DOUBLE)) AS BIGINT)
           AS recommended_salts
FROM tot, qs, hot
""",
)
def diag_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEY-SKEW DIAGNOSTICS report over a join/agg key (o_custkey) —
    the profiling pass an operator runs BEFORE tuning a 100 TB
    shuffle: distinct-key count, exact p50/p90/p99 of the per-key row
    counts, the hottest key and its count, the skew factor
    (max / mean), and a recommended salt fan-out (hot-key count over
    the p90 bulk count — the factor agg_salted_hotkey's n_salts wants
    and AQE's skew-join split approximates at runtime). Pairs the
    REMEDIES already in the registry (agg_salted_hotkey, join_skew_aqe)
    with the MEASUREMENT that decides when to apply them.

    Exactness: quantiles are index-based over the count-of-counts
    histogram with integer cross-multiplication (cum*k >= n*q — no
    float interpolation, no percentile() divergence across engines);
    the only doubles are two final ratios with a fixed expression
    tree.

    Scale shape (the point of the histogram form): one shuffle builds
    per-key counts; the count-of-counts HISTOGRAM is tiny (distinct
    frequency VALUES, not keys), so the quantile window runs over a
    bounded frame — never a global sort of the key population (the
    naive exact-quantile plan). Hot-key argmin is one more pass over
    the counts frame with a broadcast 1-row max. Grounding: stake
    concentration over hotkeys (reference neurons/miner.py:127-137,
    validator.py:149-151)."""
    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count("*").alias("cnt")
    )
    counts = counts.localCheckpoint(eager=False)
    tot = F.broadcast(
        counts.agg(
            F.count("*").alias("n_keys"),
            F.sum("cnt").alias("total_rows"),
            F.max("cnt").alias("max_cnt"),
        )
    )
    hist = counts.groupBy("cnt").agg(F.count("*").alias("n_keys_at"))
    w = (
        Window.orderBy("cnt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the window is global but runs over the COUNT-OF-COUNTS
    # histogram — bounded by distinct frequency values, not keys
    cum = hist.withColumn("cum_keys", F.sum("n_keys_at").over(w))
    qcols = []
    for name, num, den in (
        ("p50_cnt", 1, 2),
        ("p90_cnt", 9, 10),
        ("p99_cnt", 99, 100),
    ):
        qcols.append(
            F.min(
                F.when(
                    F.col("cum_keys") * den >= F.col("n_keys") * num,
                    F.col("cnt"),
                )
            ).alias(name)
        )
    qs = cum.crossJoin(tot).agg(*qcols)
    hot = (
        counts.crossJoin(tot)
        .where(F.col("cnt") == F.col("max_cnt"))
        .agg(F.min("key").alias("hottest_key"))
    )
    out = (
        tot.crossJoin(F.broadcast(qs))
        .crossJoin(F.broadcast(hot))
        .select(
            "n_keys",
            "total_rows",
            "max_cnt",
            "hottest_key",
            "p50_cnt",
            "p90_cnt",
            "p99_cnt",
            (
                F.col("max_cnt").cast("double")
                / (
                    F.col("total_rows").cast("double")
                    / F.col("n_keys").cast("double")
                )
            ).alias("skew_factor"),
            F.ceil(
                F.col("max_cnt").cast("double")
                / F.greatest(F.col("p90_cnt"), F.lit(1)).cast("double")
            )
            .cast("long")
            .alias("recommended_salts"),
        )
    )
    return out
