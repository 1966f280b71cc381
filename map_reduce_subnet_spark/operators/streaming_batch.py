"""Family I — streaming semantics, batch-mode equivalents
(SURVEY.md §2.2.I).

Grounding: every-2-steps weight sink (reference neurons/validator.py:
149 → tumbling window), resync cadence (reference neurons/miner.py:179
→ sliding window), axon request sessions (reference neurons/miner.py:
151-169 → session window), staleness/resync (reference
neurons/validator.py:166-170 → watermark), redundant chunks (reference
README.md:18 → stream dedup).

These run the *same semantics* as the Structured Streaming jobs in
map_reduce_subnet_spark/streaming/jobs.py, expressed as batch plans so
the DuckDB oracle can verify values. Window starts are emitted as
epoch seconds (BIGINT) — timestamp-representation-free hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from map_reduce_subnet_spark.functions.stable import dsum, sql_dsum
from map_reduce_subnet_spark.operators.registry import query
from map_reduce_subnet_spark.sources.tables import load_table


@query(
    "stream_tumbling",
    oracle=f"""
SELECT CAST(floor(epoch(ts) / 120) AS BIGINT) * 120 AS win_start,
       event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-minute tumbling windows (weights-every-2-steps cadence).
    F.window is epoch-aligned for minute durations, matching the
    floor(epoch/120)*120 arithmetic exactly."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "stream_sliding",
    oracle=f"""
WITH panes AS (
    SELECT CAST(floor(epoch(ts) / 300) AS BIGINT) * 300 AS win_start, value
    FROM events
    UNION ALL
    SELECT CAST(floor(epoch(ts) / 300) AS BIGINT) * 300 - 300 AS win_start, value
    FROM events
)
SELECT win_start, COUNT(*) AS n_events, {sql_dsum('value')} AS sum_value
FROM panes
GROUP BY win_start
""",
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding by 5 (resync cadence): every event
    lands in exactly two panes; the oracle materializes both."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("win_start"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "stream_session",
    oracle="""
WITH flagged AS (
    SELECT user_id, ts, event_id,
           CASE WHEN LAG(ts) OVER w IS NULL
                     OR date_diff('microseconds', LAG(ts) OVER w, ts) > 1800000000
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
    SELECT user_id, ts, event_id,
           SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
    FROM flagged
)
SELECT user_id,
       CAST(session_id AS BIGINT) AS session_id,
       epoch_us(MIN(ts)) AS start_us,
       COUNT(*) AS n_events,
       date_diff('microseconds', MIN(ts), MAX(ts)) AS duration_us
FROM numbered
GROUP BY user_id, session_id
""",
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap (axon request
    sessions) — the gaps-and-islands batch form of F.session_window."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "is_new",
        F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.unix_micros(F.min("ts")).alias("start_us"),
        F.count("*").alias("n_events"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("duration_us"),
    )


@query(
    "stream_watermark_late",
    oracle="""
SELECT event_id, user_id
FROM (
    SELECT event_id, user_id, ts,
           MAX(ts) OVER (ORDER BY event_id ROWS UNBOUNDED PRECEDING) AS max_seen
    FROM events
)
WHERE ts >= max_seen - INTERVAL 10 MINUTE
""",
)
def stream_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark semantics as a batch plan: drop events more than
    10 minutes behind the max event-time seen so far in arrival order
    (event_id = arrival). The production form is streaming/jobs.py
    (withWatermark), where the engine maintains the clock.

    Scale shape: the naive formulation is a single global ordered
    window (one partition holding the whole fact table). Instead the
    running max is computed in two levels — the classic parallel
    prefix: (1) a per-row running max WITHIN arrival-order buckets of
    2^12 events (Window partitioned by bucket → fully parallel),
    (2) an exclusive prefix max ACROSS buckets, a window over the
    per-bucket aggregates only (n / 4096 rows — the one intentionally
    tiny serial pass), joined back on the bucket key so the join
    reuses the bucket hash partitioning. max_seen = greatest(in-bucket
    running max, prior-bucket max). The query self-lints with a
    WARNING (tests/test_plans.py asserts the same invariants hard):
    explain-output wording shifts across Spark/optimizer versions, so
    a healthy plan must never become a runtime failure — but a
    degraded plan should still announce itself outside the test
    suite."""
    import warnings
    from map_reduce_subnet_spark.plans import formatted_plan

    bucket_size = 4096  # events per arrival-order block
    # integer DIV, not double division + cast: the cast truncates
    # toward zero (wrong block for negative ids) and double loses
    # exactness past 2^53 — either silently mis-buckets the running
    # max at the scales this operator advertises
    ev = load_table(spark, sf_dir, "events").withColumn(
        "bucket", F.expr(f"event_id DIV {bucket_size}")
    )
    w_row = (
        Window.partitionBy("bucket")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_bucket = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prior = (
        ev.groupBy("bucket")
        .agg(F.max("ts").alias("b_max"))
        .withColumn("prior_max", F.max("b_max").over(w_bucket))
        .select("bucket", "prior_max")
    )
    out = (
        ev.withColumn("in_max", F.max("ts").over(w_row))
        .join(prior, "bucket")
        # greatest skips NULLs, so the first bucket (prior_max NULL)
        # falls back to its in-bucket running max
        .withColumn("max_seen", F.greatest("in_max", "prior_max"))
        .where(F.col("ts") >= F.col("max_seen") - F.expr("INTERVAL 10 MINUTES"))
        .select("event_id", "user_id")
    )
    # formatted explain puts exchange args on their own "Arguments:"
    # line, so match the partitioning spec, not "Exchange <spec>"
    plan = formatted_plan(out)
    if "hashpartitioning(bucket" not in plan:
        warnings.warn(
            "stream_watermark_late: row-level running max does not "
            "appear bucket-partitioned — possible global-sort "
            "regression (or explain-format drift; see "
            "tests/test_plans.py::test_watermark_late_two_level_prefix)",
            RuntimeWarning,
            stacklevel=2,
        )
    if plan.count("SinglePartition") > 1:
        warnings.warn(
            "stream_watermark_late: more than one single-partition "
            "exchange in the plan — a full-table serial pass may have "
            "crept back in",
            RuntimeWarning,
            stacklevel=2,
        )
    return out


@query(
    "stream_dedup",
    oracle="""
SELECT DISTINCT event_id, user_id, value
FROM (
    SELECT event_id, user_id, value FROM events
    UNION ALL
    SELECT event_id, user_id, value FROM events
)
""",
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once delivery over an at-least-once stream: redundant
    chunks (README.md:18) collapse to one row per event_id. Duplicate
    rows are identical, so dropDuplicates is deterministic here."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    doubled = ev.unionByName(ev)
    return doubled.dropDuplicates(["event_id"])


@query(
    "timeseries_gapfill",
    oracle=f"""
WITH hourly AS (
    SELECT user_id, date_trunc('hour', ts) AS h,
           {sql_dsum('value')} AS s, COUNT(*) AS n
    FROM events GROUP BY 1, 2
), span AS (
    SELECT user_id, MIN(h) AS mn, MAX(h) AS mx FROM hourly GROUP BY 1
), spine AS (
    SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
    FROM span
), joined AS (
    SELECT spine.user_id, spine.h, hourly.s, COALESCE(hourly.n, 0) AS n
    FROM spine LEFT JOIN hourly
      ON spine.user_id = hourly.user_id AND spine.h = hourly.h
)
SELECT user_id,
       CAST(epoch(h) AS BIGINT) AS hour_start,
       n AS n_events,
       last_value(s IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY h
           ROWS UNBOUNDED PRECEDING) AS filled_sum
FROM joined
""",
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample + gap-fill per user (the hypertable-rollup
    shape): aggregate events into hour buckets, materialize the DENSE
    hour spine between each user's first and last hour (sequence +
    explode — gaps become real rows with n_events = 0), and
    forward-fill each gap's sum with the last observed hour's value
    (last-observation-carried-forward, the standard time-series
    downsampling semantics).

    Scale shape: the hourly rollup partial-aggregates before its
    shuffle (hour granularity ≈ corpus/1000s of rows); the spine
    explode is per-user metadata (two timestamps → one array); the
    forward-fill window partitions by user over HOURLY rows, not raw
    events — bounded by the time span, not event volume. The hourly
    sums are decimal-exact (dsum) so the carried values hash match."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy("user_id", F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(dsum("value", "s"), F.count("*").alias("n"))
    )
    spine = (
        hourly.groupBy("user_id")
        .agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
        .select(
            "user_id",
            F.explode(
                F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    joined = spine.join(hourly, ["user_id", "h"], "left").select(
        "user_id", "h", "s", F.coalesce("n", F.lit(0)).alias("n")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "user_id",
        F.unix_timestamp("h").alias("hour_start"),
        F.col("n").alias("n_events"),
        F.last("s", ignorenulls=True).over(w).alias("filled_sum"),
    )


@query(
    "sessionize_events",
    oracle=f"""
WITH ordered AS (
    SELECT user_id,
           event_id,
           epoch_us(ts) AS ts_us,
           value,
           CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                  OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                THEN 1 ELSE 0 END AS new_sess
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
    SELECT user_id, ts_us, value,
           CAST(SUM(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS session_seq
    FROM ordered
)
SELECT user_id,
       session_seq,
       MIN(ts_us) AS session_start_us,
       MAX(ts_us) AS session_end_us,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS sum_value
FROM numbered
GROUP BY user_id, session_seq
""",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: assign explicit session ids per user
    (gap > 30 min starts a new session), then aggregate each session
    (the axon request-session shape, reference neurons/miner.py:151-169,
    as a batch lineage operator — stream_session aggregates the same
    windows but never materializes a session ID you can join on).

    Two window passes over ONE shuffle: lag() flags session starts,
    a running sum converts flags to a per-user session sequence — both
    windows share partitionBy(user_id)/orderBy(ts, event_id) so
    Catalyst plans a single Exchange + Sort. Gap arithmetic runs on
    BIGINT epoch micros (exact for all longs; doubles lose exactness
    past 2^53). The final groupBy re-uses the same user_id-keyed
    distribution. Per-user state is a sort, not a collect_list — hot
    users spill gracefully instead of materializing one giant row."""
    from map_reduce_subnet_spark.functions.sessions import assign_sessions

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "value",
    )
    numbered = assign_sessions(
        ev, key="user_id", ts="ts_us", gap=1_800_000_000, tiebreak="event_id"
    )
    return numbered.groupBy("user_id", "session_seq").agg(
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
        F.count("*").alias("n_events"),
        dsum("value", "sum_value"),
    )


# CEP pattern parameters: the ordered stage types and the max
# anchor→close time span. 24 h in integer microseconds — the gap
# arithmetic stays in BIGINT epoch micros (exact for all longs) like
# sessionize_events. The bound is chosen to BITE on the fixtures
# (per-user cadence is hours: at sf0.01 the 76 contiguous triples
# span 2.3 h–60 h, so a one-day window admits some and rejects
# others — a constraint the differential can actually observe at
# every SF, measured r13).
CEP_STAGES = ("view", "click", "purchase")
CEP_SPAN_US = 86_400_000_000

# Per-stage gap bound for the NON-CONTIGUOUS variant
# (events_cep_gapped): each consecutive stage pair must close within
# 12 h. Chosen to BITE on the fixtures the same way CEP_SPAN_US does:
# per-user cadence is hours, so at sf0.01 the bound admits 81 of the
# candidate view anchors and rejects the rest (measured r14) — a
# constraint the differential can observe at every SF.
CEP_GAP_US = 43_200_000_000

# Shared by events_cep_pattern (batch) and streaming/jobs.py's
# stream_cep_true (the live state-store twin): both drain the same
# fixture, and every match is emitted exactly once in either mode, so
# ONE oracle certifies both.
CEP_ORACLE = f"""
WITH seq AS (
    SELECT user_id, event_id, event_type,
           epoch_us(ts) AS ts_us,
           lead(event_type, 1) OVER w AS t2,
           lead(event_type, 2) OVER w AS t3,
           lead(event_id, 2) OVER w AS close_event_id,
           lead(epoch_us(ts), 2) OVER w AS ts3_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       event_id AS anchor_event_id,
       close_event_id,
       ts_us AS anchor_ts_us,
       (ts3_us - ts_us) AS span_us
FROM seq
WHERE event_type = '{CEP_STAGES[0]}' AND t2 = '{CEP_STAGES[1]}'
  AND t3 = '{CEP_STAGES[2]}'
  AND ts3_us - ts_us <= {CEP_SPAN_US}
"""


@query("events_cep_pattern", oracle=CEP_ORACLE)
def events_cep_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPLEX-EVENT-PROCESSING pattern match — the MATCH_RECOGNIZE /
    Flink-CEP capability in its contiguous form: per user, emit every
    occurrence of the ordered stage sequence view → click → purchase
    appearing as three CONSECUTIVE events (by ts, event_id) whose
    total span is ≤ 24 h (CEP_SPAN_US). This is per-OCCURRENCE sequence detection
    — funnel_conversion answers "how many users ever progressed"
    (per-user, any-gap); this answers "where exactly did the
    conversion pattern fire" (the rows an alerting/attribution
    pipeline joins back to). The non-contiguous bounded-gap variant
    is events_cep_gapped below (r14) — the forward-as-of composition
    of family C (join_asof / join_point_in_time), expressed as two
    chained suffix-min windows so it shares this operator's single
    shuffle.

    Exactness: the match predicate is pure string equality plus
    BIGINT epoch-microsecond arithmetic (exact for all longs; the
    sessionize_events discipline) and the per-user order is
    deterministic under the (ts, event_id) tiebreak, so lead()
    observes the identical sequence in both engines.

    Scale shape: ONE shuffle on user_id, one Sort, one WindowExec
    evaluating all four lead() columns over the SAME frame (bounded
    2-row lookahead, constant memory per position — never a
    per-user collect), then a scan-local filter. At 100 TB this is
    the cheapest possible CEP plan: cost ≡ sessionization.
    Grounding: ordered request/response step sequences per peer
    (reference neurons/miner.py:151-169, validator.py:120-141)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "ts",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "ts_us",
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
        F.lead("event_id", 2).over(w).alias("close_event_id"),
        F.lead("ts_us", 2).over(w).alias("ts3_us"),
    )
    return seq.where(
        (F.col("event_type") == CEP_STAGES[0])
        & (F.col("t2") == CEP_STAGES[1])
        & (F.col("t3") == CEP_STAGES[2])
        & (F.col("ts3_us") - F.col("ts_us") <= F.lit(CEP_SPAN_US))
    ).select(
        "user_id",
        F.col("event_id").alias("anchor_event_id"),
        "close_event_id",
        F.col("ts_us").alias("anchor_ts_us"),
        (F.col("ts3_us") - F.col("ts_us")).alias("span_us"),
    )


# Shared by events_cep_gapped and tests: the skip-till-next match is
# two chained "earliest following stage" lookups, each a suffix min
# over the per-user (ts, event_id) sequence. The oracle encodes the
# (ts_us, event_id) sequence key as a zero-padded 19+19-char string so
# MIN() over a window is lexicographic = sequence order in DuckDB
# (struct-ordered MIN is Spark-side only). Both components are BIASED
# by +5e18 before padding: a bare lpad breaks on NEGATIVE values
# (lexicographic '-...' ordering is wrong AND the decode substr can't
# re-parse a mid-string sign — caught by the r14 negative-domain
# layer's pre-1970 plants), while biased values are positive 19-digit
# integers whose string order IS numeric order over the whole
# |value| < 4.2e18 domain (epoch-µs spans ±2.9e17, ids are row
# numbers — both orders of magnitude inside; beyond it DuckDB's
# BIGINT addition aborts loudly). The purchase-suffix decodes
# (positions 39, 58) use TRY_CAST, not CAST: on a click with no later
# purchase those positions carry the '~' sentinel, and the WHERE guard
# `substr(ck,39,1) != '~'` only protects a plain CAST under
# left-to-right conjunct evaluation — which is not contractual in SQL
# (ADVICE r14 #1). TRY_CAST yields NULL on the sentinel, and NULL
# arithmetic/comparison filters the row identically, so correctness no
# longer depends on the optimizer's conjunct ordering.
CEP_KEY_BIAS = 5_000_000_000_000_000_000

CEP_GAPPED_ORACLE = f"""
WITH seq AS (
    SELECT user_id, event_id, event_type,
           epoch_us(ts) AS ts_us,
           lpad(CAST(epoch_us(ts) + {CEP_KEY_BIAS} AS VARCHAR), 19, '0')
               || lpad(CAST(event_id + {CEP_KEY_BIAS} AS VARCHAR),
                       19, '0') AS k
    FROM events
), p1 AS (
    -- earliest purchase strictly AFTER each row in sequence order
    -- (DESC ordering + [unbounded preceding, 1 preceding] = the
    -- ascending-order suffix excluding the current row)
    SELECT *, min(CASE WHEN event_type = '{CEP_STAGES[2]}' THEN k END)
                  OVER w AS pk
    FROM seq
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), p2 AS (
    -- earliest click strictly AFTER each row, carrying THAT click's
    -- own next-purchase key as a fixed-width suffix ('~' sorts above
    -- every digit, so a purchase-less click still wins on its k
    -- prefix and the match is then rejected — skip-till-next, no
    -- backtracking)
    SELECT *, min(CASE WHEN event_type = '{CEP_STAGES[1]}'
                       THEN k || coalesce(pk, repeat('~', 38)) END)
                  OVER w AS ck
    FROM p1
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT user_id,
       event_id AS anchor_event_id,
       CAST(substr(ck, 20, 19) AS BIGINT) - {CEP_KEY_BIAS}
           AS mid_event_id,
       TRY_CAST(substr(ck, 58, 19) AS BIGINT) - {CEP_KEY_BIAS}
           AS close_event_id,
       ts_us AS anchor_ts_us,
       (TRY_CAST(substr(ck, 39, 19) AS BIGINT) - {CEP_KEY_BIAS}) - ts_us
           AS span_us
FROM p2
WHERE event_type = '{CEP_STAGES[0]}'
  AND ck IS NOT NULL
  AND (CAST(substr(ck, 1, 19) AS BIGINT) - {CEP_KEY_BIAS}) - ts_us
      <= {CEP_GAP_US}
  AND substr(ck, 39, 1) != '~'
  AND TRY_CAST(substr(ck, 39, 19) AS BIGINT)
      - CAST(substr(ck, 1, 19) AS BIGINT) <= {CEP_GAP_US}
"""


@query("events_cep_gapped", oracle=CEP_GAPPED_ORACLE)
def events_cep_gapped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NON-CONTIGUOUS bounded-gap CEP (VERDICT r13 next-round #2) —
    the form real attribution/alerting runs, where contiguity breaks
    the moment an unrelated event interleaves: per user, match
    view → click → purchase where stages need NOT be adjacent, under
    SKIP-TILL-NEXT semantics — the anchor view's match is the FIRST
    click strictly after it in (ts, event_id) sequence order, and
    that click's match is the FIRST purchase strictly after it; each
    consecutive stage pair must close within CEP_GAP_US (12 h). No
    backtracking: if the first click after a view has no purchase
    within its gap, that view does not match (the as-of contract —
    the nearest following stage IS the match, tolerance then accepts
    or rejects it). Emits one row per matched anchor with all three
    event ids and the total span.

    This is the forward-as-of composition SURVEY §2.2.I commits to
    (stage k's frame as-of-joined onto stage k+1 with the gap as
    tolerance), but expressed WITHOUT a self-join: "earliest stage-3
    after each stage-2 row" is a suffix MIN over the per-user
    sequence, and "earliest stage-2 after each stage-1 row, with that
    row's stage-3 result" is a second suffix MIN over a struct that
    carries the first pass's answer as payload (struct MIN orders
    lexicographically and (ts_us, event_id) is unique per user, so
    the payload never influences which click wins). Both windows
    share one partitioning and one sort, so the whole match costs ONE
    shuffle on user_id — same price as events_cep_pattern, strictly
    cheaper than the two shuffled self-joins the literal as-of
    composition would run, and with no per-user state beyond the
    window frame.

    Frame direction: the windows order DESC with
    [unboundedPreceding, -1 row] rather than ASC with
    [1 following, unboundedFollowing] — the same row set (the strict
    ascending suffix), but Spark evaluates unbounded-PRECEDING frames
    incrementally (O(n) per partition) while unbounded-FOLLOWING
    frames recompute per row (O(n²) on a million-event user at
    100 TB). MIN is order-insensitive, so only the frame bookkeeping
    changes.

    Exactness: string equality + BIGINT epoch-µs arithmetic (the
    sessionize_events discipline); the oracle's BIASED padded-string
    encoding (see CEP_KEY_BIAS) and the engine's struct ordering
    realize the same total order over the whole |value| < 4.2e18
    domain — pre-epoch (negative-µs) events included, pinned by the
    negative-domain layer.

    Grounding: ordered request/response step sequences per peer
    (reference neurons/miner.py:151-169, validator.py:120-141), as
    events_cep_pattern, with the adjacency requirement dropped."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts_us").desc(), F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pk = F.min(
        F.when(
            F.col("event_type") == CEP_STAGES[2],
            F.struct(F.col("ts_us").alias("p_ts"),
                     F.col("event_id").alias("p_id")),
        )
    ).over(w)
    s1 = ev.withColumn("pk", pk)
    ck = F.min(
        F.when(
            F.col("event_type") == CEP_STAGES[1],
            F.struct(
                F.col("ts_us").alias("c_ts"),
                F.col("event_id").alias("c_id"),
                F.col("pk").alias("cpk"),
            ),
        )
    ).over(w)
    s2 = s1.withColumn("ck", ck)
    return s2.where(
        (F.col("event_type") == CEP_STAGES[0])
        & F.col("ck").isNotNull()
        & (F.col("ck.c_ts") - F.col("ts_us") <= F.lit(CEP_GAP_US))
        & F.col("ck.cpk").isNotNull()
        & (F.col("ck.cpk.p_ts") - F.col("ck.c_ts") <= F.lit(CEP_GAP_US))
    ).select(
        "user_id",
        F.col("event_id").alias("anchor_event_id"),
        F.col("ck.c_id").alias("mid_event_id"),
        F.col("ck.cpk.p_id").alias("close_event_id"),
        F.col("ts_us").alias("anchor_ts_us"),
        (F.col("ck.cpk.p_ts") - F.col("ts_us")).alias("span_us"),
    )
