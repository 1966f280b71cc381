"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in :mod:`map_reduce_subnet_spark`; this module is
a thin adapter over its query registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from map_reduce_subnet_spark.operators import ORACLES, QUERIES  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# The driver's sweep checks only the FIRST `SWEEP_CAP` entries of
# queries() per round. Rotation policy (and the reason the list is
# explicit): (1) keys that have NEVER received a driver CORRECTNESS
# row in any round, (2) keys whose implementation changed this round —
# both MUST sit inside the cap; then (3) backfill with the oldest
# HASH-green rows (r1's) so oracle coverage keeps refreshing. Keys
# beyond the cap either hash-matched in CORRECTNESS_r01∪r02 or are
# rows-only keys that ran green there (rows-only refreshes carry the
# least signal, so they rotate out first) — all unchanged since.
# tests/test_correctness.py pins len(_SWEEP_PRIORITY) <= SWEEP_CAP and
# that queries() actually leads with this list.
SWEEP_CAP = 50

_SWEEP_PRIORITY = [
    # --- FRESHNESS SCHEDULE, r12 edition (VERDICT r11 #1) ---
    # r11 changed 48 keys (the _sql_finite oracle insertion touched 43
    # oracle strings; the versioned.py atomic-commit rewrite touched
    # the engine of 5 more) but shipped the r10 list verbatim, so 34
    # changed keys have no driver row for their current program, and
    # the 11 r5-vintage stragglers promised for r11 never swept. r12
    # pays the whole debt: 34 r11-changed-unswept + 11 r5-stale + 5
    # oldest-r6 backfill = exactly 50. Keys changed AGAIN in r12
    # (the MV non-finite guard: mv_incremental_refresh,
    # stream_mv_refresh_true; the vacuum tmp-debris sweep:
    # table_vacuum) already sit inside this list. The changed-key
    # rule is now MECHANIZED: scripts/fingerprints.py records
    # key -> md5(oracle + engine source) per round, and
    # tests/test_correctness.py fails if any fingerprint changed
    # without the key appearing here.
    #
    # (1) the five VersionedTable consumers first — the r11 torn-read
    # FIX (temp+fsync+link publish) is what most needs driver rows;
    # two of them (mv_*) also take the r12 MV non-finite guard and
    # table_vacuum takes the r12 _log/*.tmp debris sweep:
    "table_timetravel",
    "table_changefeed",
    "table_vacuum",
    "mv_incremental_refresh",
    "stream_mv_refresh_true",
    # (2) the remaining 29 r11-changed-unswept keys (_sql_finite
    # oracle-text consumers), flagship aggregations first:
    "agg_reduce_sum",
    "agg_global",
    "agg_having",
    "agg_cube",
    "agg_rollup",
    "agg_grouping_sets",
    "agg_histogram",
    "agg_salted_hotkey",
    "join_broadcast",
    "join_bucketed",
    "join_bloom_runtime",
    "join_partition_prune_dynamic",
    "window_moving_avg",
    "window_rolling_quantiles",
    "window_zscore_anomaly",
    "scan_csv_malformed",
    "scan_orc_roundtrip",
    "scan_rowgroup_skip",
    "scan_schema_evolution",
    "sink_compaction",
    "sink_zorder_cluster",
    "sql_pipe_syntax",
    "observe_metrics",
    "sessionize_events",
    "stream_python_sink_true",
    "stream_python_source_true",
    "text_entropy_unigram",
    "text_stats",
    "text_zipf_slope",
    # (3) the eleven r5-vintage stragglers displaced in r10 and
    # (wrongly) not swept in r11 — closes the r5 cohort entirely
    # (join_broadcast, the twelfth, is already in (2)):
    "project_arith",
    "filter_compound",
    "filter_null_semantics",
    "join_left_outer",
    "join_semi",
    "join_shuffle_equi",
    "setop_except_all",
    "setop_intersect_all",
    "window_ntile_cume",
    "window_range_frame",
    "window_rank_stake",
    # (4) changed in r12: the int8_dequantized let-binding fix (HOF
    # invariant #13 — the captured scale embedded array_max over the
    # whole vector and re-evaluated per element, O(dim²) per row;
    # measured 27.8 s -> 0.32 s for 200 rows at dim 2048, output
    # identical, equivalence + linearity pinned). Both consumers take
    # changed-key slots — they are also r6-vintage freshness debt:
    "sim_quantized_recall",
    "sim_ann_recall",
    # (4b) NEW in r12 — never driver-swept, category (1) of the
    # rotation policy (they displace two of the three planned r6
    # backfill roundtrips, which move to the r13 schedule):
    # prefix-truncation dedup and product-quantization ANN:
    "dedup_prefix_truncation",
    "sim_ann_pq_adc",
    # (5) backfill: the oldest r6-vintage row that still fits (the
    # other two roundtrip keys move to r13 with the rest of the r6
    # cohort, NOTES.md):
    "sink_csv_roundtrip",
]


def _ordered(mapping: dict) -> dict:
    out = {k: mapping[k] for k in _SWEEP_PRIORITY if k in mapping}
    out.update((k, v) for k, v in mapping.items() if k not in out)
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (agg_reduce_sum, TPC-H Q1 shape) on sf0.001."""
    return QUERIES["agg_reduce_sum"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.2."""
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every SQL-expressible query."""
    return _ordered(ORACLES)
