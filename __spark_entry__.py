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
    # (1) NEW in round 7 — need their first driver row
    "multimodal_decode_gif",
    "join_bloom_runtime",
    "agg_cms_heavy_hitters",
    "scan_xml_roundtrip",
    "scan_binaryfile_media",
    "dedup_chunk_level",
    "table_timetravel",
    "text_quality_gopher",
    "merge_scd2_history",
    "window_cumulative_uniques",
    "sample_ksample_per_stratum",
    "multimodal_audio_stats",
    "agg_robust_mad",
    "text_decontaminate",
    "agg_gini_concentration",
    "stream_tumbling_distinct_true",
    "sink_compaction",
    "join_asof_nearest",
    # (2) changed in round 7: the sketch trio promoted to
    # bound-checked SQL oracles; funnel_conversion rewritten to the
    # one-exchange window form; stream_python_sink_true's read-back
    # dedupes replayed commit-log lines; multimodal_features' oracle
    # grew the empty-text COALESCE
    "agg_approx_distinct",
    "agg_hll_sketch_merge",
    "agg_approx_percentile",
    "funnel_conversion",
    "stream_python_sink_true",
    "multimodal_features",
    # (3) VERDICT r6 #1: the 19 keys whose newest driver row was
    # still r1/r2 (agg_approx_distinct + agg_approx_percentile are
    # already above) — rotate the whole backlog through this round so
    # every CORRECTNESS row in the registry is at most 2 rounds old
    "agg_corr",
    "agg_global",
    "agg_max_by",
    "agg_pivot",
    "agg_string_agg",
    "agg_unpivot",
    "gen_date_spine",
    "join_broadcast_nested_loop",
    "join_cross_bipartite",
    "merge_upsert",
    "project_try_cast",
    "scan_filter_pushdown",
    "scan_json_props",
    "str_posexplode",
    "text_chunking",
    "text_pii_scrub",
    "window_first_last",
    # (4) backfill: the oldest remaining green rows (r3) — unchanged
    # code, pure signal refresh, cheapest queries first
    "agg_minmax_stats",
    "agg_count_distinct",
    "agg_rollup",
    "agg_distinct_arg",
    "agg_normalize_l1",
    "join_anti",
    "dedup_exact",
    "text_stats",
    "text_langid_ngram",
    # (multimodal_join, sample_systematic, text_token_count,
    # sim_cosine_topk, text_quality, text_langid, filter_membership,
    # str_basics, project_cast rotated back out for the ten new r7
    # keys — all r3-green, structurally simple, unchanged)
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
