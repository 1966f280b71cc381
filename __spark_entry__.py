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
    # --- FRESHNESS SCHEDULE, r13 edition (VERDICT r12 #1/#2) ---
    # r13 is the out-of-domain round: six keys took runtime changes
    # (the three asymmetric magnitude guards + the three mid-band
    # operand-domain rewrites), and the freshness backlog is the r6
    # cohort (28 keys, NOTES "FRESHNESS PLAN"). 6 changed + 28
    # r6-cohort + 16 oldest-r7 backfill = exactly 50. The changed-key
    # rule is mechanized: scripts/fingerprints.py records
    # key -> md5(oracle + engine source) per round, and
    # tests/test_correctness.py fails if any fingerprint changed
    # without the key appearing here.
    #
    # (1a) NEW in r13 — never driver-swept, category (1) of the
    # rotation policy (they displace the last four r7 backfill slots,
    # join_asof_nearest / merge_scd2_history / agg_gini_concentration
    # / agg_robust_mad, to the r14 schedule): CEP sequence-pattern
    # detection (batch + live state-store twin), dynamic partition
    # overwrite, and blocked edit-distance dedup:
    "events_cep_pattern",
    "stream_cep_true",
    "sink_dynamic_partition_overwrite",
    "dedup_fuzzy_blocked",
    # (1b) the six r13-changed keys (VERDICT r12's weak list, all
    # cleared this round — magnitude guards for the asymmetric trio,
    # integer-micro-unit / decimal-power-sum rewrites for the
    # mid-band trio):
    "privacy_k_anonymize",
    "window_rolling_quantiles",
    "udaf_grouped_agg",
    "agg_corr",
    "agg_trend_ols",
    "agg_skew_kurtosis",
    # (2) the r6 freshness cohort — 28 keys whose latest driver row
    # is r6 (incl. the two roundtrips displaced from r12's backfill):
    "sink_json_roundtrip",
    "sink_roundtrip",
    "scan_variant_props",
    "scan_python_datasource",
    "sink_python_datasource",
    "udtf_python_lateral",
    "stream_dedup_within_watermark_true",
    "stream_state_inspect",
    "stream_stateful_ema",
    "stream_stateful_ema_batches",
    "stream_stream_join_true",
    "stream_watermark_late",
    "join_interval_overlap",
    "join_skew_aqe",
    "agg_bitmap_distinct",
    "agg_percentile",
    "dedup_simhash",
    "embed_neardup_cosine",
    "graph_pagerank",
    "multimodal_decode_png",
    "multimodal_decode_wav",
    "multimodal_frame_sample",
    "multimodal_image_resize",
    "retention_cohort",
    "sim_ann_ivf",
    "sim_ann_ivf_kmeans",
    "sim_ann_lsh_topk",
    "sim_ann_multiprobe_topk",
    # (3) backfill: 16 of the 35 r7-vintage keys (flagship scans /
    # aggregations / dedup first; the remaining 19 take the r14
    # sweep with the rest of the r7 cohort — target per NOTES: by
    # r14 no key's latest driver row predates r8):
    "scan_filter_pushdown",
    "scan_json_props",
    "join_anti",
    "join_cross_bipartite",
    "agg_approx_distinct",
    "agg_count_distinct",
    "agg_distinct_arg",
    "agg_normalize_l1",
    "agg_hll_sketch_merge",
    "dedup_exact",
    "dedup_chunk_level",
    "agg_cms_heavy_hitters",
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
