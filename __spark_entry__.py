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
    # --- FRESHNESS SCHEDULE, r14 edition (VERDICT r13 #1/#3) ---
    # r14 composition: 8 changed keys (the 7 EXTREME_DRIFT keys
    # ported to stable.py::dsum_wide + window_rolling_quantiles'
    # ROLLQ_VALUE_DOMAIN halve) + the full 22-key remainder of the
    # r7-vintage cohort (agg_gini_concentration is in both sets,
    # counted once under "changed") + r8 backfill to the cap. Any
    # NEW keys this round displace backfill slots from the END of
    # the r8 tranche. Target met (NOTES "R14 PLAN"): after this
    # sweep no key's latest driver row predates r8. The changed-key
    # rule is mechanized: scripts/fingerprints.py records
    # key -> md5(oracle + engine source) per round, and
    # tests/test_correctness.py fails if any fingerprint changed
    # without the key appearing here.
    #
    # (0) NEW in r14 — never driver-swept, category (1) of the
    # rotation policy (each displaces one slot from the END of the
    # r8 backfill tranche):
    "events_cep_gapped",
    "stream_cep_gapped_true",
    "sim_ann_ivfpq",
    "multimodal_probe_mp4",
    # (1) changed this round — the wide-domain two-limb sum port,
    # sim_ann_recall's two new ADC legs (pq_adc / ivfpq_adc), and
    # dedup_fuzzy_blocked's second (tail-words) block key:
    "sim_ann_recall",
    "dedup_fuzzy_blocked",
    # (clears the r13 EXTREME_DRIFT pins; agg_salted_hotkey via the
    # functions/skew.py::salted_sum rewrite) and the rolling-quantile
    # domain halve (ADVICE r13):
    "agg_global",
    "agg_grouping_sets",
    "agg_salted_hotkey",
    "agg_gini_concentration",
    "join_broadcast",
    "observe_metrics",
    "scan_orc_roundtrip",
    "window_rolling_quantiles",
    # (2) the r7-vintage freshness cohort — the 22 remaining keys
    # whose latest driver row is r7 (VERDICT r13 next-round #1):
    "agg_approx_percentile",
    "agg_max_by",
    "agg_pivot",
    "agg_robust_mad",
    "agg_string_agg",
    "agg_unpivot",
    "gen_date_spine",
    "join_asof_nearest",
    "join_broadcast_nested_loop",
    "merge_scd2_history",
    "merge_upsert",
    "multimodal_audio_stats",
    "project_try_cast",
    "sample_ksample_per_stratum",
    "scan_xml_roundtrip",
    "str_posexplode",
    "stream_tumbling_distinct_true",
    "text_chunking",
    "text_pii_scrub",
    "text_quality_gopher",
    "window_cumulative_uniques",
    "window_first_last",
    # (3) backfill: the oldest r8 rows, diverse families first; new
    # r14 keys displace from the END of this tranche:
    "agg_mutual_information",
    "dedup_substring_spans",
    "graph_triangle_count",
    "join_point_in_time",
    "multimodal_decode_gif",
    "multimodal_decode_jpeg",
    "multimodal_image_ahash",
    "multimodal_join",
    "sample_systematic",
    "sample_temperature",
    "sample_weighted_reservoir",
    "scan_binaryfile_media",
    "sim_cosine_topk",
    "stream_pit_join_true",
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
