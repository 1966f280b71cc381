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
    # (1) NEW in round 8 — need their first driver row
    "graph_triangle_count",
    "table_vacuum",
    "sample_temperature",
    "window_rolling_quantiles",
    "agg_skew_kurtosis",
    "scan_schema_evolution",
    "text_bpe_merges",
    "text_hashing_vectorizer",
    "scan_csv_malformed",
    "join_point_in_time",
    "pipeline_curation_e2e",
    "text_lm_bigram_score",
    "agg_mutual_information",
    "stream_pit_join_true",
    "table_changefeed",
    "multimodal_decode_jpeg",
    "mv_incremental_refresh",
    "text_entropy_unigram",
    "text_zipf_slope",
    "dedup_containment",
    "sink_zorder_cluster",
    "graph_kcore",
    "text_bpe_encode",
    "multimodal_image_ahash",
    "sample_weighted_reservoir",
    "dedup_substring_spans",
    # (2) changed in round 8: text_lm_unigram_score promoted to the
    # portable-ln full oracle; sink_compaction grew the fixture
    # precondition; scan_binaryfile_media moved to localCheckpoint;
    # table_timetravel commits through the new OCC path;
    # multimodal_decode_gif's truncation handling changed; the
    # streaming footer probe learned directory layouts (one
    # representative streaming key — also the oldest stream row, r5)
    "text_lm_unigram_score",
    "sink_compaction",
    "scan_binaryfile_media",
    "table_timetravel",
    "multimodal_decode_gif",
    "stream_tumbling_true",
    # (3) VERDICT r7 #3 backlog: the entire r3 cohort (oldest rows in
    # the registry) ...
    "agg_cube",
    "agg_grouping_sets",
    "agg_having",
    "dedup_ngram_jaccard",
    "filter_membership",
    "multimodal_join",
    "project_cast",
    "project_conditional",
    "sample_systematic",
    "sim_cosine_topk",
    "str_basics",
    "text_fingerprint",
    "text_langid",
    "text_quality",
    "text_term_freq",
    "text_token_count",
    # (4) ... plus as many of the 28 r4 rows as the cap allows (2 —
    # the r8 additions squeezed this backfill tier; scan_full,
    # text_tfidf_topk and the remaining 24 r4 rows defer to r9's
    # rotation: map_funcs, limit_topk, str_split_explode, str_hash,
    # date_parts, date_arith, math_funcs, array_funcs, array_hof,
    # json_funcs, scan_prune_columns, setop_dedup/except/intersect/
    # union_all, sort_multi_key, str_regex, udf_scalar,
    # udaf_grouped_agg, window_lag_delta/moving_avg/percent_rank/
    # running_sum/topk_per_group)
    "agg_reduce_sum",
    "agg_salted_hotkey",
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
