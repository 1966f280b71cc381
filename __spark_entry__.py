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
    # (1) never swept in r1/r2 — the only registry keys with no
    # CORRECTNESS row in any round
    "sink_json_roundtrip",
    "stream_tumbling_true",
    "stream_dedup_true",
    "stream_session_true",
    # (2) changed this round: stream_stateful_ema gained a SQL oracle
    # (closed-form EMA) + the memory-sink cleanup; the dedup/LSH family
    # gained bucket caps, the stop-shingle cap (oracle changed too) and
    # the random-hyperplane sign sketch
    "stream_stateful_ema",
    "dedup_ngram_jaccard",
    "dedup_near_minhash",
    "embed_neardup_cosine",
    # (3) refresh the oldest green rows (hash-green in r1, untouched
    # since) — projections/filters
    "project_arith",
    "project_conditional",
    "filter_membership",
    "filter_compound",
    "filter_null_semantics",
    "project_cast",
    # joins
    "join_broadcast",
    "join_shuffle_equi",
    "join_multiway_star",
    "join_left_outer",
    "join_semi",
    "join_anti",
    "join_theta_range",
    "join_asof",
    # aggregations
    "agg_reduce_sum",
    "agg_minmax_stats",
    "agg_count_distinct",
    "agg_having",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_distinct_arg",
    "agg_normalize_l1",
    "agg_ema",
    # scalar/text/llm keys last green in r1
    "str_basics",
    "dedup_exact",
    "text_stats",
    "text_term_freq",
    "text_quality",
    "text_langid",
    "text_fingerprint",
    "text_token_count",
    "sim_cosine_topk",
    "multimodal_join",
    # new in round 3 — need their first driver row
    "text_tfidf_topk",
    "sample_systematic",
    "dedup_cluster",
    "stream_static_join_true",
    "multimodal_frame_sample",
    "sim_ann_lsh_topk",
    "stream_sliding_true",
    "text_langid_ngram",
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
