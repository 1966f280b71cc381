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
    # (1) new in round 4 — need their first driver row
    "dedup_survivors",
    "scan_partition_prune",
    "join_bucketed",
    "agg_salted_hotkey",
    "sim_ann_recall",
    "stream_stateful_ema_batches",
    # (2) changed this round: three streaming-true keys were PROMOTED
    # from rows-only to full SQL oracles (closed-subset / identity
    # semantics), text_tfidf_topk now tokenizes once via checkpoint,
    # dedup_cluster/dedup_survivors route through stable_checkpoint,
    # and the sign-sketch NULL-component coalesce touches the LSH
    # consumers; stream_stateful_ema's bench warm-up changed
    "stream_tumbling_true",
    "stream_sliding_true",
    "stream_dedup_true",
    "text_tfidf_topk",
    "dedup_cluster",
    "dedup_near_minhash",
    "embed_neardup_cosine",
    "sim_ann_lsh_topk",
    "stream_stateful_ema",
    # (3) refresh the oldest green rows (hash-green in r2, untouched
    # since) — windows, sorts, setops
    "window_rank_stake",
    "window_row_number",
    "window_topk_per_group",
    "window_lag_delta",
    "window_running_sum",
    "window_moving_avg",
    "window_range_frame",
    "window_percent_rank",
    "sort_multi_key",
    "limit_topk",
    "setop_union_all",
    "setop_intersect",
    "setop_except",
    "setop_dedup",
    # scalar families last green in r2
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
    # batch streaming family last green in r2
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    "stream_watermark_late",
    "stream_dedup",
    # UDF surface + scans last green in r2
    "udf_scalar",
    "udaf_grouped_agg",
    "udtf_grouped_map",
    "scan_full",
    "scan_prune_columns",
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
