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
    # (1) new in round 5 — need their first driver row
    "text_quality_c4",
    "text_collocations_pmi",
    "sim_ann_multiprobe_topk",
    "stream_stream_join_true",
    "sample_stratified_rebalance",
    "multimodal_decode_wav",
    "scan_csv_roundtrip",
    "scan_jsonl_roundtrip",
    "join_asof_binned",
    "window_ntile_cume",
    "timeseries_gapfill",
    "quality_dedup_rates",
    "sim_quantized_recall",
    "setop_except_all",
    "setop_intersect_all",
    "str_fuzzy_levenshtein",
    "scan_partition_prune",
    "agg_hll_sketch_merge",
    "join_full_outer",
    "agg_mode_deterministic",
    "window_rank_stake",
    "window_row_number",
    "window_range_frame",
    # (2) changed this round. The ts-encoding fix (events.ts went
    # timestamp[ns]→timestamp[us] in the regenerated fixtures; batch
    # loader + streaming reader now normalize both) touches every
    # events-ts consumer; stream_session_true was PROMOTED rows→SQL;
    # stream_watermark_late got the partition-parallel prefix plan;
    # the two UDTF demos moved to Arrow-native applyInArrow;
    # sim_ann_recall grew the lsh_multiprobe leg and the LSH/near-dup
    # queries share the new band_struct_array helper
    "stream_session_true",
    "stream_tumbling_true",
    "stream_sliding_true",
    "stream_dedup_true",
    "stream_stateful_ema",
    "stream_stateful_ema_batches",
    "stream_static_join_true",
    "stream_session",
    "stream_watermark_late",
    "stream_tumbling",
    "stream_sliding",
    "stream_dedup",
    "join_asof",
    "join_theta_range",
    "udtf_grouped_map",
    "udtf_cogrouped_map",
    "sim_ann_recall",
    "sim_ann_lsh_topk",
    "embed_neardup_cosine",
    # (3) refresh the oldest green rows (hash-green in r3, untouched
    # since) — projections, joins, aggregations, llm batch family
    "project_arith",
    "filter_compound",
    "filter_null_semantics",
    "join_broadcast",
    "join_shuffle_equi",
    "join_multiway_star",
    "join_left_outer",
    "join_semi",
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
