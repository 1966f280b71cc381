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
    # (1) new in round 6 — need their first driver row
    "join_skew_aqe",
    "multimodal_decode_png",
    "sessionize_events",
    "join_interval_overlap",
    "agg_histogram",
    "window_zscore_anomaly",
    "scan_orc_roundtrip",
    "sim_ann_ivf_kmeans",
    "stream_upsert_foreachbatch",
    "text_lm_unigram_score",
    "graph_pagerank",
    "funnel_conversion",
    "retention_cohort",
    "multimodal_image_resize",
    # promoted rows->SQL late r6 (need their first ORACLE row):
    "sink_roundtrip",
    "sink_csv_roundtrip",
    "sink_json_roundtrip",
    "sim_ann_lsh_topk",
    "sim_ann_multiprobe_topk",
    "embed_neardup_cosine",
    # promoted rows->SQL late r6, second batch: the whole MinHash
    # dedup family moved to the portable md5 hash + pinned affine
    # permutations, making signatures/bands/pairs/label-propagation
    # SQL-expressible (cluster/survivors via the 20-round unroll)
    "dedup_near_minhash",
    "dedup_simhash",
    "dedup_cluster",
    "dedup_survivors",
    # promoted rows->SQL late r6, third batch: the multimodal family —
    # the PNG oracles (decode/resize, already listed in group 1)
    # REGENERATE the expected output from the synthetic pixel program
    # (a hash match proves the DEFLATE/unfilter loop lossless); the
    # byte-feature oracles lean on the all-ASCII fixture
    # (precondition pinned in tests)
    "multimodal_features",
    "multimodal_frame_sample",
    # decode_wav promoted too: the sawtooth payload is pure-integer,
    # so its RMS regenerates exactly (sqrt is IEEE-identical, unlike
    # the sine's libm sin that blocked the oracle before)
    "multimodal_decode_wav",
    # new late r6: mergeable-bitmap exact distinct + MinHash Jaccard
    # estimation over the candidate pairs
    "agg_bitmap_distinct",
    "dedup_minhash_est",
    # new late r6: custom Python DataSource API (batch + streaming +
    # sink) and the VARIANT-typed payload scan
    "scan_python_datasource",
    "stream_python_source_true",
    "sink_python_datasource",
    "scan_variant_props",
    # new late r6: state-store inspection (Spark 4 state data source)
    # + real Python UDTF via LATERAL join
    "stream_state_inspect",
    "udtf_python_lateral",
    # new late r6: runtime star-join pruning + the custom streaming
    # sink pipeline (source->sink, commit-log read-back)
    "join_partition_prune_dynamic",
    "stream_python_sink_true",
    # new late r6: Spark 4 SQL pipe syntax, bounded-state streaming
    # dedup, and query-attached observed metrics
    "sql_pipe_syntax",
    "stream_dedup_within_watermark_true",
    "observe_metrics",
    # (2) changed this round: agg_ema moved to the two-level
    # (user, day)-binned fold (new oracle too); sim_ann_ivf and
    # sim_ann_recall's IVF leg moved to the shuffle-free
    # nearest_centroid fold; sim_ann_recall grew the lsh_int8_quant
    # leg and sim_quantized_recall now shares int8_dequantized;
    # sample_stratified_rebalance got the overflow-safe mod-2^31
    # selector (both engines); stream_watermark_late buckets with
    # integer DIV; join_bucketed caches its bucketed scratch; every
    # streaming job reads through the all-files footer probe
    "agg_ema",
    "sim_ann_ivf",
    "sim_ann_recall",
    "sim_quantized_recall",
    # (sample_stratified_rebalance rotated back out for
    # multimodal_decode_wav — its r6 overflow-safe selector changed
    # both engines identically and is covered by test_correctness)
    "stream_watermark_late",
    "join_bucketed",
    "stream_stateful_ema",
    "stream_stateful_ema_batches",
    # (stream_sliding_true, stream_dedup_true, stream_tumbling_true,
    # stream_session_true rotated back out for the newly-oracled
    # multimodal byte-feature keys and the within-watermark/observe
    # additions: all hash-green r5, and seven other streaming keys in
    # this list exercise the same changed footer-probe read path)
    # (stream_static_join_true rotated back out for sql_pipe_syntax:
    # hash-green r5, and six other streaming keys above exercise the
    # same changed _read_events_stream footer-probe path)
    "stream_stream_join_true",
    # (3) the 25 keys whose newest driver row is still r1/r2 (rotated
    # out by the 50-slot cap in r3-r5; several sit above shared
    # helpers that changed since) — refresh them all this round
    # (agg_global rotated back out for join_partition_prune_dynamic —
    # structurally simple r1-green, unchanged)
    # (agg_approx_distinct rotated back out with multimodal_features /
    # sink_roundtrip — rows-only refresh, least signal)
    # (agg_pivot, agg_unpivot, str_posexplode rotated back out for the
    # late-r6 LSH promotions — structurally simple r1-greens)
    "agg_percentile",
    # (agg_string_agg, agg_corr, project_try_cast, window_first_last
    # rotated back out for the four newly-oracled dedup keys —
    # structurally simple, unchanged since their r1/r2 green rows)
    # (join_cross_bipartite, dedup_simhash, gen_date_spine rotated
    # back out for the three newly-oracled sink keys: unchanged since
    # their r1/r2 green rows, and dedup_simhash is rows-only)
    # (text_chunking, text_pii_scrub rotated back out for
    # sink_python_datasource / scan_variant_props — structurally
    # simple, unchanged since their r1/r2 green rows)
    # (multimodal_features rotated back out when the round-6
    # continuation keys claimed their slots — rows-only, least
    # refresh signal; the sink keys moved to the promoted group)
    # (scan_filter_pushdown rotated back out for
    # stream_python_sink_true — r2-green, unchanged, and its pushdown
    # invariant is plan-linted in tests/test_plans.py every run)
    # (scan_json_props rotated back out for udtf_python_lateral —
    # r2-green, unchanged, and scan_variant_props re-exercises the
    # same JSON payload surface this round)
    # (join_broadcast_nested_loop, agg_approx_percentile rotated back
    # out for agg_bitmap_distinct / dedup_minhash_est — the former is
    # a structurally simple r2-green, the latter rows-only; agg_max_by
    # and merge_upsert rotated back out for the two Python DataSource
    # keys — both unchanged since their r1/r2 green rows)
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
