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
    # --- FRESHNESS SCHEDULE (VERDICT r8 #2), r9 edition ---
    # With a 207+ key registry and a 50-slot cap, the backlog of
    # aging hash-green rows clears on a two-round schedule:
    #   r9  = new/changed keys + the r4 cohort (21 of 26; see below);
    #   r10 = new/changed keys + the seven r4 keys displaced late-r9
    #         (limit_topk, date_parts — agg_ema/multimodal_features
    #         slots; setop_dedup, setop_except, setop_intersect —
    #         the ANSI zero-variance fix slots; setop_union_all,
    #         sort_multi_key — the NULL-key fix slots) + the FULL
    #         38-key r5 cohort
    #         (agg_mode_deterministic, filter_compound,
    #         filter_null_semantics, join_asof, join_asof_binned,
    #         join_broadcast,
    #         join_full_outer, join_left_outer, join_multiway_star,
    #         join_semi, join_shuffle_equi, join_theta_range,
    #         project_arith, quality_dedup_rates,
    #         sample_stratified_rebalance, scan_csv_roundtrip,
    #         scan_jsonl_roundtrip, scan_partition_prune,
    #         setop_except_all, setop_intersect_all,
    #         str_fuzzy_levenshtein, stream_dedup, stream_dedup_true,
    #         stream_session, stream_session_true, stream_sliding,
    #         stream_sliding_true, stream_static_join_true,
    #         stream_tumbling, text_collocations_pmi, text_quality_c4,
    #         timeseries_gapfill, udtf_cogrouped_map, udtf_grouped_map,
    #         window_ntile_cume, window_range_frame, window_rank_stake,
    #         window_row_number) + r6-cohort backfill in spare slots.
    # Invariant after r9: no key's latest row predates r5; after r10:
    # none predates r6.
    #
    # (1) never driver-checked — first rows (VERDICT r8 #1 puts
    # text_quality_classifier at slot 1)
    "text_quality_classifier",
    "split_leakage_safe",
    "stream_mv_refresh_true",
    "text_ccnet_perplexity_bucket",
    "text_repetition_ngram",
    "agg_time_decay",
    "pipeline_sequence_pack",
    "scan_rowgroup_skip",
    "sim_mmr_diversify",
    "quality_filter_agreement",
    "diag_skew_report",
    "multimodal_scene_cut",
    "table_constraint_audit",
    "text_source_drift_jsd",
    # agg_trend_ols ALSO changed late-r9 (degenerate zero-x-variance
    # groups now NULL via NULLIF on both engines — tie-corpus catch);
    # it already sits inside the cap as a first-row key, so the
    # changed-key rule is satisfied without displacing anything
    "agg_trend_ols",
    "sample_contrastive_pairs",
    "privacy_k_anonymize",
    "privacy_dp_count_laplace",
    # (2) changed in round 9: table_vacuum grew the orphan grace
    # window + aged-debris fixture; graph_kcore's fixpoint loop bound;
    # scan_csv_malformed's FAILFAST probe narrowed; the BPE pair's
    # rules memo keyed by merge count; mv_incremental_refresh's oracle
    # extracted to the shared constant stream_mv_refresh_true reuses;
    # agg_ema's NULL-value semantics pinned to skip-the-observation on
    # both engines (the micro-corpus differential caught Spark's
    # non-nullable fold seed materializing a poisoned bin as 0.0) —
    # its slot displaces limit_topk from the r4 cohort to r10 (a
    # documented exception to the "nothing predates r5 after r9"
    # invariant; a changed key outranks a stale-but-unchanged one);
    # multimodal_features' ORACLE grew an empty-text guard (DuckDB
    # ord('') is -1, the engine's empty-payload byte_sum is 0 — also
    # a micro-corpus differential catch; fixtures have no empty docs,
    # min text length 44, so the r7 row's values are unchanged) — its
    # slot displaces date_parts to r10.
    # LATE-r9 additions to this group (ANSI zero-variance crash fixes,
    # caught by the new tie-stress/constant-corpus differentials; all
    # NULLIF-guarded on both engines, invariant #10 in NOTES):
    # agg_corr (explicit covar/NULLIF(sx*sy) replaces the corr()
    # built-in, which ANSI-throws on constant x), agg_skew_kurtosis
    # (m2==0 guards), window_zscore_anomaly (sd==0 and n==1 guards) —
    # their slots displace setop_dedup, setop_except, setop_intersect
    # from the r4 cohort to r10 (exceptions three to five; each of the
    # three displaced keys was locally re-verified 4 ways this round:
    # perturbed, micro, tie, partition-invariance).
    # SECOND late-r9 batch (NULL-KEY corpus catches): changes() now
    # uses presence markers + eqNullSafe (a NULL-key row present in
    # both snapshots was emitted as TWO inserts, double-counting the
    # NULL bucket downstream); both MV bucket merges made null-safe;
    # table_changefeed and udtf_cogrouped_map oracles moved to
    # IS NOT DISTINCT FROM. mv_incremental_refresh and
    # stream_mv_refresh_true already hold slots above; table_changefeed
    # and udtf_cogrouped_map take the two slots freed by displacing
    # setop_union_all and sort_multi_key to r10 (exceptions six and
    # seven — both displaced keys 5-way locally verified this round).
    "table_changefeed",
    "udtf_cogrouped_map",
    "agg_corr",
    "agg_skew_kurtosis",
    "window_zscore_anomaly",
    "agg_ema",
    "multimodal_features",
    "table_vacuum",
    "graph_kcore",
    "scan_csv_malformed",
    "text_bpe_merges",
    "text_bpe_encode",
    "mv_incremental_refresh",
    # (3) the r4 cohort (oldest rows in the registry), minus the three
    # keys displaced to r10 by the late-r9 changed keys above
    "array_funcs",
    "array_hof",
    "date_arith",
    "json_funcs",
    "map_funcs",
    "math_funcs",
    "scan_full",
    "scan_prune_columns",
    "str_hash",
    "str_regex",
    "str_split_explode",
    "text_tfidf_topk",
    "udaf_grouped_agg",
    "udf_scalar",
    "window_lag_delta",
    "window_moving_avg",
    "window_percent_rank",
    "window_running_sum",
    "window_topk_per_group",
    # (4) r5-cohort backfill: fully displaced by the fifteen r9
    # additions — the whole 38-key r5 cohort moves to r10 (list
    # above), which still fits: 38 + r9's changed keys < the cap.
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
