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
    # --- FRESHNESS SCHEDULE (VERDICT r8 #2 / r9 #1), r10 edition ---
    # r10 executes the burn-down written in r9, then trades part of it
    # for this round's changed keys per the ranking above (changed
    # keys outrank stale-but-unchanged backfill): 18 changed keys +
    # the SEVEN r4-vintage keys + 25 of the 37-key r5 cohort = exactly
    # 50. Invariant after r10: no key's latest driver row predates r6
    # EXCEPT the twelve displaced r5 keys (project_arith + the eleven
    # listed at the shingle-fix comment below — every one of them
    # twelve-layer-verified locally this round); r11 sweeps those
    # twelve FIRST, then the r6 cohort.
    #
    # (1) changed in round 10:
    # stream_upsert_foreachbatch — the per-batch merge closure hoisted
    # module-level so foreachBatch REPLAY idempotency is mechanically
    # tested (same batch id delivered twice -> identical state); the
    # merge algebra (per-user latest-wins) is unchanged, so values are
    # identical — the slot refreshes an r6-vintage row anyway.
    # agg_time_decay / agg_trend_ols / privacy_k_anonymize — ORACLE
    # fixes from the new negative-domain differential corpus (r10):
    # their day/week buckets were spelled `epoch_us // 86400000000` in
    # DuckDB, whose BIGINT // TRUNCATES toward zero, while the Spark
    # side floors — identical on every post-1970 corpus (all driver
    # rows unchanged), divergent left of 1970. Now the identical
    # floor(double-division) program on both engines (NOTES invariant
    # #12). Their slots displace three r6-backfill keys
    # (agg_percentile, dedup_cluster, dedup_minhash_est — all
    # unchanged-and-green, pure backfill).
    "stream_upsert_foreachbatch",
    "agg_time_decay",
    "agg_trend_ols",
    "privacy_k_anonymize",
    # agg_minmax_stats / funnel_conversion / text_source_drift_jsd —
    # NULLIF guards from the degenerate-cardinality corpus (r10):
    # dstddev's /(n-1) ANSI-aborted on an n=1 group, the funnel's
    # /n_view on zero entry users, the JSD's /t_r on a single-source
    # corpus (invariant #10 at its cardinality extreme). Guards are
    # value-inert on every fixture (no degenerate group exists there —
    # verified MATCH at sf0.01+sf0.1 from a plain session). Their
    # slots take the last two r6-backfill keys (agg_bitmap_distinct,
    # agg_histogram) plus ONE r5-cohort displacement: project_arith →
    # r11 (the most-trivial displaced key, green in all twelve local
    # layers this round — the r9-precedented changed-key-outranks-
    # stale-unchanged trade).
    "agg_minmax_stats",
    "funnel_conversion",
    "text_source_drift_jsd",
    # the shingle/trigram LET-BINDING fix (r10, the biggest scale find
    # of the round): expressions referenced from inside a Spark HOF
    # lambda re-evaluate PER ELEMENT, so shingles()/char_trigrams()
    # re-split (re-walked) the whole text per output element — O(n²)
    # per document (measured 16k words = 49.8 s -> 0.17 s; a 60k-word
    # web doc pushed dedup_near_minhash past 10 minutes; even the
    # ~200-word fixture docs paid 2-4x: dedup_near_minhash 4.78 ->
    # 1.82 s at sf0.1). Values are IDENTICAL (pinned by equivalence +
    # linearity tests; 13/13 diffcheck MATCH at sf0.01+sf0.1; all ten
    # adversarial corpora green). Every registered consumer of the two
    # helpers takes a changed-key slot, displacing eleven r5-cohort
    # freshness keys to r11 (per the established ranking: changed keys
    # outrank stale-but-unchanged backfill; each displaced key is
    # green in all twelve local layers this round): filter_compound,
    # filter_null_semantics, join_broadcast, join_left_outer,
    # join_semi, join_shuffle_equi, setop_except_all,
    # setop_intersect_all, window_ntile_cume, window_range_frame,
    # window_rank_stake.
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_near_minhash",
    "dedup_minhash_est",
    "dedup_cluster",
    "dedup_survivors",
    "text_langid_ngram",
    "text_decontaminate",
    "pipeline_curation_e2e",
    "split_leakage_safe",
    "sample_contrastive_pairs",
    # (2) the seven r4-vintage keys displaced late-r9 (each 5-way
    # locally verified in r9: perturbed, micro, tie, constant,
    # partition-invariance)
    "date_parts",
    "limit_topk",
    "setop_dedup",
    "setop_except",
    "setop_intersect",
    "setop_union_all",
    "sort_multi_key",
    # (3) the full r5 cohort (oldest remaining rows in the registry)
    "agg_mode_deterministic",
    "join_asof",
    "join_asof_binned",
    "join_full_outer",
    "join_multiway_star",
    "join_theta_range",
    "quality_dedup_rates",
    "sample_stratified_rebalance",
    "scan_csv_roundtrip",
    "scan_jsonl_roundtrip",
    "scan_partition_prune",
    "str_fuzzy_levenshtein",
    "stream_dedup",
    "stream_dedup_true",
    "stream_session",
    "stream_session_true",
    "stream_sliding",
    "stream_sliding_true",
    "stream_static_join_true",
    "stream_tumbling",
    "text_collocations_pmi",
    "text_quality_c4",
    "timeseries_gapfill",
    "udtf_grouped_map",
    "window_row_number",
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
