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
    # --- FRESHNESS SCHEDULE, r16 edition (VERDICT r15 #7) ---
    # r16 composition, auditable sum: 0 new + 18 changed + 16 (the
    # r9-vintage cohort remainder deferred from r15; its 17th key,
    # udtf_cogrouped_map, is in the changed tranche) + 16 (oldest
    # backfill: the r11-vintage cohort in sorted order, all
    # hash-green in CORRECTNESS_r11) = 50 = SWEEP_CAP. Cohorts are
    # COMPUTED from the CORRECTNESS_r01..r15 union (latest green row
    # per key), not hand-copied; after this rotation no key's latest
    # driver row predates r9 except the 23 r11-vintage keys that did
    # not fit (they lead the r17 backfill). The changed-key rule is
    # mechanized: scripts/fingerprints.py records key -> md5(oracle +
    # engine source) per round, and tests/test_correctness.py fails
    # if any fingerprint changed without the key appearing here.
    #
    # (1) changed this round (OPTIMIZATION_r16.md): the streaming
    # trigger-floor respellings (replay file splits 4->2 / 6->3,
    # bounded python source drains in 2 offset batches), the
    # sim_ann_recall IVF cell-assignment artifact (and the second-
    # session LSH-leg project-before-dedup), the udtf_cogrouped_map
    # input projection, the embed_neardup per-vector norm precompute,
    # the no-data-batch opt-out for the three emit-on-arrival drains,
    # the pagerank nodes-from-trans derivation, the two standalone
    # LSH top-k project-before-dedup respellings, and the
    # contrastive-pairs anchors-first negative lookup:
    "stream_cep_true",
    "stream_cep_gapped_true",
    "stream_cep_ooo",
    "stream_cep_gapped_ooo",
    "stream_stateful_ema_batches",
    "stream_upsert_foreachbatch",
    "stream_python_source_true",
    "stream_python_sink_true",
    "sim_ann_recall",
    "udtf_cogrouped_map",
    "embed_neardup_cosine",
    "stream_stream_join_true",
    "stream_dedup_true",
    "stream_dedup_within_watermark_true",
    "graph_pagerank",
    "sim_ann_lsh_topk",
    "sim_ann_multiprobe_topk",
    "sample_contrastive_pairs",
    # (2) the r9-vintage cohort remainder, deferred from r15 (VERDICT
    # r15 #7 — after these, no registered key's latest driver row is
    # older than r11):
    "sim_mmr_diversify",
    "str_hash",
    "str_regex",
    "str_split_explode",
    "table_constraint_audit",
    "text_bpe_encode",
    "text_bpe_merges",
    "text_ccnet_perplexity_bucket",
    "text_quality_classifier",
    "text_repetition_ngram",
    "text_tfidf_topk",
    "udf_scalar",
    "window_lag_delta",
    "window_percent_rank",
    "window_running_sum",
    "window_topk_per_group",
    # (3) backfill: the r11-vintage cohort (oldest remaining rows,
    # all hash-green in r11), first 16 in sorted order — the
    # remaining 30 (sample_contrastive_pairs moved up into the
    # changed tranche; limit_topk / pipeline_curation_e2e /
    # quality_dedup_rates displaced by the three second-session
    # changed keys) lead the r17 backfill:
    "agg_minmax_stats",
    "agg_mode_deterministic",
    "agg_time_decay",
    "date_parts",
    "dedup_cluster",
    "dedup_containment",
    "dedup_minhash_est",
    "dedup_near_minhash",
    "dedup_ngram_jaccard",
    "dedup_survivors",
    "funnel_conversion",
    "join_asof",
    "join_asof_binned",
    "join_full_outer",
    "join_multiway_star",
    "join_theta_range",
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
