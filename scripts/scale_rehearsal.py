"""Scale rehearsal above sf0.1 (VERDICT r6 #4): build a 10x fixture
("sf1") by unioning ten id-shifted copies of the sf0.1 tables, run
the dedup family + ANN + PageRank + the flagship aggregate at BOTH
scales on the same local[32] session, and print the scaling table
that SCALE.md records.

The 10x corpus is duplicate-heavy BY CONSTRUCTION (each document/
vector appears in all ten copies with a shifted id) — exactly the
shape a dedup pipeline exists for, and the shape that makes
candidate-pair counts grow: each sf0.1 near-dup cluster of size c
becomes a 10c-clique, so pair outputs scale ~x45 per cluster while
the corpus scales x10. Linear-ish wall-clock at that output growth
is the pass bar for the bucketed (never all-pairs) architecture.

Methodology matches bench.py: each query executes into the no-op
sink (all columns materialized, nothing crosses to the driver); a
watchdog cancels any query still running after --timeout seconds and
records TIMEOUT instead of hanging the rehearsal.

Usage:
    python scripts/scale_rehearsal.py [--rebuild] [--queries q1,q2]
        [--timeout 600]

Writes nothing under /root/repo except stdout; the scaled fixture
lives in /tmp/mrs_scale_sf1.
"""

from __future__ import annotations

import argparse
import shutil
import sys
import threading
import time
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"
DST = "/tmp/mrs_scale_sf1"
COPIES = 10
SHIFT_DOC = 1_000_000
SHIFT_VEC = 1_000_000
SHIFT_ORD = 1_000_000_000

QUERY_SET = [
    "agg_reduce_sum",
    "dedup_exact",
    "dedup_near_minhash",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_minhash_est",
    "dedup_cluster",
    "dedup_survivors",
    "sim_ann_lsh_topk",
    "sim_ann_multiprobe_topk",
    "sim_ann_ivf_kmeans",
    # r12: the two new operators. The 10x corpus is their stress
    # shape — every document reappears in all ten copies, so each
    # sf0.1 prefix-truncation chain of c docs becomes a 10c-clique
    # inside one prefix bucket (pair output ~x45 per chain while the
    # corpus is x10; the LSH_BUCKET_CAP bounds the worst bucket);
    # sim_ann_pq_adc must stay scan-dominated (train once, serve as
    # one zero-exchange pass).
    "dedup_prefix_truncation",
    "sim_ann_pq_adc",
    # r13: the two new operators. CEP is sessionization-priced (one
    # user_id shuffle + one Window with bounded 2-row lookahead) —
    # the 10x question is only sort volume per user; dynamic
    # partition overwrite is write-dominated — the 10x question is
    # that the revision write stays per-task (no shuffle) and the
    # delete set stays pruned to the touched partitions.
    "events_cep_pattern",
    "sink_dynamic_partition_overwrite",
    # r13 batch 2: blocked fuzzy dedup's 10x question is the pair
    # population on the duplicate-heavy corpus (each sf0.1 near-dup
    # chain becomes a 10c-clique inside one block — the
    # LSH_BUCKET_CAP bounds the worst block) with an O(len·budget)
    # levenshtein verify per pair; the live CEP twin's question is
    # state-store growth (O(1) per user) across batches at 10x rows.
    "dedup_fuzzy_blocked",
    "stream_cep_true",
    "graph_pagerank",
    "funnel_conversion",
    # r8 (VERDICT r7 #6): the streaming + warehouse families — the
    # 10x questions here are state-store growth (the stream-stream
    # join keeps BOTH sides' rows in state within the time bound;
    # the stateful EMA keeps one row per user) and the versioned
    # table's commit path (merge input stays one row per key per
    # side, snapshots are plain scans — commits should scale with
    # the REDUCED state, not the event count).
    "stream_tumbling_true",
    "stream_stream_join_true",
    "stream_stateful_ema_batches",
    "stream_upsert_foreachbatch",
    "table_timetravel",
    "table_changefeed",
    "merge_scd2_history",
    "merge_upsert",
    # r8 second session: the learned-artifact + composition family.
    # 10x questions: BPE's per-round pair shuffle grows with the
    # DISTINCT-WORD vocab (sub-linear in corpus — the learner trick's
    # whole point); the curation funnel composes three gates and the
    # corpus-wide drop list (drop set grows ~x45 on the duplicate-
    # heavy fixture — does the broadcast anti-join hold?); triangle
    # counting's wedge cost is O(sum deg^2) with capped degrees on a
    # pair graph that grows ~x45; the bigram LM joins the corpus to
    # two count dictionaries whose hot keys multiply nothing.
    "text_bpe_merges",
    "pipeline_curation_e2e",
    "graph_triangle_count",
    "text_lm_bigram_score",
    # graph_kcore peels the pair graph whose edge count grows ~x45
    # on the duplicate-heavy fixture; per-round cost is O(edges).
    "graph_kcore",
    # r9 (VERDICT r8 #6): the remaining r8 families + the r9 keys.
    # 10x questions: the substring-span table is the biggest
    # intermediate in the repo — (doc_id,pos,h) rows grow x10 and the
    # duplicated-span population ~x45-ish on the id-shifted fixture
    # (every 10-token span of every doc now repeats in 10 copies), so
    # BOTH shuffles of the spans pipeline grow — the deliberate
    # non-broadcast equi-join back is what must hold; image aHash
    # decodes 10x payloads scan-locally and shuffles only 24-byte
    # fingerprints; the leakage-safe split joins a ~x10 cluster map
    # against a x10 corpus on doc_id; the streaming MV refresh's
    # change feeds stay one-row-per-user (scale-invariant user
    # population here) while the commits behind them process x10
    # events; classifier inference is map-only and must scale flat
    # per-row.
    "dedup_substring_spans",
    "multimodal_image_ahash",
    "split_leakage_safe",
    "stream_mv_refresh_true",
    "text_quality_classifier",
    # r9 late batch. 10x questions: sequence packing's two-phase
    # prefix sum must keep the driver sync at its fixed bucket count
    # while the token stream grows x10; contrastive mining's cluster
    # positives ride the ~x45 pair growth and the hash-rank negative
    # join must stay one bucketed shuffle; the JSD drift score's
    # (word x source) aggregate is distinct-vocab-bound
    # (scale-invariant here) with a x10 count pass in front;
    # scene-cut decodes x10 binary frame payloads scan-locally;
    # the skew report's count-of-counts histogram collapses x10 keys
    # into the same tiny histogram; the constraint audit's two FK
    # anti-joins re-scan x10 fact rows against dim-sized key sides;
    # OLS trend and the DP counts are single partial+final
    # aggregates that must price like a COUNT.
    "pipeline_sequence_pack",
    "sample_contrastive_pairs",
    "text_source_drift_jsd",
    "multimodal_scene_cut",
    "diag_skew_report",
    "table_constraint_audit",
    "agg_trend_ols",
    "privacy_dp_count_laplace",
    # r15: the two new operators + the nprobe-changed ANN pair. OOO
    # CEP's 10x question is the REORDER-BUFFER population (event rate
    # x the 1 h reorder window per user) on top of the gapped state,
    # across the same 4-file replay; MJPEG's is x10 demux+decode
    # payloads scan-locally (frames never cross a shuffle);
    # sim_ann_ivfpq at nprobe=2 must still serve via static partition
    # prune — two inverted-list directories instead of one, cold
    # build unchanged and fixture-cached.
    "stream_cep_gapped_ooo",
    "multimodal_decode_mjpeg",
    "sim_ann_ivfpq",
    # r15 late: the contiguous OOO twin — same replay and flush
    # machinery as the gapped one with O(1) machine state; the 10x
    # question is only the reorder-buffer population.
    "stream_cep_ooo",
]

COPY_TABLES = [
    "region", "nation", "customer", "supplier", "part",
]


# A single output file per table would under-parallelize the whole
# rehearsal: Spark plans scan tasks by BYTE ranges (one row group
# never splits), so a 0.9 MB single-file documents table carries the
# entire 50k-doc shingle pipeline on ONE task no matter how many
# cores exist — the first rehearsal measured 290-520 s for
# dedup_near_minhash@sf1 purely because of that layout. Real 100 TB
# tables arrive as thousands of files; emulate that with a
# directory of N_FILES hash-bucketed parquet files per scaled table.
N_FILES = 32


def _copy_sharded(con, select_sql: str, dest: str, shard_col: str) -> None:
    Path(dest).mkdir()
    for s in range(N_FILES):
        con.sql(
            f"COPY (SELECT * FROM ({select_sql}) WHERE"
            f" {shard_col} % {N_FILES} = {s})"
            f" TO '{dest}/part-{s:05d}.parquet' (FORMAT PARQUET)"
        )


def build_fixture() -> None:
    dst = Path(DST)
    if dst.exists():
        shutil.rmtree(dst)
    dst.mkdir(parents=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW src AS SELECT * FROM '{SRC}/documents.parquet'")
    unions = " UNION ALL ".join(
        f"SELECT doc_id + {k * SHIFT_DOC} AS doc_id, text, lang, source,"
        f" n_chars FROM src"
        for k in range(COPIES)
    )
    _copy_sharded(con, unions, f"{DST}/documents.parquet", "doc_id")
    con.sql("DROP VIEW src")
    con.sql(f"CREATE VIEW src AS SELECT * FROM '{SRC}/embeddings.parquet'")
    unions = " UNION ALL ".join(
        f"SELECT vec_id + {k * SHIFT_VEC} AS vec_id, embedding, label"
        f" FROM src"
        for k in range(COPIES)
    )
    _copy_sharded(con, unions, f"{DST}/embeddings.parquet", "vec_id")
    con.sql("DROP VIEW src")
    con.sql(f"CREATE VIEW src AS SELECT * FROM '{SRC}/orders.parquet'")
    unions = " UNION ALL ".join(
        f"SELECT o_orderkey + {k * SHIFT_ORD} AS o_orderkey, o_custkey,"
        f" o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
        f" FROM src"
        for k in range(COPIES)
    )
    _copy_sharded(con, unions, f"{DST}/orders.parquet", "o_orderkey")
    con.sql("DROP VIEW src")
    con.sql(f"CREATE VIEW src AS SELECT * FROM '{SRC}/lineitem.parquet'")
    cols = (
        "l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice,"
        " l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate"
    )
    unions = " UNION ALL ".join(
        f"SELECT l_orderkey + {k * SHIFT_ORD} AS l_orderkey, {cols} FROM src"
        for k in range(COPIES)
    )
    _copy_sharded(con, unions, f"{DST}/lineitem.parquet", "l_orderkey")
    con.sql("DROP VIEW src")
    con.sql(f"CREATE VIEW src AS SELECT * FROM '{SRC}/events.parquet'")
    unions = " UNION ALL ".join(
        f"SELECT event_id + {k * SHIFT_ORD} AS event_id, ts, user_id,"
        f" event_type, value, props FROM src"
        for k in range(COPIES)
    )
    _copy_sharded(con, unions, f"{DST}/events.parquet", "event_id")
    for t in COPY_TABLES:
        shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    print(
        f"built {DST} (documents/embeddings/orders/lineitem x{COPIES})",
        flush=True,
    )


def run_noop(spark, build, group: str, timeout: float) -> float | None:
    """BUILD the query (eager checkpoints / fixture-cache builds
    included — bench.py parity) and execute it into the no-op sink,
    all under a watchdog; return seconds or None on timeout/failure
    (the watchdog cancels the job group so the rehearsal proceeds)."""
    done = threading.Event()

    def watchdog() -> None:
        if not done.wait(timeout):
            print(f"  WATCHDOG: cancelling {group}", flush=True)
            spark.sparkContext.cancelJobGroup(group)

    t = threading.Thread(target=watchdog, daemon=True)
    t.start()
    spark.sparkContext.setJobGroup(group, group, interruptOnCancel=True)
    t0 = time.time()
    try:
        build().write.format("noop").mode("overwrite").save()
        return time.time() - t0
    except Exception as e:
        print(f"  {group} failed/cancelled: {str(e)[:200]}", flush=True)
        return None
    finally:
        done.set()
        spark.sparkContext.setJobGroup("", "")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rebuild", action="store_true")
    ap.add_argument("--queries", default=",".join(QUERY_SET))
    ap.add_argument("--timeout", type=float, default=600.0)
    args = ap.parse_args()
    if args.rebuild or not Path(DST).exists():
        build_fixture()

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    # The 10x fixture needs a bigger driver heap than pyspark's 1g
    # local default: dedup_ngram_jaccard@sf1's shingle window dies in
    # GCLocker allocation failures at 1g (the local-mode analog of
    # executor memory sizing on a real cluster). Must be set before
    # the JVM launches.
    import os

    os.environ.setdefault(
        "PYSPARK_SUBMIT_ARGS", "--driver-memory 48g pyspark-shell"
    )
    from map_reduce_subnet_spark.operators import QUERIES
    from map_reduce_subnet_spark.session import get_spark

    # bench.py's session, so absolute numbers are comparable to
    # BASELINE.md rows (an ad-hoc builder session measured the same
    # sf0.1 queries 4-6x slower)
    spark = get_spark(app_name="mrs-scale-rehearsal")
    # Untimed warmup (bench.py discipline): JVM + parquet footers at
    # both scales so the first timed row doesn't absorb startup, plus
    # one throwaway stateful streaming job when the query set contains
    # streaming rows — engine + state-store + python state-worker
    # spin-up cost about 20 s and landed entirely in the first timed
    # streaming row of the first r8 rehearsal (28.65 s at sf0.1 for a
    # query whose bench row is ~5 s).
    names = [q for q in args.queries.split(",") if q]
    for sf_dir in (SRC, DST):
        QUERIES["agg_reduce_sum"](spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
    if any(n.startswith("stream_") for n in names):
        QUERIES["stream_stateful_ema"](spark, SRC).write.format(
            "noop"
        ).mode("overwrite").save()
    results = {}
    for name in names:
        row = {}
        for label, sf_dir in (("sf0.1", SRC), ("sf1", DST)):
            dt = run_noop(
                spark,
                lambda n=name, d=sf_dir: QUERIES[n](spark, d),
                f"{name}@{label}",
                args.timeout,
            )
            row[label] = round(dt, 2) if dt is not None else None
            print(f"{name} @ {label}: {row[label]}s", flush=True)
        results[name] = row
    print("\n| query | sf0.1 s | sf1 s | ratio |", flush=True)
    print("|---|---|---|---|", flush=True)
    for name, row in results.items():
        a, b = row["sf0.1"], row["sf1"]
        ratio = f"{b / a:.1f}x" if a and b else "n/a"
        print(f"| {name} | {a} | {b} | {ratio} |", flush=True)


if __name__ == "__main__":
    main()
