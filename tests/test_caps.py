"""Degenerate-corpus cap tests (VERDICT r6 #4): the fixtures never
hit the LSH bucket cap (max bucket ≈ a handful of ids) or the
stop-shingle DF cap (max shingle df 9), so until now the bounds that
make the dedup family safe at 100 TB were design claims. These tests
build corpora that EXCEED the caps and pin the truncation behavior.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from map_reduce_subnet_spark.operators import QUERIES


def _write_documents(path, rows):
    """documents.parquet with the full declared column contract."""
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "source": pa.array(["synthetic"] * len(rows), pa.string()),
                "n_chars": pa.array(
                    [len(r[1]) for r in rows], pa.int64()
                ),
            }
        ),
        str(path / "documents.parquet"),
    )


def test_capped_buckets_truncates_degenerate_bucket(spark):
    """_capped_buckets must keep exactly the cap lowest ids of a hot
    bucket (deterministic survivors) and leave cold buckets intact —
    the per-task O(cap²) bound that stops a million-duplicate bucket
    from building an unbounded collect_list row."""
    from map_reduce_subnet_spark.operators.llm import (
        _bucket_pairs,
        _capped_buckets,
    )
    import pyspark.sql.functions as F

    rows = [("hot", i) for i in range(20, 0, -1)] + [
        ("cold", i) for i in (107, 103, 105)
    ]
    df = spark.createDataFrame(rows, "k string, doc_id long")
    got = {
        r["k"]: r["ids"]
        for r in _capped_buckets(df, ["k"], "doc_id", cap=5).collect()
    }
    assert got["hot"] == [1, 2, 3, 4, 5]  # the 5 LOWEST, sorted
    assert got["cold"] == [103, 105, 107]
    pairs = (
        _capped_buckets(df, ["k"], "doc_id", cap=5)
        .select(F.explode(_bucket_pairs(F.col("ids"))).alias("p"))
        .select("p.a_id", "p.b_id")
        .collect()
    )
    # C(5,2) + C(3,2) pairs, every pair a<b; the hot bucket's pairs
    # stay entirely inside its 5 surviving ids (ids 6..20 lost
    # candidacy), while the cold bucket pairs all of its ids
    assert len(pairs) == 10 + 3
    assert all(r["a_id"] < r["b_id"] for r in pairs)
    hot_pairs = [(r["a_id"], r["b_id"]) for r in pairs if r["b_id"] <= 20]
    assert len(hot_pairs) == 10
    assert max(b for _, b in hot_pairs) == 5  # ids 6..20 lost candidacy


def test_minhash_bucket_cap_bites_on_duplicate_flood(spark, tmp_path):
    """300 IDENTICAL documents all share every band signature; the
    real dedup_near_minhash query must admit only the LSH_BUCKET_CAP
    (256) lowest doc_ids to pair expansion — C(256,2) pairs, ids
    ≥ 256 losing candidacy — instead of building a 300-wide bucket."""
    from map_reduce_subnet_spark.operators.llm import LSH_BUCKET_CAP

    text = "the quick brown fox jumps over the lazy dog again and again"
    _write_documents(tmp_path, [(i, text) for i in range(300)])
    got = QUERIES["dedup_near_minhash"](spark, str(tmp_path)).collect()
    cap = LSH_BUCKET_CAP
    assert len(got) == cap * (cap - 1) // 2
    assert max(r["b_id"] for r in got) == cap - 1
    assert min(r["a_id"] for r in got) == 0


def test_shingle_df_cap_bites_on_hot_shingle(spark, tmp_path):
    """70 documents share one hot shingle (df=70 > SHINGLE_DF_CAP=64);
    without the stop-shingle cap they would all pair (Jaccard 1/7 ≥
    the 0.1 threshold). The real dedup_ngram_jaccard query must drop
    the hot shingle and emit ONLY the genuinely-near-dup pair that
    shares rare shingles."""
    rows = [
        (i, f"hot hot hot u{i}a u{i}b u{i}c") for i in range(70)
    ] + [
        (100, "alpha beta gamma delta"),
        (101, "alpha beta gamma delta"),
    ]
    _write_documents(tmp_path, rows)
    got = QUERIES["dedup_ngram_jaccard"](spark, str(tmp_path)).collect()
    assert [(r["a_id"], r["b_id"], r["jaccard"]) for r in got] == [
        (100, 101, 1.0)
    ]


def test_substring_span_interval_union_and_stop_cap(spark, tmp_path):
    """dedup_substring_spans: (a) overlapping span hits merge via
    interval union (a shared 14-token region = 5 overlapping spans but
    exactly 14 covered tokens), (b) two disjoint shared regions sum as
    separate islands, (c) a span shared by 70 > SPAN_STOP_CAP docs is
    a boilerplate stop-span and contributes NOTHING."""
    shared_a = [f"s{i}" for i in range(14)]  # 5 overlapping 10-spans
    shared_b = [f"t{i}" for i in range(10)]  # 1 exact 10-span
    boiler = [f"b{i}" for i in range(10)]  # hot: in 70 docs

    def uniq(d, n, tag):
        return [f"u{d}{tag}{j}" for j in range(n)]

    rows = [
        (
            d,
            " ".join(
                uniq(d, 10, "a")
                + shared_a
                + uniq(d, 3, "g")
                + shared_b
                + uniq(d, 5, "z")
            ),
        )
        for d in (1, 2)
    ]
    rows += [
        (
            100 + d,
            " ".join(uniq(100 + d, 5, "a") + boiler + uniq(100 + d, 5, "z")),
        )
        for d in range(70)
    ]
    _write_documents(tmp_path, rows)
    out = {
        r["doc_id"]: r
        for r in QUERIES["dedup_substring_spans"](
            spark, str(tmp_path)
        ).collect()
    }
    for d in (1, 2):
        assert out[d]["n_tokens"] == 42
        assert out[d]["n_spans"] == 33
        assert out[d]["n_dup_spans"] == 6  # 5 overlapping + 1 exact
        assert out[d]["covered_tokens"] == 24  # 14 + 10, unioned
    for d in range(70):  # the hot span was dropped, not counted
        assert out[100 + d]["n_dup_spans"] == 0
        assert out[100 + d]["covered_tokens"] == 0
