"""Regression tests for degenerate inputs the fixtures don't contain:
short/empty documents and short/empty embedding vectors (found by
review — Spark's sequence(1, 0) counts DOWN, and ANSI element_at
raises out-of-bounds instead of returning NULL).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from map_reduce_subnet_spark.functions import similarity as sim
from map_reduce_subnet_spark.functions import text as tx


def test_shingles_short_documents(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, "hi"), (2, "a b"), (3, "a b c"), (4, "a b c d")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["sh"]
        for r in df.select(
            "doc_id", tx.shingles("text", 3).alias("sh")
        ).collect()
    }
    assert got[0] == [] and got[1] == [] and got[2] == []
    assert got[3] == ["a b c"]
    assert got[4] == ["a b c", "b c d"]


def test_sign_sketch_short_vectors(spark):
    """Short/empty vectors must sketch without crashing (the hyperplane
    projection just folds fewer terms), the sketch must be confined to
    its n_bits, and an empty vector projects to 0 on every hyperplane
    (sign convention: 0 → bit 1 → all-ones sketch)."""
    df = spark.createDataFrame(
        [(0, [1.0] * 16), (1, [1.0] * 4), (2, [])],
        "vec_id long, embedding array<float>",
    )
    sel = df.select(
        "vec_id", sim.sign_sketch(F.col("embedding"), 16).alias("sk")
    )
    rows = {r["vec_id"]: r["sk"] for r in sel.collect()}
    assert all(0 <= v <= 0xFFFF for v in rows.values())
    assert rows[2] == 0xFFFF
    # hash-seeded hyperplanes are deterministic: same plan, same sketch
    rows2 = {r["vec_id"]: r["sk"] for r in sel.collect()}
    assert rows == rows2
    # a vector and its negation land on opposite sides of every
    # hyperplane — sketches are complementary. Power-of-2 components:
    # ±1 ±0.5 ±0.25 … can never sum to exactly 0 (the leading term
    # outweighs all others), so no bit sits ON a hyperplane.
    v = [2.0 ** -i for i in range(16)]
    pair = spark.createDataFrame(
        [(0, v), (1, [-x for x in v])],
        "vec_id long, embedding array<float>",
    ).select("vec_id", sim.sign_sketch(F.col("embedding"), 16).alias("sk"))
    got = {r["vec_id"]: r["sk"] for r in pair.collect()}
    assert got[1] == got[0] ^ 0xFFFF


def test_sign_sketch_null_component(spark):
    """A NULL *element* inside a vector contributes 0 (coalesced), so
    the sketch equals the same vector with that component zeroed —
    instead of NULL poisoning every projection and collapsing all
    NULL-bearing vectors into one degenerate bucket."""
    v = [2.0 ** -i for i in range(16)]
    with_null = v[:7] + [None] + v[8:]
    with_zero = v[:7] + [0.0] + v[8:]
    df = spark.createDataFrame(
        [(0, with_null), (1, with_zero), (2, v)],
        "vec_id long, embedding array<float>",
    ).select("vec_id", sim.sign_sketch(F.col("embedding"), 16).alias("sk"))
    got = {r["vec_id"]: r["sk"] for r in df.collect()}
    assert got[0] == got[1]
    assert 0 <= got[0] <= 0xFFFF


def test_quality_score_single_token(spark):
    df = spark.createDataFrame([(0, "word")], "doc_id long, text string")
    [r] = df.select(tx.quality_score("text").alias("q")).collect()
    assert 0.0 <= r["q"] <= 1.0
