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
    df = spark.createDataFrame(
        [(0, [1.0] * 16), (1, [1.0] * 4), (2, [])],
        "vec_id long, embedding array<float>",
    )
    rows = {
        r["vec_id"]: r["sk"]
        for r in df.select(
            "vec_id", sim.sign_sketch(F.col("embedding"), 16).alias("sk")
        ).collect()
    }
    assert rows[0] == 0xFFFF
    # short vectors degrade to 0-bits for missing components, no crash
    assert rows[1] == 0xF000
    assert rows[2] == 0


def test_quality_score_single_token(spark):
    df = spark.createDataFrame([(0, "word")], "doc_id long, text string")
    [r] = df.select(tx.quality_score("text").alias("q")).collect()
    assert 0.0 <= r["q"] <= 1.0
