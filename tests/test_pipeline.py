"""The subnet round-loop pipeline vs a plain-Python reference model.

Simulates the reference's validator/miner rounds (dummy ×2 protocol,
EMA scoring, periodic L1 weight sink) over a metagraph built from the
supplier fixture, and checks the DataFrame implementation against a
step-by-step Python recomputation — the same differential discipline
as everywhere else.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from map_reduce_subnet_spark.pipeline import SubnetPipeline, init_scores
from map_reduce_subnet_spark.sources.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture()
def metagraph(spark):
    su = load_table(spark, SF_DIR, "supplier")
    # suppliers as peers: uid=s_suppkey, stake=s_acctbal; odd uids are
    # unregistered (the blacklist reject side, miner.py:116)
    return su.select(
        F.col("s_suppkey").alias("uid"),
        F.col("s_acctbal").alias("stake"),
        (F.col("s_suppkey") % 2 == 0).alias("registered"),
    )


def test_round_loop_matches_python_model(spark, metagraph):
    pipe = SubnetPipeline.attach()
    scores = init_scores(metagraph)
    peers = {
        r["uid"]: r["registered"] for r in metagraph.collect()
    }
    model = {uid: 1.0 for uid in peers}

    for step in range(5):
        scores, weights = pipe.validator_round(metagraph, scores)
        # python model: registered peers answer step*2 (score 1),
        # unregistered are blacklisted -> no response -> score 0
        for uid in model:
            s = 1.0 if peers[uid] else 0.0
            model[uid] = 0.9 * model[uid] + 0.1 * s
        got = {r["uid"]: r["ema"] for r in scores.collect()}
        for uid in model:
            assert got[uid] == pytest.approx(model[uid], abs=1e-12), (
                f"step {step} uid {uid}"
            )
        if step % 2 == 1:
            assert weights is not None
            w = {r["uid"]: r["weight"] for r in weights.collect()}
            assert sum(w.values()) == pytest.approx(1.0, abs=1e-9)
            total = sum(model.values())
            for uid in model:
                assert w[uid] == pytest.approx(model[uid] / total, abs=1e-9)
        else:
            assert weights is None

    assert len(pipe.sunk_weights) == 2  # sink every 2 of 5 steps


def test_custom_attach_overrides(spark, metagraph):
    """attach with custom forward/priority mirrors axon.attach
    flexibility (miner.py:156-160)."""
    pipe = SubnetPipeline.attach(
        forward=lambda x: x * 3 + 1,
        priority=lambda df: F.col("stake") * 2,
    )
    reqs = metagraph.withColumn("dummy_input", F.lit(7))
    out = pipe.miner_respond(reqs)
    rows = out.collect()
    assert all(r["response"] == 22 for r in rows)
    # blacklist default dropped unregistered peers
    assert {r["uid"] for r in rows} == {
        r["uid"] for r in metagraph.where("registered").collect()
    }
