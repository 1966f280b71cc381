"""The reference's subnet round-loop, re-expressed as DataFrame plans.

This is the capability-parity centerpiece: a user of the reference's
miner/validator pair can run the same round semantics here, scaled by
Spark instead of a peer-to-peer network.

Reference mapping (file:line):
- ``attach(forward, blacklist, priority)`` — the axon extension point
  (reference neurons/miner.py:156-160). Callables here are COLUMN
  BUILDERS (Column -> Column / DataFrame predicates), not Python UDFs,
  so the whole round stays JVM-side.
- blacklist before deserialization (reference neurons/miner.py:107-123)
  → left-semi join on the registered-peer set, applied before any
  payload column is touched (Catalyst pushes it into the scan).
- priority by stake (reference neurons/miner.py:127-137) → orderBy
  stake descending.
- forward transform ``×2`` (reference neurons/miner.py:140-147).
- oracle scoring ``1 if resp == step*2 else 0`` (reference
  neurons/validator.py:134-141) + non-responders score 0 via left
  join (validator.py:127 timeout semantics).
- EMA fold α=0.9 seeded at 1.0 (reference neurons/validator.py:
  109-110,146).
- every-2-steps L1-normalized weight sink (reference
  neurons/validator.py:149-163).

State (the score vector) is a small keyed DataFrame carried across
rounds — at cluster scale it lives as a checkpointed table keyed by
uid; each round is one broadcast join against it.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from map_reduce_subnet_spark.functions.checkpoint import stable_checkpoint

ALPHA = 0.9  # reference neurons/validator.py:109
SINK_PERIOD = 2  # reference neurons/validator.py:149


@dataclass
class SubnetPipeline:
    """One attached miner pipeline + validator scoring loop."""

    forward: Callable[[Column], Column]
    blacklist: Callable[[DataFrame], Column]
    priority: Callable[[DataFrame], Column]
    step: int = 0
    sunk_weights: list = field(default_factory=list)

    @classmethod
    def attach(
        cls,
        forward: Callable[[Column], Column] | None = None,
        blacklist: Callable[[DataFrame], Column] | None = None,
        priority: Callable[[DataFrame], Column] | None = None,
    ) -> "SubnetPipeline":
        """Mirror of ``axon.attach`` (reference neurons/miner.py:156-160)
        with the reference's default behaviors."""
        return cls(
            forward=forward or (lambda x: x * 2),  # miner.py:146
            blacklist=blacklist
            or (lambda df: F.col("registered")),  # miner.py:113
            priority=priority or (lambda df: F.col("stake")),  # miner.py:135
        )

    def miner_respond(self, requests: DataFrame) -> DataFrame:
        """The per-request miner pipeline: blacklist (before payload
        access) → priority annotation → forward transform.

        Priority is exposed as a COLUMN (`_priority`), not a global
        orderBy: DataFrame row order would not survive the consumer's
        join/groupBy anyway, so a sort here would be a dead
        range-partition exchange per round. A real queue consumer
        orders on the column at its sink."""
        admitted = requests.where(self.blacklist(requests))
        prioritized = admitted.withColumn("_priority", self.priority(admitted))
        return prioritized.withColumn(
            "response", self.forward(F.col("dummy_input"))
        )

    def validator_round(
        self, metagraph: DataFrame, scores: DataFrame
    ) -> tuple[DataFrame, DataFrame | None]:
        """One validator step: broadcast the query to every peer, score
        responses against the recomputed oracle, EMA-fold the score
        vector, and sink L1 weights every SINK_PERIOD steps.

        Returns (new_scores, weights_or_None).
        """
        step = self.step
        # broadcast query: every registered peer gets dummy_input=step
        # (validator.py:120-127)
        requests = metagraph.select(
            "uid",
            "stake",
            "registered",
            F.lit(step).alias("dummy_input"),
        )
        responses = self.miner_respond(requests).select("uid", "response")

        # exact-match oracle; peers with no response score 0
        # (validator.py:134-141)
        expected = step * 2
        scored = (
            metagraph.select("uid")
            .join(responses, "uid", "left")
            .select(
                "uid",
                F.when(F.col("response") == expected, 1.0)
                .otherwise(0.0)
                .alias("score"),
            )
        )

        # EMA fold into persistent state (validator.py:146).
        # stable_checkpoint truncates lineage each round — without it
        # the score frame's plan grows by one join per round and every
        # action at round N re-executes all N rounds (O(rounds²)).
        # Durable (checkpoint-dir) when the session sets one, executor
        # -local otherwise: see functions/checkpoint.py.
        new_scores = stable_checkpoint(
            scores.join(scored, "uid", "left")
            .select(
                "uid",
                (
                    F.lit(ALPHA) * F.col("ema")
                    + (1 - ALPHA) * F.coalesce(F.col("score"), F.lit(0.0))
                ).alias("ema"),
            )
        )

        weights = None
        self.step += 1
        if self.step % SINK_PERIOD == 0:  # validator.py:149
            total = new_scores.agg(
                F.sum(F.col("ema").cast("decimal(27,6)")).cast("double")
            ).collect()[0][0]
            # empty metagraph (all peers deregistered) → no total; skip
            # the sink rather than emitting all-NULL weights
            if total:
                weights = new_scores.select(
                    "uid", (F.col("ema") / F.lit(total)).alias("weight")
                )
                self.sunk_weights.append(weights)  # set_weights sink
        return new_scores, weights


def init_scores(metagraph: DataFrame) -> DataFrame:
    """ones_like init (reference neurons/validator.py:110)."""
    return metagraph.select("uid", F.lit(1.0).alias("ema"))
