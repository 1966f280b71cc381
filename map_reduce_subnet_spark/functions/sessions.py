"""Gap-based sessionization as a reusable single-shuffle plan.

Assigns an explicit per-key session sequence: a row starts a new
session when its gap from the previous row (same key, time order)
exceeds ``gap``. Two window passes — a lag() flag and a running sum
turning flags into a sequence — share one partitionBy(key) ordering,
so Catalyst plans exactly ONE Exchange (pinned in tests/test_plans.py).

Per-key state is a sort, not a collect_list: hot keys spill through
the external sorter instead of materializing one giant row (the
agg_ema lesson from round 5's review).

Grounding: axon request sessions, reference neurons/miner.py:151-169.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_sessions(
    df: DataFrame,
    key: str,
    ts: str,
    gap: int,
    tiebreak: str,
) -> DataFrame:
    """Add a BIGINT ``session_seq`` column (1-based per ``key``).

    ``ts`` must be an integer time column (epoch micros in the
    registered query — exact for all longs, where double arithmetic
    silently loses exactness past 2^53). ``tiebreak`` orders rows
    with equal timestamps deterministically (a unique id)."""
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    flagged = df.withColumn(
        "new_sess",
        F.when(
            F.lag(ts).over(w).isNull()
            | (F.col(ts) - F.lag(ts).over(w) > gap),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return flagged.withColumn(
        "session_seq",
        F.sum("new_sess")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    ).drop("new_sess")
