"""Scan-parallelism floor for unsplittable inputs.

Spark sizes scan tasks by byte ranges (``spark.sql.files.maxPartitionBytes``),
but a parquet file is only divisible at ROW-GROUP boundaries: a
single-row-group file is one task no matter the config (and
``spark.sql.files.minPartitionNum`` cannot split it either — the extra
splits come back empty). Every fixture table here is written as one
row group, so at bench scale every base scan is ONE task and any
CPU-heavy scan-local stage (interpreted HOF vector math, Arrow-batched
Python decode) runs on a single core of the machine.

``scan_parallel`` is the engine's floor for that case: when the input
frame has fewer partitions than the session's default parallelism it
redistributes rows across ``defaultParallelism`` partitions (hash on a
unique id when given — deterministic w.r.t. the data — round-robin
otherwise); when the input is already split at least that wide it is a
NO-OP returning the frame untouched. At 100 TB inputs carry thousands
of row groups, so the floor never engages and the plan stays
scan-local — this is the ``minPartitionNum`` idea carried to the one
layout minPartitionNum cannot handle.

Use it ONLY in front of stages whose per-row cost dominates the few
bytes the rebalance moves (the callers project to the columns the
stage needs first — ids and short payload sources, never decoded
media). Results are unaffected: every consumer is either a per-row map
or an order-insensitive aggregate/join downstream of its own exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def scan_parallel(df: DataFrame, key: str | None = None) -> DataFrame:
    """Floor ``df``'s partition count at the session's default
    parallelism (no-op when the source layout is already at least that
    wide). ``key``: optional unique-id column to hash-distribute on;
    omitted = round-robin (Spark sorts each input partition first —
    SPARK-23207 — so retries are deterministic).

    PRECONDITION (ADVICE r15 #2): apply this to PLAIN SCANS only,
    never downstream of a shuffle. The no-op probe materializes
    ``df.rdd`` — on an exchange-free scan that is a pure plan
    translation, but on an AQE plan containing upstream exchanges it
    would execute the query stages eagerly (running real jobs at
    build time) just to count partitions. Every current call site is
    a base-table scan (optionally projected); keep it that way."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    if key is not None:
        return df.repartition(target, F.col(key))
    return df.repartition(target)
