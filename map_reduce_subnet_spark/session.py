"""SparkSession factory tuned for this engine.

Defaults are chosen for the driver's local[*] harness but every knob is
the one you would also set on a real multi-executor cluster at 100 TB:
AQE for runtime coalescing / skew splitting / broadcast conversion,
Arrow for any Python<->JVM batch transfer, and a shuffle-partition count
sized to the input rather than Spark's static 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "*")


def get_spark(
    app_name: str = "map-reduce-subnet-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard config.

    At cluster scale the same settings apply unchanged: AQE coalesces the
    statically-over-provisioned shuffle partitions down to what the data
    actually needs, converts sort-merge joins to broadcast when the
    runtime size of a side is below the threshold, and splits skewed
    shuffle partitions (the salting fallback is in operators/joins.py).
    """
    cpus = DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # --- Adaptive execution: the scale story -------------------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- Shuffle sizing ---------------------------------------------
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))),
        )
        # --- Arrow for every pandas_udf / applyInPandas boundary --------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Parquet TIMESTAMP(NANOS) columns surface as LongType (epoch
        # nanos); sources/tables.py truncates them to microsecond
        # timestamps, matching DuckDB's ns→us truncation on read.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Broadcast threshold: dims (region/nation/customer/supplier/part)
        # stay broadcastable well past sf0.1; AQE upgrades at runtime too.
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        # --- Straggler redundancy (reference README.md:18 "usually with
        # redundancy"): speculative re-execution of slow tasks. On a
        # 1000-executor cluster one slow disk/node no longer gates the
        # stage. NOTE: these knobs are inert under local[*] — Spark's
        # TaskSchedulerImpl starts the speculation thread only on a
        # real cluster manager — so they cost nothing here and engage
        # only on deployment. The 10s minTaskRuntime floor keeps
        # cluster-side speculation away from sub-second tasks, where
        # duplicating work adds variance instead of cutting tail
        # latency; 100 TB cluster tasks run minutes and still
        # speculate.
        .config("spark.speculation", "true")
        .config("spark.speculation.multiplier", "4")
        .config("spark.speculation.quantile", "0.9")
        .config("spark.speculation.minTaskRuntime", "10s")
        # --- Priority scheduling analog (reference neurons/miner.py:
        # 127-137 priority_fn): FAIR scheduling lets concurrent jobs on
        # one session share the cluster by pool weight instead of FIFO
        # head-of-line blocking; callers tag work via
        # sc.setLocalProperty("spark.scheduler.pool", <pool>).
        .config("spark.scheduler.mode", "FAIR")
        # --- Heap sizing: in local mode driver + all 32 executor
        # threads share ONE JVM, and Spark's 1g default put a long
        # bench run (224 queries, streaming state stores, memory
        # sinks) one unlucky GC away from OutOfMemoryError — observed
        # once late r9 (heap OOM in stream_tumbling_distinct_true
        # killed the SparkContext and failed every later query). 16g
        # is still tiny against the 128 GiB harness box. Only takes
        # effect at JVM launch (getOrCreate on a live session ignores
        # it — e.g. under the driver's own pre-built session, which
        # sizes its own JVM).
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # Quieter Ivy/UI in the harness.
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
