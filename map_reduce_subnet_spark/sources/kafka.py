"""Kafka as a streaming source — gated plumbing.

The wire-protocol half of the reference (axon/dendrite request
transport, reference neurons/miner.py:151-169 / README.md:18-20) maps
in production Spark to a Kafka topic read by Structured Streaming.
This container ships no Kafka connector jar and no broker, so the
SOURCE constructor is gated behind a clear error — but everything
downstream of the source (the value-deserialization contract, the
schema) is real, batch-testable code: Kafka rows have a fixed shape
(key/value binary + topic/partition/offset/timestamp), so the parser
is pure DataFrame logic independent of the transport.

Scale notes for the real deployment: one Spark input partition per
Kafka partition (parallelism = topic partitioning, no shuffle at the
source); ``maxOffsetsPerTrigger`` bounds micro-batch size; offsets
live in the checkpoint, giving exactly-once into transactional sinks
(the foreachBatch upsert in streaming/jobs.py is the matching sink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The value contract mirrors the events fixture: a JSON document per
# message (the reference serializes request payloads the same way,
# template/protocol.py:53-75). Explicit schema — never schema
# inference on a stream.
EVENT_VALUE_SCHEMA = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double, props string"
)


def parse_kafka_events(raw: DataFrame) -> DataFrame:
    """Decode Kafka-shaped rows (value: binary JSON) into typed event
    columns, carrying the source coordinates (topic, partition,
    offset) for lineage/dedup.

    Pure plan logic — works identically on a real Kafka stream and on
    a batch frame with the same columns (how the tests drive it).
    Malformed JSON yields NULL fields rather than failing the batch
    (from_json's PERMISSIVE default), matching the loader posture of
    scan_jsonl_roundtrip."""
    return raw.select(
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.from_json(
            F.col("value").cast("string"), EVENT_VALUE_SCHEMA
        ).alias("ev"),
    ).select("topic", "partition", "offset", "ev.*")


def read_kafka_events_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    max_offsets_per_trigger: int = 100_000,
) -> DataFrame:
    """Open the Kafka source and return the parsed typed stream.

    GATED: raises NotImplementedError in environments without the
    spark-sql-kafka connector on the classpath (this container). The
    error message carries the exact dependency to add; when the
    connector is present the same call returns a live parsed stream."""
    try:
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("startingOffsets", "earliest")
            .option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
            .load()
        )
    except Exception as e:  # connector jar absent → AnalysisException
        raise NotImplementedError(
            "Kafka source requires the spark-sql-kafka connector "
            "(--packages org.apache.spark:spark-sql-kafka-0-10_2.13:"
            "<spark-version>); not available in this environment: "
            f"{e}"
        ) from e
    return parse_kafka_events(raw)
