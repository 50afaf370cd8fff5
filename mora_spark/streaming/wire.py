"""Kafka-shaped event ingest: one wire format, pluggable transports.

The reference ingests via its WAL append path (``wal/persist.go``); the
production Spark analogue is a Kafka topic. This module fixes the WIRE
CONTRACT — records of (key, value, topic, partition, offset, timestamp)
with a JSON event payload in ``value`` — and gives it two transports:

- :func:`kafka_events` — the real ``format("kafka")`` reader (needs the
  spark-sql-kafka connector jar + a broker; neither ships in this
  container, so it is declared but not exercised here);
- :func:`wire_chunked_source` + :func:`read_wire_stream` — a file-stream
  transport carrying the SAME record schema, which is what the tests
  and declared queries drive.

Both funnel through :func:`parse_event_wire`, so the deserialization
logic the cluster would run against Kafka is exactly the logic verified
against the DuckDB oracle in-container.

DECLARED CONTRACT (SURVEY §2.D): wire-parser parity. What this repo
owns is the encode↔parse round-trip over the exact ``format("kafka")``
column schema — verified byte-exactly (microsecond timestamps included)
by ``tests/test_streaming.py::test_wire_roundtrip_lossless`` and the
``q_stream_wire`` oracle row. The connector jar and a broker are
Spark-shipped infrastructure outside the repo's surface; no broker
exercise is owed beyond this parity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mora_spark.datasets import load_table
from mora_spark.streaming.ingest import EVENT_STREAM_SCHEMA

# Spark's default JSON timestamp formats truncate to milliseconds;
# events carry microseconds, so the wire pins a lossless format on
# BOTH the producer and consumer side. The event data model is naive
# UTC wall-clock (parquet timestamp[us], isAdjustedToUTC=false → Spark
# TIMESTAMP_NTZ), and NTZ columns use the separate `timestampNTZFormat`
# option — the plain `timestampFormat` is silently ignored for them,
# which the wire contract must not rely on.
_TS_FMT = {
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
}

# Consumer-side payload schema: EVENT_STREAM_SCHEMA with ts as
# TIMESTAMP_NTZ, so a parsed wire record is column-for-column AND
# type-for-type identical to a row read from the events table.
WIRE_EVENT_SCHEMA = T.StructType(
    [
        f if f.name != "ts" else T.StructField("ts", T.TimestampNTZType())
        for f in EVENT_STREAM_SCHEMA
    ]
)

# Column-for-column the schema `format("kafka")` emits.
KAFKA_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),
        T.StructField("topic", T.StringType(), True),
        T.StructField("partition", T.IntegerType(), True),
        T.StructField("offset", T.LongType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("timestampType", T.IntegerType(), True),
    ]
)


def parse_event_wire(raw: DataFrame) -> DataFrame:
    """Deserialize wire records to typed event rows: value bytes →
    JSON → EVENT_STREAM_SCHEMA. Malformed payloads become all-null
    structs (from_json's PERMISSIVE mode) rather than failing the
    stream — drop them with ``.where(col("event_id").isNotNull())``
    when the topic is dirty."""
    return raw.select(
        F.from_json(
            F.col("value").cast("string"), WIRE_EVENT_SCHEMA, _TS_FMT
        ).alias("e")
    ).select("e.*")


def kafka_events(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Streaming typed events from a Kafka topic (production path).

    Requires the spark-sql-kafka-0-10 connector on the classpath and a
    reachable broker — swap-in point for :func:`read_wire_stream`; the
    downstream pipeline (parse → dedup → merge) is transport-agnostic.
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return parse_event_wire(raw)


def rate_events(
    spark: SparkSession,
    rows_per_batch: int = 1000,
    n_users: int = 100,
) -> DataFrame:
    """Synthetic typed-event stream from Spark's deterministic
    ``rate-micro-batch`` source — the load-generator transport (soak
    tests, backpressure tuning) behind the same event schema as the
    Kafka and file transports. Columns derive arithmetically from the
    monotone ``value`` counter, so replays are reproducible."""
    raw = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .load()
    )
    return raw.select(
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        (F.col("value") % n_users).alias("user_id"),
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
            (F.col("value") % 3 + 1).cast("int"),
        ).alias("event_type"),
        (F.col("value") % 997).cast("double").alias("value"),
        F.lit(None).cast("string").alias("props"),
    )


def events_to_wire(events: DataFrame, topic: str = "events") -> DataFrame:
    """Encode typed event rows as wire records (the producer side):
    key = event_id bytes, value = JSON payload, partition = hash-ish
    bucket — byte-compatible with what a JSON Kafka producer ships."""
    return events.select(
        F.encode(F.col("event_id").cast("string"), "UTF-8").alias("key"),
        F.encode(
            F.to_json(
                F.struct(
                    "event_id", "ts", "user_id", "event_type", "value",
                    "props",
                ),
                _TS_FMT,
            ),
            "UTF-8",
        ).alias("value"),
        F.lit(topic).alias("topic"),
        (F.col("event_id") % 8).cast("int").alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("ts").alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )


def wire_chunked_source(
    spark: SparkSession, sf_dir: str, out_dir: str, n_files: int = 8
) -> str:
    """Materialize the events table as wire-format parquet files (the
    in-container stand-in for a populated Kafka topic). Idempotent per
    (sf_dir, out_dir)."""
    src = os.path.join(out_dir, "wire_source")
    if os.path.exists(src):
        return src
    wire = events_to_wire(load_table(spark, sf_dir, "events"))
    wire.repartition(n_files).write.parquet(src)
    return src


def read_wire_stream(spark: SparkSession, src: str) -> DataFrame:
    """File-stream transport for the wire format → typed events."""
    raw = (
        spark.readStream.schema(KAFKA_WIRE_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    return parse_event_wire(raw)
