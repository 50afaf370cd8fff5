"""Streaming declared queries: micro-batch replay of events must equal
the batch result (the Spark analogue of WAL replay equivalence,
SURVEY §3.3 / §5-4).

Each query actually runs a Structured Streaming job (availableNow
trigger over a chunked file source) and returns the final table as a
batch DataFrame for the oracle compare. Work dirs under ``.scratch/``
are wiped per run.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mora_spark.datasets import candles_sql
from mora_spark.queries.store import scratch_dir
from mora_spark.streaming import (
    chunked_source,
    stream_candles,
    stream_dedup_ingest,
)


def _work(name: str, sf_dir: str) -> str:
    d = scratch_dir(name, sf_dir)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    return d


def q_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streamed exactly-once ingest, then per-type totals — must equal
    the batch aggregation over the raw table."""
    work = _work("stream_ingest", sf_dir)
    src = chunked_source(spark, sf_dir, work)
    ingested = stream_dedup_ingest(spark, src, work)
    return ingested.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


O_STREAM_INGEST = """
SELECT event_type,
       count(*) AS n_events,
       sum(value) AS sum_value,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
"""


def q_stream_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming OHLCV aggregation (update mode + last-emission-wins)
    — must equal the batch candles derivation exactly."""
    work = _work("stream_candles", sf_dir)
    src = chunked_source(spark, sf_dir, work)
    return stream_candles(spark, src, work)


O_STREAM_CANDLES = candles_sql("SELECT * FROM candles")


QUERIES = {
    "q_stream_ingest": q_stream_ingest,
    "q_stream_candles": q_stream_candles,
}

ORACLES = {
    "q_stream_ingest": O_STREAM_INGEST,
    "q_stream_candles": O_STREAM_CANDLES,
}
