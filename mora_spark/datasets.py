"""Test-table loaders and the canonical events→candles derivation.

The driver's synthetic tables (TESTDATA.md) have no native candle table,
so every candle-centric operator derives a deterministic 1-minute OHLCV
candle table from ``events``: market is the literal ``'SYN'``, the
symbol code is ``event_type``, and each minute bucket aggregates
``value`` into an OHLCV bar. ``event_id`` (unique, monotone with ts in
the generator) is the open/close tiebreaker so Spark and the DuckDB
oracle agree bit-for-bit.

The same derivation exists twice on purpose — once as DataFrame ops
(:func:`candles_from_events`) and once as an ANSI-SQL CTE
(:data:`CANDLES_CTE_SQL`) — which is exactly the engine-vs-oracle
contract of the correctness gate.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _ensure_session_confs(spark: SparkSession) -> None:
    """Self-configure the two confs this engine cannot run without,
    so queries work even under a caller-built vanilla SparkSession
    (e.g. the external driver): nanos-as-long (events.parquet uses
    TIMESTAMP(NANOS), unreadable otherwise) and UTC (every timestamp
    comparison against the DuckDB oracle assumes it). Both are
    runtime-settable."""
    for k, v in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # already set via static conf, or policy-locked


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table. Schema comes from the parquet footer
    (schema-on-read, FIXTURES.md F2).

    ``events.ts`` is TIMESTAMP(NANOS) in the file, which Spark reads as
    a nanosecond LongType under ``legacy.parquet.nanosAsLong``; convert
    to a microsecond TIMESTAMP (DuckDB's timestamp type truncates to
    microseconds identically, so engine and oracle agree).
    """
    _ensure_session_confs(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    for f in df.schema.fields:
        if f.name == "ts" and isinstance(f.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def spread(df: DataFrame, min_ratio: int = 2) -> DataFrame:
    """Re-spread a narrow scan across all cores before CPU-heavy
    per-row expression work (tokenization, shingle hashing, vector
    math).

    A small parquet input is one row group, so Spark plans the whole
    scan — and every scan-stage expression fused onto it — as ONE task,
    serializing the corpus-wide md5/HOF work the text and vector
    operators do, however many cores the session has. When the planned
    scan parallelism is materially below the session default, one
    round-robin shuffle of the raw rows unlocks the cores; the guard
    makes this a no-op at 100 TB, where the input arrives as thousands
    of splits and an unconditional repartition would be a pointless
    full-corpus shuffle.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() * min_ratio <= target:
        return df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every synthetic table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def candles_from_events(events: DataFrame, length_s: int = 60) -> DataFrame:
    """Deterministic OHLCV candles from the events stream.

    The reference stores pre-aggregated bars (SURVEY §1.1); here we both
    *build* the bars (what mora's upstream clients did) and keep the exact
    candle schema (market, code, candle_length, ts, OHLCV, bit_fields).

    Entirely JVM-side built-ins — min_by/max_by/min/max/sum — so the
    aggregation is a single partial+final hash aggregate with no Python
    in the loop; at 100 TB this is one shuffle on (code, minute).
    """
    bucket = F.timestamp_seconds(
        (F.unix_timestamp("ts") / length_s).cast("bigint") * length_s
    )
    return (
        events.groupBy(
            F.lit("SYN").alias("market"),
            F.col("event_type").alias("code"),
            F.lit(length_s).alias("candle_length"),
            bucket.alias("ts"),
        )
        .agg(
            F.min_by("value", "event_id").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "event_id").alias("close"),
            F.sum("value").alias("volume"),
            F.count(F.lit(1)).alias("bit_fields"),
        )
    )


# DuckDB-dialect rendition of candles_from_events(events, 60): shared CTE
# prefix for every candle-query oracle. date_trunc/epoch arithmetic kept
# simple so DuckDB and Spark bucket identically (both floor to the minute).
CANDLES_CTE_SQL = """
candles AS (
  SELECT
    'SYN' AS market,
    event_type AS code,
    60 AS candle_length,
    make_timestamp(CAST(floor(epoch(ts) / 60) AS BIGINT) * 60 * 1000000) AS ts,
    arg_min(value, event_id) AS open,
    max(value) AS high,
    min(value) AS low,
    arg_max(value, event_id) AS close,
    sum(value) AS volume,
    count(*) AS bit_fields
  FROM events
  GROUP BY 1, 2, 3, 4
)
"""


def candles_sql(body: str) -> str:
    """Wrap an oracle query body with the shared candles CTE."""
    return f"WITH {CANDLES_CTE_SQL} {body}"
