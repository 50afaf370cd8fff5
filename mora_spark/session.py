"""SparkSession factory with engine defaults.

Replaces the reference's YAML config + logger setup
(``database/util/config.go:3-7``, ``logger.go:10-16``). All defaults are
chosen for determinism (UTC session time zone, stable shuffle partition
count) and for scale (AQE on, Arrow on for the pandas-UDF operators).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mora_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``)
    for tests; on a real cluster, pass ``master=None`` with a
    pre-configured environment and the builder leaves it alone.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name)
    if master is None and not os.environ.get("SPARK_MASTER"):
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)

    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    conf = {
        # Determinism: every timestamp is UTC, mirroring the reference's
        # UTC-only candle times (common/candle.go:36-39).
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        # Scale: adaptive execution re-plans shuffles at runtime
        # (coalesce small partitions, skew-join splitting).
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # Arrow makes pandas UDF exchange columnar (10-100x vs pickling).
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Let a hash partitioning on a SUBSET of the join keys count as
        # co-partitioned (rows equal on the full key are equal on the
        # subset, so they land in the same bucket). The store's
        # ts-bucketed layout (CandleStore n_buckets) relies on this:
        # store-store joins key on (market, code, candle_length, ts)
        # while the on-disk buckets hash ts alone — the only candle
        # data column, since the rest are partition dirs.
        "spark.sql.requireAllClusterKeysForCoPartition": "false",
        # Parquet pushdown is the analogue of the reference's page day
        # index (page/index.go:11-17): row-group min/max skipping on ts.
        "spark.sql.parquet.filterPushdown": "true",
        # The driver's events.parquet uses TIMESTAMP(NANOS) which Spark
        # rejects by default; read as long, converted in load_table().
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.parquet.aggregatePushdown": "true",
        # Write INT64 micros timestamps, not legacy INT96: INT96 chunks
        # carry NO min/max statistics, which would blind both parquet
        # row-group skipping and the store manifest's file-level ts
        # stats (engine/store.py:_parquet_ts_range) on everything this
        # engine writes.
        "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
        # Keep partition discovery cheap for the hive-style candle store.
        "spark.sql.sources.partitionOverwriteMode": "dynamic",
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        "spark.ui.enabled": "false",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
