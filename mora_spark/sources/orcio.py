"""ORC document source/sink — the columnar interchange sibling of the
parquet store layout.

ORC is the other Hadoop-native columnar format a migrating warehouse
is likely to hold corpora in (Hive's default); Spark bundles a
vectorized reader/writer for it, so supporting it costs no new
dependency and keeps every scan property the engine's plans rely on:
column pruning and predicate pushdown reach the ORC stripe reader the
same way they reach parquet (`PushedFilters` on the FileScan — pinned
by test), and files split by stripe so read parallelism follows data
size, not file count.

Same posture as the other sources: explicit schema on read (no
inference pass over 100 TB), lossless round-trip, an ``n_files`` knob
on write. Unlike CSV/JSONL there is no quarantine column — ORC is a
self-describing binary format, so a corrupt file fails loudly rather
than yielding quietly-null rows (the right behavior for data that
cannot be half-parsed).

Batch and streaming read paths share the schema contract;
``read_orc_stream`` is the file-stream twin for continuous ingestion
from an ORC-dropping producer.

Reference: the reference's only interchange format is its binary page
file (``page/header.go``, ``page/body.go``); ORC, like CSV/JSONL, is a
Spark-native corpus surface this engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_orc(df: DataFrame, path: str, n_files: int | None = None) -> None:
    """Write ``df`` as ORC (zstd stripes — Spark 4's
    ``spark.sql.orc.compression.codec`` default; set that conf to pick
    another codec). ``n_files`` repartitions first — the shard-count
    knob that bounds per-file size; at scale prefer FEWER, larger
    files (stripes split for parallelism, unlike multiLine CSV)."""
    if n_files is not None:
        df = df.repartition(n_files)
    df.write.mode("overwrite").orc(path)


def read_orc(
    spark: SparkSession, path: str, schema_like: DataFrame
) -> DataFrame:
    """Read ORC shards under ``path`` with the explicit schema of
    ``schema_like`` (never inferred — at 100 TB an inference pass is a
    full extra scan, and a schema drifting silently under a pipeline
    is exactly what the explicit contract prevents)."""
    return spark.read.schema(schema_like.schema).orc(path)


def read_orc_stream(
    spark: SparkSession,
    path: str,
    schema_like: DataFrame,
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """File-stream twin of :func:`read_orc`: new ORC files under
    ``path`` arrive as micro-batches (oldest mtime first)."""
    return (
        spark.readStream.schema(schema_like.schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .orc(path)
    )
