"""JSONL (newline-delimited JSON) document source/sink.

The interchange staple of LLM data pipelines: raw corpora arrive as
JSONL shards (one document object per line), get curated, and ship
back out as JSONL. Spark's native ``json`` format IS JSONL — one
object per line, splittable, parallel on both paths — so both
directions here are thin, declarative wrappers; the value added is
the contract:

- **Explicit schema on read.** At 100 TB, schema inference is an extra
  full pass over the corpus before the real one; ``read_jsonl``
  requires a schema (or derives it from a template DataFrame) so the
  scan plans in one pass with column pruning intact. ``PERMISSIVE``
  mode plus ``_corrupt_record`` capture is the production posture for
  crawled corpora: malformed lines land in a quarantine column instead
  of failing the job (``mode="FAILFAST"`` opts into strictness).
- **Lossless round-trip.** Unicode, quotes, embedded newlines (JSON-
  escaped, so the line framing survives) — ``q_jsonl_roundtrip``
  hash-verifies write→read equals the source table exactly.

Reference: jungnoh/mora's only interchange format is its binary page
file (`page/header.go`, `page/body.go`); JSONL is the Spark-native
equivalent surface for the document tables this engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def write_jsonl(df: DataFrame, path: str, n_files: int | None = None) -> None:
    """Write ``df`` as JSONL shards (one JSON object per line, one file
    per partition). ``n_files`` repartitions first — the shard-count
    knob for downstream consumers; leave None to keep the upstream
    partitioning (no extra shuffle)."""
    if n_files is not None:
        df = df.repartition(n_files)
    df.write.mode("overwrite").json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | DataFrame,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Read JSONL shards under an EXPLICIT schema (pass a StructType,
    or a template DataFrame whose schema to reuse). In PERMISSIVE mode
    malformed lines surface in the ``_corrupt_record`` column (select
    it to quarantine them); FAILFAST raises on the first bad line."""
    if isinstance(schema, DataFrame):
        schema = schema.schema
    if mode == "PERMISSIVE" and CORRUPT_COL not in schema.fieldNames():
        schema = T.StructType(
            list(schema.fields)
            + [T.StructField(CORRUPT_COL, T.StringType(), True)]
        )
    return (
        spark.read.schema(schema)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_jsonl_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType | DataFrame,
    max_files_per_trigger: int = 2,
) -> DataFrame:
    """Streaming twin of :func:`read_jsonl`: a file-stream over JSONL
    shards under the same explicit schema + PERMISSIVE quarantine
    contract (a continuously-ingesting curation pipeline must survive
    malformed lines mid-stream, not die at batch 37 of a crawl). Same
    record schema as the batch reader, so downstream logic is shared
    verbatim between the backfill and the live path."""
    if isinstance(schema, DataFrame):
        schema = schema.schema
    if CORRUPT_COL not in schema.fieldNames():
        schema = T.StructType(
            list(schema.fields)
            + [T.StructField(CORRUPT_COL, T.StringType(), True)]
        )
    return (
        spark.readStream.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )
