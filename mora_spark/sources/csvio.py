"""CSV document source/sink — the JSONL contract for the other
interchange staple.

Same posture as ``sources/jsonl.py``: explicit schema on read (no
inference pass over 100 TB), PERMISSIVE ``_corrupt_record`` quarantine
for malformed rows, lossless round-trip. CSV specifics the options pin
down:

- **RFC-4180 quoting** (``escape='"'``): embedded quotes double rather
  than backslash-escape, so any standards-compliant consumer reads the
  shards back.
- **Null vs empty**: nulls serialize as the ``\\N`` sentinel (the
  classic dump convention) so an empty string and a NULL survive the
  round trip as distinct values. The inherent sentinel ambiguity is
  accepted and pinned by test: a field whose CONTENT is exactly
  ``\\N`` reads back as NULL — corpora that may contain the literal
  sentinel belong in JSONL, which types null natively.
- **Embedded newlines** force ``multiLine`` on read, which makes one
  FILE (not one line) the split unit — the shard-count knob on write
  is therefore the read-parallelism knob at scale. Corpora without
  embedded newlines can read with ``multi_line=False`` and regain
  line-level splitting.

Reference: the reference's only interchange format is its binary page
file (``page/header.go``, ``page/body.go``); CSV/JSONL are the
Spark-native document-table surfaces this engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

# No emptyValue override: the writer's DEFAULT emits empty string as
# quoted `""` (distinct from the bare-nothing a `\N`-sentinel null
# would collapse to), and the reader maps quoted-empty back to ''.
# Setting emptyValue="" on write flattens `""` to nothing and loses
# the null/empty distinction (pinned by tests/test_csv.py).
_OPTS = {
    "header": "true",
    "quote": '"',
    "escape": '"',
    "nullValue": "\\N",
}


def write_csv(df: DataFrame, path: str, n_files: int | None = None) -> None:
    """Write ``df`` as headered CSV shards (RFC-4180 quoting, ``\\N``
    nulls). ``n_files`` repartitions first — the shard-count knob that
    bounds per-file size (and, with multiLine reads, read parallelism)."""
    if n_files is not None:
        df = df.repartition(n_files)
    df.write.mode("overwrite").options(**_OPTS).csv(path)


def read_csv_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType | DataFrame,
    max_files_per_trigger: int = 2,
    multi_line: bool = True,
) -> DataFrame:
    """Streaming twin of :func:`read_csv`: a file-stream over CSV
    shards under the same explicit schema + PERMISSIVE quarantine
    contract (a malformed shard mid-crawl diverts rows, it does not
    kill the job). Same record schema as the batch reader, so backfill
    and live ingest share downstream logic verbatim."""
    if isinstance(schema, DataFrame):
        schema = schema.schema
    if CORRUPT_COL not in schema.fieldNames():
        schema = T.StructType(
            list(schema.fields)
            + [T.StructField(CORRUPT_COL, T.StringType(), True)]
        )
    return (
        spark.readStream.schema(schema)
        .options(**_OPTS)
        .option("multiLine", str(multi_line).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .csv(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | DataFrame,
    mode: str = "PERMISSIVE",
    multi_line: bool = True,
) -> DataFrame:
    """Read CSV shards under an EXPLICIT schema. PERMISSIVE mode lands
    malformed rows (wrong arity, unparsable typed fields) in
    ``_corrupt_record``; FAILFAST raises on the first bad row."""
    if isinstance(schema, DataFrame):
        schema = schema.schema
    if mode == "PERMISSIVE" and CORRUPT_COL not in schema.fieldNames():
        schema = T.StructType(
            list(schema.fields)
            + [T.StructField(CORRUPT_COL, T.StringType(), True)]
        )
    return (
        spark.read.schema(schema)
        .options(**_OPTS)
        .option("multiLine", str(multi_line).lower())
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )
