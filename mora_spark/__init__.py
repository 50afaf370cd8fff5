"""mora_spark — a PySpark-native analytics engine for financial time-series.

A from-scratch rebuild of the capabilities of the reference engine
``jungnoh/mora`` (an embedded Go storage engine for OHLCV candles, see
SURVEY.md), re-expressed Spark-first:

- the candle data model (reference ``common/candle.go:27-39``) becomes an
  explicit ``StructType`` over a partitioned Parquet table
  (``mora_spark.schema``),
- the INSERT upsert-merge (reference ``page/page.go:61-142``) becomes a
  last-writer-wins MERGE (``mora_spark.operators.upsert``,
  ``mora_spark.engine.store``),
- the WAL / lock manager / buffer pool are subsumed by Spark + Parquet
  atomic-rename commits and are deliberately NOT reimplemented,
- on top, the query surface the reference leaves to clients: resampling,
  gap-fill, rolling windows, as-of joins, streaming ingest, plus
  LLM-data-pipeline operators (dedup, similarity search, text analysis,
  multimodal columns).

Everything is a pure ``DataFrame -> DataFrame`` function so that every
operator can be replayed against a DuckDB oracle.
"""

__version__ = "0.1.0"
