"""Persistent candle store: the Spark rendition of mora's database layer."""

from mora_spark.engine.store import CandleStore

__all__ = ["CandleStore"]
