"""Candle-length conversion (resampling).

``CandleLength`` is a first-class key dimension in the reference
(``page/index.go:19-23``) but conversion between lengths is left to
clients; here it is a core operator. Pure built-in aggregation —
min_by/max_by give the open/close of the earliest/latest source bar —
so batch and streaming share the plan shape (one hash aggregate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucket_expr(
    target_length_s: int, anchor_s: int = 0, ts_col: str = "ts"
) -> Column:
    """THE bucket-grid expression: floored (not truncation-cast, so
    pre-1970 timestamps land on the same grid as every SQL oracle's
    ``floor(epoch(ts)/L)``), anchor-shifted. Single source of truth —
    ``resample``, ``CandleStore.derive_rollup``'s touched-bucket set,
    and the multi-timeframe join all MUST share this expression, or
    their grids can silently diverge."""
    e = F.unix_timestamp(ts_col) - F.lit(anchor_s)
    return F.timestamp_seconds(
        F.floor(e / target_length_s).cast("bigint") * target_length_s
        + F.lit(anchor_s)
    )


def resample(
    candles: DataFrame, target_length_s: int, anchor_s: int = 0
) -> DataFrame:
    """Aggregate finer candles into ``target_length_s``-second bars.

    Requires source ``candle_length`` to divide ``target_length_s``
    evenly for exact bucket alignment (60→300→3600 algebra holds:
    resampling twice equals resampling once, tested in
    tests/test_resample.py).

    ``anchor_s`` shifts the bucket grid: a bar covers
    ``[k·L + anchor, (k+1)·L + anchor)`` instead of the epoch-aligned
    ``[k·L, (k+1)·L)``. The classic use is session-aligned daily
    candles (L = 86400, anchor = the exchange session open, e.g.
    09:30 UTC → 34200), where midnight-aligned dailies would split
    every trading session across two bars. The emitted ``ts`` is the
    anchored bucket start. anchor_s = 0 is exactly the unanchored
    grid.
    """
    bucket = bucket_expr(target_length_s, anchor_s)
    return (
        candles.groupBy(
            "market",
            "code",
            F.lit(target_length_s).alias("candle_length"),
            bucket.alias("ts"),
        )
        .agg(
            F.min_by("open", "ts").alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", "ts").alias("close"),
            F.sum("volume").alias("volume"),
            F.sum("bit_fields").alias("bit_fields"),
        )
    )
