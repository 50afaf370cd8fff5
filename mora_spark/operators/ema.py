"""Exponential moving average — the grouped-map pandas UDF operator.

EMA is inherently sequential per key (EMA_t = a*x_t + (1-a)*EMA_{t-1},
EMA_0 = x_0), so it cannot be a built-in window aggregate; this is the
canonical ``applyInPandas`` case (SURVEY §4: recursive indicators).
Arrow-batched per key group — one shuffle on the series key, vectorized
``pandas.Series.ewm`` inside, no row-at-a-time Python.

At 100 TB the group is a (market, code, candle_length) series — bounded
(~years of bars, tens of MB) so a group always fits one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SERIES_KEY = ["market", "code", "candle_length"]


def ema(candles: DataFrame, span: int, col: str = "close") -> DataFrame:
    """Append ``ema_{span}`` (alpha = 2/(span+1), adjust=False,
    seeded with the first value — the classic trading EMA)."""
    out_name = f"ema_{span}"
    schema = T.StructType(
        candles.schema.fields + [T.StructField(out_name, T.DoubleType())]
    )
    alpha = 2.0 / (span + 1.0)

    def _ema(pdf):
        pdf = pdf.sort_values("ts")
        pdf[out_name] = pdf[col].ewm(alpha=alpha, adjust=False).mean()
        return pdf

    return candles.groupBy(*SERIES_KEY).applyInPandas(_ema, schema=schema)
