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


def macd(
    candles: DataFrame,
    fast: int = 12,
    slow: int = 26,
    signal: int = 9,
    col: str = "close",
) -> DataFrame:
    """MACD (fast EMA − slow EMA), its signal line (EMA of MACD), and
    the histogram — all three EWM passes in ONE grouped pass, so the
    whole indicator costs a single shuffle on the series key.

    The MACD line is snapped to the 1e-6 grid with ``floor(x·1e6 +
    0.5)/1e6`` BEFORE the signal recursion (and the outputs likewise):
    the identical IEEE-double expression on both engines, so a SQL
    oracle that expands the recursions in closed form lands on exactly
    the same doubles — no engine rounding-mode divergence, no
    compounded drift through the second recursion.
    """
    import numpy as np

    out_cols = ["macd", "macd_signal", "macd_hist"]
    schema = T.StructType(
        candles.schema.fields
        + [T.StructField(c, T.DoubleType()) for c in out_cols]
    )

    def snap(s):
        return np.floor(s * 1e6 + 0.5) / 1e6

    def _macd(pdf):
        pdf = pdf.sort_values("ts")
        f = pdf[col].ewm(alpha=2.0 / (fast + 1.0), adjust=False).mean()
        s = pdf[col].ewm(alpha=2.0 / (slow + 1.0), adjust=False).mean()
        m = snap(f - s)
        sig = snap(m.ewm(alpha=2.0 / (signal + 1.0), adjust=False).mean())
        pdf["macd"] = m
        pdf["macd_signal"] = sig
        pdf["macd_hist"] = snap(m - sig)
        return pdf

    return candles.groupBy(*SERIES_KEY).applyInPandas(_macd, schema=schema)
