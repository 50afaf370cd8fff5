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


def heikin_ashi(candles: DataFrame) -> DataFrame:
    """Heikin-Ashi candle transform — the smoothed-candle chart type:

    - ha_close_t = (open_t + high_t + low_t + close_t) / 4
    - ha_open_t  = (ha_open_{t-1} + ha_close_{t-1}) / 2,
      seeded with (open_1 + close_1) / 2
    - ha_high_t  = max(high_t, ha_open_t, ha_close_t)
    - ha_low_t   = min(low_t,  ha_open_t, ha_close_t)

    The ha_open recursion is a fixed-alpha EWM (alpha = 1/2) over the
    one-bar-lagged ha_close with the seed as its first element, so the
    whole transform is one grouped pandas pass (one shuffle on the
    series key) — and a SQL oracle can expand it in closed form with
    exact powers of two (the O_EMA_12 construction at span 3).
    """
    import numpy as np

    out_cols = ["ha_open", "ha_high", "ha_low", "ha_close"]
    schema = T.StructType(
        candles.schema.fields
        + [T.StructField(c, T.DoubleType()) for c in out_cols]
    )

    def _ha(pdf):
        pdf = pdf.sort_values("ts")
        hc = (pdf["open"] + pdf["high"] + pdf["low"] + pdf["close"]) / 4.0
        src = hc.shift(1)
        src.iloc[0] = (pdf["open"].iloc[0] + pdf["close"].iloc[0]) / 2.0
        ho = src.ewm(alpha=0.5, adjust=False).mean()
        pdf["ha_open"] = ho
        pdf["ha_close"] = hc
        pdf["ha_high"] = np.maximum.reduce(
            [pdf["high"].to_numpy(), ho.to_numpy(), hc.to_numpy()]
        )
        pdf["ha_low"] = np.minimum.reduce(
            [pdf["low"].to_numpy(), ho.to_numpy(), hc.to_numpy()]
        )
        return pdf

    return candles.groupBy(*SERIES_KEY).applyInPandas(_ha, schema=schema)
