"""Rolling/analytic window operators over candle series.

All pure ``pyspark.sql.functions`` over ``Window.partitionBy(series key)
.orderBy(ts)`` — a single shuffle per distinct partitioning, whole-stage
codegen throughout. The reference has no analytics layer at all (SURVEY
§2.B); these are the client-side staples its data model exists to serve.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SERIES_KEY = ["market", "code", "candle_length"]


def _series_window(order: str = "ts") -> Window:
    return Window.partitionBy(*SERIES_KEY).orderBy(order)


def rolling(
    candles: DataFrame,
    col: str,
    n: int,
    aggs: list[str] = ("avg", "min", "max"),
    min_periods: int | None = None,
) -> DataFrame:
    """Trailing n-row rolling aggregates of ``col`` per series.

    Emits columns ``roll_{agg}_{n}``. ``min_periods`` (default n) nulls
    out rows with an incomplete window, matching pandas' semantics and
    keeping the DuckDB oracle trivially alignable.
    """
    w = _series_window().rowsBetween(-(n - 1), Window.currentRow)
    min_periods = n if min_periods is None else min_periods
    cnt = F.count(col).over(w)
    out = candles
    for agg in aggs:
        expr: Column = getattr(F, agg)(col).over(w)
        out = out.withColumn(
            f"roll_{agg}_{n}",
            F.when(cnt >= min_periods, expr),
        )
    return out


def sma(candles: DataFrame, n: int, col: str = "close") -> DataFrame:
    """Simple moving average over the trailing n bars (null until full)."""
    w = _series_window().rowsBetween(-(n - 1), Window.currentRow)
    return candles.withColumn(
        f"sma_{n}",
        F.when(F.count(col).over(w) >= n, F.avg(col).over(w)),
    )


def with_lag_lead(candles: DataFrame, col: str = "close", n: int = 1) -> DataFrame:
    """lag/lead/delta/return analytics per series."""
    w = _series_window()
    prev = F.lag(col, n).over(w)
    return (
        candles.withColumn(f"lag_{col}", prev)
        .withColumn(f"lead_{col}", F.lead(col, n).over(w))
        .withColumn("delta", F.col(col) - prev)
        .withColumn(
            "ret",
            F.when(prev != 0, (F.col(col) - prev) / prev),
        )
        .withColumn("rn", F.row_number().over(w))
    )


def top_k(
    df: DataFrame,
    partition: list[str],
    order: list[Column],
    k: int,
) -> DataFrame:
    """Per-partition top-k via row_number — map-side safe, one shuffle.

    ``order`` must be a deterministic total order (include a unique
    tiebreak column) so results are stable for oracle comparison.
    """
    w = Window.partitionBy(*partition).orderBy(*order)
    return (
        df.withColumn("rank_k", F.row_number().over(w))
        .where(F.col("rank_k") <= k)
    )


def vwap(candles: DataFrame) -> DataFrame:
    """Cumulative volume-weighted average price per series (by day).

    VWAP_t = sum(close*volume) / sum(volume) over the day so far.
    """
    w = (
        Window.partitionBy(*SERIES_KEY, F.to_date("ts"))
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pv = F.sum(F.col("close") * F.col("volume")).over(w)
    v = F.sum("volume").over(w)
    return candles.withColumn("vwap", F.when(v != 0, pv / v))


def bollinger(
    candles: DataFrame, n: int = 20, k: float = 2.0, col: str = "close"
) -> DataFrame:
    """Bollinger bands: trailing n-bar SMA ± k sample standard
    deviations (null until the window is full). mid and sd are rounded
    to 6 dp BEFORE the band arithmetic so the emitted values are
    bit-identical across engines (the same discipline as the rolling
    correlation's round)."""
    w = _series_window().rowsBetween(-(n - 1), Window.currentRow)
    full = F.count(col).over(w) >= n
    mid = F.when(full, F.round(F.avg(col).over(w), 6))
    sd = F.when(full, F.round(F.stddev_samp(col).over(w), 6))
    return (
        candles.withColumn(f"bb_mid_{n}", mid)
        .withColumn(f"bb_sd_{n}", sd)
        .withColumn(
            f"bb_up_{n}",
            F.round(F.col(f"bb_mid_{n}") + k * F.col(f"bb_sd_{n}"), 6),
        )
        .withColumn(
            f"bb_dn_{n}",
            F.round(F.col(f"bb_mid_{n}") - k * F.col(f"bb_sd_{n}"), 6),
        )
    )


def rsi(candles: DataFrame, n: int = 14, col: str = "close") -> DataFrame:
    """Relative Strength Index over the trailing n bar-to-bar moves —
    the simple-moving-average variant (Cutler's RSI), which is a pure
    window expression and therefore cross-engine exact; Wilder's
    recursive smoothing belongs to the EMA operator's pandas-UDF path.
    Null until n moves are in the window; a window with zero average
    loss pins at 100 (the conventional saturation)."""
    wl = _series_window()
    d = F.col(col) - F.lag(col).over(wl)
    base = candles.withColumn(
        "__gain", F.when(d > 0, d).otherwise(F.lit(0.0))
    ).withColumn(
        "__loss", F.when(d < 0, -d).otherwise(F.lit(0.0))
    ).withColumn("__d", d)
    w = _series_window().rowsBetween(-(n - 1), Window.currentRow)
    full = F.count("__d").over(w) >= n  # n REAL moves (first is null)
    ag = F.avg("__gain").over(w)
    al = F.avg("__loss").over(w)
    value = F.when(al == 0, F.lit(100.0)).otherwise(
        F.round(F.lit(100.0) - F.lit(100.0) / (1 + ag / al), 6)
    )
    return base.withColumn(
        f"rsi_{n}", F.when(full, value)
    ).drop("__gain", "__loss", "__d")


def obv(candles: DataFrame, close_col: str = "close",
        vol_col: str = "volume") -> DataFrame:
    """On-balance volume: running sum of signed volume (sign of the
    bar-to-bar close move; the first bar contributes 0). Volume is
    summed exactly in decimal so the running total is bit-identical
    across engines and partitionings, then emitted as double."""
    wl = _series_window()
    d = F.col(close_col) - F.lag(close_col).over(wl)
    signed = (
        F.when(d > 0, F.col(vol_col))
        .when(d < 0, -F.col(vol_col))
        .otherwise(F.lit(0.0))
        .cast("decimal(38,10)")
    )
    run = _series_window().rowsBetween(Window.unboundedPreceding, 0)
    return candles.withColumn("__sv", signed).withColumn(
        "obv", F.sum("__sv").over(run).cast("double")
    ).drop("__sv")


def stochastic(candles: DataFrame, n: int = 14, d: int = 3) -> DataFrame:
    """Stochastic oscillator: %K = 100·(close − min(low,n)) /
    (max(high,n) − min(low,n)) over the trailing n bars (50 when the
    range is flat, null until full), %D = trailing d-bar SMA of %K.
    %K is rounded to 6 dp BEFORE the %D average so both engines feed
    the identical doubles into the second window (the bollinger/MACD
    grid discipline)."""
    w = _series_window().rowsBetween(-(n - 1), Window.currentRow)
    full = F.count("close").over(w) >= n
    lo = F.min("low").over(w)
    hi = F.max("high").over(w)
    k = F.when(hi > lo,
               F.round(F.lit(100.0) * (F.col("close") - lo) / (hi - lo), 6)
               ).otherwise(F.lit(50.0))
    base = candles.withColumn(f"stoch_k_{n}", F.when(full, k))
    wd = _series_window().rowsBetween(-(d - 1), Window.currentRow)
    dfull = F.count(f"stoch_k_{n}").over(wd) >= d
    return base.withColumn(
        f"stoch_d_{d}",
        F.when(dfull, F.round(F.avg(f"stoch_k_{n}").over(wd), 6)),
    )


def donchian(candles: DataFrame, n: int = 20) -> DataFrame:
    """Donchian channel: trailing n-bar extremes of high/low plus the
    mid-line and channel width (null until the window is full). Pure
    min/max — order-independent, so the outputs are bit-identical
    across engines with no rounding needed; mid/width are single IEEE
    ops on those exact extremes."""
    w = _series_window().rowsBetween(-(n - 1), Window.currentRow)
    full = F.count("close").over(w) >= n
    up = F.max("high").over(w)
    dn = F.min("low").over(w)
    return (
        candles.withColumn(f"dc_up_{n}", F.when(full, up))
        .withColumn(f"dc_dn_{n}", F.when(full, dn))
        .withColumn(
            f"dc_mid_{n}",
            (F.col(f"dc_up_{n}") + F.col(f"dc_dn_{n}")) / F.lit(2.0),
        )
        .withColumn(
            f"dc_width_{n}", F.col(f"dc_up_{n}") - F.col(f"dc_dn_{n}")
        )
    )


def drawdown(
    candles: DataFrame,
    price_col: str = "close",
    peak_col: str = "high",
) -> DataFrame:
    """Running-peak drawdown per series: the trailing all-time peak
    (cumulative max of ``peak_col``) and the fractional drawdown of
    ``price_col`` from it — the risk-analysis staple over the candle
    model. Cumulative max involves no float accumulation, so peak and
    the single IEEE division are bit-identical across engines with no
    rounding; one window pass on the shared series sort."""
    w = _series_window().rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return candles.withColumn("peak", F.max(peak_col).over(w)).withColumn(
        "drawdown", (F.col(price_col) - F.col("peak")) / F.col("peak")
    )


def zscore_anomaly(
    candles: DataFrame,
    n: int = 60,
    threshold: float = 3.0,
    col: str = "close",
) -> DataFrame:
    """Rolling z-score outlier detection — the data-quality monitor a
    candle feed runs on ingest: z = (x − trailing-n mean) / trailing-n
    sample stddev, flagged when |z| exceeds ``threshold``. Mean and sd
    round to 6 dp BEFORE the division and z rounds after it, so the
    flag (a discrete decision) is taken on bit-identical doubles in
    both engines. Null until the window is full or when sd is 0."""
    w = _series_window().rowsBetween(-(n - 1), Window.currentRow)
    full = F.count(col).over(w) >= n
    mu = F.when(full, F.round(F.avg(col).over(w), 6))
    sd = F.when(full, F.round(F.stddev_samp(col).over(w), 6))
    z = F.when(sd > 0, F.round((F.col(col) - mu) / sd, 6))
    return (
        candles.withColumn(f"z_{n}", z)
        .withColumn(
            "is_anomaly",
            F.when(
                F.col(f"z_{n}").isNotNull(),
                F.abs(F.col(f"z_{n}")) > F.lit(threshold),
            ),
        )
    )


def atr(candles: DataFrame, n: int = 14) -> DataFrame:
    """Average true range: TR = greatest(high-low, |high-prev_close|,
    |low-prev_close|) (first bar: high-low), ATR = trailing n-bar
    simple average of TR, rounded to 6 dp, null until n bars."""
    wl = _series_window()
    pc = F.lag("close").over(wl)
    tr = F.when(
        pc.isNull(), F.col("high") - F.col("low")
    ).otherwise(
        F.greatest(
            F.col("high") - F.col("low"),
            F.abs(F.col("high") - pc),
            F.abs(F.col("low") - pc),
        )
    )
    w = _series_window().rowsBetween(-(n - 1), Window.currentRow)
    base = candles.withColumn("tr", tr)
    return base.withColumn(
        f"atr_{n}",
        F.when(
            F.count("tr").over(w) >= n, F.round(F.avg("tr").over(w), 6)
        ),
    )
