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
