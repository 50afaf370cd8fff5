"""Gap filling: densify a candle series and forward-fill.

The reference guarantees sorted, unique timestamps within a (series,
year) page but has no notion of missing bars; gap-fill is the standard
client-side companion. Implemented as per-key ``sequence()`` expansion
(JVM-side, no Python) + left join + ``last(ignorenulls)`` forward-fill
window.

Scale notes: the sequence explode is per key and proportional to the
output size (the dense grid), which is the lower bound anyway; the
forward-fill window is one shuffle on the key, ordered by ts — same
partitioning as the join, so AQE can reuse the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mora_spark.schema import OHLCV

SERIES_KEY = ["market", "code", "candle_length"]


def fill_gaps(candles: DataFrame, length_s: int | None = None) -> DataFrame:
    """Insert missing bars on the per-key [min_ts, max_ts] grid.

    Filled bars carry forward the previous close as open/high/low/close,
    volume 0, bit_fields 0, and a ``filled`` flag. ``length_s`` defaults
    to each series' own candle_length.
    """
    step = F.coalesce(F.lit(length_s), F.col("candle_length")).cast("long")

    grid = (
        candles.groupBy(*SERIES_KEY)
        .agg(
            F.min("ts").alias("min_ts"),
            F.max("ts").alias("max_ts"),
        )
        .withColumn(
            "ts",
            F.explode(
                F.sequence(
                    F.unix_timestamp("min_ts"),
                    F.unix_timestamp("max_ts"),
                    step,
                )
            ),
        )
        .withColumn("ts", F.timestamp_seconds("ts"))
        .drop("min_ts", "max_ts")
    )

    joined = grid.join(candles, on=SERIES_KEY + ["ts"], how="left")
    w = (
        Window.partitionBy(*SERIES_KEY)
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_close = F.last("close", ignorenulls=True).over(w)
    filled = F.col("close").isNull()

    out = joined.withColumn("filled", filled)
    for c in ["open", "high", "low"]:
        out = out.withColumn(c, F.coalesce(F.col(c), prev_close))
    return (
        out.withColumn("close", prev_close)
        .withColumn("volume", F.coalesce(F.col("volume"), F.lit(0.0)))
        .withColumn("bit_fields", F.coalesce(F.col("bit_fields"), F.lit(0)))
    )


def interpolate_gaps(
    candles: DataFrame,
    value_col: str = "close",
    length_s: int | None = None,
) -> DataFrame:
    """Densify the per-key grid and LINEARLY interpolate ``value_col``
    across gaps (the Timescale ``interpolate()`` / Influx
    ``fill(linear)`` analogue, vs :func:`fill_gaps`'s last-observation-
    carried-forward). Grid rows before the first or after the last
    known value stay NULL — extrapolation is a lie, not a fill.

    Same scale shape as fill_gaps: per-key ``sequence()`` explode
    (proportional to the dense output — the lower bound), then TWO
    ignore-nulls windows over one (key, ts) sort: the carried previous
    known (value, ts) and the pending next known (value, ts). Both
    windows share the forward-fill's partitioning, so the whole op is
    one shuffle on the series key."""
    step = F.coalesce(F.lit(length_s), F.col("candle_length")).cast("long")
    grid = (
        candles.groupBy(*SERIES_KEY)
        .agg(F.min("ts").alias("min_ts"), F.max("ts").alias("max_ts"))
        .withColumn(
            "ts",
            F.explode(
                F.sequence(
                    F.unix_timestamp("min_ts"),
                    F.unix_timestamp("max_ts"),
                    step,
                )
            ),
        )
        .withColumn("ts", F.timestamp_seconds("ts"))
        .drop("min_ts", "max_ts")
    )
    joined = grid.join(
        candles.select(*SERIES_KEY, "ts", value_col),
        on=SERIES_KEY + ["ts"],
        how="left",
    )
    known_ts = F.when(
        F.col(value_col).isNotNull(), F.unix_timestamp("ts")
    )
    back = (
        Window.partitionBy(*SERIES_KEY)
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # "Next known" is expressed as a RUNNING frame over ts DESC, not a
    # (currentRow, unboundedFollowing) frame: Spark's unbounded-
    # FOLLOWING window frame re-scans to the partition end per row
    # (O(n^2) per series — measured 322s vs 4s on a 215k-row grid);
    # the descending running frame is the streaming-accumulator path.
    fwd = (
        Window.partitionBy(*SERIES_KEY)
        .orderBy(F.col("ts").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_v = F.last(value_col, ignorenulls=True).over(back)
    prev_t = F.last(known_ts, ignorenulls=True).over(back)
    next_v = F.last(value_col, ignorenulls=True).over(fwd)
    next_t = F.last(known_ts, ignorenulls=True).over(fwd)
    t = F.unix_timestamp("ts")
    frac = (t - prev_t).cast("double") / (next_t - prev_t).cast("double")
    interp = F.when(F.col(value_col).isNotNull(), F.col(value_col)).when(
        prev_v.isNotNull() & next_v.isNotNull(),
        prev_v + (next_v - prev_v) * frac,
    )
    return joined.select(
        *SERIES_KEY,
        "ts",
        interp.alias(f"{value_col}_interp"),
        F.col(value_col).isNull().alias("was_gap"),
    )
