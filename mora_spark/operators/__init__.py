"""Time-series and relational operators: upsert, resample, gap-fill,
windows, as-of join, interval join, skew-salted join."""

from mora_spark.operators.upsert import last_writer_wins, merge_batches
from mora_spark.operators.resample import resample
from mora_spark.operators.gapfill import fill_gaps
from mora_spark.operators.asof import asof_join
from mora_spark.operators.interval import interval_join
from mora_spark.operators.skew import salted_join
from mora_spark.operators.windows import (
    rolling,
    sma,
    with_lag_lead,
    top_k,
    vwap,
)
from mora_spark.operators.ema import ema

__all__ = [
    "last_writer_wins",
    "merge_batches",
    "resample",
    "fill_gaps",
    "asof_join",
    "interval_join",
    "salted_join",
    "rolling",
    "sma",
    "with_lag_lead",
    "top_k",
    "vwap",
    "ema",
]
