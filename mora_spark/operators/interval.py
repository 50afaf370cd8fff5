"""Interval (range) join: point-in-interval matching at scale.

Spark has no native interval-join operator (SURVEY §2.B, joins row).
The naive formulation — a cross join filtered on ``ts BETWEEN start AND
end`` — degenerates to a broadcast-nested-loop over every (row,
interval) pair. This operator uses the standard bucketed-range-join
plan instead: quantize time into fixed buckets, explode each interval
into the buckets it covers, and equi-join on (keys, bucket) before the
exact range filter. The join is then a plain shuffled/broadcast hash
join whose fan-in per task is bounded by bucket width, which is the
plan that survives 100 TB.

No duplicate elimination is needed: a point lies in exactly one bucket,
so each (row, interval) pair meets on exactly one join key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "win_start",
    end_col: str = "win_end",
    on: list[str] | None = None,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner-join point rows to every interval row whose
    ``[start_col, end_col]`` (inclusive) contains the point's
    ``ts_col``, optionally also matching equality ``on`` keys.
    (Inner only: the exact range check runs after the bucket equi-join,
    which cannot preserve unmatched rows; left semantics would need an
    anti-join union on top.)

    ``bucket_seconds`` trades explode fan-out (long intervals → many
    buckets) against join selectivity (wide buckets → more false
    candidates for the range filter); set it near the median interval
    length.
    """
    on = on or []
    b = F.lit(bucket_seconds)
    ivals = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.unix_timestamp(start_col) / b).cast("bigint"),
                (F.unix_timestamp(end_col) / b).cast("bigint"),
            )
        ),
    )
    pts = points.withColumn(
        "__bucket", (F.unix_timestamp(ts_col) / b).cast("bigint")
    )
    cond = (
        (F.col(ts_col) >= F.col(start_col))
        & (F.col(ts_col) <= F.col(end_col))
    )
    joined = pts.join(ivals, on=on + ["__bucket"], how="inner").where(cond)
    return joined.drop("__bucket")
