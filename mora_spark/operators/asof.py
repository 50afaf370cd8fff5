"""As-of join: enrich a (keyed, timestamped) left stream with the most
recent right-side row at or before each left timestamp.

Spark has no native ASOF JOIN; the scalable plan (SURVEY §4-1) is the
union trick: tag both sides, union on the key, one time-ordered window
with ``last(ignorenulls)`` carries the right side's payload forward onto
left rows. One shuffle on the key, no range-explosion, no broadcast
needed — works when either side is huge. (DuckDB's native ``ASOF JOIN``
is the oracle.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    tolerance_s: int | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` within the same ``on`` key ('at or before':
    a right row at the exact left timestamp matches, like DuckDB's
    ``ASOF JOIN ... ON l.ts >= r.ts``). Left rows with no prior right
    row keep NULLs (left-outer semantics).

    ``tolerance_s`` (pandas ``merge_asof`` parity): a match older than
    ``tolerance_s`` seconds is discarded — the carried payload keeps
    the right row's timestamp, so staleness is one filter, not a
    second join."""
    right_cols = right_cols or [
        c for c in right.columns if c not in on and c != right_ts
    ]
    payload = F.struct(
        *[F.col(c) for c in right_cols],
        F.col(right_ts).alias("__rts"),
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    # Right rows sort before left rows at equal __t (side 0 < 1) so an
    # exact-timestamp right row is visible to its left row.
    w = (
        Window.partitionBy(*on)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        unioned.withColumn(
            "__carried", F.last("__payload", ignorenulls=True).over(w)
        )
        .where(F.col("__side") == 1)
    )
    if tolerance_s is not None:
        stale = (
            F.unix_timestamp(F.col(left_ts))
            - F.unix_timestamp(F.col("__carried").getField("__rts"))
        ) > tolerance_s
        out = out.withColumn(
            "__carried", F.when(~stale, F.col("__carried"))
        )
    for c in right_cols:
        out = out.withColumn(f"{c}{suffix}", F.col("__carried").getField(c))
    return out.drop("__t", "__side", "__payload", "__carried")
