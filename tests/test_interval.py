"""interval_join semantics: inclusive bounds, bucket-boundary safety,
key matching, and equivalence to the naive cross-join formulation."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mora_spark.operators.interval import interval_join

T0 = dt.datetime(2022, 1, 1, 0, 0, 0)


def _dfs(spark):
    pts = spark.createDataFrame(
        [
            ("a", T0 + dt.timedelta(seconds=s), float(s))
            for s in [0, 59, 60, 3599, 3600, 3601, 7200]
        ]
        + [("b", T0 + dt.timedelta(seconds=60), 999.0)],
        "k string, ts timestamp, v double",
    )
    ivs = spark.createDataFrame(
        [
            # [60, 3600] spans an hour-bucket boundary
            ("a", T0 + dt.timedelta(seconds=60), T0 + dt.timedelta(seconds=3600)),
            ("b", T0, T0 + dt.timedelta(seconds=59)),
        ],
        "k string, win_start timestamp, win_end timestamp",
    )
    return pts, ivs


def test_inclusive_bounds_and_keys(spark):
    pts, ivs = _dfs(spark)
    got = interval_join(pts, ivs, on=["k"], bucket_seconds=3600).collect()
    matched = {(r["k"], r["v"]) for r in got}
    # inclusive on both ends: 60 and 3600 match; 59 and 3601 do not
    assert matched == {("a", 60.0), ("a", 3599.0), ("a", 3600.0)}


def test_equivalent_to_naive_cross_join(spark):
    pts, ivs = _dfs(spark)
    for bucket in (60, 600, 3600, 86400):
        fast = interval_join(pts, ivs, on=["k"], bucket_seconds=bucket)
        naive = pts.join(ivs, "k").where(
            (F.col("ts") >= F.col("win_start"))
            & (F.col("ts") <= F.col("win_end"))
        )
        a = sorted(tuple(r) for r in fast.select("k", "ts", "v").collect())
        b = sorted(tuple(r) for r in naive.select("k", "ts", "v").collect())
        assert a == b, f"bucket={bucket}"


def test_no_duplicate_matches(spark):
    pts, ivs = _dfs(spark)
    got = interval_join(pts, ivs, on=["k"], bucket_seconds=60)
    assert got.count() == got.dropDuplicates(["k", "ts", "v"]).count()
