"""Operator semantics on the sf0.001 events-derived candles."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mora_spark.datasets import candles_from_events, load_table
from mora_spark.operators import asof_join, ema, fill_gaps, resample


@pytest.fixture(scope="module")
def candles(spark, sf_dir):
    return candles_from_events(load_table(spark, sf_dir, "events")).cache()


def test_resample_algebra(spark, candles):
    # 60 -> 300 -> 3600 must equal 60 -> 3600 (SURVEY §5 property 3).
    via = resample(resample(candles, 300), 3600)
    direct = resample(candles, 3600)
    key = ["market", "code", "candle_length", "ts"]
    a = {tuple(r[k] for k in key): r for r in via.collect()}
    b = {tuple(r[k] for k in key): r for r in direct.collect()}
    assert a.keys() == b.keys()
    for k in a:
        for c in ["open", "high", "low", "close"]:
            assert a[k][c] == b[k][c], (k, c)
        assert math.isclose(a[k]["volume"], b[k]["volume"], rel_tol=1e-12)


def test_resample_conservation(candles):
    # Total volume and trade count survive resampling exactly.
    src = candles.agg(F.sum("volume"), F.sum("bit_fields")).collect()[0]
    dst = resample(candles, 3600).agg(
        F.sum("volume"), F.sum("bit_fields")
    ).collect()[0]
    assert math.isclose(src[0], dst[0], rel_tol=1e-12)
    assert src[1] == dst[1]


def test_gapfill_dense_grid(candles):
    one = candles.where(F.col("code") == "click")
    filled = fill_gaps(one)
    n = filled.count()
    bounds = one.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    expected = int((bounds["hi"] - bounds["lo"]).total_seconds() // 60) + 1
    assert n == expected
    # Filled rows carry forward close and have zero volume.
    f = filled.where(F.col("filled")).limit(5).collect()
    assert all(r["volume"] == 0.0 for r in f)
    assert filled.where(F.col("close").isNull()).count() == 0


def test_ema_matches_manual_recursion(spark):
    import datetime as dt

    rows = [
        ("M", "X", 60, dt.datetime(2024, 1, 1, 0, i), float(v), float(v),
         float(v), float(v), 1.0, 0)
        for i, v in enumerate([10, 20, 15, 30, 25])
    ]
    from mora_spark.schema import CANDLE_SCHEMA

    df = spark.createDataFrame(rows, CANDLE_SCHEMA)
    out = {r["ts"].minute: r["ema_3"] for r in ema(df, 3).collect()}
    alpha = 0.5
    exp, vals = [], [10, 20, 15, 30, 25]
    e = vals[0]
    for v in vals:
        e = alpha * v + (1 - alpha) * e if exp else v
        exp.append(e)
    for i, v in enumerate(exp):
        assert math.isclose(out[i], v, rel_tol=1e-12)


def test_asof_exact_and_before(spark):
    import datetime as dt

    L = [(1, "k", dt.datetime(2024, 1, 1, 0, 5)),
         (2, "k", dt.datetime(2024, 1, 1, 0, 10)),
         (3, "k", dt.datetime(2024, 1, 1, 0, 1))]
    R = [("k", dt.datetime(2024, 1, 1, 0, 5), 100.0),
         ("k", dt.datetime(2024, 1, 1, 0, 2), 50.0)]
    left = spark.createDataFrame(L, ["id", "k", "ts"])
    right = spark.createDataFrame(R, ["k", "ts", "px"])
    out = {r["id"]: r["px_asof"]
           for r in asof_join(left, right, on=["k"]).collect()}
    assert out[1] == 100.0   # exact-timestamp right row matches
    assert out[2] == 100.0   # latest at-or-before
    assert out[3] is None    # nothing before → NULL

    # tolerance (merge_asof parity): id=2 is 5 min after its match —
    # a 3-minute tolerance discards it; id=1's exact match survives
    tol = {r["id"]: r["px_asof"]
           for r in asof_join(left, right, on=["k"], tolerance_s=180).collect()}
    assert tol[1] == 100.0
    assert tol[2] is None
    assert tol[3] is None


def test_heikin_ashi_matches_manual_recursion(spark):
    import datetime as dt

    from mora_spark.operators.ema import heikin_ashi
    from mora_spark.schema import CANDLE_SCHEMA

    bars = [  # (open, high, low, close)
        (10.0, 12.0, 9.0, 11.0),
        (11.0, 13.0, 10.0, 12.5),
        (12.5, 14.0, 12.0, 13.0),
        (13.0, 13.5, 11.0, 11.5),
        (11.5, 12.0, 10.5, 11.0),
    ]
    rows = [
        ("M", "X", 60, dt.datetime(2024, 1, 1, 0, i), o, h, lo, c, 1.0, 0)
        for i, (o, h, lo, c) in enumerate(bars)
    ]
    df = spark.createDataFrame(rows, CANDLE_SCHEMA)
    out = {r["ts"].minute: r for r in heikin_ashi(df).collect()}

    ho = (bars[0][0] + bars[0][3]) / 2.0
    for i, (o, h, lo, c) in enumerate(bars):
        hc = (o + h + lo + c) / 4.0
        if i > 0:
            prev = bars[i - 1]
            prev_hc = (prev[0] + prev[1] + prev[2] + prev[3]) / 4.0
            ho = (ho + prev_hc) / 2.0
        r = out[i]
        assert math.isclose(r["ha_open"], ho, rel_tol=1e-12), i
        assert math.isclose(r["ha_close"], hc, rel_tol=1e-12), i
        assert math.isclose(r["ha_high"], max(h, ho, hc), rel_tol=1e-12)
        assert math.isclose(r["ha_low"], min(lo, ho, hc), rel_tol=1e-12)


def test_stochastic_bounds_and_flat_window(spark, candles):
    from mora_spark.operators.windows import stochastic

    out = stochastic(candles, n=14, d=3)
    bad = out.where(
        (F.col("stoch_k_14") < 0) | (F.col("stoch_k_14") > 100)
        | (F.col("stoch_d_3") < 0) | (F.col("stoch_d_3") > 100)
    ).count()
    assert bad == 0
    # first n-1 bars of each series have no %K
    first = out.where(F.col("stoch_k_14").isNull()).count()
    n_series = candles.select("market", "code", "candle_length").distinct().count()
    assert first == 13 * n_series

    # a perfectly flat window pins %K at 50
    import datetime as dt

    from mora_spark.schema import CANDLE_SCHEMA

    flat = spark.createDataFrame(
        [("M", "X", 60, dt.datetime(2024, 1, 1, 0, i),
          5.0, 5.0, 5.0, 5.0, 1.0, 0) for i in range(20)],
        CANDLE_SCHEMA,
    )
    ks = [r["stoch_k_14"] for r in stochastic(flat, n=14, d=3).collect()
          if r["stoch_k_14"] is not None]
    assert ks and all(k == 50.0 for k in ks)


def test_donchian_channel_contains_prices(candles):
    from mora_spark.operators.windows import donchian

    out = donchian(candles, n=20).where(F.col("dc_up_20").isNotNull())
    bad = out.where(
        (F.col("high") > F.col("dc_up_20"))
        | (F.col("low") < F.col("dc_dn_20"))
        | (F.col("dc_mid_20") > F.col("dc_up_20"))
        | (F.col("dc_mid_20") < F.col("dc_dn_20"))
        | (F.col("dc_width_20") < 0)
    ).count()
    assert bad == 0


def test_anchored_resample_grid_and_totals(candles):
    # Session-anchored daily bars: every bucket start sits on the
    # anchored grid (epoch ≡ anchor mod 86400), volume is conserved,
    # and anchor=0 equals the plain resample.
    anchored = resample(candles, 86_400, anchor_s=34_200)
    rows = anchored.collect()
    assert rows
    for r in rows:
        assert int(r["ts"].timestamp()) % 86_400 == 34_200
    src_vol = candles.agg(F.sum("volume")).collect()[0][0]
    dst_vol = sum(r["volume"] for r in rows)
    assert math.isclose(src_vol, dst_vol, rel_tol=1e-9)

    plain = resample(candles, 3600).collect()
    zero = resample(candles, 3600, anchor_s=0).collect()
    key = lambda r: (r["market"], r["code"], r["ts"])
    assert sorted(map(key, plain)) == sorted(map(key, zero))
