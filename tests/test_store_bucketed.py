"""Store-level bucketing: zero-exchange store-store joins.

The CandleStore's partition grid (market/length/code/year —
``disk/resolver.go:15-17``) prunes SCANS; ``n_buckets`` extends the
layout to JOIN keys: every data file is written hash(ts)%k-bucketed
within its partition dir, and ``bucketed_view`` re-exposes that
partitioning to the planner so two stores join bucket-to-bucket with
no shuffle on either side."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mora_spark.engine import CandleStore
from mora_spark.operators.bucketed import exchanges_in_plan
from tests.test_store import mk

KEY = ["market", "code", "candle_length", "ts"]


@pytest.fixture()
def no_broadcast(spark):
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ]
    old = {k: spark.conf.get(k, None) for k in keys}
    for k in keys:
        spark.conf.set(k, "-1")
    yield
    for k, v in old.items():
        spark.conf.unset(k) if v is None else spark.conf.set(k, v)


def _rows(n, base_open):
    t0 = dt.datetime(2021, 1, 1)
    return [
        (code, t0 + dt.timedelta(minutes=i), base_open + i)
        for code in ("BTC", "ETH")
        for i in range(n)
    ]


def test_store_store_join_has_zero_exchanges(spark, tmp_path, no_broadcast):
    a = CandleStore(spark, str(tmp_path / "a"), n_buckets=4)
    b = CandleStore(spark, str(tmp_path / "b"), n_buckets=4)
    a.write(mk(spark, _rows(60, 100.0)))
    b.write(mk(spark, _rows(60, 500.0)))
    va = a.bucketed_view("v_feed_a")
    vb = b.bucketed_view("v_feed_b")
    j = va.join(vb, KEY).select(
        *KEY,
        (vb["open"] - va["open"]).alias("spread"),
    )
    assert exchanges_in_plan(j) == 0
    rows = j.collect()
    assert len(rows) == 120
    assert {r["spread"] for r in rows} == {400.0}
    # The same join over plain (manifest) reads shuffles both sides.
    plain = a.read().join(b.read(), KEY)
    assert exchanges_in_plan(plain) > 0


def test_bucketed_store_merge_semantics_unchanged(spark, tmp_path):
    """Bucketing is a layout property: last-writer-wins upsert and
    time travel behave exactly as on an unbucketed store."""
    s = CandleStore(spark, str(tmp_path / "s"), n_buckets=4)
    s.write(mk(spark, [("BTC", dt.datetime(2021, 1, 1, 0, i), 100.0 + i)
                       for i in range(5)]))
    s.write(mk(spark, [("BTC", dt.datetime(2021, 1, 1, 0, 2), 999.0)]))
    out = {r["ts"].minute: r["open"] for r in s.read(code="BTC").collect()}
    assert len(out) == 5 and out[2] == 999.0 and out[1] == 101.0
    assert s.read(version=1).count() == 5


def test_view_tracks_current_snapshot(spark, tmp_path, no_broadcast):
    s = CandleStore(spark, str(tmp_path / "s"), n_buckets=4)
    s.write(mk(spark, [("BTC", dt.datetime(2021, 1, 1, 0, i), 1.0)
                       for i in range(4)]))
    assert s.bucketed_view("v_snap").count() == 4
    s.write(mk(spark, [("ETH", dt.datetime(2021, 1, 1, 0, i), 2.0)
                       for i in range(3)]))
    assert s.bucketed_view("v_snap").count() == 7


def test_bucketed_store_rollup_keeps_layout(spark, tmp_path, no_broadcast):
    """derive_rollup stages through the same bucketed write path, so
    continuous-aggregate maintenance on a bucketed store keeps every
    data file bucket-tagged and the snapshot view keeps planning
    exchange-free joins afterwards."""
    s = CandleStore(spark, str(tmp_path / "s"), n_buckets=4)
    batch = mk(spark, _rows(30, 100.0))
    s.write(batch)
    s.derive_rollup(batch, target_length_s=300)
    coarse = s.read(candle_length=300)
    assert coarse.count() == 12  # 30 minutes -> 6 buckets x 2 codes
    v = s.bucketed_view("v_rollup_mix")
    assert v.count() == 60 + 12  # 2 codes x 30 fine bars + 12 coarse
    j = v.alias("a").join(
        spark.table("v_rollup_mix").alias("b"), KEY
    )
    assert exchanges_in_plan(j) == 0


def test_bucket_spec_is_persisted_and_enforced(spark, tmp_path):
    path = str(tmp_path / "s")
    s = CandleStore(spark, path, n_buckets=4)
    s.write(mk(spark, [("BTC", dt.datetime(2021, 1, 1), 1.0)]))
    # Reopen without the arg: the persisted spec is adopted.
    again = CandleStore(spark, path)
    assert again.n_buckets == 4
    again.bucketed_view("v_reopen")  # still works
    with pytest.raises(ValueError, match="bucketed into 4"):
        CandleStore(spark, path, n_buckets=8)
    # Retrofitting bucketing onto existing unbucketed data is refused.
    plain = str(tmp_path / "plain")
    CandleStore(spark, plain).write(
        mk(spark, [("BTC", dt.datetime(2021, 1, 1), 1.0)])
    )
    with pytest.raises(ValueError, match="retroactively"):
        CandleStore(spark, plain, n_buckets=4)
    with pytest.raises(ValueError, match="n_buckets"):
        CandleStore(spark, plain).bucketed_view("v_nope")


def test_bucketed_snapshot_diff_has_zero_exchanges(
    spark, tmp_path, no_broadcast
):
    """CDC between two versions of a bucketed store is exchange-free:
    each version is pinned by a hardlinked bucketed_view BEFORE the
    next write, and snapshot_diff's full outer join plans over two
    hash(ts)-co-partitioned scans — no shuffle of either version."""
    s = CandleStore(spark, str(tmp_path / "s"), n_buckets=4)
    s.write(mk(spark, _rows(30, 100.0)))  # v1
    va = s.bucketed_view("v_diff_before")
    s.write(  # v2: restate one bar, add one new bar
        mk(spark, [
            ("BTC", dt.datetime(2021, 1, 1, 0, 2), 999.0),
            ("BTC", dt.datetime(2021, 2, 1, 0, 0), 7.0),
        ])
    )
    vb = s.bucketed_view("v_diff_after")
    d = CandleStore.snapshot_diff(va, vb)
    assert exchanges_in_plan(d) == 0
    rows = {(r["change"], r["code"], r["ts"]) for r in d.collect()}
    assert rows == {
        ("update", "BTC", dt.datetime(2021, 1, 1, 0, 2)),
        ("insert", "BTC", dt.datetime(2021, 2, 1, 0, 0)),
    }
    # The unbucketed diff of the same versions shuffles.
    assert exchanges_in_plan(s.diff(1, 2)) > 0
