"""Bucketed co-located join: shuffle-free plan + result equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from contextlib import contextmanager

from mora_spark.datasets import load_table
from mora_spark.operators.bucketed import exchanges_in_plan, save_bucketed


@contextmanager
def _no_broadcast(spark):
    """Force shuffle-vs-bucket planning: at test scale every table fits
    the broadcast threshold, which would sidestep the very plan shape
    under test (both thresholds — planner and AQE — must drop)."""
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ]
    old = {k: spark.conf.get(k, None) for k in keys}
    for k in keys:
        spark.conf.set(k, "-1")
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bucketed_join_has_zero_exchanges(spark, sf_dir, tmp_path):
    """Two tables bucketed by the join key at the same bucket count
    must sort-merge-join with NO Exchange anywhere in the join plan —
    the on-disk hash partitioning replaces the shuffle (and sortBy on
    the key removes the sort's input requirement). A plain parquet
    read of the same data shuffles both sides."""
    l = save_bucketed(
        load_table(spark, sf_dir, "lineitem"),
        "tb_lineitem",
        str(tmp_path / "l"),
        ["l_orderkey"],
        n_buckets=4,
        sort_cols=["l_orderkey"],
    )
    o = save_bucketed(
        load_table(spark, sf_dir, "orders"),
        "tb_orders",
        str(tmp_path / "o"),
        ["o_orderkey"],
        n_buckets=4,
        sort_cols=["o_orderkey"],
    )
    with _no_broadcast(spark):
        j = l.join(o, l.l_orderkey == o.o_orderkey).select(
            "l_orderkey", "l_quantity", "o_orderpriority"
        )
        assert exchanges_in_plan(j) == 0
        plain = (
            load_table(spark, sf_dir, "lineitem")
            .join(
                load_table(spark, sf_dir, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .select("l_orderkey", "l_quantity", "o_orderpriority")
        )
        assert exchanges_in_plan(plain) > 0
        # Bucketing is invisible in the answer.
        assert j.count() == plain.count()
        a = j.groupBy().agg(F.sum("l_quantity").alias("s")).collect()[0]["s"]
        b = plain.groupBy().agg(F.sum("l_quantity").alias("s")).collect()[0]["s"]
        assert a == b


def test_bucketed_table_survives_reread_via_catalog(spark, sf_dir, tmp_path):
    """The bucket spec lives in the catalog: spark.table() of the saved
    name gets the shuffle-free scan, while a raw parquet read of the
    same files does not (documented contract of save_bucketed)."""
    save_bucketed(
        load_table(spark, sf_dir, "orders"),
        "tb_orders2",
        str(tmp_path / "o2"),
        ["o_orderkey"],
        n_buckets=4,
    )
    with _no_broadcast(spark):
        via_catalog = spark.table("tb_orders2")
        self_join = via_catalog.alias("a").join(
            spark.table("tb_orders2").alias("b"), "o_orderkey"
        )
        assert exchanges_in_plan(self_join) == 0
        raw = spark.read.parquet(str(tmp_path / "o2"))
        raw_join = raw.alias("a").join(raw.alias("b"), "o_orderkey")
        assert exchanges_in_plan(raw_join) > 0


def test_exchange_counter_ignores_reused_exchange(spark, sf_dir):
    """A self-join of one aggregated subtree plans a single shuffle
    plus a ReusedExchange of it — the node-walking counter must report
    the LIVE shuffle only (the substring-matching version this
    replaced counted 2 here)."""
    agg = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    with _no_broadcast(spark):
        j = agg.alias("a").join(agg.alias("b"), "l_orderkey")
        j.write.format("noop").mode("overwrite").save()
        plan = j._jdf.queryExecution().executedPlan().toString()
        n = exchanges_in_plan(j)
        if "ReusedExchange" in plan:
            assert n == 1
        else:  # planner didn't reuse on this version: both are live
            assert n == 2
