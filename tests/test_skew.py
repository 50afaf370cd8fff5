"""salted_join: result equivalence, hot-key sampling, salt spread."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mora_spark.operators.skew import detect_hot_keys, salted_join


def _skewed(spark):
    # 90% of fact rows share one hot key
    rows = [("hot", i, float(i)) for i in range(900)] + [
        (f"k{i % 30}", i, float(i)) for i in range(100)
    ]
    facts = spark.createDataFrame(rows, "k string, i long, v double")
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"D{i}") for i in range(30)],
        "k string, label string",
    )
    return facts, dim


def test_salted_join_equals_plain_join(spark):
    facts, dim = _skewed(spark)
    plain = facts.join(dim, "k")
    salted = salted_join(facts, dim, on=["k"], salt=8, sample_fraction=0.5)
    a = sorted(tuple(r) for r in plain.select("k", "i", "v", "label").collect())
    b = sorted(tuple(r) for r in salted.select("k", "i", "v", "label").collect())
    assert a == b


def test_left_join_preserves_unmatched(spark):
    facts, dim = _skewed(spark)
    extra = facts.unionByName(
        spark.createDataFrame([("orphan", 1, 1.0)], "k string, i long, v double")
    )
    out = salted_join(
        extra, dim, on=["k"], salt=4, how="left", sample_fraction=0.5
    )
    orphan = out.where(F.col("k") == "orphan").collect()
    assert len(orphan) == 1 and orphan[0]["label"] is None


def test_left_join_preserves_null_keys(spark):
    """NULL join keys never equi-match but must survive a LEFT join —
    they route through the plain half despite the isin() null verdict."""
    facts, dim = _skewed(spark)
    extra = facts.unionByName(
        spark.createDataFrame([(None, 2, 2.0)], "k string, i long, v double")
    )
    out = salted_join(
        extra, dim, on=["k"], salt=4, how="left", sample_fraction=0.5
    )
    nulls = out.where(F.col("k").isNull()).collect()
    assert len(nulls) == 1 and nulls[0]["label"] is None


def test_detect_hot_keys_finds_only_the_heavy_hitter(spark):
    facts, _ = _skewed(spark)
    hot = detect_hot_keys(facts, ["k"], sample_fraction=0.5, hot_share=0.1)
    assert hot == [("hot",)]


def test_uniform_keys_pay_no_replication(spark):
    """Only the hot slice of the dimension is exploded salt x: with one
    detected hot key, the salted half carries 1 dim key x salt rows and
    the other 30 dim keys appear exactly once in the plain half."""
    facts, dim = _skewed(spark)
    out = salted_join(
        facts, dim, on=["k"], salt=8, hot_keys=[("hot",)]
    )
    # Equivalence under the explicit hot set too.
    plain = sorted(
        tuple(r) for r in facts.join(dim, "k").select("k", "i", "v", "label").collect()
    )
    got = sorted(tuple(r) for r in out.select("k", "i", "v", "label").collect())
    assert got == plain


def test_no_hot_keys_degrades_to_plain_join(spark):
    _, dim = _skewed(spark)
    uniform = spark.createDataFrame(
        [(f"k{i % 30}", i, float(i)) for i in range(300)],
        "k string, i long, v double",
    )
    out = salted_join(
        uniform, dim, on=["k"], salt=8, sample_fraction=0.5, hot_share=0.2
    )
    # No key crosses the 20% share bar -> the plan is the plain join
    # (no __salt column anywhere, single join node).
    assert "__salt" not in out.columns
    assert out.count() == uniform.join(dim, "k").count()
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" not in plan


def test_rejects_outer_joins(spark):
    facts, dim = _skewed(spark)
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(facts, dim, on=["k"], how="full")


def test_hot_key_spreads_across_salts(spark):
    facts, dim = _skewed(spark)
    sl = F.pmod(F.xxhash64(*[F.col(c) for c in facts.columns]), F.lit(8))
    n = (
        facts.where(F.col("k") == "hot")
        .select(sl.alias("s"))
        .distinct()
        .count()
    )
    assert n >= 6  # 900 hot rows land in nearly all 8 salt buckets
