"""salted_join: result equivalence and salt distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from mora_spark.operators.skew import salted_join


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
    salted = salted_join(facts, dim, on=["k"], salt=8)
    a = sorted(tuple(r) for r in plain.select("k", "i", "v", "label").collect())
    b = sorted(tuple(r) for r in salted.select("k", "i", "v", "label").collect())
    assert a == b


def test_left_join_preserves_unmatched(spark):
    facts, dim = _skewed(spark)
    extra = facts.unionByName(
        spark.createDataFrame([("orphan", 1, 1.0)], "k string, i long, v double")
    )
    out = salted_join(extra, dim, on=["k"], salt=4, how="left")
    orphan = out.where(F.col("k") == "orphan").collect()
    assert len(orphan) == 1 and orphan[0]["label"] is None


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
