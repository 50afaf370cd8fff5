"""ORC interchange: lossless round-trip, scan pushdown, streaming."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from mora_spark.sources.orcio import read_orc, read_orc_stream, write_orc


def test_orc_roundtrips_nulls_empties_and_unicode(spark, tmp_path):
    """Binary columnar round-trip is exact: NULL vs empty string stay
    distinct (no sentinel ambiguity like CSV), unicode and newlines
    survive, types come back as written."""
    rows = [
        (1, "plain", 3.5),
        (2, None, None),
        (3, "", 0.0),
        (4, 'quotes " and \n newline', -1.25),
        (5, "unicodé ✓", 2.0),
    ]
    df = spark.createDataFrame(rows, "id long, txt string, val double")
    path = str(tmp_path / "orc")
    write_orc(df, path)
    back = read_orc(spark, path, df)
    assert sorted(map(tuple, back.collect())) == sorted(rows)
    assert back.schema == df.schema


def test_orc_scan_pushes_filters_and_prunes_columns(spark, tmp_path):
    """The contract that makes ORC a first-class corpus surface: a
    selective filter reaches the stripe reader as a pushed filter and
    a 1-column projection prunes the read schema."""
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") * 2).alias("v"),
        F.lit("padpadpad").alias("pad"),
    )
    path = str(tmp_path / "orc")
    write_orc(df, path)
    q = read_orc(spark, path, df).where(F.col("id") < 10).select("v")
    plan = q._jdf.queryExecution().executedPlan().toString()
    scan = [ln for ln in plan.splitlines() if "FileScan orc" in ln][0]
    assert "PushedFilters: [" in scan and "LessThan(id,10)" in scan
    assert "pad" not in scan.split("ReadSchema")[-1]


def test_orc_n_files_knob_and_stream_read(spark, tmp_path):
    """n_files bounds the shard count; the file-stream twin replays
    the shards as micro-batches with the same explicit schema."""
    df = spark.range(100).select(
        F.col("id"), F.col("id").cast("string").alias("txt")
    )
    path = str(tmp_path / "orc")
    write_orc(df, path, n_files=4)
    assert len(glob.glob(os.path.join(path, "*.orc"))) == 4
    out = str(tmp_path / "out")
    q = (
        read_orc_stream(spark, path, df, max_files_per_trigger=1)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    assert got.count() == 100
    assert sorted(r["id"] for r in got.collect()) == list(range(100))
