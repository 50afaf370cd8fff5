"""JSONL source/sink: explicit-schema read, quarantine, FAILFAST."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mora_spark.sources.jsonl import CORRUPT_COL, read_jsonl, write_jsonl


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, 'uniçøde "quoted" text', "en"),
            (2, "embedded\nnewline and\ttab", "de"),
            (3, None, None),
        ],
        "doc_id long, text string, lang string",
    )


def test_roundtrip_preserves_unicode_quotes_newlines(spark, tmp_path):
    docs = _docs(spark)
    p = str(tmp_path / "jl")
    write_jsonl(docs, p)
    back = read_jsonl(spark, p, docs, mode="FAILFAST").select(*docs.columns)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, docs.collect())
    )


def test_permissive_quarantines_and_failfast_raises(spark, tmp_path):
    docs = _docs(spark)
    p = str(tmp_path / "jl")
    write_jsonl(docs, p)
    with open(os.path.join(p, "part-bad.json"), "w") as f:
        f.write("{broken\n")
    back = read_jsonl(spark, p, docs.schema)
    assert CORRUPT_COL in back.columns
    bad = back.where(F.col(CORRUPT_COL).isNotNull()).collect()
    assert len(bad) == 1 and bad[0][CORRUPT_COL] == "{broken"
    with pytest.raises(Exception, match="FAILED_READ_FILE|[Mm]alformed"):
        read_jsonl(spark, p, docs.schema, mode="FAILFAST").collect()


def test_read_accepts_structtype_or_template(spark, tmp_path):
    docs = _docs(spark)
    p = str(tmp_path / "jl")
    write_jsonl(docs, p, n_files=2)
    st = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    via_struct = read_jsonl(spark, p, st)
    # Column pruning at the source: only the requested fields + the
    # quarantine column appear.
    assert set(via_struct.columns) == {"doc_id", "text", CORRUPT_COL}
    assert via_struct.count() == 3
    files = [n for n in os.listdir(p) if n.endswith(".json")]
    assert len(files) == 2  # n_files controls the shard count
