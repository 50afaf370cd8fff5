"""CSV interchange edge fidelity (sources/csvio.py): the corpus-level
round trip is oracle-checked by q_csv_roundtrip; these pin the edge
values the synthetic corpus doesn't contain."""

from __future__ import annotations

import pytest

from mora_spark.sources.csvio import CORRUPT_COL, read_csv, write_csv


def test_csv_roundtrips_nulls_empties_quotes_newlines(spark, tmp_path):
    rows = [
        (1, None, "en"),  # NULL text -> \N sentinel
        (2, "", "en"),  # empty string stays empty, not NULL
        (3, 'say "hi", ok?', "en"),  # embedded quote + separator
        (4, "line one\nline two", "en"),  # embedded newline
        (5, "tab\there — unicode: héllo", "fr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    path = str(tmp_path / "csv")
    write_csv(df, path)
    back = read_csv(spark, path, df, mode="FAILFAST")
    got = sorted(map(tuple, back.select("doc_id", "text", "lang").collect()))
    assert got == sorted(rows)


def test_csv_null_sentinel_collision_is_the_documented_ambiguity(
    spark, tmp_path
):
    """A text field whose CONTENT is exactly the ``\\N`` sentinel reads
    back as NULL — the inherent ambiguity of every CSV null sentinel
    (classic dump formats share it), documented in csvio; corpora that
    may contain the literal sentinel belong in JSONL, which has real
    null typing."""
    df = spark.createDataFrame(
        [(1, "\\N", "en")], "doc_id long, text string, lang string"
    )
    path = str(tmp_path / "csv")
    write_csv(df, path)
    back = read_csv(spark, path, df, mode="FAILFAST").collect()
    assert back[0]["text"] is None


def test_csv_failfast_raises_on_planted_bad_row(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "ok", "en")], "doc_id long, text string, lang string"
    )
    path = str(tmp_path / "csv")
    write_csv(df, path)
    with open(f"{path}/part-planted.csv", "w") as f:
        f.write("doc_id,text,lang\n")
        f.write("notanumber,bad,en\n")
    with pytest.raises(Exception, match="Malformed|FAILFAST"):
        read_csv(spark, path, df, mode="FAILFAST").collect()
    # PERMISSIVE diverts the same row instead of failing. (A real
    # column must ride along: Spark refuses corrupt-column-only
    # queries off a raw CSV scan.)
    back = read_csv(spark, path, df)
    from pyspark.sql import functions as F

    r = back.agg(
        F.count("doc_id").alias("n_ok"),
        F.count(F.col(CORRUPT_COL)).alias("n_bad"),
    ).collect()[0]
    assert r["n_bad"] == 1 and r["n_ok"] == 1
