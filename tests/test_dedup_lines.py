"""Line-level corpus dedup semantics: first occurrence wins, order is
preserved, short lines are exempt, fully-deduped docs survive empty."""

from __future__ import annotations

import pytest

from mora_spark.llm.dedup import dedup_lines

DOCS = [
    (1, "alpha unique one\nshared banner line\nalpha unique two"),
    (2, "shared banner line\nbeta unique one"),
    (3, "shared banner line"),  # every line duplicated away
    (4, "x\ngamma unique\nx"),  # short 'x' exempt from dedup
]


@pytest.fixture()
def out(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    return {
        r["doc_id"]: r for r in dedup_lines(df, min_len=2).collect()
    }


def test_first_occurrence_wins_in_order(out):
    assert out[1]["text_dedup"] == (
        "alpha unique one\nshared banner line\nalpha unique two"
    )
    assert out[2]["text_dedup"] == "beta unique one"


def test_fully_deduped_doc_survives_empty(out):
    assert out[3]["text_dedup"] == ""
    assert out[3]["n_kept"] == 0
    assert out[3]["n_total"] == 1


def test_short_lines_exempt(out):
    # both 'x' lines stay: length 1 < min_len 2
    assert out[4]["text_dedup"] == "x\ngamma unique\nx"
    assert out[4]["n_kept"] == 3


def test_counts(out):
    assert out[1]["n_total"] == 3 and out[1]["n_kept"] == 3
    assert out[2]["n_total"] == 2 and out[2]["n_kept"] == 1
