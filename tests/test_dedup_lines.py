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
    (5, None),  # NULL text must not lose the row
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


def test_null_text_survives_as_empty(out):
    assert 5 in out  # the row is not lost
    assert out[5]["text_dedup"] == ""
    assert out[5]["n_total"] == 1 and out[5]["n_kept"] == 1


# --- corpus-level properties over random line soups ---

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

LINE = st.sampled_from(
    ["aa", "bb", "cc", "dd", "common header", "x", ""]
)
DOC = st.lists(LINE, min_size=1, max_size=6).map("\n".join)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(DOC, min_size=1, max_size=8))
def test_dedup_lines_properties(spark, texts):
    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in dedup_lines(df, min_len=2).collect()}

    kept_eligible: list[str] = []
    for i, text in docs:
        orig = text.split("\n")
        kept = out[i]["text_dedup"].split("\n") if out[i]["n_kept"] else []
        # kept lines are a subsequence of the original, in order
        it = iter(orig)
        assert all(ln in it for ln in kept)
        assert out[i]["n_total"] == len(orig)
        assert out[i]["n_kept"] == len(kept)
        kept_eligible += [ln for ln in kept if len(ln) >= 2]
        # ineligible (short) lines are never dropped
        assert sum(len(x) < 2 for x in kept) == sum(
            len(x) < 2 for x in orig
        )
    # each distinct eligible line survives exactly once, corpus-wide
    eligible_distinct = {
        ln for t in texts for ln in t.split("\n") if len(ln) >= 2
    }
    assert sorted(kept_eligible) == sorted(eligible_distinct)
