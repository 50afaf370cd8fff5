"""Semantic unit tests for the event-analytics queries.

The oracle gate proves Spark == DuckDB, but both sides share one
author — these fixtures pin the INTENDED funnel/retention semantics on
hand-built frames where the right answer is computed by eye:
strict ordering (a purchase before the qualifying click must not
count), the (ts, event_id) tie rule, and day-offset arithmetic.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mora_spark.queries.relational import funnel_daily, retention_cohort

D = dt.datetime


def _events(spark, rows):
    return spark.createDataFrame(
        [
            {
                "event_id": i,
                "ts": ts,
                "user_id": uid,
                "event_type": et,
                "value": 1.0,
                "props": "{}",
            }
            for i, (uid, ts, et) in enumerate(rows)
        ]
    )


def test_funnel_strict_ordering(spark):
    t = lambda m: D(2024, 1, 1, 0, m)
    rows = [
        # user 1: view -> click -> purchase, in order: full funnel
        (1, t(1), "view"),
        (1, t(2), "click"),
        (1, t(3), "purchase"),
        # user 2: click BEFORE the view -> click doesn't qualify, and
        # the purchase has no qualified click before it
        (2, t(1), "click"),
        (2, t(2), "view"),
        (2, t(3), "purchase"),
        # user 3: purchase BETWEEN view and click -> step2 yes, step3 no
        (3, t(1), "view"),
        (3, t(2), "purchase"),
        (3, t(3), "click"),
        # user 4: no view at all -> contributes to no step
        (4, t(1), "purchase"),
        (4, t(2), "click"),
    ]
    out = funnel_daily(_events(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_view"], r["n_view_click"], r["n_full_funnel"]) == (3, 2, 1)


def test_funnel_same_ts_ties_break_by_event_id(spark):
    ts = D(2024, 1, 1, 0, 0)
    # view and click share one timestamp; event_id (insertion order)
    # puts the view first, so the click qualifies
    out = funnel_daily(
        _events(spark, [(1, ts, "view"), (1, ts, "click")])
    ).collect()
    assert (out[0]["n_view"], out[0]["n_view_click"]) == (1, 1)


def test_funnel_scoped_per_day(spark):
    # view on day 1, click on day 2: the funnel is per (user, day), so
    # neither day sees a view->click conversion
    out = {
        r["day"].day: r
        for r in funnel_daily(
            _events(
                spark,
                [(1, D(2024, 1, 1, 5), "view"), (1, D(2024, 1, 2, 5), "click")],
            )
        ).collect()
    }
    assert out[1]["n_view"] == 1 and out[1]["n_view_click"] == 0
    assert out[2]["n_view"] == 0 and out[2]["n_view_click"] == 0


def test_funnel_steps_generalizes_to_n_steps(spark):
    from mora_spark.operators.funnel import funnel_steps

    t = lambda m: D(2024, 1, 1, 0, m)
    rows = [
        # user 1 completes all four steps in order
        (1, t(1), "signup"),
        (1, t(2), "view"),
        (1, t(3), "click"),
        (1, t(4), "purchase"),
        # user 2 misses the middle step: depth stops at 2
        (2, t(1), "signup"),
        (2, t(2), "view"),
        (2, t(3), "purchase"),
    ]
    out = {
        r["user_id"]: (r["s1"], r["s2"], r["s3"], r["s4"])
        for r in funnel_steps(
            _events(spark, rows),
            steps=("signup", "view", "click", "purchase"),
            keys=("user_id",),
        ).collect()
    }
    assert out == {1: (1, 1, 1, 1), 2: (1, 1, 0, 0)}


def test_retention_offsets(spark):
    rows = [
        # user 1: first seen Jan 1, active again Jan 3 (two events that
        # day collapse to one cell) and Jan 10
        (1, D(2024, 1, 1, 8), "view"),
        (1, D(2024, 1, 3, 9), "view"),
        (1, D(2024, 1, 3, 10), "click"),
        (1, D(2024, 1, 10, 1), "view"),
        # user 2: first seen Jan 3, active Jan 4
        (2, D(2024, 1, 3, 2), "view"),
        (2, D(2024, 1, 4, 2), "view"),
    ]
    out = {
        (r["cohort_day"].day, r["day_offset"]): r["n_users"]
        for r in retention_cohort(_events(spark, rows)).collect()
    }
    assert out == {
        (1, 0): 1,  # user 1 day-0
        (1, 2): 1,  # user 1 on Jan 3
        (1, 9): 1,  # user 1 on Jan 10
        (3, 0): 1,  # user 2 day-0
        (3, 1): 1,  # user 2 on Jan 4
    }
