"""Ordered N-step conversion funnel.

The reference is a single-table candle engine with no window or join
operators (SURVEY §2.B; ``database/command/types.go:11-14``), so this
is part of the analytics surface the rebuild adds over the event
stream. A user completes step *i* within a funnel scope iff an event
of the step-*i* type occurs strictly AFTER some completion of step
*i−1* (strictly = earlier in the total (ts, tiebreak) order, so
same-timestamp events resolve deterministically).

Plan shape: ONE shuffle on the scope keys, then one running-min
window pass per step over the same sorted partition (the sort is
shared — Spark plans consecutive windows with identical
partitioning/ordering in a single Window chain), then one hash agg.
The classic k-way self-join funnel shuffles k times and explodes on
hot users; this stays linear in events for any number of steps.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_steps(
    e: DataFrame,
    steps: Sequence[str],
    keys: Sequence[str] = ("user_id",),
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-``keys`` funnel flags: one row per key tuple with columns
    ``s1 .. s{len(steps)}`` — 1 iff the ordered prefix of ``steps`` up
    to that depth was completed within the key scope."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    w = Window.partitionBy(*keys).orderBy(ts_col, tiebreak_col)
    prior = w.rowsBetween(Window.unboundedPreceding, -1)
    for i, step in enumerate(steps):
        cond = F.col(type_col) == step
        if i > 0:
            # First completion time of the previous step among
            # STRICTLY earlier rows: this event only qualifies if the
            # prefix was already complete before it.
            cond = cond & F.min(F.col(f"_q{i - 1}")).over(prior).isNotNull()
        e = e.withColumn(f"_q{i}", F.when(cond, F.col(ts_col)))
    return e.groupBy(*keys).agg(
        *[
            F.max(F.col(f"_q{i}").isNotNull().cast("int")).alias(f"s{i + 1}")
            for i in range(len(steps))
        ]
    )
