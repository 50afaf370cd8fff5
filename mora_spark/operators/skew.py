"""Skew mitigation: hot-key-sampled salted equi-join.

AQE's skew-join splitting (enabled in session defaults) handles most
hot-key cases at runtime, but only for sort-merge joins of two shuffled
sides. Salting is the explicit fallback when the planner can't help:
a replicated-dimension join where one key dominates the fact side, or
when the skewed side must stay co-partitioned for a downstream agg.

``salted_join(facts, dim, on=keys, salt=16)`` detects the hot keys by
SAMPLING the fact side (a key-only scan; the hot set is bounded above
by ``1 / hot_share`` keys so the driver collect is O(100) rows), then
splits ONLY hot-key rows across ``salt`` sub-partitions and replicates
ONLY the hot slice of the small side ``salt``×; every other key takes
a plain equi-join and the two halves are unioned. Uniform keys
therefore pay zero replication — the dimension shuffle no longer grows
``salt``× just because one key somewhere is hot. Pass ``hot_keys``
explicitly to skip the sampling pass (e.g. when the heavy hitters are
known from a previous run), or ``hot_share=0.0``-adjacent values to
force more keys into the salted slice.

The per-row salt is a deterministic hash (no RNG), so task retries and
recomputations are stable; the sampling pass uses a fixed seed for the
same reason.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hot_key_filter(on: Sequence[str], keys: list[tuple]) -> Column:
    """Boolean column: row's join key is in the (bounded) hot set."""
    if len(on) == 1:
        return F.col(on[0]).isin([k[0] for k in keys])
    cond = F.lit(False)
    for k in keys:
        m = F.lit(True)
        for c, v in zip(on, k):
            m = m & (F.col(c) == F.lit(v))
        cond = cond | m
    return cond


def detect_hot_keys(
    df: DataFrame,
    on: Sequence[str],
    sample_fraction: float = 0.01,
    hot_share: float = 0.01,
    seed: int = 7,
) -> list[tuple]:
    """Sampled heavy-hitter detection on ``df``'s join key.

    Key-only projection → row sample → map-side-combined count: the
    shuffle carries only the sample's distinct keys, and the collect is
    bounded — at most ``1 / hot_share`` keys can each hold more than a
    ``hot_share`` fraction of the sampled rows.
    """
    samp = df.select(*on).sample(fraction=sample_fraction, seed=seed)
    counts = samp.groupBy(*on).agg(F.count(F.lit(1)).alias("__n"))
    total = counts.agg(F.sum("__n").alias("t")).collect()[0]["t"] or 0
    if total == 0:
        return []
    rows = counts.where(
        F.col("__n") >= F.lit(float(hot_share) * total)
    ).collect()
    return [tuple(r[c] for c in on) for r in rows]


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: list[str],
    salt: int = 16,
    how: str = "inner",
    hot_keys: list[tuple] | None = None,
    sample_fraction: float = 0.01,
    hot_share: float = 0.01,
) -> DataFrame:
    """Equi-join where DETECTED-hot keys are split ``salt`` ways.

    Row-level salt comes from xxhash64 over all of the skewed side's
    columns — rows of one hot key spread uniformly, and the value is
    deterministic for a given row (safe under task retry). Only the
    hot slice of the small side is exploded ``salt``×; uniform keys
    join plainly and the halves are unioned, so the output equals the
    unsalted equi-join exactly.

    ``how`` is limited to inner/left: the skewed side's rows are
    partitioned between the two halves (each row appears in exactly
    one), which preserves inner and left semantics; a right/full outer
    would emit ``salt`` copies of each unmatched replicated small row.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if hot_keys is None:
        hot_keys = detect_hot_keys(
            skewed, on, sample_fraction=sample_fraction, hot_share=hot_share
        )
    if not hot_keys:
        return skewed.join(small, on, how)

    is_hot = _hot_key_filter(on, hot_keys)
    # NULL join keys never equi-match but must survive a LEFT join:
    # route them through the plain half (coalesce keeps ~NULL truthy).
    not_hot = ~F.coalesce(is_hot, F.lit(False))

    sl = F.pmod(
        F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt)
    ).cast("int")
    l_hot = skewed.where(is_hot).withColumn("__salt", sl)
    r_hot = small.where(is_hot).withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt)])),
    )
    hot_half = l_hot.join(r_hot, on + ["__salt"], how).drop("__salt")
    plain_half = skewed.where(not_hot).join(small.where(not_hot), on, how)
    return hot_half.unionByName(plain_half)
