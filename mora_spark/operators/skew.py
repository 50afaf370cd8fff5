"""Skew mitigation: salted equi-join.

AQE's skew-join splitting (enabled in session defaults) handles most
hot-key cases at runtime, but only for sort-merge joins of two shuffled
sides. Salting is the explicit fallback when the planner can't help:
a replicated-dimension join where one key dominates the fact side, or
when the skewed side must stay co-partitioned for a downstream agg.

``salted_join(facts, dim, on=keys, salt=16)`` splits every hot key's
rows across ``salt`` sub-partitions (deterministic per-row hash — no
RNG, so retries and recomputations are stable) and replicates the small
side ``salt``× so each sub-partition still sees its full match set.
Replication multiplies the small side's shuffle volume: keep it for
dimension-sized rights.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys are split ``salt`` ways.

    Row-level salt comes from xxhash64 over all of the skewed side's
    columns — rows of one hot key spread uniformly, and the value is
    deterministic for a given row (safe under task retry). The small
    side is exploded ``salt``× so every (key, salt) bucket joins
    against the full small-side row set for that key.
    """
    sl = F.pmod(
        F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt)
    ).cast("int")
    l = skewed.withColumn("__salt", sl)
    r = small.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt)])),
    )
    return l.join(r, on + ["__salt"], how).drop("__salt")
