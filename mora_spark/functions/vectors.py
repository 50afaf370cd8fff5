"""Vector math over ``array<float>`` embedding columns.

All built-in higher-order functions (``zip_with`` + ``aggregate``), JVM
vectorized — no UDFs. Elements are cast to double before arithmetic so
Spark and the DuckDB oracle (which computes in double) agree to float
rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ with left-to-right accumulation (matches DuckDB
    list_dot_product element order)."""
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def l2_dist(a: Column, b: Column) -> Column:
    diff = F.zip_with(
        as_double(a), as_double(b), lambda x, y: (x - y) * (x - y)
    )
    return F.sqrt(F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x))
