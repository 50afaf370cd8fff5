"""Declared-query registry — the t2 correctness contract.

Each domain module exposes ``QUERIES: dict[name, fn(spark, sf_dir) ->
DataFrame]`` and ``ORACLES: dict[name, duckdb_sql]``. ``__spark_entry__``
merges them for the driver. Column names are aliased identically on both
sides (the driver's compare sorts columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def collect_registry() -> tuple[dict[str, QueryFn], dict[str, str]]:
    from mora_spark.queries import (
        multimodal,
        relational,
        relational2,
        store,
        streaming,
        text,
        timeseries,
        vectors,
    )

    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for mod in (
        timeseries,
        relational,
        relational2,
        text,
        vectors,
        streaming,
        store,
        multimodal,
    ):
        dup = queries.keys() & mod.QUERIES.keys()
        if dup:  # a silent override would skip a correctness check
            raise ValueError(f"duplicate query names across modules: {dup}")
        if not mod.ORACLES.keys() <= mod.QUERIES.keys():
            raise ValueError(
                f"oracle without query in {mod.__name__}: "
                f"{mod.ORACLES.keys() - mod.QUERIES.keys()}"
            )
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    return queries, oracles
