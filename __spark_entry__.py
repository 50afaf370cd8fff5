"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Query implementations live in ``mora_spark/queries/`` (one module per
domain); this file just merges the registries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the full ingest→candle aggregation (the Spark rendition of the
    reference's INSERT surface) on the smoke-scale events table.
    """
    from mora_spark.datasets import candles_from_events, load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    return candles_from_events(events)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from mora_spark.queries import collect_registry

    return collect_registry()[0]


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (omitted ⇒ rows-only check)."""
    from mora_spark.queries import collect_registry

    return collect_registry()[1]
