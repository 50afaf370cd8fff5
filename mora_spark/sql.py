"""SQL entry point: run ANSI SQL over the engine's tables.

``spark.sql`` is the second query surface next to the DataFrame API —
everything Catalyst gives the DataFrame plans (pushdown, pruning, join
selection, AQE) applies identically here. ``run_sql`` registers the
synthetic tables (and the derived ``candles`` view) as temp views and
executes the statement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mora_spark.datasets import candles_from_events, load_table, register_views


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Execute ``query`` with every synthetic table plus the derived
    1-minute ``candles`` table registered as temp views."""
    register_views(spark, sf_dir)
    candles_from_events(
        load_table(spark, sf_dir, "events")
    ).createOrReplaceTempView("candles")
    return spark.sql(query)
