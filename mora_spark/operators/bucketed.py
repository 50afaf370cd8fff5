"""Bucketed (co-located) tables: shuffle-free joins at 100 TB.

The biggest single cost of a fact-fact join at scale is shuffling both
sides on the join key. Hive-style bucketing pre-partitions the DATA ON
DISK by hash(key) % n_buckets, so two tables bucketed the same way join
bucket-to-bucket with ZERO exchange: Spark's bucketed scan exposes the
on-disk hash partitioning to the planner and the sort-merge join reads
co-located buckets directly (plus, with ``sortBy`` on the key, no sort
either). This is the storage-side dual of ``broadcast()`` — broadcast
kills the shuffle for small dims, bucketing kills it for big-big joins
that repeat across workloads (the reference's fixed
market/length/code/year page grid is the same idea applied to scans:
``disk/resolver.go:15-17``; bucketing extends it to JOIN keys).

``save_bucketed`` writes an external parquet table (explicit path,
catalog entry for the bucket spec — the spec lives in the catalog, not
the files, which is why plain ``spark.read.parquet`` of the same files
would NOT get the shuffle-free plan). ``n_buckets`` sizes one bucket's
rows to a comfortable task (~100-500 MB at the target scale); both
sides of a co-located join must agree on it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def save_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """Persist ``df`` as an external bucketed parquet table and return
    the catalog-backed handle (reading via ``spark.table`` is what
    carries the bucket spec into the plan)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(name)
    return spark.table(name)


def _walk_plan(node, out: list[str]) -> None:
    cls = node.getClass().getSimpleName()
    out.append(cls)
    if cls == "AdaptiveSparkPlanExec":
        # AQE root is a leaf node wrapping the current physical plan;
        # walking it (not the initial plan string) is what keeps this
        # count honest after runtime re-planning.
        _walk_plan(node.executedPlan(), out)
        return
    if cls.endswith("QueryStageExec"):
        # Materialized AQE stages wrap their shuffle/broadcast in
        # .plan(); children() is empty (they are leaves).
        _walk_plan(node.plan(), out)
        return
    if cls == "ReusedExchangeExec":
        # Reuses the output of an exchange counted at its original
        # site — no additional shuffle happens here.
        return
    ch = node.children()
    for i in range(ch.length()):
        _walk_plan(ch.apply(i), out)


def exchanges_in_plan(df: DataFrame) -> int:
    """Number of SHUFFLE Exchange operators in the executed plan — the
    evidence surface for co-located joins (0 expected between two
    same-spec bucketed scans). Counts ``ShuffleExchangeExec`` plan
    NODES via a tree walk (not substring matching, which would
    miscount ReusedExchange and, under AQE, the retained initial-plan
    section of the plan string). BroadcastExchange is not a shuffle
    and is excluded (a broadcast moves one small side once; the
    shuffle a bucketed layout eliminates repartitions BOTH sides)."""
    nodes: list[str] = []
    _walk_plan(df._jdf.queryExecution().executedPlan(), nodes)
    return sum(1 for c in nodes if c == "ShuffleExchangeExec")
