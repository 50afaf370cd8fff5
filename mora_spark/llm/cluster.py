"""Connected components over a pair graph — dedup cluster resolution.

Near-dup detection (MinHash LSH, SimHash, embedding cosine) yields
PAIRS; a training-data pipeline needs CLUSTERS (keep one doc per
component). The reference engine has no graph/iteration surface at
all (its command enum is INSERT/COMMIT, `database/command/types.go:11-14`),
so this is part of the rebuild's LLM-pipeline layer.

Algorithm: iterative min-label propagation. label(v) starts as v;
each round every vertex takes the min label over itself and its
neighbors; stop when no label changes. Rounds needed = graph
diameter, which for near-dup clusters is tiny (dup groups are
near-cliques — LSH emits most intra-group pairs directly), so this
beats the O(log n)-round star-contraction algorithms in practice
while staying a pure DataFrame loop: each round is one shuffle on the
edge key. ``localCheckpoint`` truncates the plan lineage each round
— without it the plan doubles per iteration and the driver, not the
data, becomes the bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    num_partitions: int | None = None,
) -> DataFrame:
    """Resolve the undirected graph given by (src, dst) pairs into
    components. Returns one row per vertex: (node, cluster_id) with
    cluster_id = min vertex id in the component.

    Deterministic for any edge order. Vertices only ever appear in
    ``edges``; callers wanting singletons present join the result back
    to their full id set with coalesce(cluster_id, id).
    """
    if num_partitions is None:
        # pair graphs can still be dense (near-clique corpora), so
        # default to the session's shuffle parallelism rather than a
        # small fixed count
        num_partitions = int(
            edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    e = edges.select(
        F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
    )
    # Materialize the edge list ONCE: without this every round's join
    # re-executes the upstream pair-generation pipeline (e.g. the whole
    # MinHash LSH cascade), which dominates the loop's cost. Checkpointed
    # RDDs freeze their partition count and AQE no longer coalesces them,
    # so size the loop explicitly: the pair graph is orders of magnitude
    # smaller than the corpus (num_partitions=8 default; raise for
    # billion-edge graphs).
    bidir = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .repartition(num_partitions, "a")
        .localCheckpoint(eager=True)
    )
    # seed: min over self and direct neighbors (saves one round)
    labels = (
        bidir.groupBy("a")
        .agg(F.least(F.min("b"), F.first("a")).alias("label"))
        .select(F.col("a").alias("node"), "label")
        .coalesce(num_partitions)
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr = (
            bidir.join(labels, bidir.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr, labels.node == nbr.a, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_min", F.col("label"))
                ).alias("label"),
                (F.col("nbr_min") < F.col("label")).alias("changed"),
            )
            .coalesce(num_partitions)
            .localCheckpoint(eager=True)
        )
        converged = (
            new_labels.where(F.col("changed")).limit(1).count() == 0
        )
        labels = new_labels.drop("changed")
        if converged:
            break
    return labels
