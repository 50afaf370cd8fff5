"""Embedding-space semantic deduplication (SemDeDup-shape).

Token-space dedup (MinHash / SimHash) misses paraphrases and
translations that land near each other in embedding space; semantic
dedup clusters the corpus by embedding cosine and keeps ONE canonical
member per cluster (Abbas et al., "SemDeDup: Data-efficient learning
at web-scale through semantic deduplication", arXiv 2023 — there the
blocking is k-means cells; here it is the already-verified band-OR SRP
LSH, the same blocking q_embed_neardup measures at recall 1.0 on this
corpus). The reference engine has no vector surface at all (its
command enum is INSERT/COMMIT, `database/command/types.go:11-14`);
this is part of the rebuild's LLM-pipeline layer.

Semantics are BLOCKING-INDEPENDENT by construction: clusters are the
connected components of the exact pair graph {(a, b): round(cos, 6)
>= threshold}, so any blocking with full recall on that graph (bands
here, IVF cells at larger scale) yields the identical answer — which
is what makes the operator exactly oracle-able (DuckDB replays the
brute-force pair graph plus a recursive-CTE label propagation).

Scale shape: pairs come from the banded equi-join (never all-pairs),
components from the contracted min-label loop, and the canonical pick
is one max(struct) aggregation — map-side combinable, so a giant
boilerplate cluster never funnels through a single sort partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mora_spark.functions.vectors import l2_norm
from mora_spark.llm.cluster import connected_components
from mora_spark.llm.simsearch import embedding_neardup_pairs


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_bits: int | None = None,
    n_bands: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quality: DataFrame | None = None,
    quality_col: str = "quality",
) -> DataFrame:
    """One row per semantic near-dup cluster:
    (cluster_id, keep_id, best_quality, cluster_size).

    ``n_bits=None`` (default) sizes the SRP band width to the corpus
    count (``simsearch.derive_srp_bits``: ~log2(n) - 4, floored at the
    old fixed default 8) — candidate volume at a fixed width grows
    ~n²/2^n_bits, so the fixed default was scale-unsafe past ~50k
    vectors (361.6 s vs 37.6 s at the 40x probe, identical answer).
    ``n_bands=None`` (default) sizes the band count to hold the recall
    envelope AT the derived width (``simsearch.derive_srp_bands``,
    floored at the old fixed 16) — a fixed band count would silently
    lose recall as the derived width grows, breaking the
    width-independence the next paragraph promises. The result is
    unchanged whenever the banded pass holds full recall on the pair
    graph — which the derivation targets (>= 0.99 at the threshold
    boundary, strictly better above it) but approximates rather than
    guarantees per-pair; explicit ints remain exact overrides, the
    ``chunk=None`` contract of ``curation.pack_sequences``.

    ``cluster_id`` is the component's min member id; ``keep_id`` the
    quality-canonical member (max quality, ties to the smaller id —
    the q_cluster_best max(struct) discipline). ``quality`` is an
    optional frame carrying (id_col, quality_col) — the column is
    selected BY NAME and must exist (extra columns are ignored, a
    missing one raises instead of silently ranking by the wrong
    signal), and the join is LEFT: a clustered id absent from the
    quality frame keeps its cluster membership with NULL quality,
    ranking below every scored member (ties by smaller id) rather
    than vanishing from the cluster size. By default the vector's L2
    norm (rounded to 6 dp on both engines) stands in — a
    deterministic, embedding-intrinsic proxy so the operator needs no
    side table. Docs outside any cluster (no pair at the threshold)
    are untouched by definition and not emitted; the caller's
    keep-set is ``all ids - (cluster members - keep ids)``.
    """
    pairs = embedding_neardup_pairs(
        embeddings,
        threshold=threshold,
        n_bits=n_bits,
        n_bands=n_bands,
        id_col=id_col,
        vec_col=vec_col,
    )
    cc = connected_components(pairs, src="id_a", dst="id_b")
    if quality is None:
        q = embeddings.select(
            F.col(id_col).alias("node"),
            F.round(l2_norm(F.col(vec_col)), 6).alias("q"),
        )
    else:
        for col in (id_col, quality_col):
            if col not in quality.columns:
                raise ValueError(
                    f"quality frame has no column {col!r} "
                    f"(columns: {quality.columns})"
                )
        # Collapse duplicate ids to their max quality: a duplicated id
        # would otherwise fan out the cc join, inflating cluster_size
        # and potentially shifting keep_id. max() is deterministic and
        # map-side combinable; one quality row per id is the contract.
        q = (
            quality.select(
                F.col(id_col).alias("node"),
                F.col(quality_col).alias("q"),
            )
            .groupBy("node")
            .agg(F.max("q").alias("q"))
        )
    # LEFT join: an id missing from the quality frame stays a cluster
    # member with NULL quality (NULL struct fields sort below every
    # scored member under max(), ties by smaller id) — dropping it
    # would silently shrink cluster_size and could erase a cluster.
    j = cc.join(q, "node", "left")
    best = j.groupBy("label").agg(
        F.count(F.lit(1)).alias("cluster_size"),
        F.max(F.struct(F.col("q"), (-F.col("node")).alias("nid"))).alias(
            "w"
        ),
    )
    return best.select(
        F.col("label").alias("cluster_id"),
        (-F.col("w.nid")).cast("long").alias("keep_id"),
        F.col("w.q").alias("best_quality"),
        "cluster_size",
    )
