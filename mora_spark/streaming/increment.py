"""Streaming incremental dedup — continuous corpus curation.

The production loop a training-data pipeline runs forever: documents
arrive in micro-batches; each batch is deduped against the persisted
LSH index of every EARLIER KEPT document (``llm.dedup.dedup_increment``
— the corpus is never re-tokenized) and within itself; the batch's
survivors are appended to the index so later batches dedup against
them. ``foreachBatch`` is the transactional boundary (the analogue of
the reference's WAL append batching, ``database/storage/wal/persist.go``):
dup pairs are materialized BEFORE the index mutates, and the index
grows batch-atomically under the streaming checkpoint.

Drop rule (exactly what the batch operators implement): a document is
a duplicate iff it near-dups any kept doc from an earlier batch
(``src='corpus'``) or any earlier doc in its own batch (``src='batch'``,
regardless of whether that earlier doc itself survived). The kept set
is therefore order-dependent by construction — which is the point:
it reproduces what sequential ingestion actually keeps.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mora_spark.datasets import load_table
from mora_spark.parallel import run_concurrent

DOC_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def docs_chunked_source(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_chunks: int = 4,
    filter_expr: str | None = None,
    chunk_expr: str = "doc_id",
) -> str:
    """Materialize documents as ``n_chunks`` parquet files (chunk k =
    rows with ``chunk_expr % n_chunks == k``, optionally restricted to
    ``filter_expr``) with increasing mtimes, so a
    ``maxFilesPerTrigger=1`` file stream replays them as deterministic
    micro-batches. Both expressions are plain SQL over ``doc_id`` so
    the chunking (unlike range chunking) is exactly reproducible in
    the DuckDB oracle. Delegates to
    :func:`mora_spark.streaming.chunked.chunked_replay_source` (the
    shared hardened machinery: coverage assert, corpus-keyed cache,
    atomic publish); the cache token names the corpus — sf_dir plus
    the corpus-defining filter."""
    from mora_spark.streaming.chunked import chunked_replay_source

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    if filter_expr is not None:
        docs = docs.where(F.expr(filter_expr))
    return chunked_replay_source(
        spark,
        docs,
        os.path.join(out_dir, "docs_source"),
        n_chunks,
        f"({chunk_expr}) % {n_chunks}",
        cache_token=f"{sf_dir}|{filter_expr}",
    )


def stream_dedup_increment(
    spark: SparkSession,
    src: str,
    work_dir: str,
    threshold: float = 0.5,
    seed_index_path: str | None = None,
) -> DataFrame:
    """Run the continuous-curation loop over a document file stream;
    returns the accumulated dup-pair table (doc_id, dup_id, jaccard,
    src). The kept corpus is the index's group membership afterwards.

    Per micro-batch: (1) dedup the batch against the loaded index +
    itself; (2) write the pairs (an action — the plan is fully
    evaluated against the PRE-append index); (3) anti-join the batch
    against its own dup ids and add the survivors' bands/groups to the
    index. foreachBatch is at-least-once, so EVERY batch write targets
    a deterministic ``batch_id=<n>`` subdirectory with mode=overwrite:
    a replay after a crash anywhere in 2-3 recomputes the same pair
    set (the index is read AS OF the earlier batches via a
    ``batch_id < current`` snapshot filter, so rows a half- or
    fully-finished step 3 left behind are invisible to the replayed
    join) and overwrites, never duplicates.
    That makes the whole sink idempotent — the streaming analogue of
    the store's WAL-before-apply + committed-only-replay discipline.

    ``work_dir``'s index is SINK-OWNED: it must start empty (first run)
    or contain only this sink's own ``batch_id=`` layout (restart). To
    dedup the stream against a PREBUILT ``save_minhash_index`` corpus,
    pass it as ``seed_index_path`` — the seed stays in its own sharded
    layout (keeping its directory-pruned joins) and is treated as an
    always-in-snapshot batch "-1": every micro-batch dedups against
    seed + earlier kept streamed docs + itself, and only streamed
    survivors are appended to the sink-owned index. Never copy a
    sharded index INTO work_dir: mixing ``shard=`` and ``batch_id=``
    subdirs under one parquet root breaks partition discovery.
    """
    from mora_spark.llm.dedup import (
        STREAM_BANDS_SCHEMA,
        STREAM_GROUPS_SCHEMA,
        build_minhash_index,
        dedup_increment,
        load_minhash_family,
        load_minhash_index,
        minhash_lsh_pairs,
        write_minhash_family,
    )

    index_path = os.path.join(work_dir, "lsh_index")
    pairs_dir = os.path.join(work_dir, "dup_pairs")
    ckpt = os.path.join(work_dir, "ckpt_dedup_incr")
    seed = (
        load_minhash_index(spark, seed_index_path)
        if seed_index_path is not None
        else None
    )
    # The banding family follows the SEED index when there is one (a
    # batch banded differently would never collide with the seed's
    # band keys — the exact silent failure dedup_increment's guard
    # exists for); an unseeded stream keeps whatever its own index
    # already carries (fixed defaults on a fresh dir). If the sink
    # already OWNS an index built with a different family, seeding is
    # refused rather than silently re-stamped: the batches would band
    # with the seed's family and never collide with the sink's own
    # prior epochs — duplicates of earlier streamed docs would all
    # come back "unique".
    own_family = load_minhash_family(index_path)
    if seed_index_path is not None:
        family = load_minhash_family(seed_index_path)
        if (
            os.path.isdir(os.path.join(index_path, "groups"))
            and own_family != family
        ):
            raise ValueError(
                f"stream_dedup_increment: seed index family {family} "
                f"conflicts with the existing sink-owned index's "
                f"family {own_family} at {index_path}; compact the "
                "old epoch with its own family (or start a fresh "
                "work_dir) instead of mixing banding families in one "
                "index"
            )
    else:
        family = own_family
    # Stamp the family onto the sink-owned index so the next epoch
    # (compaction, reseeding, ad-hoc increments) recovers it from
    # metadata instead of assuming.
    write_minhash_family(index_path, *family)

    def sink(batch: DataFrame, batch_id: int) -> None:
        batch = batch.select("doc_id", "text")
        # One tokenization of the batch for every index join, the
        # within-batch self-join, and the kept index derivation; the
        # persist lifetime is OWNED HERE (unpersisted after the writes) so
        # cached blocks do not accumulate across micro-batches.
        bands_b, groups_b = build_minhash_index(batch, band_size=family[0], n_bands=family[1])
        groups_b.persist()
        try:
            # One corpus-pair pass per index; each keeps its native
            # layout (the seed its shard/gshard pruning, the sink-owned
            # index its batch_id snapshot filter), and the within-batch
            # pairs are emitted exactly once at the end.
            parts = []
            if seed is not None:
                parts.append(
                    dedup_increment(
                        batch, seed[0], seed[1], threshold=threshold,
                        prebuilt=(groups_b, bands_b), include_intra=False,
                        index_family=family,
                    )
                )
            if os.path.isdir(os.path.join(index_path, "groups")):
                # Supply the fixed sink-owned schema when the layout IS
                # the sink's (every partition dir is batch_id=...) —
                # skipping the per-micro-batch schema-inference job; a
                # FOREIGN pre-existing index at index_path (sharded
                # save, other id types) keeps inference. The listdir
                # gate matches the local-dir assumption the isdir
                # check above already makes.
                own_layout = all(
                    n.startswith("batch_id=") or n.startswith("_")
                    for n in os.listdir(os.path.join(index_path, "groups"))
                )
                bands, groups = load_minhash_index(
                    spark,
                    index_path,
                    bands_schema=(
                        STREAM_BANDS_SCHEMA if own_layout else None
                    ),
                    groups_schema=(
                        STREAM_GROUPS_SCHEMA if own_layout else None
                    ),
                )
                # The subdir layout doubles as a snapshot filter: a
                # replayed batch must dedup against the index AS OF the
                # batches before it — without this, a crash after step
                # 3 would replay the batch against its own survivors
                # and emit spurious self/corpus pairs. Partition
                # pruning makes it free. (The seed index has no replay
                # exposure — its rows predate every micro-batch — so
                # it is always in-snapshot; same for a foreign
                # pre-existing index without the batch_id layout.)
                if "batch_id" in bands.columns:
                    bands = bands.where(F.col("batch_id") < batch_id)
                    groups = groups.where(F.col("batch_id") < batch_id)
                parts.append(
                    dedup_increment(
                        batch, bands, groups, threshold=threshold,
                        prebuilt=(groups_b, bands_b), include_intra=False,
                        index_family=family,
                    )
                )
            intra = minhash_lsh_pairs(
                batch, threshold=threshold,
                prebuilt=(groups_b, bands_b),
            ).select(
                F.col("doc_b").alias("doc_id"),
                F.col("doc_a").alias("dup_id"),
                "jaccard",
                F.lit("batch").alias("src"),
            )
            pairs = intra
            for p in parts:
                pairs = pairs.unionByName(p)
            # Eager checkpoint: the pair set is fully materialized
            # against the PRE-append index, then feeds both the result
            # sink and the kept-set anti-join without re-evaluating the
            # dedup plan (or re-reading the pair dir).
            pairs = pairs.localCheckpoint(eager=True)
            # The kept index tables derive from the BATCH tables
            # already computed (groups_b is persisted): drop the dup
            # ids from the member lists and semi-join the band rows —
            # a rebuild from the kept anti-join would re-run the batch
            # scan + tokenization + grouping a second time per
            # micro-batch (guide §2.4). Exact equivalence with
            # build_minhash_index(kept): gids/ti depend only on the
            # token set, members re-collect to the sorted kept subset,
            # groups left with no kept member drop out of the inner
            # join — identical rows to a rebuild.
            dropped = pairs.select("doc_id").distinct()
            m = (
                groups_b.select("gid", F.explode("members").alias("doc_id"))
                .join(dropped, "doc_id", "left_anti")
                .groupBy("gid")
                .agg(
                    F.sort_array(F.collect_list("doc_id")).alias("members")
                )
            )
            g = (
                groups_b.select("gid", "ti", "n")
                .join(m, "gid")
                .select("gid", "members", "ti", "n")
            )
            b = bands_b.join(g.select("gid"), "gid", "left_semi")
            # One file per batch at fixture scale; a production stream
            # would instead target the store's compaction cadence (many
            # small appends, periodic rewrite — see CandleStore.compact).
            # The three writes are independent — pairs is eagerly
            # checkpointed above, so the index writes don't re-run the
            # dedup plan — and overlapping them hides the per-action
            # driver latency that dominates small batches (guide §2.6).
            run_concurrent(
                lambda: pairs.write.mode("overwrite").parquet(
                    os.path.join(pairs_dir, f"batch_id={batch_id}")
                ),
                lambda: b.coalesce(1)
                .write.mode("overwrite")
                .parquet(
                    os.path.join(
                        index_path, "bands", f"batch_id={batch_id}"
                    )
                ),
                lambda: g.coalesce(1)
                .write.mode("overwrite")
                .parquet(
                    os.path.join(
                        index_path, "groups", f"batch_id={batch_id}"
                    )
                ),
            )
        finally:
            groups_b.unpersist()

    stream = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    from mora_spark.streaming.ingest import _state_partitions

    # Micro-batches are corpus-increments, not the whole corpus: size
    # the shuffles to the batch, not the session default.
    with _state_partitions(spark, 8):
        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # batch_id is a layout detail (partition discovery surfaces it);
    # the result contract is the four pair columns.
    return spark.read.parquet(pairs_dir).select(
        "doc_id", "dup_id", "jaccard", "src"
    )


def compact_stream_index(
    spark: SparkSession,
    work_dir: str,
    dest: str,
    seed_index_path: str | None = None,
) -> None:
    """Close the curation loop: re-shard the sink-owned streaming index
    (one ``batch_id=`` subdir per micro-batch, accumulated forever by a
    long-running stream) into the ``save_minhash_index`` layout at
    ``dest`` — band-key-sharded bands, gid-sharded groups, one file per
    shard. The compacted index is the natural SEED for the next stream
    epoch (``seed_index_path=dest``), so the production cadence is
    stream → compact → seed, mirroring ``CandleStore.compact`` for the
    store.

    If the epoch itself ran seeded, pass the SAME ``seed_index_path``
    here: the sink only appends streamed survivors to its own index,
    so the seed corpus must be folded into the compaction or the next
    epoch would forget every document older than one epoch and
    re-admit their duplicates. Seed and stream groups are merged by
    gid (an identical token set in both can only be the degenerate
    empty-token case — any non-empty match would have been dropped as
    a duplicate — but the merge unions members regardless, so the
    result is a well-formed group table either way). Group membership
    is exactly seed ∪ kept streamed docs, so searches and increments
    against the compacted index return what the two-index composition
    returns, now with directory-pruned joins."""
    from mora_spark.llm.dedup import (
        _band_table,
        load_minhash_family,
        load_minhash_index,
        save_minhash_index,
    )

    index_path = os.path.join(work_dir, "lsh_index")
    # The sink stamped its family (seed-inherited or default) onto the
    # work index; the compacted index re-bands with, and re-persists,
    # that same family — so the next epoch's seed metadata survives
    # the compaction round-trip.
    family = load_minhash_family(index_path)
    _, groups = load_minhash_index(spark, index_path)
    groups = groups.select("gid", "members", "ti", "n")
    if seed_index_path is not None:
        _, seed_groups = load_minhash_index(spark, seed_index_path)
        groups = (
            groups.unionByName(
                seed_groups.select("gid", "members", "ti", "n")
            )
            .groupBy("gid")
            .agg(
                F.sort_array(
                    F.array_distinct(F.flatten(F.collect_list("members")))
                ).alias("members"),
                F.first("ti").alias("ti"),
                F.first("n").alias("n"),
            )
        )
    save_minhash_index(
        _band_table(groups, *family), groups, dest,
        band_size=family[0], n_bands=family[1],
    )
