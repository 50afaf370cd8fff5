"""Streaming perceptual dedup for multimodal payloads.

The media twin of ``streaming/increment.py``'s continuous text
curation: media payloads ARRIVE as a stream, each micro-batch is
deduped perceptually (dHash Hamming distance, the
``llm/multimodal.py`` operator) against the persisted signature index
of earlier KEPT media plus itself, and only survivors' signatures
grow the index. The reference engine has no streaming or media
surface at all (command enum INSERT/COMMIT,
`database/command/types.go:11-14`); this composes two already-verified
rebuild layers.

Index contents are 8-byte signatures — never payloads — so the
per-batch state the sink re-reads is ~16 bytes/kept-item however large
the media bytes are. Signatures are re-banded on read (3 bit-ops per
row, scan-stage); a deployment with billions of kept items would
persist the band chunks as index columns and band-partition the
layout like the MinHash index — same plan shape, noted not needed at
this scale.

Replay-idempotence follows the increment sink's WAL discipline: every
write (pairs AND index) targets its own deterministic
``batch_id=<n>`` directory with mode=overwrite, and each batch joins
the index through a ``batch_id < current`` snapshot filter, so a
crashed-and-replayed micro-batch recomputes the same answer against
the same snapshot and overwrites, never duplicates.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from mora_spark.llm.hamming import banded_hamming_pairs
from mora_spark.llm.multimodal import DHASH_BITS, dhash_media
from mora_spark.streaming.pairdedup import dedup_pairs_batch


def media_chunked_source(
    spark: SparkSession,
    media: DataFrame,
    out_dir: str,
    n_chunks: int,
    chunk_expr: str,
    cache_token: str | None = None,
) -> str:
    """Materialize a media frame (media_id, payload) as ``n_chunks``
    parquet files (chunk k = rows with ``chunk_expr == k``) with
    increasing mtimes, so a ``maxFilesPerTrigger=1`` file stream
    replays them as deterministic micro-batches. ``chunk_expr`` is
    plain SQL over media_id so the chunking is exactly reproducible in
    the oracle. Delegates to
    :func:`mora_spark.streaming.chunked.chunked_replay_source` (the
    shared hardened machinery: coverage assert, atomic publish);
    callers wanting cache reuse MUST pass a ``cache_token`` naming the
    corpus — keying by chunk params alone would let two different
    media frames hit the same cached source."""
    from mora_spark.streaming.chunked import chunked_replay_source

    return chunked_replay_source(
        spark,
        media.select("media_id", "payload"),
        out_dir,
        n_chunks,
        chunk_expr,
        cache_token=cache_token,
    )


def stream_media_dedup(
    spark: SparkSession,
    src: str,
    work_dir: str,
    max_hamming: int = 2,
) -> DataFrame:
    """Run the continuous perceptual-dedup loop over a media file
    stream; returns the accumulated dup-pair table
    (media_id, dup_id, hamming, src).

    Per micro-batch: (1) dHash the batch's payloads; (2) emit dup
    pairs — same-batch pairs as src='batch' (the later id is the dup)
    and pairs against earlier kept signatures as src='corpus' (the
    batch side is the dup, either id orientation); (3) survivors
    (batch items pairing with nothing earlier or smaller) append
    their signatures to the index under the batch's own epoch. The
    drop rule matches the text sink's greedy replay exactly, so the
    oracle unrolls per-batch CTEs over the same dHash SQL."""
    index_dir = os.path.join(work_dir, "sig_index")
    pairs_dir = os.path.join(work_dir, "dup_pairs")
    ckpt = os.path.join(work_dir, "ckpt_media_dedup")

    def sink(batch: DataFrame, batch_id: int) -> None:
        dedup_media_batch(
            spark, batch, batch_id, index_dir, pairs_dir, max_hamming
        )

    schema = "media_id long, payload binary"
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(pairs_dir).select(
        "media_id", "dup_id", "hamming", "src"
    )


def dedup_media_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    index_dir: str,
    pairs_dir: str,
    max_hamming: int = 2,
) -> None:
    """One micro-batch step of :func:`stream_media_dedup` — exposed so
    the replay-idempotence contract is directly testable: re-invoking
    a batch (foreachBatch is at-least-once) recomputes the same answer
    against the same ``batch_id < current`` index snapshot and
    overwrites its own epoch directories, never duplicating.

    The intra-batch drop rule is ORDER-GREEDY, not component-greedy
    (matching the text sink, ``streaming/increment.py``): a batch item
    pairing with an EARLIER batchmate is dropped even if that batchmate
    was itself dropped against the corpus index — so the kept set is
    "items pairing with nothing earlier", NOT "survivors of a greedy
    replay over kept items only". A consumer reconstructing kept media
    from the pairs table must apply the same rule.

    The transactional step is the shared pair-dedup core
    (``streaming/pairdedup.py``) with the banded-Hamming pair pass as
    the pair function; only the dHash state projection lives here."""
    dedup_pairs_batch(
        spark,
        dhash_media(batch).select("media_id", "dhash"),
        batch_id,
        index_dir,
        pairs_dir,
        pair_fn=lambda sigs: banded_hamming_pairs(
            sigs,
            sig_col="dhash",
            n_bits=DHASH_BITS,
            max_hamming=max_hamming,
        ),
        id_col="media_id",
        score_col="hamming",
    )
