"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``BinaryType`` columns with a typed
metadata struct — the storage pattern for 100 TB multimodal corpora:
metadata stays queryable/prunable while payload bytes flow through
Arrow-batched ``mapInPandas`` only in the stages that need them.

The codec is RUNTIME-PROBED: when PIL is importable on the executor,
image payloads decode for real (width/height/n_frames from the codec);
otherwise — and for payloads the codec rejects — a clearly-marked
deterministic fake (payload sha256 → pseudo width/height) keeps the
pipeline shape identical. This container ships no codec libraries, so
in-container behavior is exactly the stub; on a real cluster with PIL
installed the same operator decodes real images with no code change.
The Spark-side plumbing — schemas, batch shapes, UDF signatures,
partition behavior — is real and tested either way.
"""

from __future__ import annotations

import hashlib
import io
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # runtime codec probe — absent in this container, see module doc
    from PIL import Image as _PIL_IMAGE  # type: ignore
except ImportError:  # pragma: no cover - exercised only without PIL
    _PIL_IMAGE = None

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("byte_entropy", T.DoubleType(), True),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Stand-in multimodal table: document text bytes as the payload
    (the driver ships no real media; every op below only assumes
    'opaque bytes + metadata')."""
    payload = F.encode("text", "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("sha256"),
    )


def _fake_decode(payload: bytes, kind: str) -> tuple[int, int, int]:
    """DETERMINISTIC FAKE decode — replaces PIL/ffmpeg in this
    container. Derives (width, height, n_frames) from the payload hash
    so the pipeline shape is real while the codec is absent."""
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    n_frames = 1 if kind == "image" else 1 + h[2] % 120
    return width, height, n_frames


def _decode_dims(payload: bytes, kind: str) -> tuple[int, int, int]:
    """(width, height, n_frames): the REAL codec when PIL is importable
    and the payload decodes as an image; the deterministic fake for
    everything else (no-PIL containers, audio/video kinds, payloads the
    codec rejects) — same tuple shape either way, so the downstream
    schema and partitioning never depend on which path ran."""
    if kind == "image" and _PIL_IMAGE is not None and payload:
        try:
            with _PIL_IMAGE.open(io.BytesIO(payload)) as im:
                return (
                    int(im.width),
                    int(im.height),
                    int(getattr(im, "n_frames", 1)),
                )
        except Exception:
            pass  # not a decodable image — fall through to the stub
    return _fake_decode(payload, kind)


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow batches).

    Real work per batch is vectorizable python; payload bytes never
    leave the executor. At 100 TB: repartition by size so a batch's
    payloads fit executor memory; metadata-only consumers never touch
    this path.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = [
                bytes(p) if p is not None else b"" for p in pdf["payload"]
            ]
            n = len(payloads)
            # The codec call is inherently per-item (PIL/ffmpeg decode
            # one blob at a time); everything else below is columnar.
            dims = np.array(
                [
                    _decode_dims(p, k)
                    for p, k in zip(payloads, pdf["kind"])
                ],
                dtype="int64",
            ).reshape(n, 3)
            # Byte-histogram entropy, one vectorized pass for the whole
            # Arrow batch: flatten every payload into a single buffer
            # with row offsets, 2-D bincount via row*256+byte, then a
            # masked p·log2(p) reduction per row. Peak temp memory is
            # ~9x the batch's payload bytes — batch_hint bounds it.
            lens = np.fromiter(
                (len(p) for p in payloads), dtype="int64", count=n
            )
            flat = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            row_idx = np.repeat(np.arange(n), lens)
            counts = np.bincount(
                row_idx * 256 + flat.astype(np.int64), minlength=n * 256
            ).reshape(n, 256)
            probs = counts / np.maximum(lens, 1)[:, None]
            ent = -np.where(
                probs > 0, probs * np.log2(np.where(probs > 0, probs, 1.0)), 0.0
            ).sum(axis=1)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "n_bytes": pdf["n_bytes"].to_numpy(),
                    "width": dims[:, 0],
                    "height": dims[:, 1],
                    "n_frames": dims[:, 2],
                    "byte_entropy": ent,
                }
            )

    return media.mapInPandas(decode, schema=FEATURE_SCHEMA)


# --- perceptual near-duplicate detection (dHash) ---
# The image analogue of MinHash: a difference hash over the decoded
# luminance grid pairs payloads that are *perceptually* identical
# (re-encoded, lightly edited) even when their bytes differ — exact
# sha256 dedup misses those. With a real codec the grid is the image
# resized to (cols x rows) grayscale; the in-container stand-in is the
# same DETERMINISTIC shape over raw payload bytes: cell value = mean
# byte value of the cell's byte range (exact integer arithmetic, so
# the SQL oracle replays it bit-for-bit). 9 cols x 7 rows -> 8
# column-adjacent comparisons x 7 rows = 56 bits: the classic dHash
# is 8x8=64, trimmed one row here so the hash stays strictly inside a
# signed BIGINT on both engines (bit 63 would flip the sign and
# overflow a summed assembly).

DHASH_COLS = 9
DHASH_ROWS = 7
DHASH_CELLS = DHASH_COLS * DHASH_ROWS  # 63
DHASH_BITS = (DHASH_COLS - 1) * DHASH_ROWS  # 56


def dhash_media(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(id, dhash): the 56-bit difference hash of each payload.

    Byte i of an L-byte payload lands in cell ``(i * 63) // L``; cell
    luminance is the mean byte value; bit ``r*8 + c`` is set iff
    cell (r, c+1)'s mean exceeds cell (r, c)'s — compared by integer
    cross-multiplication (``s2*c1 > s1*c2``), never by float division,
    so the hash is exactly reproducible on any engine. Arrow-batched
    mapInPandas like :func:`extract_features`; payload bytes never
    leave the executor and the output is 8 bytes/row.
    """
    bit_weights = (
        1 << np.arange(DHASH_BITS, dtype=np.int64)
    ).reshape(DHASH_ROWS, DHASH_COLS - 1)

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = np.zeros(len(pdf), dtype=np.int64)
            for n, payload in enumerate(pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                b = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                ln = len(b)
                if ln == 0:
                    continue
                cells = (np.arange(ln, dtype=np.int64) * DHASH_CELLS) // ln
                s = np.bincount(
                    cells, weights=b, minlength=DHASH_CELLS
                ).astype(np.int64)
                c = np.bincount(cells, minlength=DHASH_CELLS).astype(
                    np.int64
                )
                s2 = s.reshape(DHASH_ROWS, DHASH_COLS)
                c2 = c.reshape(DHASH_ROWS, DHASH_COLS)
                bits = (
                    s2[:, 1:] * c2[:, :-1] > s2[:, :-1] * c2[:, 1:]
                )
                hashes[n] = int((bits * bit_weights).sum())
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "dhash": hashes}
            )

    return media.select(id_col, payload_col).mapInPandas(
        part, f"{id_col} long, dhash long"
    )


def media_neardup_pairs(
    media: DataFrame,
    max_hamming: int = 2,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Perceptual near-dup pairs: all (id_a < id_b) whose dHashes
    differ in <= ``max_hamming`` bits.

    The lossless pigeonhole banding shared with the text-side SimHash
    search (:func:`mora_spark.llm.hamming.banded_hamming_pairs`), over
    the 56-bit hash. Never all-pairs; the join input is 8 bytes of
    signature per payload, not the payload."""
    from mora_spark.llm.hamming import banded_hamming_pairs

    return banded_hamming_pairs(
        dhash_media(media, id_col, payload_col),
        sig_col="dhash",
        n_bits=DHASH_BITS,
        max_hamming=max_hamming,
    )


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling plumbing for video payloads: exploded (media_id,
    frame_no) rows via the fake frame count. With a real codec the
    payload slice per frame would ride along as binary."""
    feats = extract_features(media.where(F.col("kind") == "video"))
    return feats.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0), F.col("n_frames") - 1, F.lit(every_n)
            )
        ).alias("frame_no"),
    )


def media_cluster_best(
    media: DataFrame,
    max_hamming: int = 2,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Cluster-level perceptual dedup — the media twin of the text
    pipeline's quality-canonical selection (``queries/text.py::
    q_cluster_best``) and the embedding pipeline's
    ``llm/semdedup.py``: connected components over the
    :func:`media_neardup_pairs` graph, keeping ONE canonical member
    per cluster. Returns (cluster_id, keep_media_id, best_quality,
    cluster_size); cluster_id is the component's min member id.

    Quality is the payload byte size — the deterministic,
    payload-intrinsic proxy (bigger original beats a truncated or
    re-encoded copy; a real deployment would swap in a decoder-side
    signal like resolution or the ``extract_features`` entropy, same
    plan). The winner is one max(struct(quality, -id)) aggregation —
    map-side combinable, so a giant boilerplate cluster never funnels
    through a single sort partition. Semantics are
    blocking-independent (components of the exact Hamming pair graph),
    so the DuckDB oracle replays it exactly via recursive label
    propagation."""
    from mora_spark.llm.cluster import connected_components

    pairs = media_neardup_pairs(
        media, max_hamming=max_hamming, id_col=id_col,
        payload_col=payload_col,
    )
    cc = connected_components(pairs, src="id_a", dst="id_b")
    q = media.select(
        F.col(id_col).alias("node"),
        F.length(F.col(payload_col)).cast("long").alias("q"),
    )
    j = cc.join(q, "node")
    best = j.groupBy("label").agg(
        F.count(F.lit(1)).alias("cluster_size"),
        F.max(F.struct(F.col("q"), (-F.col("node")).alias("nid"))).alias(
            "w"
        ),
    )
    return best.select(
        F.col("label").alias("cluster_id"),
        (-F.col("w.nid")).cast("long").alias("keep_media_id"),
        F.col("w.q").alias("best_quality"),
        "cluster_size",
    )
