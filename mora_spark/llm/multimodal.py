"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``BinaryType`` columns with a typed
metadata struct — the storage pattern for 100 TB multimodal corpora:
metadata stays queryable/prunable while payload bytes flow through
Arrow-batched ``mapInPandas`` only in the stages that need them.

The container has no codec libraries, so the actual decode is STUBBED:
``decode_image_meta`` uses a clearly-marked deterministic fake (payload
sha256 → pseudo width/height). The Spark-side plumbing — schemas,
batch shapes, UDF signatures, partition behavior — is real and tested;
swap ``_fake_decode`` for PIL/ffmpeg in a full container.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow batches).

    Real work per batch is vectorizable python; payload bytes never
    leave the executor. At 100 TB: repartition by size so a batch's
    payloads fit executor memory; metadata-only consumers never touch
    this path.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, kind, payload, n_bytes in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["n_bytes"]
            ):
                data = bytes(payload) if payload is not None else b""
                w, h, nf = _fake_decode(data, kind)
                # byte histogram entropy — a real, cheap content feature
                counts = pd.Series(list(data)).value_counts()
                p = counts / max(1, len(data))
                import numpy as np

                entropy = float(-(p * np.log2(p)).sum()) if len(data) else 0.0
                rows.append((media_id, kind, n_bytes, w, h, nf, entropy))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "n_bytes", "width", "height",
                    "n_frames", "byte_entropy",
                ],
            )

    return media.mapInPandas(decode, schema=FEATURE_SCHEMA)


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
