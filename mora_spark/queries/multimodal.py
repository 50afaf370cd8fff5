"""Multimodal declared queries. Metadata extraction is oracle-checked;
the decode/feature/frame paths are pandas-UDF pipelines whose codec is
stubbed (no image/audio libs in this container) → rows-only checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mora_spark.datasets import load_table
from mora_spark.llm.multimodal import (
    extract_features,
    frame_sample,
    media_from_documents,
)


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_from_documents(load_table(spark, sf_dir, "documents"))


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque binary payloads (no decode)."""
    return _media(spark, sf_dir).select(
        "media_id", "kind", "n_bytes", "sha256"
    )


O_MULTIMODAL_META = """
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS kind,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS sha256
FROM documents
"""


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode/feature pipeline. The stub codec derives
    dimensions from sha256(payload), which DuckDB can replicate — so
    the whole Arrow-batched pipeline is oracle-checked end-to-end.
    (byte_entropy stays an engine-only feature column: byte-histogram
    SQL isn't worth the oracle's while; determinism is covered by
    tests/test_simsearch.py.)"""
    return extract_features(_media(spark, sf_dir)).select(
        "media_id", "kind", "n_bytes", "width", "height", "n_frames"
    )


# sha256-hex byte k (0-based) as int: CAST('0x'||substr(hex,2k+1,2) AS INT)
_MEDIA_CTE = """
WITH m AS (
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS kind,
         octet_length(encode(text)) AS n_bytes,
         sha256(text) AS h
  FROM documents
), f AS (
  SELECT media_id, kind, n_bytes,
         64 + CAST(('0x' || substr(h, 1, 2)) AS INT) % 192 AS width,
         64 + CAST(('0x' || substr(h, 3, 2)) AS INT) % 192 AS height,
         CASE WHEN kind = 'image' THEN 1
              ELSE 1 + CAST(('0x' || substr(h, 5, 2)) AS INT) % 120
         END AS n_frames
  FROM m
)
"""

O_MEDIA_FEATURES = _MEDIA_CTE + """
SELECT media_id, kind, n_bytes, width, height, n_frames FROM f
"""


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing (explode every 10th frame)."""
    return frame_sample(_media(spark, sf_dir), every_n=10)


O_FRAME_SAMPLE = _MEDIA_CTE + """
SELECT media_id,
       unnest(range(0, n_frames, 10)) AS frame_no
FROM f WHERE kind = 'video'
"""


QUERIES = {
    "q_multimodal_meta": q_multimodal_meta,
    "q_media_features": q_media_features,
    "q_frame_sample": q_frame_sample,
}

ORACLES = {
    "q_multimodal_meta": O_MULTIMODAL_META,
    "q_media_features": O_MEDIA_FEATURES,
    "q_frame_sample": O_FRAME_SAMPLE,
}
