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
    """mapInPandas decode/feature pipeline (stubbed codec) — rows-only."""
    return extract_features(_media(spark, sf_dir))


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing — rows-only."""
    return frame_sample(_media(spark, sf_dir), every_n=10)


QUERIES = {
    "q_multimodal_meta": q_multimodal_meta,
    "q_media_features": q_media_features,
    "q_frame_sample": q_frame_sample,
}

ORACLES = {
    "q_multimodal_meta": O_MULTIMODAL_META,
}
