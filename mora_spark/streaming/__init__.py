"""Structured Streaming ingestion: the reference's WAL/commit pipeline
re-expressed as micro-batch streams with checkpoint recovery."""

from mora_spark.streaming.chunked import chunked_replay_source
from mora_spark.streaming.pairdedup import (
    compact_epoch_index,
    dedup_pairs_batch,
)
from mora_spark.streaming.semdedup import (
    dedup_embed_batch,
    stream_semantic_dedup,
)
from mora_spark.streaming.increment import (
    compact_stream_index,
    docs_chunked_source,
    stream_dedup_increment,
)
from mora_spark.streaming.ingest import (
    chunked_source,
    ordered_chunked_source,
    stream_candles,
    stream_dedup_ingest,
    stream_drawdown,
    stream_ema,
    stream_enrich,
    stream_sliding,
    stream_sessions,
    stream_store_asof,
    stream_store_merge,
    stream_stream_join,
)

__all__ = [
    "chunked_replay_source",
    "chunked_source",
    "compact_epoch_index",
    "dedup_embed_batch",
    "dedup_pairs_batch",
    "docs_chunked_source",
    "compact_stream_index",
    "stream_dedup_increment",
    "stream_semantic_dedup",
    "ordered_chunked_source",
    "stream_candles",
    "stream_dedup_ingest",
    "stream_drawdown",
    "stream_ema",
    "stream_enrich",
    "stream_sliding",
    "stream_sessions",
    "stream_store_asof",
    "stream_store_merge",
    "stream_stream_join",
]
