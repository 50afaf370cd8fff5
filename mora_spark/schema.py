"""Schemas and key constants for the candle data model.

Mirrors the reference's fixed Go-struct schema (``common/candle.go:27-39``)
and series key (``page/index.go:19-28``): a candle is identified by
``(market, code, candle_length, ts)`` and stored partitioned by
``(market, candle_length, code, year)`` — the Spark rendition of mora's
one-file-per-(set, year) layout (``database/storage/disk/resolver.go:15-17``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Natural key of a candle row (reference: page/index.go:19-23 + ts).
CANDLE_KEY = ["market", "code", "candle_length", "ts"]

# Partition columns for the persistent store. Order mirrors the reference
# path layout {market}/{length}/{code}/{year} (disk/resolver.go:15-17);
# `year` is derived from ts like CandleList.SplitByYear
# (common/candle.go:70-80).
CANDLE_PARTITIONS = ["market", "candle_length", "code", "year"]

# Reference string-length caps (page/constant.go:10-11). Not enforced as
# hard errors — validate_candles() reports violations.
MARKET_MAX_LEN = 10
CODE_MAX_LEN = 18

CANDLE_SCHEMA = T.StructType(
    [
        T.StructField("market", T.StringType(), False),
        T.StructField("code", T.StringType(), False),
        # Bar interval in seconds (uint32 in the reference; the demo uses
        # 60 = 1-minute bars, main.go:43-47).
        T.StructField("candle_length", T.IntegerType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("open", T.DoubleType(), True),
        T.StructField("high", T.DoubleType(), True),
        T.StructField("low", T.DoubleType(), True),
        T.StructField("close", T.DoubleType(), True),
        T.StructField("volume", T.DoubleType(), True),
        # uint32 in the reference (common/candle.go:33); BIGINT holds it
        # losslessly without sign issues.
        T.StructField("bit_fields", T.LongType(), True),
    ]
)

CANDLE_COLUMNS = [f.name for f in CANDLE_SCHEMA.fields]

OHLCV = ["open", "high", "low", "close", "volume"]

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDING_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)
