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


def validate_candles(df):
    """One-pass data-quality report for a candle batch: counts of rows
    violating the reference's structural rules — key-column nulls,
    market/code over the byte caps (``page/constant.go:10-11``), the
    reserved year-0 sentinel (``page/index.go:30-32``), non-positive
    bar length, and OHLC range inversions (high < low). Returns a
    single-row DataFrame; a sum of 0 across columns means the batch is
    clean. Reporting, not enforcement — mirrors how the reference only
    rejects what would corrupt a page.
    """
    from pyspark.sql import functions as F

    def n(cond, name):
        return F.sum(F.when(cond, 1).otherwise(0)).alias(name)

    key_null = (
        F.col("market").isNull()
        | F.col("code").isNull()
        | F.col("candle_length").isNull()
        | F.col("ts").isNull()
    )
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        n(key_null, "null_key"),
        n(F.octet_length("market") > MARKET_MAX_LEN, "market_too_long"),
        n(F.octet_length("code") > CODE_MAX_LEN, "code_too_long"),
        n(F.year("ts") == 0, "year_zero_sentinel"),
        n(F.col("candle_length") <= 0, "bad_length"),
        n(F.col("high") < F.col("low"), "inverted_ohlc"),
    )
