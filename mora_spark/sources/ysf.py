"""`.ysf` page-file source/sink — the migration path from reference mora
storage into this engine (SURVEY §4-4, optional milestone).

The format is re-derived from the reference's documented layout, not a
code port; every constant below cites where the reference defines it:

- **Header, 60 B** (``page/header.go:25-106``, ``page/constant.go:5``):
  magic ``20 18 10 29`` | version u16 LE = 1 | year u16 | candle_length
  u32 | count u32 | start_offset u32 | end_offset u32 | last_tx_id u64 |
  market 10 B null-padded (``page/constant.go:10``) | code 18 B
  null-padded (``page/constant.go:11``). All little-endian.
- **Index, 1,488 B** = 372 × u32 LE (``page/constant.go:3-9``):
  cumulative daily candle counts — entry *d* = number of candles
  strictly before day *d* of the year (``page/index.go:11-17``); writer
  pads unused tail entries with ``count`` (``page/header.go:95-103``).
- **Body, 48 B/candle** (``page/body.go:36-80``): ts_offset u32 LE
  (seconds since Jan 1 UTC of the page's year, ``common/time.go:16-24``),
  bit_fields u32 **big-endian** (the format's one BE field), then
  O/H/L/C/V as 5 × f64 LE.
- **Path** ``{root}/{market}/{length}/{code}/{year:05d}.ysf``
  (``database/storage/disk/resolver.go:15-17``).

Spark-side: the reader is ``binaryFile`` + Arrow-batched ``mapInPandas``
with a vectorized numpy struct decode — one page file per input row, no
per-candle Python. Decode parallelism = number of page files, which is
exactly the reference's own storage grid (market × length × code ×
year), so a 100 TB migration fans out to one task per ~24 MB page.
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mora_spark.schema import CANDLE_COLUMNS, CANDLE_SCHEMA

MAGIC = bytes((0x20, 0x18, 0x10, 0x29))
HEADER_SIZE = 60
INDEX_ENTRIES = 372  # 31 rows x 12 cols of u32 (page/constant.go:3-9)
DATA_OFFSET = HEADER_SIZE + 4 * INDEX_ENTRIES
BLOCK_WIDTH = 48
MARKET_LEN = 10
CODE_LEN = 18

# One vectorized view of the 48-byte body block (page/body.go:46-52).
BODY_DTYPE = np.dtype(
    [
        ("ts_offset", "<u4"),
        ("bit_fields", ">u4"),
        ("open", "<f8"),
        ("high", "<f8"),
        ("low", "<f8"),
        ("close", "<f8"),
        ("volume", "<f8"),
    ]
)


def _year_start_epoch(year: int) -> int:
    return int(pd.Timestamp(year=year, month=1, day=1, tz="UTC").timestamp())


def decode_page(buf: bytes) -> pd.DataFrame:
    """One `.ysf` page → pandas frame in the canonical candle schema."""
    if buf[:4] != MAGIC:
        raise ValueError("invalid .ysf page: bad magic")
    (version, year, candle_length, count) = struct.unpack_from("<HHII", buf, 4)
    if version != 1:
        raise ValueError(f"unsupported .ysf version {version}")
    market = buf[32:42].split(b"\x00", 1)[0].decode()
    code = buf[42:60].split(b"\x00", 1)[0].decode()

    body = np.frombuffer(buf, dtype=BODY_DTYPE, count=count, offset=DATA_OFFSET)
    ts = _year_start_epoch(year) + body["ts_offset"].astype("int64")
    return pd.DataFrame(
        {
            "market": market,
            "code": code,
            "candle_length": np.int32(candle_length),
            "ts": pd.to_datetime(ts, unit="s"),
            "open": body["open"],
            "high": body["high"],
            "low": body["low"],
            "close": body["close"],
            "volume": body["volume"],
            "bit_fields": body["bit_fields"].astype("int64"),
        }
    )


def encode_page(
    market: str,
    code: str,
    candle_length: int,
    year: int,
    pdf: pd.DataFrame,
    last_tx_id: int = 0,
) -> bytes:
    """Canonical candle rows (one series-year) → `.ysf` page bytes.

    Rows are sorted and deduped on ts (last wins) — the invariant the
    reference's merge maintains (``page/page.go:95-142``).
    """
    if len(market.encode()) > MARKET_LEN or len(code.encode()) > CODE_LEN:
        raise ValueError("market/code exceeds .ysf field width")
    pdf = pdf.sort_values("ts").drop_duplicates("ts", keep="last")
    epoch = pdf["ts"].astype("datetime64[ns]").astype("int64") // 10**9
    offsets = (epoch - _year_start_epoch(year)).to_numpy()
    if len(offsets) and (offsets.min() < 0 or offsets.max() >= 366 * 86400):
        raise ValueError("candle outside page year")

    body = np.empty(len(pdf), dtype=BODY_DTYPE)
    body["ts_offset"] = offsets
    body["bit_fields"] = pdf["bit_fields"].to_numpy()
    for col in ("open", "high", "low", "close", "volume"):
        body[col] = pdf[col].to_numpy(dtype="float64")

    count = len(pdf)
    header = bytearray(HEADER_SIZE)
    header[0:4] = MAGIC
    struct.pack_into(
        "<HHIIIIQ",
        header,
        4,
        1,
        year,
        candle_length,
        count,
        int(offsets[0]) if count else 0,
        int(offsets[-1]) if count else 0,
        last_tx_id,
    )
    header[32:42] = market.encode().ljust(MARKET_LEN, b"\x00")
    header[42:60] = code.encode().ljust(CODE_LEN, b"\x00")

    # Cumulative daily index: entry d = candles strictly before day d;
    # tail entries past day 365 pad with count (page/header.go:95-103).
    days = offsets // 86400
    per_day = np.bincount(days, minlength=INDEX_ENTRIES)[:INDEX_ENTRIES]
    index = np.zeros(INDEX_ENTRIES, dtype="<u4")
    index[1:] = np.cumsum(per_day)[:-1]

    return bytes(header) + index.tobytes() + body.tobytes()


def read_ysf(spark: SparkSession, root: str) -> DataFrame:
    """Distributed `.ysf` import: every page file under ``root`` →
    one canonical candles DataFrame.

    Series identity comes from the page header (authoritative,
    ``page/header.go:37-44``), not the directory path.
    """
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.ysf")
        .option("recursiveFileLookup", "true")
        .load(root)
        .select("content")
    )

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            for buf in batch["content"]:
                yield decode_page(bytes(buf))

    return files.mapInPandas(unpack, schema=CANDLE_SCHEMA)


def write_ysf(candles: DataFrame, root: str) -> DataFrame:
    """Distributed `.ysf` export: one page file per (market, length,
    code, year) group, laid out exactly like the reference
    (``database/storage/disk/resolver.go:15-17``).

    ``root`` must be a filesystem every executor can reach (true in
    local mode and on any shared/NFS or fuse-mounted store). Returns a
    manifest DataFrame (path, n_candles) — also the action that drives
    the write.
    """
    out_schema = T.StructType(
        [
            T.StructField("path", T.StringType(), False),
            T.StructField("n_candles", T.LongType(), False),
        ]
    )

    def write_group(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        market, code, length, year = key
        buf = encode_page(market, code, int(length), int(year), pdf)
        d = os.path.join(root, market, str(int(length)), code)
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"{int(year):05d}.ysf")
        with open(path, "wb") as f:
            f.write(buf)
        return pd.DataFrame({"path": [path], "n_candles": [len(pdf)]})

    keyed = candles.withColumn("year", F.year("ts"))
    return keyed.groupBy(
        "market", "code", "candle_length", "year"
    ).applyInPandas(write_group, schema=out_schema)
