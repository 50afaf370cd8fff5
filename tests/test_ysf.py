"""`.ysf` page codec: byte-layout assertions + distributed round-trip."""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

from mora_spark.datasets import candles_from_events, load_table
from mora_spark.sources.ysf import (
    BLOCK_WIDTH,
    DATA_OFFSET,
    MAGIC,
    decode_page,
    encode_page,
    read_ysf,
    write_ysf,
)


def _pdf():
    ts = pd.to_datetime(
        ["2021-01-01 00:00:00", "2021-01-01 00:01:00", "2021-03-05 12:00:00"]
    )
    return pd.DataFrame(
        {
            "ts": ts,
            "open": [1.0, 2.0, 3.0],
            "high": [1.5, 2.5, 3.5],
            "low": [0.5, 1.5, 2.5],
            "close": [1.2, 2.2, 3.2],
            "volume": [10.0, 20.0, 30.0],
            "bit_fields": [7, 0, 2**31],
        }
    )


def test_page_byte_layout():
    buf = encode_page("NASD", "AAPL", 60, 2021, _pdf(), last_tx_id=42)
    assert buf[:4] == MAGIC
    version, year, length, count, start_off, end_off, tx = struct.unpack_from(
        "<HHIIIIQ", buf, 4
    )
    assert (version, year, length, count, tx) == (1, 2021, 60, 3, 42)
    assert start_off == 0
    # 2021-03-05 12:00 UTC is day 63 of 2021
    assert end_off == 63 * 86400 + 12 * 3600
    assert buf[32:42] == b"NASD" + b"\x00" * 6
    assert buf[42:60] == b"AAPL" + b"\x00" * 14
    assert len(buf) == DATA_OFFSET + 3 * BLOCK_WIDTH
    # index: cumulative counts strictly before day d
    idx = np.frombuffer(buf, dtype="<u4", count=372, offset=60)
    assert idx[0] == 0 and idx[1] == 2 and idx[63] == 2 and idx[64] == 3
    # bit_fields is the format's one big-endian field
    first_block = buf[DATA_OFFSET : DATA_OFFSET + BLOCK_WIDTH]
    assert struct.unpack(">I", first_block[4:8])[0] == 7


def test_codec_roundtrip_and_lww():
    pdf = _pdf()
    # duplicate ts: encode must keep the LAST row (page/page.go:118-123)
    dup = pdf.iloc[[1]].assign(close=999.0)
    back = decode_page(
        encode_page("X", "Y", 60, 2021, pd.concat([pdf, dup]))
    )
    assert len(back) == 3
    assert back.loc[back["ts"] == pd.Timestamp("2021-01-01 00:01:00"), "close"].item() == 999.0
    assert back["bit_fields"].tolist() == [7, 0, 2**31]
    assert back["market"].unique().tolist() == ["X"]


def test_spark_roundtrip(spark, sf_dir, tmp_path):
    candles = candles_from_events(load_table(spark, sf_dir, "events"))
    manifest = write_ysf(candles, str(tmp_path)).collect()
    assert sum(r["n_candles"] for r in manifest) == candles.count()
    # reference path layout {market}/{length}/{code}/{year:05d}.ysf
    assert all("/SYN/60/" in r["path"] and r["path"].endswith(".ysf")
               for r in manifest)
    back = read_ysf(spark, str(tmp_path))
    assert back.count() == candles.count()
    a = {tuple(r) for r in candles.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b
