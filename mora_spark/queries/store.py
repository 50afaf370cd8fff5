"""Declared query exercising the persistent CandleStore write→merge→read
path (the reference's entire executable surface: INSERT + COMMIT + keyed
read, SURVEY §2.A rows 1-9).

The scratch store lives under ``.scratch/`` in the repo; it is wiped at
the start of each run so the query is deterministic.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mora_spark.datasets import candles_from_events, candles_sql, load_table
from mora_spark.engine import CandleStore

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".scratch")


def scratch_dir(name: str, sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(SCRATCH, f"{name}_{tag}")


def q_store_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest candles, then upsert a restatement batch (every 'click'
    bar's close/volume shifted), then read back BOTH snapshots —
    ``head`` must show the restatement (merge last-writer-wins +
    partition overwrite + pruned read) and time-travel ``v1`` must
    still show the pre-restatement data byte-exactly (the reference's
    snapshot-isolated accessor read; commit never mutates data files).
    """
    path = scratch_dir("store_roundtrip", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    store = CandleStore(spark, path)

    candles = candles_from_events(load_table(spark, sf_dir, "events"))
    store.write(candles)  # initial load -> manifest version 1

    restatement = (
        candles.where(F.col("code") == "click")
        .withColumn("close", F.col("close") + 1000.0)
        .withColumn("volume", F.lit(0.0))
    )
    store.write(restatement)  # upsert: new values must win -> version 2

    cols = [
        "market", "code", "candle_length", "ts",
        "open", "high", "low", "close", "volume", "bit_fields",
    ]
    head = store.read(market="SYN").select(*cols)
    v1 = store.read(market="SYN", version=1).select(*cols)
    return head.withColumn("snapshot", F.lit("head")).unionByName(
        v1.withColumn("snapshot", F.lit("v1"))
    )


O_STORE_ROUNDTRIP = candles_sql(
    """
SELECT market, code, candle_length, ts, open, high, low,
       CASE WHEN code = 'click' THEN close + 1000.0 ELSE close END AS close,
       CASE WHEN code = 'click' THEN 0.0 ELSE volume END AS volume,
       bit_fields, 'head' AS snapshot
FROM candles
UNION ALL
SELECT market, code, candle_length, ts, open, high, low, close, volume,
       bit_fields, 'v1' AS snapshot
FROM candles
"""
)


def q_store_scheme_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The q_store_roundtrip contract over a ``file://`` root — the
    in-container proxy for hdfs/s3a store roots (r16: the manifest log
    + all driver-side store metadata route through the session's
    Hadoop FileSystem for ``scheme://`` roots, ``engine/storefs.py``).
    Same batches, same merge/time-travel semantics, same oracle; what
    this row pins under the driver's hash gate is that the PORTED
    metadata path — staging promotion, page writes, the per-filesystem
    CAS (link(2) drop-down for the local scheme), manifest reads —
    produces byte-identical snapshots to the POSIX twin."""
    path = scratch_dir("store_scheme_roundtrip", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    store = CandleStore(spark, f"file://{path}")

    candles = candles_from_events(load_table(spark, sf_dir, "events"))
    store.write(candles)  # initial load -> manifest version 1

    restatement = (
        candles.where(F.col("code") == "click")
        .withColumn("close", F.col("close") + 1000.0)
        .withColumn("volume", F.lit(0.0))
    )
    store.write(restatement)  # upsert: new values must win -> version 2

    cols = [
        "market", "code", "candle_length", "ts",
        "open", "high", "low", "close", "volume", "bit_fields",
    ]
    head = store.read(market="SYN").select(*cols)
    v1 = store.read(market="SYN", version=1).select(*cols)
    return head.withColumn("snapshot", F.lit("head")).unionByName(
        v1.withColumn("snapshot", F.lit("v1"))
    )


def q_store_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append fast path + multi-year batch split, driver-verified.

    Initial merge load, then a ``mode="append"`` write (the reference's
    blind page append, ``page/page.go:73-93``: no read-back, files added
    and the manifest unioned in one CAS) of KNOWN-NEW candles — every
    'click' bar re-timestamped +370 and +740 days, so the single batch
    spans two distinct years and must split into per-year partitions
    (``database/factory.go:14-35`` / ``common/candle.go:70-80``; Spark
    side: the ``year`` derivation + partitionBy in ``_stage_and_publish``).
    Day-granular shifts (not INTERVAL YEAR) keep Spark and DuckDB
    calendar arithmetic trivially identical. Read-back is the full
    keyed scan: original + both shifted year partitions.
    """
    path = scratch_dir("store_append", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    store = CandleStore(spark, path)

    candles = candles_from_events(load_table(spark, sf_dir, "events"))
    store.write(candles)  # initial load -> manifest version 1

    clicks = candles.where(F.col("code") == "click")
    batch = clicks.withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 370 DAYS")
    ).unionByName(
        clicks.withColumn("ts", F.col("ts") + F.expr("INTERVAL 740 DAYS"))
    )
    store.write(batch, mode="append")  # -> version 2, two new years

    cols = [
        "market", "code", "candle_length", "ts",
        "open", "high", "low", "close", "volume", "bit_fields",
    ]
    return store.read(market="SYN").select(*cols)


O_STORE_APPEND = candles_sql(
    """
SELECT market, code, candle_length, ts, open, high, low, close, volume,
       bit_fields
FROM candles
UNION ALL
SELECT market, code, candle_length, ts + INTERVAL 370 DAY, open, high,
       low, close, volume, bit_fields
FROM candles WHERE code = 'click'
UNION ALL
SELECT market, code, candle_length, ts + INTERVAL 740 DAY, open, high,
       low, close, volume, bit_fields
FROM candles WHERE code = 'click'
"""
)


def q_ysf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Export candles to reference-layout `.ysf` page files, read them
    back with the binaryFile+mapInPandas importer, and return the
    re-imported table — byte-level parity with the reference's storage
    format (SURVEY §1.3), oracle-checked against the plain derivation."""
    from mora_spark.sources import read_ysf, write_ysf

    path = scratch_dir("ysf_roundtrip", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    candles = candles_from_events(load_table(spark, sf_dir, "events"))
    write_ysf(candles, path).collect()  # action drives the export
    return read_ysf(spark, path).withColumn(
        "bit_fields", F.col("bit_fields").cast("long")
    )


O_YSF_ROUNDTRIP = candles_sql("SELECT * FROM candles")


N_MAINT_APPENDS = 11  # crosses CHECKPOINT_INTERVAL (10): v1 + 11 = v12


def q_store_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production maintenance loop under driver verification:
    enough commits to cross the manifest-log CHECKPOINT interval (so
    ``current()`` resolves from the ``_last_checkpoint`` marker, not a
    directory listing), then ``compact`` → ``vacuum`` → ``expire_versions``
    — and the read-back must still be byte-identical to the plain
    derivation. Also asserts the typed time-travel contract: an
    expired version raises ``VersionExpiredError``, a vacuumed one
    ``VersionVacuumedError`` (the round-3 audit's "opaque read error"
    gap, now a contract)."""
    from mora_spark.engine.store import (
        CHECKPOINT_INTERVAL,
        VersionExpiredError,
        VersionVacuumedError,
    )

    path = scratch_dir("store_maint", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    store = CandleStore(spark, path)

    clicks = candles_from_events(
        load_table(spark, sf_dir, "events")
    ).where(F.col("code") == "click")
    store.write(clicks)  # v1
    for i in range(1, N_MAINT_APPENDS + 1):
        store.write(
            clicks.withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {i} DAYS")),
            mode="append",
        )  # v2 .. v12 — v10's commit refreshes the checkpoint marker
    assert store._log.checkpoint_hint() >= CHECKPOINT_INTERVAL
    store.compact()  # v13: one ts-sorted file set per partition
    store.vacuum(older_than_s=0)  # reclaim pre-compaction files
    store.expire_versions(keep_last=3)  # trim the manifest log
    for bad, exc in ((2, VersionExpiredError), (12, VersionVacuumedError)):
        try:
            store.read(version=bad)
            raise AssertionError(f"version {bad} should raise {exc.__name__}")
        except exc:
            pass
    cols = [
        "market", "code", "candle_length", "ts",
        "open", "high", "low", "close", "volume", "bit_fields",
    ]
    return store.read(market="SYN").select(*cols)


O_STORE_MAINTENANCE = candles_sql(
    f"""
SELECT market, code, candle_length,
       ts + d * INTERVAL 1 DAY AS ts,
       open, high, low, close, volume, bit_fields
FROM candles
CROSS JOIN (SELECT unnest(range({N_MAINT_APPENDS + 1})) AS d)
WHERE code = 'click'
"""
)


def q_store_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental continuous-aggregate maintenance under driver
    verification: the 1-minute series arrives in two OVERLAPPING
    batches (everything before Jan 20, then everything from Jan 15 on,
    where the second batch also RESTATES its rows' volume), each
    followed by ``derive_rollup`` into the 5-minute series. The
    read-back of the derived series must equal a from-scratch 5m
    resample of the final source data — proving touched-bucket
    recomputation converges under overlap and upsert (buckets written
    twice take the restated values; buckets from batch 1 alone are
    never recomputed or rewritten)."""
    path = scratch_dir("store_rollup", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    store = CandleStore(spark, path)

    candles = candles_from_events(load_table(spark, sf_dir, "events"))
    cut1 = "2024-01-20 00:00:00"
    cut0 = "2024-01-15 00:00:00"
    b1 = candles.where(F.col("ts") < F.lit(cut1))
    b2 = candles.where(F.col("ts") >= F.lit(cut0)).withColumn(
        "volume", F.col("volume") + 5.0
    )
    store.write(b1)
    store.derive_rollup(b1, 300)
    store.write(b2)
    store.derive_rollup(b2, 300)

    cols = [
        "market", "code", "candle_length", "ts",
        "open", "high", "low", "close", "volume", "bit_fields",
    ]
    return store.read(market="SYN", candle_length=300).select(*cols)


O_STORE_ROLLUP = candles_sql(
    """
, final AS (
  SELECT market, code, candle_length, ts, open, high, low, close,
         CASE WHEN ts >= TIMESTAMP '2024-01-15 00:00:00'
              THEN volume + 5.0 ELSE volume END AS volume,
         bit_fields
  FROM candles
)
SELECT market, code, 300 AS candle_length, bucket_ts AS ts,
       arg_min(open, ts) AS open, max(high) AS high, min(low) AS low,
       arg_max(close, ts) AS close, sum(volume) AS volume,
       CAST(sum(bit_fields) AS BIGINT) AS bit_fields
FROM (
  SELECT *, make_timestamp(CAST(floor(epoch(ts) / 300) AS BIGINT)
            * 300 * 1000000) AS bucket_ts
  FROM final
)
GROUP BY market, code, bucket_ts
"""
)


def q_store_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-shuffle store-store join via store-level bucketing.

    Two persistent stores are built with the same ``n_buckets`` spec
    (every data file hash(ts)%8-bucketed within its partition dir — the
    write-path extension of ``save_bucketed``'s layout): a trade-bar
    store and a sparser mark-price feed (even minutes only, restated
    close). ``bucketed_view`` re-exposes the on-disk partitioning to
    the planner, so the enrichment join on the full candle key plans
    with no exchange on either fact side — the plan assertion lives in
    ``tests/test_store_bucketed.py``; THIS query verifies bucketing is
    invisible in the answer (join result == the plain relational
    semantics the oracle states)."""
    return _store_bjoin_result(*_store_bjoin_views(spark, sf_dir))


def _store_bjoin_views(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Build both bucketed stores and register their snapshot views —
    the ingest-time cost the bench keeps untimed."""
    path_a = scratch_dir("store_bjoin_a", sf_dir)
    path_b = scratch_dir("store_bjoin_b", sf_dir)
    for p in (path_a, path_b):
        shutil.rmtree(p, ignore_errors=True)
    a = CandleStore(spark, path_a, n_buckets=8)
    b = CandleStore(spark, path_b, n_buckets=8)

    candles = candles_from_events(load_table(spark, sf_dir, "events"))
    a.write(candles)
    marks = (
        candles.where(F.minute("ts") % 2 == 0)
        .withColumn("close", F.col("close") * 1.01)
        .withColumn("volume", F.col("volume") * 0.5)
    )
    b.write(marks)
    return a.bucketed_view("sbj_trades"), b.bucketed_view("sbj_marks")


def _store_bjoin_result(va: DataFrame, vb: DataFrame) -> DataFrame:
    key = ["market", "code", "candle_length", "ts"]
    return va.join(vb, key).select(
        *key,
        va["close"].alias("trade_close"),
        vb["close"].alias("mark_close"),
        (vb["close"] - va["close"]).alias("basis"),
    )


def store_bucketed_join_hot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-only: the zero-exchange join over views staged by
    :func:`_store_bjoin_views` (untimed) — the repeated path at scale."""
    return _store_bjoin_result(
        spark.table("sbj_trades"), spark.table("sbj_marks")
    )


O_STORE_BUCKETED_JOIN = candles_sql(
    """
SELECT market, code, candle_length, ts,
       close AS trade_close,
       close * 1.01 AS mark_close,
       close * 1.01 - close AS basis
FROM candles
WHERE minute(ts) % 2 = 0
"""
)


def q_store_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (CDC/audit view) across a restatement commit:
    v1 = full candle load; v2 = one merge batch that restates every
    'click' bar (close +1000, volume zeroed — updates) AND backfills
    the same bars 400 days later under new keys (inserts).
    ``store.diff(1, 2)`` must report exactly those changes and nothing
    else — unchanged rows never appear, which is what makes the diff
    usable as an audit at 100 TB (output is proportional to the
    CHANGE set, not the table)."""
    path = scratch_dir("store_diff", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    store = CandleStore(spark, path)
    candles = candles_from_events(load_table(spark, sf_dir, "events"))
    store.write(candles)  # v1
    clicks = candles.where(F.col("code") == "click")
    batch = (
        clicks.withColumn("close", F.col("close") + 1000.0)
        .withColumn("volume", F.lit(0.0))
        .unionByName(
            clicks.withColumn(
                "ts", F.col("ts") + F.expr("INTERVAL 400 DAYS")
            )
        )
    )
    store.write(batch)  # v2
    d = store.diff(1, 2)
    return d.select(
        "market", "code", "candle_length", "ts", "change",
        F.col("before.close").alias("close_before"),
        F.col("after.close").alias("close_after"),
        F.col("before.volume").alias("volume_before"),
        F.col("after.volume").alias("volume_after"),
    )


O_STORE_DIFF = candles_sql(
    """
SELECT market, code, candle_length, ts, 'update' AS change,
       close AS close_before, close + 1000.0 AS close_after,
       volume AS volume_before, 0.0 AS volume_after
FROM candles WHERE code = 'click'
UNION ALL
SELECT market, code, candle_length, ts + INTERVAL 400 DAY AS ts,
       'insert' AS change,
       CAST(NULL AS DOUBLE) AS close_before, close AS close_after,
       CAST(NULL AS DOUBLE) AS volume_before, volume AS volume_after
FROM candles WHERE code = 'click'
"""
)


def q_store_diff_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exchange-free CDC twin of ``q_store_diff``: the same
    restatement scenario on an ``n_buckets`` store, with each version
    snapshotted through ``bucketed_view`` BEFORE the next write (the
    hardlinked view dirs pin the version even as the store moves on).
    ``snapshot_diff`` then full-outer joins two hash(ts)-bucketed
    sides, so the planner needs no shuffle on either version — the
    plan assertion lives in tests/test_store_bucketed.py; THIS query
    verifies bucketing is invisible in the answer (same oracle as the
    shuffling diff)."""
    path = scratch_dir("store_diff_bkt", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    store = CandleStore(spark, path, n_buckets=8)
    candles = candles_from_events(load_table(spark, sf_dir, "events"))
    store.write(candles)  # v1
    va = store.bucketed_view("sdb_before")
    clicks = candles.where(F.col("code") == "click")
    batch = (
        clicks.withColumn("close", F.col("close") + 1000.0)
        .withColumn("volume", F.lit(0.0))
        .unionByName(
            clicks.withColumn(
                "ts", F.col("ts") + F.expr("INTERVAL 400 DAYS")
            )
        )
    )
    store.write(batch)  # v2
    vb = store.bucketed_view("sdb_after")
    d = CandleStore.snapshot_diff(va, vb)
    return d.select(
        "market", "code", "candle_length", "ts", "change",
        F.col("before.close").alias("close_before"),
        F.col("after.close").alias("close_after"),
        F.col("before.volume").alias("volume_before"),
        F.col("after.volume").alias("volume_after"),
    )


QUERIES = {
    "q_store_roundtrip": q_store_roundtrip,
    "q_store_scheme_roundtrip": q_store_scheme_roundtrip,
    "q_store_bucketed_join": q_store_bucketed_join,
    "q_store_diff": q_store_diff,
    "q_store_diff_bucketed": q_store_diff_bucketed,
    "q_store_rollup": q_store_rollup,
    "q_store_append": q_store_append,
    "q_store_maintenance": q_store_maintenance,
    "q_ysf_roundtrip": q_ysf_roundtrip,
}
ORACLES = {
    "q_store_roundtrip": O_STORE_ROUNDTRIP,
    "q_store_scheme_roundtrip": O_STORE_ROUNDTRIP,
    "q_store_bucketed_join": O_STORE_BUCKETED_JOIN,
    "q_store_diff": O_STORE_DIFF,
    "q_store_diff_bucketed": O_STORE_DIFF,
    "q_store_rollup": O_STORE_ROLLUP,
    "q_store_append": O_STORE_APPEND,
    "q_store_maintenance": O_STORE_MAINTENANCE,
    "q_ysf_roundtrip": O_YSF_ROUNDTRIP,
}
