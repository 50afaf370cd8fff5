"""CandleStore — partitioned-Parquet candle storage with ACID upsert merge.

The Spark rendition of the reference's whole database layer:

- ``Database.Write(set, candles)`` (``database/database.go:54-57``) →
  :meth:`CandleStore.write` with ``mode='merge'`` — last-writer-wins
  upsert into per-(series, year) partitions, mirroring the page merge
  (``page/page.go:95-142``, keep-new tie-break ``page/page.go:118-123``)
  and the per-year batch split (``database/factory.go:14-35``,
  ``common/candle.go:70-80``).
- the append fast path (``page/page.go:73-93``) → ``mode='append'`` for
  known-new data (no read-back, blind file add).
- keyed year reads (``database/storage/accessor.go:139-161``) →
  :meth:`CandleStore.read` — manifest-level file pruning on
  ``market/candle_length/code/year`` plus Parquet row-group skipping
  on ``ts`` (the analogue of the page day index, ``page/index.go:11-17``).

Commit protocol (the analogue of the reference's WAL-before-apply
contract, ``database/storage/accessor.go:86-92`` + committed-only replay
``database/storage/wal/flusher.go:110-128``): data files are immutable
and never the commit point. A write stages new Parquet files under
``_staging/<txn>/``, moves them into the live ``data/`` tree under
transaction-unique names (still invisible — readers only see files
listed in a manifest), then commits by publishing manifest version N+1
in ``_log/``. The publish is a compare-and-swap: ``os.link`` of a fully
written temp file onto the versioned name, which atomically fails if a
concurrent writer committed that version first; the loser re-reads the
new snapshot, recomputes its merge, and retries. A crash at ANY point
before the link leaves the previous version fully intact (orphan data
files are invisible until :meth:`vacuum` removes them); a crash after
the link is a completed commit. This is the Delta/Iceberg optimistic
protocol in miniature — on HDFS the CAS would be rename-without-
overwrite, on S3 a conditional PUT; here POSIX ``link(2)``.

Scale notes: a merge touches ONLY the partitions present in the
incoming batch (partition tuples are collected — bounded by
series × years, not row count — and pruned against the manifest
driver-side, so untouched partitions are never read OR rewritten).
Rewritten partitions are sorted within by ts at write, so downstream
range scans stay sequential. The manifest is one JSON file per version
listing (file, partition-tuple) pairs; at 100 TB (~1e6 files) the
production variant would page manifests Iceberg-style (Avro manifest
lists), but the protocol — prune by tuple, CAS on a version counter —
is unchanged.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mora_spark.schema import CANDLE_COLUMNS, CANDLE_PARTITIONS, CANDLE_SCHEMA

_KEY = ["market", "code", "candle_length", "ts"]

MAX_COMMIT_RETRIES = 10


def _local(path: str) -> str:
    """Strip a file: scheme so driver-side manifest I/O can use os.*
    (the store targets one filesystem; swap this layer for HDFS/S3)."""
    if path.startswith("file://"):
        return path[len("file://"):]
    if path.startswith("file:"):
        return path[len("file:"):]
    return path


class _TxnLog:
    """Versioned manifest log with POSIX link(2) compare-and-swap.

    Version N is the file ``_log/{N:012d}.json`` holding the complete
    list of live data files. The newest version wins; publishing is
    atomic-create-if-absent, so exactly one of any set of racing
    writers commits each version.
    """

    def __init__(self, root: str):
        self.dir = os.path.join(root, "_log")

    def versions(self) -> list[int]:
        """All committed versions, ascending."""
        if not os.path.isdir(self.dir):
            return []
        return sorted(
            int(n[:-5])
            for n in os.listdir(self.dir)
            if n.endswith(".json") and n[:-5].isdigit()
        )

    def read_version(self, version: int) -> dict:
        """The full manifest record {version, txn, files} at ``version``."""
        with open(os.path.join(self.dir, f"{version:012d}.json")) as f:
            return json.load(f)

    def entries_at(self, version: int) -> list[dict]:
        return self.read_version(version)["files"]

    def current(self) -> tuple[int, list[dict]]:
        """Newest (version, entries); (0, []) for an empty store."""
        versions = self.versions()
        if not versions:
            return 0, []
        v = versions[-1]
        return v, self.entries_at(v)

    def try_commit(self, version: int, entries: list[dict], txn: str) -> bool:
        """CAS-publish ``version``; False if a racer got there first."""
        os.makedirs(self.dir, exist_ok=True)
        tmp = os.path.join(self.dir, f".tmp-{txn}")
        with open(tmp, "w") as f:
            json.dump({"version": version, "txn": txn, "files": entries}, f)
            f.flush()
            os.fsync(f.fileno())
        dst = os.path.join(self.dir, f"{version:012d}.json")
        try:
            os.link(tmp, dst)  # atomic fail-if-exists: the commit point
            return True
        except FileExistsError:
            return False
        finally:
            os.remove(tmp)


class CandleStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = _local(path)
        self.data_dir = os.path.join(self.path, "data")
        self._log = _TxnLog(self.path)

    # -- helpers -----------------------------------------------------

    def _exists(self) -> bool:
        return self._log.current()[0] > 0

    @staticmethod
    def _with_year(df: DataFrame) -> DataFrame:
        # Year derivation mirrors CandleList.SplitByYear
        # (common/candle.go:70-80). Year 0 is the reference's reserved
        # sentinel (page/index.go:30-32); nothing enforces it here
        # because timestamps before year 1 are unrepresentable anyway.
        return df.withColumn("year", F.year("ts"))

    def _normalize(self, df: DataFrame) -> DataFrame:
        missing = [c for c in CANDLE_COLUMNS if c not in df.columns]
        if missing:
            raise ValueError(f"candle batch missing columns: {missing}")
        return self._with_year(df.select(*CANDLE_COLUMNS))

    @staticmethod
    def _tuple_of(entry: dict) -> tuple[str, ...]:
        return tuple(entry["partition"][c] for c in CANDLE_PARTITIONS)

    def _read_files(self, entries: list[dict]) -> DataFrame:
        if not entries:
            schema = T.StructType(
                CANDLE_SCHEMA.fields
                + [T.StructField("year", T.IntegerType(), True)]
            )
            return self.spark.createDataFrame([], schema)
        paths = [os.path.join(self.data_dir, e["path"]) for e in entries]
        # basePath keeps Hive partition-column inference over an
        # explicit (manifest-pruned) file list.
        return (
            self.spark.read.option("basePath", self.data_dir)
            .parquet(*paths)
        )

    # -- write path --------------------------------------------------

    def _stage_and_publish(
        self, df: DataFrame, txn: str, max_records_per_file: int = 0
    ) -> list[dict]:
        """Write ``df`` as Hive-partitioned Parquet under a staging dir,
        then move the files into the live tree under txn-unique names.
        The moved files stay invisible until a manifest lists them."""
        staging = os.path.join(self.path, "_staging", txn)
        writer = (
            df.sortWithinPartitions(*CANDLE_PARTITIONS, "ts")
            .write.partitionBy(*CANDLE_PARTITIONS)
            .mode("overwrite")
        )
        if max_records_per_file:
            writer = writer.option("maxRecordsPerFile", max_records_per_file)
        writer.parquet(staging)
        entries: list[dict] = []
        for dirpath, _, names in os.walk(staging):
            for name in names:
                if not name.endswith(".parquet"):
                    continue
                rel_dir = os.path.relpath(dirpath, staging)
                parts = dict(
                    seg.split("=", 1) for seg in rel_dir.split(os.sep)
                )
                partition = {
                    c: unquote(parts[c]) for c in CANDLE_PARTITIONS
                }
                dest_rel = os.path.join(rel_dir, f"{txn}-{name}")
                dest = os.path.join(self.data_dir, dest_rel)
                os.makedirs(os.path.dirname(dest), exist_ok=True)
                os.rename(os.path.join(dirpath, name), dest)
                entries.append({"path": dest_rel, "partition": partition})
        shutil.rmtree(staging, ignore_errors=True)
        return entries

    def write(self, df: DataFrame, mode: str = "merge") -> None:
        """Upsert (``merge``) or blind-append (``append``) a batch.

        merge: for every (market, candle_length, code, year) partition
        present in the batch, existing rows are read back (manifest-
        pruned), unioned with the batch, deduplicated last-writer-wins
        (batch wins), and the partition's files are replaced in one
        atomic manifest commit. Partitions not in the batch are neither
        read nor rewritten. Concurrent writers serialize through the
        manifest CAS: the loser recomputes against the winner's
        snapshot, so no committed row is ever lost.
        """
        batch = self._normalize(df)
        if mode == "append":
            txn = uuid.uuid4().hex
            new = self._stage_and_publish(batch, txn)
            for _ in range(MAX_COMMIT_RETRIES):
                version, files = self._log.current()
                # Data is snapshot-independent: reuse the files, retry
                # only the manifest union on CAS conflict.
                if self._log.try_commit(version + 1, files + new, txn):
                    return
            raise RuntimeError("append: commit contention, retries exhausted")
        if mode != "merge":
            raise ValueError(f"unknown write mode: {mode}")

        # Partition tuple count is bounded (series x years), so the
        # collect and the driver-side manifest pruning stay small even
        # for huge row counts.
        touched = {
            tuple(str(v) for v in r)
            for r in batch.select(*CANDLE_PARTITIONS).distinct().collect()
        }
        for _ in range(MAX_COMMIT_RETRIES):
            txn = uuid.uuid4().hex
            version, files = self._log.current()
            replaced = [e for e in files if self._tuple_of(e) in touched]
            kept = [e for e in files if self._tuple_of(e) not in touched]
            if replaced:
                existing = self._read_files(replaced).select(*batch.columns)
                merged = (
                    existing.withColumn("__seq", F.lit(0))
                    .unionByName(batch.withColumn("__seq", F.lit(1)))
                )
                w = Window.partitionBy(*_KEY).orderBy(F.col("__seq").desc())
                merged = (
                    merged.withColumn("__rn", F.row_number().over(w))
                    .where(F.col("__rn") == 1)
                    .drop("__rn", "__seq")
                )
            else:
                merged = batch
            new = self._stage_and_publish(merged, txn)
            if self._log.try_commit(version + 1, kept + new, txn):
                return
            # Lost the race: the published-but-uncommitted files are
            # orphans (invisible; vacuum reclaims them). Recompute the
            # merge against the winner's snapshot.
        raise RuntimeError("merge: commit contention, retries exhausted")

    def vacuum(self, older_than_s: float = 3600.0) -> int:
        """Delete data files not referenced by the newest manifest, and
        stale staging dirs. ``older_than_s`` guards racing writers that
        have published files but not yet committed (Delta-style
        retention); pass 0 only when no writer is active. Returns the
        number of files removed."""
        _, files = self._log.current()
        live = {os.path.join(self.data_dir, e["path"]) for e in files}
        cutoff = time.time() - older_than_s
        removed = 0
        for dirpath, _, names in os.walk(self.data_dir):
            for name in names:
                p = os.path.join(dirpath, name)
                if p not in live and os.path.getmtime(p) <= cutoff:
                    os.remove(p)
                    removed += 1
        staging_root = os.path.join(self.path, "_staging")
        if os.path.isdir(staging_root):
            for d in os.listdir(staging_root):
                p = os.path.join(staging_root, d)
                if os.path.getmtime(p) <= cutoff:
                    shutil.rmtree(p, ignore_errors=True)
        return removed

    def stats(self) -> DataFrame:
        """Per-(series, year) partition profile: row count, ts range,
        volume total — the operational view mora kept in page headers
        (Count/StartOffset/EndOffset, ``page/header.go:13-23``),
        computed here by one aggregation over manifest-listed files."""
        _, files = self._log.current()
        df = self._with_year(self._read_files(files).select(*CANDLE_COLUMNS))
        return df.groupBy(*CANDLE_PARTITIONS).agg(
            F.count(F.lit(1)).alias("n_candles"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.sum("volume").alias("total_volume"),
        )

    def compact(self, target_file_mb: int = 128) -> None:
        """Rewrite every partition into size-targeted, ts-sorted files.

        Repeated micro-batch merges leave one small file per write per
        partition; compaction rewrites each partition's rows into
        ``ceil(bytes / target_file_mb)`` files sorted by ``ts`` — the
        parquet analogue of the reference keeping each page's body
        sorted (``page/page.go:95-142``) and the standard maintenance
        pass that keeps row-group min/max skipping effective at scale.
        One manifest CAS swaps the whole file set atomically; the old
        files remain until :meth:`vacuum`.
        """
        for _ in range(MAX_COMMIT_RETRIES):
            txn = uuid.uuid4().hex
            version, files = self._log.current()
            df = self._read_files(files).select(*CANDLE_COLUMNS)
            df = self._with_year(df).repartition(
                *[F.col(c) for c in CANDLE_PARTITIONS]
            )
            new = self._stage_and_publish(
                df, txn,
                max_records_per_file=target_file_mb * 1024 * 1024 // 64,
            )
            if self._log.try_commit(version + 1, new, txn):
                return
        raise RuntimeError("compact: commit contention, retries exhausted")

    # -- read path ---------------------------------------------------

    def history(self) -> DataFrame:
        """The commit log as a table: one row per committed version with
        its transaction id and live-file count — the operational analogue
        of Delta's DESCRIBE HISTORY over this store's manifest log."""
        rows = [
            (v, m["txn"], len(m["files"]))
            for v in self._log.versions()
            for m in [self._log.read_version(v)]
        ]
        return self.spark.createDataFrame(
            rows, "version long, txn string, n_files long"
        )

    def read(
        self,
        market: str | None = None,
        code: str | None = None,
        candle_length: int | None = None,
        start=None,
        end=None,
        version: int | None = None,
    ) -> DataFrame:
        """Keyed/temporal read with two pruning layers: manifest entries
        are filtered driver-side (no file outside the key/year range is
        even listed to Spark), then the same predicates run as partition
        and row-group filters on the pruned scan.

        ``start``/``end`` bound ``ts`` as [start, end) and additionally
        prune whole year partitions before any file is opened.

        ``version`` time-travels: the scan is planned against that
        manifest snapshot instead of the newest one (the reference's
        snapshot-isolated accessor read; Delta's ``versionAsOf``). Data
        files are immutable and a manifest lists exactly its snapshot's
        files, so an old version stays byte-exactly readable until
        :meth:`vacuum` reclaims files the NEWEST manifest no longer
        references — vacuum bounds the time-travel horizon, as in Delta.
        """
        if version is not None:
            files = self._log.entries_at(version)
        else:
            _, files = self._log.current()

        def keep(e: dict) -> bool:
            p = e["partition"]
            if market is not None and p["market"] != market:
                return False
            if code is not None and p["code"] != code:
                return False
            if candle_length is not None and p["candle_length"] != str(
                candle_length
            ):
                return False
            if (
                start is not None
                and hasattr(start, "year")
                and int(p["year"]) < start.year
            ):
                return False
            if (
                end is not None
                and hasattr(end, "year")
                and int(p["year"]) > end.year
            ):
                return False
            return True

        df = self._read_files([e for e in files if keep(e)])
        if market is not None:
            df = df.where(F.col("market") == market)
        if code is not None:
            df = df.where(F.col("code") == code)
        if candle_length is not None:
            df = df.where(F.col("candle_length") == candle_length)
        if start is not None:
            df = df.where(
                (F.col("ts") >= F.lit(start))
                & (F.col("year") >= F.year(F.lit(start)))
            )
        if end is not None:
            df = df.where(
                (F.col("ts") < F.lit(end))
                & (F.col("year") <= F.year(F.lit(end)))
            )
        return df.select(*CANDLE_COLUMNS)
