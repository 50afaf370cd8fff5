"""CandleStore — partitioned-Parquet candle storage with upsert merge.

The Spark rendition of the reference's whole database layer:

- ``Database.Write(set, candles)`` (``database/database.go:54-57``) →
  :meth:`CandleStore.write` with ``mode='merge'`` — last-writer-wins
  upsert into per-(series, year) partitions, mirroring the page merge
  (``page/page.go:95-142``, keep-new tie-break ``page/page.go:118-123``)
  and the per-year batch split (``database/factory.go:14-35``,
  ``common/candle.go:70-80``).
- the append fast path (``page/page.go:73-93``) → ``mode='append'`` for
  known-new data (no read-back, blind partition append).
- keyed year reads (``database/storage/accessor.go:139-161``) →
  :meth:`CandleStore.read` — pure partition pruning on
  ``market/candle_length/code/year`` plus Parquet row-group skipping
  on ``ts`` (the analogue of the page day index, ``page/index.go:11-17``).

What is deliberately NOT here (SURVEY §2.A rows 10-19): WAL, buffer
pool, lock manager, copy-on-write latches — Parquet's immutable files +
dynamic partition overwrite give snapshot semantics; a Delta/Iceberg
table format would add multi-writer atomicity without changing this
API.

Scale notes: a merge touches ONLY the partitions present in the
incoming batch (partition values are collected — they are bounded by
series × years, not row count — and pushed down as a pruning filter).
Rewritten partitions are sorted within by ts at write, so downstream
range scans stay sequential.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mora_spark.schema import CANDLE_COLUMNS, CANDLE_PARTITIONS

_KEY = ["market", "code", "candle_length", "ts"]


class CandleStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # -- helpers -----------------------------------------------------

    def _exists(self) -> bool:
        # Cheap driver-side check via Hadoop FS (works for local and
        # distributed filesystems alike).
        jvm = self.spark.sparkContext._jvm
        conf = self.spark.sparkContext._jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path(self.path)
        return p.getFileSystem(conf).exists(p)

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

    # -- write path --------------------------------------------------

    def write(self, df: DataFrame, mode: str = "merge") -> None:
        """Upsert (``merge``) or blind-append (``append``) a batch.

        merge: for every (market, candle_length, code, year) partition
        present in the batch, existing rows are read back, unioned with
        the batch, deduplicated last-writer-wins (batch wins), and the
        partition is atomically replaced (dynamic partition overwrite).
        Partitions not in the batch are untouched.
        """
        batch = self._normalize(df)
        if mode == "append":
            (
                batch.sortWithinPartitions("ts")
                .write.partitionBy(*CANDLE_PARTITIONS)
                .mode("append")
                .parquet(self.path)
            )
            return
        if mode != "merge":
            raise ValueError(f"unknown write mode: {mode}")

        if self._exists():
            # Prune existing data to the touched partitions only. The
            # partition tuple count is bounded (series x years), so the
            # IN-filter stays small even for huge row counts.
            parts = [
                tuple(r)
                for r in batch.select(*CANDLE_PARTITIONS).distinct().collect()
            ]
            existing = self.spark.read.parquet(self.path)
            # OR-of-ANDs over literal partition tuples keeps the filter
            # in partition-pruning form (a concat/isin trick would not).
            cond = F.lit(False)
            for p in parts:
                this = F.lit(True)
                for col, val in zip(CANDLE_PARTITIONS, p):
                    this = this & (F.col(col) == F.lit(val))
                cond = cond | this
            existing = existing.where(cond).select(*batch.columns)
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

        (
            merged.sortWithinPartitions("ts")
            .write.partitionBy(*CANDLE_PARTITIONS)
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(self.path)
        )

    def stats(self) -> DataFrame:
        """Per-(series, year) partition profile: row count, ts range,
        volume total — the operational view mora kept in page headers
        (Count/StartOffset/EndOffset, ``page/header.go:13-23``),
        computed here by one aggregation over partition-pruned scans."""
        df = self._with_year(
            self.spark.read.parquet(self.path).select(*CANDLE_COLUMNS)
        )
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
        Dynamic partition overwrite makes the rewrite atomic per
        partition.
        """
        df = self._with_year(
            self.spark.read.parquet(self.path).select(*CANDLE_COLUMNS)
        )
        (
            df.repartition(*[F.col(c) for c in CANDLE_PARTITIONS])
            .sortWithinPartitions("ts")
            .write.partitionBy(*CANDLE_PARTITIONS)
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .option("maxRecordsPerFile", target_file_mb * 1024 * 1024 // 64)
            .parquet(self.path)
        )

    # -- read path ---------------------------------------------------

    def read(
        self,
        market: str | None = None,
        code: str | None = None,
        candle_length: int | None = None,
        start=None,
        end=None,
    ) -> DataFrame:
        """Keyed/temporal read; every filter is partition-prunable.

        ``start``/``end`` bound ``ts`` as [start, end) and additionally
        prune whole year partitions before any file is opened.
        """
        df = self.spark.read.parquet(self.path)
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
