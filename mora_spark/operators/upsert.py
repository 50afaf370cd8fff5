"""Last-writer-wins upsert — the Spark rendition of mora's INSERT.

The reference's only mutating command is an upsert-merge of candles into
a year page where, on duplicate timestamp, the NEW candle replaces the
old (``page/page.go:118-123``; merge loop ``page/page.go:95-142``). The
reference's append fast path can corrupt ordering on overlapping batches
(SURVEY §2.C-1); per the survey we implement the *intended* semantics —
sorted, timestamp-unique, last-writer-wins — always.

Scale notes: one shuffle on the natural key; at 100 TB the window/
aggregate is per-key so AQE handles skew. No Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mora_spark.schema import CANDLE_KEY


def last_writer_wins(
    df: DataFrame,
    key: list[str] | None = None,
    order_cols: list[str] | str = "ingest_seq",
) -> DataFrame:
    """Keep exactly one row per key: the row greatest under ``order_cols``
    (compared left-to-right, each descending).

    ``order_cols`` is the batch/arrival sequence — higher wins, mirroring
    the reference's keep-new tie-break. Implemented with row_number so it
    is a single shuffle + per-key sort.
    """
    key = key or CANDLE_KEY
    if isinstance(order_cols, str):
        order_cols = [order_cols]
    w = Window.partitionBy(*key).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_batches(batches: list[DataFrame], key: list[str] | None = None) -> DataFrame:
    """Upsert-merge an ordered list of batches; later batches win ties.

    Equivalent to executing the reference's INSERT commands in sequence
    (``database/factory.go:26-34`` runs per-year inserts in order inside
    one transaction), but as one declarative plan: union + keep-latest.
    """
    key = key or CANDLE_KEY
    tagged = [
        b.withColumn("ingest_seq", F.lit(i)) for i, b in enumerate(batches)
    ]
    out = tagged[0]
    for b in tagged[1:]:
        out = out.unionByName(b)
    return last_writer_wins(out, key=key).drop("ingest_seq")
