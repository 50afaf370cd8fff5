"""Streaming declared queries: micro-batch replay of events must equal
the batch result (the Spark analogue of WAL replay equivalence,
SURVEY §3.3 / §5-4).

Each query actually runs a Structured Streaming job (availableNow
trigger over a chunked file source) and returns the final table as a
batch DataFrame for the oracle compare. Work dirs under ``.scratch/``
are wiped per run.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mora_spark.datasets import candles_sql, load_table
from mora_spark.queries.store import scratch_dir
from mora_spark.streaming import (
    chunked_source,
    ordered_chunked_source,
    stream_candles,
    stream_dedup_ingest,
    stream_ema,
    stream_enrich,
    stream_sessions,
    stream_sliding,
    stream_store_merge,
    stream_stream_join,
)


def _work(name: str, sf_dir: str) -> str:
    d = scratch_dir(name, sf_dir)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    return d


def _src_cache(sf_dir: str) -> str:
    """Replay-source files are a pure function of sf_dir — build once
    per scale factor, OUTSIDE the per-run-wiped work dirs (checkpoints
    and outputs stay per-run for determinism)."""
    d = scratch_dir("stream_src_cache", sf_dir)
    os.makedirs(d, exist_ok=True)
    return d


def q_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streamed exactly-once ingest, then per-type totals — must equal
    the batch aggregation over the raw table."""
    work = _work("stream_ingest", sf_dir)
    src = chunked_source(spark, sf_dir, _src_cache(sf_dir))
    ingested = stream_dedup_ingest(spark, src, work)
    return ingested.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


O_STREAM_INGEST = """
SELECT event_type,
       count(*) AS n_events,
       sum(value) AS sum_value,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
"""


def q_stream_wire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka-shaped ingest: wire records (key/value/topic/partition/
    offset) streamed from the file transport, deserialized by the SAME
    parser the Kafka reader uses (streaming/wire.py), then aggregated —
    must equal the batch aggregation over the raw events table."""
    from mora_spark.streaming.wire import read_wire_stream, wire_chunked_source

    work = _work("stream_wire", sf_dir)
    src = wire_chunked_source(spark, sf_dir, _src_cache(sf_dir))
    parsed = read_wire_stream(spark, src)
    out = os.path.join(work, "ingested")
    ckpt = os.path.join(work, "ckpt_wire")
    q = (
        parsed.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


O_STREAM_WIRE = """
SELECT event_type,
       count(*) AS n_events,
       sum(value) AS sum_value,
       count(DISTINCT user_id) AS n_users,
       min(ts) AS first_ts,
       max(ts) AS last_ts
FROM events
GROUP BY event_type
"""


def q_stream_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming JSONL corpus ingest with mid-stream quarantine: the
    documents table replayed as JSONL shard micro-batches, one shard
    carrying PLANTED malformed lines. The stream must survive (bad
    lines land in _corrupt_record, good rows keep their columns) and
    the parquet-sunk result must reconcile exactly with the batch
    table + the planting arithmetic. Same schema contract as the batch
    reader (q_jsonl_roundtrip), so backfill and live ingest share
    their downstream logic verbatim."""
    from mora_spark.sources.jsonl import (
        CORRUPT_COL,
        read_jsonl_stream,
        write_jsonl,
    )

    work = _work("stream_jsonl", sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    src = os.path.join(work, "src")
    write_jsonl(docs.repartition(4, "doc_id"), src)
    # Shard mtimes define replay order; the planted-bad shard arrives
    # mid-stream (not first, not last) to prove recovery, not luck.
    parts = sorted(
        n for n in os.listdir(src) if n.endswith(".json")
    )
    for i, n in enumerate(parts):
        os.utime(os.path.join(src, n), (1_600_000_000 + i,) * 2)
    bad = os.path.join(src, "part-mid-planted.json")
    with open(bad, "w") as f:
        f.write('{"doc_id": 7, "text": "truncated mid-write\n')
        f.write("plain text, not a record\n")
    os.utime(bad, (1_600_000_000 + len(parts) // 2, ) * 2)
    out = os.path.join(work, "ingested")
    ckpt = os.path.join(work, "ckpt_jsonl")
    q = (
        read_jsonl_stream(spark, src, docs)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    back = spark.read.parquet(out)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.col(CORRUPT_COL)).alias("n_quarantined"),
        F.count_distinct(
            F.when(F.col(CORRUPT_COL).isNull(), F.col("doc_id"))
        ).alias("n_docs"),
        F.sum(F.when(F.col(CORRUPT_COL).isNull(), F.col("n_chars"))).alias(
            "sum_chars"
        ),
    )


O_STREAM_JSONL = """
SELECT count(*) + 2 AS n_rows,
       CAST(2 AS BIGINT) AS n_quarantined,
       count(DISTINCT doc_id) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
"""


def q_stream_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming OHLCV aggregation (update mode + last-emission-wins)
    — must equal the batch candles derivation exactly."""
    work = _work("stream_candles", sf_dir)
    src = chunked_source(spark, sf_dir, _src_cache(sf_dir))
    return stream_candles(spark, src, work)


O_STREAM_CANDLES = candles_sql("SELECT * FROM candles")


def q_stream_store_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming candles upserted into the persistent CandleStore via
    foreachBatch MERGE (mora's late-backfill-into-old-pages,
    page/page.go:95-142) — the store read back must equal the batch
    candle derivation exactly."""
    work = _work("stream_store_merge", sf_dir)
    src = chunked_source(spark, sf_dir, _src_cache(sf_dir))
    store = stream_store_merge(
        spark, src, work, os.path.join(work, "store")
    )
    return store.read(market="SYN").select(
        "market", "code", "candle_length", "ts",
        "open", "high", "low", "close", "volume", "bit_fields",
    )


O_STREAM_STORE_MERGE = candles_sql("SELECT * FROM candles")


def q_stream_store_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming continuous aggregate: the same store-merge stream, but
    each micro-batch also maintains the derived 5-minute series via
    ``derive_rollup`` (only the batch's buckets recompute). The derived
    series read back after the stream drains must equal a from-scratch
    5m resample of the full batch candle derivation — late emissions
    and checkpoint-replayed batches converge by idempotent recompute."""
    work = _work("stream_store_rollup", sf_dir)
    src = chunked_source(spark, sf_dir, _src_cache(sf_dir))
    store = stream_store_merge(
        spark, src, work, os.path.join(work, "store"),
        rollup_lengths=(300,),
    )
    return store.read(market="SYN", candle_length=300).select(
        "market", "code", "candle_length", "ts",
        "open", "high", "low", "close", "volume", "bit_fields",
    )


O_STREAM_STORE_ROLLUP = candles_sql(
    """
SELECT market, code, 300 AS candle_length, bucket_ts AS ts,
       arg_min(open, ts) AS open, max(high) AS high, min(low) AS low,
       arg_max(close, ts) AS close, sum(volume) AS volume,
       CAST(sum(bit_fields) AS BIGINT) AS bit_fields
FROM (
  SELECT *, make_timestamp(CAST(floor(epoch(ts) / 300) AS BIGINT)
            * 300 * 1000000) AS bucket_ts
  FROM candles
)
GROUP BY market, code, bucket_ts
"""
)


def q_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows (30-min inactivity gap) — must equal
    gap-based batch sessionization. Note the boundary differs from
    q_sessionize on purpose: session windows are end-exclusive, so a
    gap of exactly 30 min starts a new session (>=, not >)."""
    work = _work("stream_sessions", sf_dir)
    src = chunked_source(spark, sf_dir, _src_cache(sf_dir))
    return stream_sessions(spark, src, work)


O_STREAM_SESSIONS = """
WITH g AS (
  SELECT *,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM g
)
SELECT user_id,
       min(ts) AS session_start,
       count(*) AS n_events,
       sum(value) AS sum_value
FROM s
GROUP BY user_id, sid
"""


def q_stream_store_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming feature lookup against the persistent store: candles
    are loaded into a CandleStore once, then the raw event stream is
    as-of enriched per micro-batch (latest stored bar at-or-before
    each event, store read-back pruned to the batch's code set + ts
    span + lookback horizon). Against a static store the union of
    enriched batches must equal the one-shot batch as-of join — the
    same oracle as q_asof_trades."""
    from mora_spark.datasets import candles_from_events
    from mora_spark.engine import CandleStore
    from mora_spark.streaming import stream_store_asof

    work = _work("stream_store_asof", sf_dir)
    store = CandleStore(spark, os.path.join(work, "store"))
    store.write(candles_from_events(load_table(spark, sf_dir, "events")))
    src = chunked_source(spark, sf_dir, _src_cache(sf_dir))
    return stream_store_asof(spark, src, work, store)


O_STREAM_STORE_ASOF = candles_sql(
    """
SELECT e.event_id, e.event_type AS code, e.ts, e.value,
       c.close AS close_asof, c.volume AS volume_asof
FROM events e
ASOF LEFT JOIN candles c
  ON e.event_type = c.code AND e.ts >= c.ts
"""
)


def q_stream_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-batch stateful running peak + drawdown
    (applyInPandasWithState, the second custom stateful operator) over
    an in-order replay — must equal the one-pass batch window."""
    from mora_spark.streaming import stream_drawdown

    work = _work("stream_drawdown", sf_dir)
    src = ordered_chunked_source(spark, sf_dir, _src_cache(sf_dir))
    return stream_drawdown(spark, src, work)


O_STREAM_DRAWDOWN = """
SELECT event_type, event_id, ts, value,
       max(value) OVER w AS peak,
       max(value) OVER w - value AS drawdown
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING)
"""


def q_stream_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-batch stateful EMA (applyInPandasWithState) over an
    in-order replay — must equal the one-pass batch recursion."""
    work = _work("stream_ema", sf_dir)
    src = ordered_chunked_source(spark, sf_dir, _src_cache(sf_dir))
    return stream_ema(spark, src, work, span=12)


# Oracle: the EMA recursion unrolled as a truncated convolution (the
# (11/13)^400 tail is ~1e-29 — far below the 1e-9 compare tolerance).
O_STREAM_EMA = """
WITH seq AS (
  SELECT event_type, event_id, ts, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT t.event_type, t.event_id, t.ts, t.value,
       sum((CASE WHEN j.rn = 1 THEN 1.0 ELSE 2.0 / 13.0 END)
           * power(11.0 / 13.0, t.rn - j.rn) * j.value) AS ema
FROM seq t
JOIN seq j ON j.event_type = t.event_type
          AND j.rn BETWEEN t.rn - 400 AND t.rn
GROUP BY t.event_type, t.event_id, t.ts, t.value
"""


def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sliding-window (5 min window, 1 min slide) per-type
    activity — each event contributes to 5 overlapping windows."""
    work = _work("stream_sliding", sf_dir)
    src = chunked_source(spark, sf_dir, _src_cache(sf_dir))
    return stream_sliding(spark, src, work, window_s=300, slide_s=60)


# Each event at ts belongs to windows starting at minute(ts) - k for
# k in 0..4 (start <= ts < start + 5 min, start on minute boundaries).
O_STREAM_SLIDING = """
SELECT event_type,
       make_timestamp((CAST(floor(epoch(ts) / 60) AS BIGINT) - k)
                      * 60 * 1000000) AS window_start,
       count(*) AS n_events,
       sum(value) AS sum_value
FROM events CROSS JOIN (SELECT unnest(range(5)) AS k)
GROUP BY event_type, window_start
"""


def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast join (events x customer dim), then a
    segment/type rollup — must equal the batch join + aggregation."""
    work = _work("stream_enrich", sf_dir)
    src = chunked_source(spark, sf_dir, _src_cache(sf_dir))
    dim = load_table(spark, sf_dir, "customer")
    enriched = stream_enrich(spark, src, work, dim)
    return enriched.groupBy("c_mktsegment", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


O_STREAM_ENRICH = """
SELECT c_mktsegment, event_type,
       count(*) AS n_events,
       sum(value) AS sum_value,
       count(DISTINCT user_id) AS n_users
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment, event_type
"""


def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream inner join (view -> purchase funnel
    within 4 h per user) — must equal the batch self-join."""
    work = _work("stream_join", sf_dir)
    src = chunked_source(spark, sf_dir, _src_cache(sf_dir))
    return stream_stream_join(spark, src, work).select(
        F.col("l_user_id").alias("user_id"),
        "left_id",
        "left_ts",
        "right_id",
        "right_ts",
        (F.col("right_value") - F.col("left_value")).alias("value_delta"),
    )


O_STREAM_JOIN = """
SELECT a.user_id AS user_id,
       a.event_id AS left_id,
       a.ts AS left_ts,
       b.event_id AS right_id,
       b.ts AS right_ts,
       b.value - a.value AS value_delta
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_type = 'view' AND b.event_type = 'purchase'
 AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 240 MINUTE
"""


# --- q_stream_dedup_increment: continuous corpus curation ---

_INCR_BATCHES = 4
_INCR_T = 0.5


def q_stream_dedup_increment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents replayed as 4 deterministic micro-batches through the
    streaming incremental-dedup loop: each batch dedups against the
    persisted LSH index of earlier KEPT docs + itself, then appends its
    survivors to the index. Output is every emitted dup pair; the
    oracle replays the same greedy sequence as unrolled per-batch CTEs."""
    from mora_spark.streaming.increment import (
        docs_chunked_source,
        stream_dedup_increment,
    )

    work = _work("stream_dedup_incr", sf_dir)
    src = docs_chunked_source(
        spark, sf_dir, _src_cache(sf_dir), n_chunks=_INCR_BATCHES
    )
    return stream_dedup_increment(spark, src, work, threshold=_INCR_T)


def _pairs_prefix_sql(
    t: float,
    band_size: int | None = None,
    n_bands: int | None = None,
) -> str:
    """The tokenize → MinHash → band → verify WITH-prefix shared by
    the streaming-replay oracles (same banding as
    :func:`mora_spark.queries.text._o_minhash`): defines ``pairs``
    (da < db, exact jaccard >= t) over the whole documents table.
    Defaults to the fixed module family; pass a recall-derived
    (band_size, n_bands) to replay that family symbolically — the
    affine prefix is shared, so the derived family's hashes are the
    first r*b of the same sequence."""
    from mora_spark.llm.dedup import BAND_SIZE, MINHASH_P, N_HASHES, minhash_ab
    from mora_spark.queries.text import TOKS_SQL

    r = BAND_SIZE if band_size is None else band_size
    nb = N_HASHES // BAND_SIZE if n_bands is None else n_bands
    sig_items = ", ".join(
        f"list_min(list_transform(ti, h -> ({a} * (h // 2) + {b}) % {MINHASH_P}))"
        for a, b in minhash_ab(r * nb)
    )
    return f"""t AS (
  SELECT doc_id,
         list_distinct(list_transform(list_distinct({TOKS_SQL}),
           tok -> CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT))) AS ti
  FROM documents
),
sig AS (SELECT doc_id, ti, len(ti) AS n, [{sig_items}] AS mh FROM t),
banded AS (
  SELECT doc_id, b,
         md5(array_to_string(mh[{r} * b + 1 : {r} * b + {r}], '|'))
           AS band_key
  FROM sig CROSS JOIN (SELECT unnest(range({nb})) AS b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
  FROM banded a JOIN banded b
    ON a.b = b.b AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
pairs AS (
  SELECT da, db, jaccard FROM (
    SELECT da, db,
           len(list_intersect(ta.ti, tb.ti))
             / (ta.n + tb.n - len(list_intersect(ta.ti, tb.ti))) AS jaccard
    FROM cand
    JOIN sig ta ON ta.doc_id = da
    JOIN sig tb ON tb.doc_id = db
    WHERE least(ta.n, tb.n) >= {t} * greatest(ta.n, tb.n)
  ) WHERE jaccard >= {t}
)"""


def _kept_ctes(
    n: int,
    member: "callable",
    seed_sql: str | None = None,
) -> tuple[list[str], list[str]]:
    """Shared unrolled replay of the streaming greedy drop rule:
    returns (kept CTEs, emitted-corpus-pair selects) for ``n``
    micro-batches. ``member(x, k)`` is a SQL predicate placing column
    ``x`` in micro-batch ``k``; ``seed_sql`` (optional) selects the
    doc_ids of a standing corpus the stream was seeded with — always
    "previously kept", exactly the sink's batch "-1". kept_k excludes
    docs pairing with an earlier kept doc (either orientation) or an
    earlier same-batch doc."""
    kept_ctes, emits = [], []
    for k in range(n):
        prevs = ([seed_sql] if seed_sql else []) + [
            f"SELECT doc_id FROM kept_{j}" for j in range(k)
        ]
        prev = (
            " UNION ALL ".join(prevs)
            or "SELECT NULL::BIGINT AS doc_id WHERE false"
        )
        kept_ctes.append(f"""
prev_{k} AS ({prev}),
dropped_{k} AS (
  SELECT p.db AS doc_id FROM pairs p
  WHERE {member("p.db", k)} AND {member("p.da", k)}
  UNION ALL
  SELECT p.db FROM pairs p JOIN prev_{k} u ON p.da = u.doc_id
  WHERE {member("p.db", k)}
  UNION ALL
  SELECT p.da FROM pairs p JOIN prev_{k} u ON p.db = u.doc_id
  WHERE {member("p.da", k)}
),
kept_{k} AS (
  SELECT doc_id FROM documents
  WHERE {member("doc_id", k)}
    AND doc_id NOT IN (SELECT doc_id FROM dropped_{k})
)""")
        emits.append(f"""
SELECT p.db AS doc_id, p.da AS dup_id, p.jaccard, 'corpus' AS src
FROM pairs p JOIN prev_{k} u ON p.da = u.doc_id WHERE {member("p.db", k)}
UNION ALL
SELECT p.da, p.db, p.jaccard, 'corpus'
FROM pairs p JOIN prev_{k} u ON p.db = u.doc_id WHERE {member("p.da", k)}""")
    return kept_ctes, emits


def _o_stream_dedup(
    n: int,
    t: float,
    member: "callable",
    seed_sql: str | None = None,
) -> str:
    """Replay oracle for the PAIR output of the streaming dedup sink:
    emitted rows mirror the engine's (doc_id, dup_id, jaccard, src)."""
    kept_ctes, emits = _kept_ctes(n, member, seed_sql)
    same_batch = " OR ".join(
        f"({member('p.da', k)} AND {member('p.db', k)})" for k in range(n)
    )
    intra = f"""
SELECT p.db AS doc_id, p.da AS dup_id, p.jaccard, 'batch' AS src
FROM pairs p WHERE {same_batch}"""
    return f"""
WITH {_pairs_prefix_sql(t)},{",".join(kept_ctes)}
{intra}
{"".join("UNION ALL" + e for e in emits)}
"""


def _o_stream_kept(
    n: int,
    t: float,
    member: "callable",
    seed_sql: str | None = None,
    extra_ctes: str = "",
    band_size: int | None = None,
    n_bands: int | None = None,
) -> str:
    """Replay oracle for the KEPT set of the streaming dedup sink (the
    curated corpus: union of every batch's survivors). ``extra_ctes``
    are injected after the pairs prefix so ``member`` may reference
    them (e.g. a quality/language gate). ``band_size``/``n_bands``
    replay a non-default (e.g. recall-derived) banding family."""
    kept_ctes, _ = _kept_ctes(n, member, seed_sql)
    union = " UNION ALL ".join(
        f"SELECT doc_id FROM kept_{k}" for k in range(n)
    )
    extra = ("," + extra_ctes) if extra_ctes else ""
    prefix = _pairs_prefix_sql(t, band_size, n_bands)
    return f"WITH {prefix}{extra},{','.join(kept_ctes)} {union}"


def _o_stream_dedup_increment(
    n: int = _INCR_BATCHES, t: float = _INCR_T
) -> str:
    """Replay of q_stream_dedup_increment: batch k = docs with
    doc_id % n == k, no seed corpus."""
    return _o_stream_dedup(n, t, lambda x, k: f"{x} % {n} = {k}")


# --- q_stream_dedup_seeded: continuous curation against a standing corpus ---

_SEED_CHUNKS = 3


def q_stream_dedup_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The seeded continuous-curation composition: half the corpus
    (even doc_ids) is indexed up front with ``save_minhash_index`` —
    the sharded, directory-pruned layout — and the other half streams
    through the incremental-dedup sink in 3 micro-batches with the
    saved index as ``seed_index_path``. Every batch dedups against
    seed + earlier kept streamed docs + itself; only streamed
    survivors grow the sink-owned index. The oracle replays the same
    greedy sequence with the seed as batch "-1"."""
    from mora_spark.llm.dedup import build_minhash_index, save_minhash_index
    from mora_spark.streaming.increment import (
        docs_chunked_source,
        stream_dedup_increment,
    )

    work = _work("stream_dedup_seeded", sf_dir)
    seed_ix = os.path.join(work, "seed_index")
    seed_docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") % 2 == 0)
    )
    save_minhash_index(*build_minhash_index(seed_docs), seed_ix)
    src = docs_chunked_source(
        spark, sf_dir, _src_cache(sf_dir), n_chunks=_SEED_CHUNKS,
        filter_expr="doc_id % 2 = 1", chunk_expr="doc_id div 2",
    )
    return stream_dedup_increment(
        spark, src, work, threshold=_INCR_T, seed_index_path=seed_ix
    )


def _o_stream_dedup_seeded(
    n: int = _SEED_CHUNKS, t: float = _INCR_T
) -> str:
    """Replay of q_stream_dedup_seeded: seed = even doc_ids (standing
    corpus, always previously-kept); batch k = odd docs with
    (doc_id // 2) % n == k."""
    return _o_stream_dedup(
        n,
        t,
        lambda x, k: f"({x} % 2 = 1 AND ({x} // 2) % {n} = {k})",
        seed_sql="SELECT doc_id FROM documents WHERE doc_id % 2 = 0",
    )


# --- q_stream_csv: streaming CSV corpus ingest with quarantine ---
# The CSV twin of q_stream_jsonl: documents replayed as headered CSV
# shard micro-batches, one shard carrying PLANTED malformed rows (a
# wrong-typed doc_id and a bare unparsable line). The stream must
# survive — bad rows land in _corrupt_record with nulled schema
# fields — and the parquet-sunk result must reconcile exactly with
# the batch table + the planting arithmetic.

def q_stream_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mora_spark.sources.csvio import (
        CORRUPT_COL,
        read_csv_stream,
        write_csv,
    )

    work = _work("stream_csv", sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    src = os.path.join(work, "src")
    write_csv(docs.repartition(4, "doc_id"), src)
    parts = sorted(n for n in os.listdir(src) if n.endswith(".csv"))
    for i, n in enumerate(parts):
        os.utime(os.path.join(src, n), (1_600_000_000 + i,) * 2)
    bad = os.path.join(src, "part-mid-planted.csv")
    with open(bad, "w") as f:
        f.write("doc_id,text,lang,source,n_chars\n")
        f.write('notanumber,"typed wrong",en,web,5\n')
        f.write("bare unparsable line\n")
    os.utime(bad, (1_600_000_000 + len(parts) // 2,) * 2)
    out = os.path.join(work, "ingested")
    q = (
        read_csv_stream(spark, src, docs)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(work, "ckpt_csv"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    back = spark.read.parquet(out)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.col(CORRUPT_COL)).alias("n_quarantined"),
        F.count_distinct(
            F.when(F.col(CORRUPT_COL).isNull(), F.col("doc_id"))
        ).alias("n_docs"),
        F.sum(
            F.when(F.col(CORRUPT_COL).isNull(), F.col("n_chars"))
        ).alias("sum_chars"),
    )


O_STREAM_CSV = """
SELECT count(*) + 2 AS n_rows,
       CAST(2 AS BIGINT) AS n_quarantined,
       count(DISTINCT doc_id) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
"""


# --- q_stream_orc: streaming ORC corpus ingest ---
# The ORC twin of q_stream_csv/q_stream_jsonl, making the interchange
# matrix symmetric at 3 formats x batch+stream. ORC is self-describing
# binary — no quarantine column; a corrupt stripe fails the stream
# loudly rather than yielding quietly-null rows (sources/orcio.py) —
# so the gate here is lossless reconciliation: the documents table
# written as ORC shards, replayed as mtime-ordered micro-batches
# through read_orc_stream, parquet-sunk, and reconciled against the
# batch table via counts PLUS an order-insensitive all-column content
# hash (sum of per-row md5 prefixes over every field, the
# engine-independent hashing discipline) — a length-preserving
# corruption or a field swap anywhere breaks the row.

def q_stream_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mora_spark.sources.orcio import read_orc_stream, write_orc

    work = _work("stream_orc", sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    src = os.path.join(work, "src")
    write_orc(docs.repartition(4, "doc_id"), src)
    # Shard mtimes define replay order; one shard per micro-batch so
    # the stream actually exercises multi-batch file discovery.
    parts = sorted(n for n in os.listdir(src) if n.endswith(".orc"))
    for i, n in enumerate(parts):
        os.utime(os.path.join(src, n), (1_600_000_000 + i,) * 2)
    out = os.path.join(work, "ingested")
    q = (
        read_orc_stream(spark, src, docs, max_files_per_trigger=1)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(work, "ckpt_orc"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    back = spark.read.parquet(out)
    row_hash = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|", "doc_id", "text", "lang", "source", "n_chars"
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("doc_id").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum(row_hash).alias("content_hash"),
    )


O_STREAM_ORC = """
SELECT count(*) AS n_rows,
       count(DISTINCT doc_id) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(sum(CAST(('0x' || substr(md5(
              concat_ws('|', doc_id, text, lang, source, n_chars)
            ), 1, 8)) AS BIGINT)) AS BIGINT) AS content_hash
FROM documents
"""


# --- q_stream_drift: continuous PSI gate over ingest micro-batches ---
# The data-quality loop a continuously-training pipeline runs: every
# micro-batch's value distribution is PSI-scored against the standing
# reference corpus BEFORE the batch is trusted (batch-only bins — mass
# in ranges the reference never saw — are the loudest drift signal and
# are reported as counts, never epsilon-clamped). Per batch: one
# bounded-key count agg over the BATCH + a broadcast join against the
# cached reference shares; the reference is computed once per stream.
# The oracle unrolls reference-vs-batch-k per micro-batch.

_DRIFT_STREAM_BATCHES = 4


def q_stream_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mora_spark.queries.relational import psi_between, value_shares
    from mora_spark.streaming.ingest import _state_partitions

    from mora_spark.streaming.chunked import chunked_replay_source

    work = _work("stream_drift", sf_dir)
    e = load_table(spark, sf_dir, "events")
    n = _DRIFT_STREAM_BATCHES
    # Batch k = events with event_id % n == k; mtimes define replay
    # order (maxFilesPerTrigger=1 -> deterministic batch membership).
    # The shared helper writes all n chunks in ONE pass over events
    # (previously one filtered scan + write per chunk — guide §2.4);
    # batch membership and replay order are unchanged, and the PSI
    # aggregation is row-order-insensitive within a batch.
    src = chunked_replay_source(
        spark, e, os.path.join(work, "src"), n, f"event_id % {n}"
    )
    ref = value_shares(e).persist()
    ref.count()
    out = os.path.join(work, "psi")
    try:

        def sink(batch: DataFrame, batch_id: int) -> None:
            # Deterministic per-batch dir + overwrite: replay-idempotent
            # (same discipline as every foreachBatch sink here).
            psi_between(ref, value_shares(batch)).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(out, f"batch_id={batch_id}"))

        with _state_partitions(spark, 8):
            q = (
                spark.readStream.schema(e.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
                .writeStream.foreachBatch(sink)
                .option("checkpointLocation", os.path.join(work, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        ref.unpersist()
    return spark.read.parquet(out).select(
        F.col("batch_id").cast("long").alias("batch"),
        "event_type",
        "psi",
        "n_bins_common",
        F.col("n_bins_a_only").alias("n_bins_ref_only"),
        F.col("n_bins_b_only").alias("n_bins_batch_only"),
    )


def _o_stream_drift(n: int = _DRIFT_STREAM_BATCHES) -> str:
    blocks = []
    for k in range(n):
        blocks.append(f"""
c_{k} AS (
  SELECT event_type, CAST(floor(value / 50.0) * 50.0 AS DOUBLE) AS bin,
         count(*) AS n
  FROM events WHERE event_id % {n} = {k} GROUP BY 1, 2
), t_{k} AS (
  SELECT event_type, sum(n) AS tot FROM c_{k} GROUP BY 1
), s_{k} AS (
  SELECT c_{k}.event_type, c_{k}.bin,
         CAST(c_{k}.n AS DOUBLE) / t_{k}.tot AS sb
  FROM c_{k} JOIN t_{k} USING (event_type)
), j_{k} AS (
  SELECT coalesce(ref.event_type, s_{k}.event_type) AS event_type,
         ref.share AS sa, s_{k}.sb AS sb
  FROM ref FULL OUTER JOIN s_{k}
    ON ref.event_type = s_{k}.event_type AND ref.bin = s_{k}.bin
), p_{k} AS (
  SELECT CAST({k} AS BIGINT) AS batch, event_type,
    CAST(sum(CASE WHEN sa IS NOT NULL AND sb IS NOT NULL
         THEN CAST((sa - sb) * ln(sa / sb) AS DECIMAL(38,10)) END)
         AS DOUBLE) AS psi,
    CAST(sum(CASE WHEN sa IS NOT NULL AND sb IS NOT NULL THEN 1 ELSE 0
         END) AS BIGINT) AS n_bins_common,
    CAST(sum(CASE WHEN sb IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS n_bins_ref_only,
    CAST(sum(CASE WHEN sa IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS n_bins_batch_only
  FROM j_{k} GROUP BY event_type
)""")
    union = " UNION ALL ".join(f"SELECT * FROM p_{k}" for k in range(n))
    return f"""
WITH rc AS (
  SELECT event_type, CAST(floor(value / 50.0) * 50.0 AS DOUBLE) AS bin,
         count(*) AS n
  FROM events GROUP BY 1, 2
), rt AS (
  SELECT event_type, sum(n) AS tot FROM rc GROUP BY 1
), ref AS (
  SELECT rc.event_type, rc.bin, CAST(rc.n AS DOUBLE) / rt.tot AS share
  FROM rc JOIN rt USING (event_type)
),{",".join(blocks)}
{union}
"""


# --- q_corpus_pipeline_jsonl: the crawl-shaped pipeline, end-to-end ---
# The flagship composition: JSONL shards (one planted-bad shard
# mid-stream) -> PERMISSIVE quarantine -> language/quality/token gates
# -> incremental LSH dedup against the growing index of earlier kept
# docs -> batch-atomic curated appends -> packed training shards. Each
# stage is an operator already driver-verified alone (q_stream_jsonl,
# q_quality_rules/q_lang_id, q_stream_dedup_increment,
# q_pack_sequences); this query checks their COMPOSITION in one
# streaming job, replayed in DuckDB as gate-CTEs + the unrolled greedy
# kept-set + the prefix-sum packing.

_PIPE_BATCHES = 4
_PIPE_T = 0.8


def _jsonl_shards(
    df: DataFrame, src: str, n: int, shard_expr: str
) -> None:
    """Write ``df`` as ``n`` single-file JSONL shards (shard k = rows
    where ``shard_expr`` evaluates to k) named ``shard-<k>.json`` with
    mtimes ``1_600_000_000 + 2k`` — the replay order, with a GAP at
    every odd offset so a planted-bad shard can be inserted mid-stream.

    ONE pass over ``df`` (previously one filtered scan + single-file
    JSON write per shard — n full scans; guide §2.4): hash-repartition
    on the shard value puts each shard in exactly one task, partitionBy
    splits per shard directory (one file each). Shard MEMBERSHIP is
    identical to the per-k filters; row order within a file is pinned
    by doc_id for reproducible bytes (the pipeline's kept set is
    id-greedy, never file-order-dependent)."""
    staged = src + ".build"
    shutil.rmtree(staged, ignore_errors=True)
    (
        df.withColumn("__shard", F.expr(shard_expr))
        .repartition(n, "__shard")
        .sortWithinPartitions("__shard", "doc_id")
        .write.mode("overwrite")
        .partitionBy("__shard")
        .json(staged)
    )
    os.makedirs(src, exist_ok=True)
    for k in range(n):
        part_dir = os.path.join(staged, f"__shard={k}")
        part = next(
            p for p in os.listdir(part_dir) if p.endswith(".json")
        )
        dst = os.path.join(src, f"shard-{k}.json")
        os.replace(os.path.join(part_dir, part), dst)
        os.utime(dst, (1_600_000_000 + 2 * k,) * 2)
    shutil.rmtree(staged, ignore_errors=True)


def q_corpus_pipeline_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mora_spark.functions.text import lang_guess, quality_score, tokens
    from mora_spark.llm.curation import pack_sequences
    from mora_spark.queries.curation import PACK_BUDGET
    from mora_spark.streaming.pipeline import stream_curate_jsonl

    work = _work("corpus_pipeline", sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    src = os.path.join(work, "src")
    # Shard k = docs with doc_id % 4 == k; mtimes define replay order
    # (maxFilesPerTrigger=1 -> one shard per micro-batch).
    _jsonl_shards(docs, src, _PIPE_BATCHES, f"doc_id % {_PIPE_BATCHES}")
    # The planted-bad shard arrives mid-stream (between shards 1 and
    # 2): both lines must quarantine without killing the job or
    # perturbing the kept set.
    bad = os.path.join(src, "shard-planted-bad.json")
    with open(bad, "w") as f:
        f.write('{"doc_id": 999999, "text": "truncated mid-wri\n')
        f.write("plain text, not a record\n")
    os.utime(bad, (1_600_000_000 + 3,) * 2)

    def gate(df: DataFrame) -> DataFrame:
        toks = tokens("text")
        return df.where(
            (lang_guess(toks) == "en")
            & (quality_score(toks) >= 0.5)
            & (F.size(toks) >= 20)
        )

    curated, n_quar = stream_curate_jsonl(
        spark, src, work, docs, threshold=_PIPE_T, gate=gate
    )
    return pack_sequences(curated, budget=PACK_BUDGET).withColumn(
        "n_quarantined", F.lit(n_quar).cast("long")
    )


def _o_corpus_pipeline(n: int = _PIPE_BATCHES, t: float = _PIPE_T) -> str:
    from mora_spark.queries.curation import PACK_BUDGET
    from mora_spark.queries.text import TOKS_SQL

    gated = _gated_cte()
    kept_sql = _o_stream_kept(
        n,
        t,
        lambda x, k: (
            f"({x} % {n} = {k} AND {x} IN (SELECT doc_id FROM gated))"
        ),
        extra_ctes=gated,
    )
    return f"""
WITH kept AS ({kept_sql}),
pt AS (
  SELECT doc_id, len({TOKS_SQL})::BIGINT AS tok_len
  FROM documents WHERE doc_id IN (SELECT doc_id FROM kept)
),
pc AS (
  SELECT doc_id, tok_len,
         CAST(sum(tok_len) OVER (ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM pt
)
SELECT doc_id, tok_len, cum_tokens,
       CAST(floor((cum_tokens - tok_len) / {PACK_BUDGET}.0) AS BIGINT)
         AS bin_first,
       CAST(floor((cum_tokens - 1) / {PACK_BUDGET}.0) AS BIGINT)
         AS bin_last,
       CAST(floor((cum_tokens - 1) / {PACK_BUDGET}.0) AS BIGINT)
         - CAST(floor((cum_tokens - tok_len) / {PACK_BUDGET}.0) AS BIGINT)
         + 1 AS n_bins,
       CAST(2 AS BIGINT) AS n_quarantined
FROM pc
"""


# --- q_corpus_pipeline_seeded: the pipeline against a standing corpus ---
# The r15 seeded-pipeline feature under the driver's hash gate: half
# the corpus (even doc_ids) is indexed up front with a RECALL-DERIVED
# banding family — derive_minhash_params(0.8) = (6, 16), not the fixed
# (4, 4) — and the odd half streams through stream_curate_jsonl in 3
# shards with that index as seed_index_path. Every batch must dedup
# against seed + earlier kept + itself USING THE SEED'S FAMILY (the
# family-follows-seed contract), the planted-bad shard must quarantine
# mid-stream, and the sink-owned index must inherit the seed family
# (pinned by emitting the post-stream sink family as columns). The
# oracle replays the derived family symbolically, the seed as batch
# "-1", and the gates as CTEs.

_SPIPE_BATCHES = 3


def _gated_cte() -> str:
    """The language/quality/token-floor gate of the pipeline rows, as
    a ``gated(doc_id)`` CTE (shared by the plain and seeded oracles —
    must mirror the ``gate`` closure in the Spark queries)."""
    from mora_spark.queries.text import O_TEXT_STATS, _o_lang_id

    return f"""gated AS (
  SELECT d.doc_id FROM documents d
  JOIN (SELECT doc_id, lang_guess FROM ({_o_lang_id()})) l USING (doc_id)
  JOIN (SELECT doc_id, quality, n_tokens FROM ({O_TEXT_STATS})) q
    USING (doc_id)
  WHERE lang_guess = 'en' AND quality >= 0.5 AND n_tokens >= 20
)"""


def q_corpus_pipeline_seeded(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from mora_spark.functions.text import lang_guess, quality_score, tokens
    from mora_spark.llm.dedup import (
        build_minhash_index,
        derive_minhash_params,
        load_minhash_family,
        save_minhash_index,
    )
    from mora_spark.streaming.pipeline import stream_curate_jsonl

    work = _work("corpus_pipeline_seeded", sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    r, b = derive_minhash_params(_PIPE_T)
    seed_ix = os.path.join(work, "seed_index")
    seed_docs = docs.select("doc_id", "text").where(
        F.col("doc_id") % 2 == 0
    )
    save_minhash_index(
        *build_minhash_index(seed_docs, band_size=r, n_bands=b),
        seed_ix,
        band_size=r,
        n_bands=b,
    )
    src = os.path.join(work, "src")
    odd = docs.where(F.col("doc_id") % 2 == 1)
    _jsonl_shards(
        odd, src, _SPIPE_BATCHES, f"(doc_id div 2) % {_SPIPE_BATCHES}"
    )
    # the planted-bad shard arrives mid-stream, as in the plain row
    bad = os.path.join(src, "shard-planted-bad.json")
    with open(bad, "w") as f:
        f.write('{"doc_id": 999999, "text": "truncated mid-wri\n')
        f.write("plain text, not a record\n")
    os.utime(bad, (1_600_000_000 + 3,) * 2)

    def gate(df: DataFrame) -> DataFrame:
        toks = tokens("text")
        return df.where(
            (lang_guess(toks) == "en")
            & (quality_score(toks) >= 0.5)
            & (F.size(toks) >= 20)
        )

    curated, n_quar = stream_curate_jsonl(
        spark,
        src,
        work,
        docs,
        threshold=_PIPE_T,
        gate=gate,
        seed_index_path=seed_ix,
    )
    # family-follows-seed, pinned through the driver hash: the sink-
    # owned index must carry the seed's derived family, not a default
    fam = load_minhash_family(os.path.join(work, "lsh_index"))
    return (
        curated.select("doc_id")
        .withColumn("n_quarantined", F.lit(n_quar).cast("long"))
        .withColumn("band_size", F.lit(fam[0]).cast("long"))
        .withColumn("n_bands", F.lit(fam[1]).cast("long"))
    )


def _o_corpus_pipeline_seeded(
    n: int = _SPIPE_BATCHES, t: float = _PIPE_T
) -> str:
    from mora_spark.llm.dedup import derive_minhash_params

    r, b = derive_minhash_params(t)
    kept_sql = _o_stream_kept(
        n,
        t,
        lambda x, k: (
            f"({x} % 2 = 1 AND ({x} // 2) % {n} = {k} "
            f"AND {x} IN (SELECT doc_id FROM gated))"
        ),
        seed_sql="SELECT doc_id FROM documents WHERE doc_id % 2 = 0",
        extra_ctes=_gated_cte(),
        band_size=r,
        n_bands=b,
    )
    return f"""
SELECT doc_id, CAST(2 AS BIGINT) AS n_quarantined,
       CAST({r} AS BIGINT) AS band_size,
       CAST({b} AS BIGINT) AS n_bands
FROM ({kept_sql})
"""


QUERIES = {
    "q_corpus_pipeline_jsonl": q_corpus_pipeline_jsonl,
    "q_corpus_pipeline_seeded": q_corpus_pipeline_seeded,
    "q_stream_drift": q_stream_drift,
    "q_stream_csv": q_stream_csv,
    "q_stream_orc": q_stream_orc,
    "q_stream_drawdown": q_stream_drawdown,
    "q_stream_store_asof": q_stream_store_asof,
    "q_stream_ingest": q_stream_ingest,
    "q_stream_dedup_increment": q_stream_dedup_increment,
    "q_stream_dedup_seeded": q_stream_dedup_seeded,
    "q_stream_wire": q_stream_wire,
    "q_stream_jsonl": q_stream_jsonl,
    "q_stream_candles": q_stream_candles,
    "q_stream_store_merge": q_stream_store_merge,
    "q_stream_store_rollup": q_stream_store_rollup,
    "q_stream_sessions": q_stream_sessions,
    "q_stream_ema": q_stream_ema,
    "q_stream_sliding": q_stream_sliding,
    "q_stream_enrich": q_stream_enrich,
    "q_stream_join": q_stream_join,
}

ORACLES = {
    "q_corpus_pipeline_jsonl": _o_corpus_pipeline(),
    "q_corpus_pipeline_seeded": _o_corpus_pipeline_seeded(),
    "q_stream_drift": _o_stream_drift(),
    "q_stream_csv": O_STREAM_CSV,
    "q_stream_orc": O_STREAM_ORC,
    "q_stream_drawdown": O_STREAM_DRAWDOWN,
    "q_stream_store_asof": O_STREAM_STORE_ASOF,
    "q_stream_ingest": O_STREAM_INGEST,
    "q_stream_dedup_increment": _o_stream_dedup_increment(),
    "q_stream_dedup_seeded": _o_stream_dedup_seeded(),
    "q_stream_wire": O_STREAM_WIRE,
    "q_stream_jsonl": O_STREAM_JSONL,
    "q_stream_candles": O_STREAM_CANDLES,
    "q_stream_store_merge": O_STREAM_STORE_MERGE,
    "q_stream_store_rollup": O_STREAM_STORE_ROLLUP,
    "q_stream_sessions": O_STREAM_SESSIONS,
    "q_stream_ema": O_STREAM_EMA,
    "q_stream_sliding": O_STREAM_SLIDING,
    "q_stream_enrich": O_STREAM_ENRICH,
    "q_stream_join": O_STREAM_JOIN,
}
