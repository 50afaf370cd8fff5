"""Candle/time-series declared queries + DuckDB oracles.

All candle queries derive the 1-minute candle table from ``events``
via :func:`mora_spark.datasets.candles_from_events`; the oracle shares
the equivalent ``candles`` CTE (:data:`mora_spark.datasets.CANDLES_CTE_SQL`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mora_spark.datasets import candles_from_events, candles_sql, load_table
from mora_spark.operators import (
    asof_join,
    ema,
    fill_gaps,
    resample,
    sma,
    top_k,
    vwap,
    with_lag_lead,
)
from mora_spark.operators.upsert import last_writer_wins
from mora_spark.operators.windows import rolling

SERIES_COLS = ["market", "code", "candle_length", "ts"]


def _candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return candles_from_events(load_table(spark, sf_dir, "events"))


# --- q_candles_1m: the flagship ingest/aggregate (SURVEY §2.A rows 1-4) ---

def q_candles_1m(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _candles(spark, sf_dir)


O_CANDLES_1M = candles_sql("SELECT * FROM candles")


# --- q_upsert_lww: last-writer-wins merge of 3 simulated writer batches
#     (reference keep-new tie-break, page/page.go:118-123) ---

def q_upsert_lww(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    ticks = events.select(
        F.lit("SYN").alias("market"),
        F.col("event_type").alias("code"),
        F.lit(60).alias("candle_length"),
        F.timestamp_seconds(
            (F.unix_timestamp("ts") / 60).cast("bigint") * 60
        ).alias("ts"),
        F.col("value").alias("close"),
        (F.col("event_id") % 3).alias("ingest_seq"),
        F.col("event_id"),
    )
    merged = last_writer_wins(
        ticks, key=SERIES_COLS, order_cols=["ingest_seq", "event_id"]
    )
    return merged.drop("ingest_seq", "event_id")


O_UPSERT_LWW = """
SELECT market, code, candle_length, ts, close FROM (
  SELECT 'SYN' AS market, event_type AS code, 60 AS candle_length,
         make_timestamp(CAST(floor(epoch(ts) / 60) AS BIGINT) * 60 * 1000000) AS ts,
         value AS close,
         row_number() OVER (
           PARTITION BY event_type,
                        CAST(floor(epoch(ts) / 60) AS BIGINT)
           ORDER BY (event_id % 3) DESC, event_id DESC
         ) AS rn
  FROM events
) WHERE rn = 1
"""


# --- q_range_scan: keyed time-range read (SURVEY §2.A row 7) ---

def q_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _candles(spark, sf_dir)
    return c.where(
        (F.col("code").isin("click", "view"))
        & (F.col("ts") >= F.lit("2024-01-10 00:00:00"))
        & (F.col("ts") < F.lit("2024-01-20 00:00:00"))
    ).select("market", "code", "candle_length", "ts", "close", "volume")


O_RANGE_SCAN = candles_sql(
    """
SELECT market, code, candle_length, ts, close, volume
FROM candles
WHERE code IN ('click', 'view')
  AND ts >= TIMESTAMP '2024-01-10 00:00:00'
  AND ts <  TIMESTAMP '2024-01-20 00:00:00'
"""
)


# --- q_resample_5m / q_resample_1h: candle-length conversion ---

def q_resample_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    return resample(_candles(spark, sf_dir), 300)


def q_resample_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    return resample(_candles(spark, sf_dir), 3600)


def _resample_oracle(step: int) -> str:
    return candles_sql(
        f"""
SELECT market, code, {step} AS candle_length, bucket_ts AS ts,
       arg_min(open, ts) AS open, max(high) AS high, min(low) AS low,
       arg_max(close, ts) AS close, sum(volume) AS volume,
       CAST(sum(bit_fields) AS BIGINT) AS bit_fields
FROM (
  SELECT *, make_timestamp(CAST(floor(epoch(ts) / {step}) AS BIGINT)
            * {step} * 1000000) AS bucket_ts
  FROM candles
)
GROUP BY market, code, bucket_ts
"""
    )


# --- q_resample_anchored: session-aligned daily candles ---
# Daily bars anchored at a 09:30 session open (anchor 34200 s):
# each bar covers [k·86400 + 34200, (k+1)·86400 + 34200), so a
# trading session is never split across two midnight-aligned bars.

ANCHOR_S = 34_200  # 09:30 UTC


def q_resample_anchored(spark: SparkSession, sf_dir: str) -> DataFrame:
    return resample(_candles(spark, sf_dir), 86_400, anchor_s=ANCHOR_S)


O_RESAMPLE_ANCHORED = candles_sql(
    f"""
SELECT market, code, 86400 AS candle_length, bucket_ts AS ts,
       arg_min(open, ts) AS open, max(high) AS high, min(low) AS low,
       arg_max(close, ts) AS close, sum(volume) AS volume,
       CAST(sum(bit_fields) AS BIGINT) AS bit_fields
FROM (
  SELECT *, make_timestamp((CAST(floor((epoch(ts) - {ANCHOR_S}) / 86400)
            AS BIGINT) * 86400 + {ANCHOR_S}) * 1000000) AS bucket_ts
  FROM candles
)
GROUP BY market, code, bucket_ts
"""
)


# --- q_mtf_join: multi-timeframe context enrichment ---
# Each 1-minute bar joined to its series' PREVIOUS COMPLETED 1-hour
# bar (bucket - 3600): the lookahead-free form — joining the current
# hour's bar would leak the future into the minute rows. Left join so
# the first hour's minutes survive with NULL context.

def q_mtf_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _candles(spark, sf_dir)
    h = resample(c, 3600).select(
        F.col("market").alias("h_market"),
        F.col("code").alias("h_code"),
        F.col("ts").alias("h_ts"),
        F.col("open").alias("h_open"),
        F.col("high").alias("h_high"),
        F.col("low").alias("h_low"),
        F.col("close").alias("h_close"),
        F.col("volume").alias("h_volume"),
    )
    # Shared floored bucket grid (operators.resample.bucket_expr) minus
    # one hour — a truncation cast here would diverge from resample's
    # (and the oracle's) floor on pre-1970 timestamps.
    from mora_spark.operators.resample import bucket_expr

    prev_hour = bucket_expr(3600) - F.expr("INTERVAL 3600 SECONDS")
    return (
        c.withColumn("prev_h", prev_hour)
        .join(
            h,
            (F.col("market") == F.col("h_market"))
            & (F.col("code") == F.col("h_code"))
            & (F.col("prev_h") == F.col("h_ts")),
            "left",
        )
        .select(
            "market", "code", "candle_length", "ts", "close",
            "h_open", "h_high", "h_low", "h_close", "h_volume",
        )
    )


O_MTF_JOIN = candles_sql(
    """
, h AS (
  SELECT market, code,
         make_timestamp(CAST(floor(epoch(ts) / 3600) AS BIGINT)
                        * 3600 * 1000000) AS h_ts,
         arg_min(open, ts) AS h_open, max(high) AS h_high,
         min(low) AS h_low, arg_max(close, ts) AS h_close,
         sum(volume) AS h_volume
  FROM candles
  GROUP BY market, code, h_ts
)
SELECT c.market, c.code, c.candle_length, c.ts, c.close,
       h.h_open, h.h_high, h.h_low, h.h_close, h.h_volume
FROM candles c
LEFT JOIN h
  ON h.market = c.market AND h.code = c.code
 AND h.h_ts = make_timestamp((CAST(floor(epoch(c.ts) / 3600) AS BIGINT)
                              * 3600 - 3600) * 1000000)
"""
)


# --- q_gapfill: densify + forward fill ---

def q_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fill_gaps(_candles(spark, sf_dir)).select(
        "market", "code", "candle_length", "ts", "close", "volume", "filled"
    )


O_GAPFILL = candles_sql(
    """
, bounds AS (
  SELECT market, code, candle_length, min(ts) AS min_ts, max(ts) AS max_ts
  FROM candles GROUP BY market, code, candle_length
), grid AS (
  SELECT market, code, candle_length,
         unnest(generate_series(min_ts, max_ts, INTERVAL 60 SECOND)) AS ts
  FROM bounds
), j AS (
  SELECT g.market, g.code, g.candle_length, g.ts, c.close, c.volume
  FROM grid g
  LEFT JOIN candles c
    ON c.market = g.market AND c.code = g.code
   AND c.candle_length = g.candle_length AND c.ts = g.ts
)
SELECT market, code, candle_length, ts,
       last_value(close IGNORE NULLS) OVER (
         PARTITION BY market, code, candle_length ORDER BY ts
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS close,
       coalesce(volume, 0.0) AS volume,
       (close IS NULL) AS filled
FROM j
"""
)


# --- q_gapfill_interp: densify + LINEAR interpolation ---
# fill_gaps carries the last observation forward; interpolate_gaps is
# the Timescale-interpolate / Influx-fill(linear) analogue — missing
# bars get the straight line between the neighboring known closes, and
# edge rows (before the first / after the last known value) stay NULL
# rather than extrapolate. Two ignore-nulls windows (carried prev,
# pending next) over ONE (key, ts) sort — same single shuffle as the
# forward fill.

def q_gapfill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mora_spark.operators.gapfill import interpolate_gaps

    return interpolate_gaps(_candles(spark, sf_dir))


O_GAPFILL_INTERP = candles_sql(
    """
, bounds AS (
  SELECT market, code, candle_length, min(ts) AS min_ts, max(ts) AS max_ts
  FROM candles GROUP BY market, code, candle_length
), grid AS (
  SELECT market, code, candle_length,
         unnest(generate_series(min_ts, max_ts, INTERVAL 60 SECOND)) AS ts
  FROM bounds
), j AS (
  SELECT g.market, g.code, g.candle_length, g.ts, c.close
  FROM grid g
  LEFT JOIN candles c
    ON c.market = g.market AND c.code = g.code
   AND c.candle_length = g.candle_length AND c.ts = g.ts
), w AS (
  SELECT market, code, candle_length, ts, close,
    last_value(close IGNORE NULLS) OVER pw AS prev_v,
    last_value(CASE WHEN close IS NOT NULL THEN epoch(ts)::BIGINT END
               IGNORE NULLS) OVER pw AS prev_t,
    first_value(close IGNORE NULLS) OVER fw AS next_v,
    first_value(CASE WHEN close IS NOT NULL THEN epoch(ts)::BIGINT END
                IGNORE NULLS) OVER fw AS next_t
  FROM j
  WINDOW pw AS (PARTITION BY market, code, candle_length ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         fw AS (PARTITION BY market, code, candle_length ORDER BY ts
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT market, code, candle_length, ts,
  CASE WHEN close IS NOT NULL THEN close
       WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
       THEN prev_v + (next_v - prev_v) *
            (CAST(epoch(ts)::BIGINT - prev_t AS DOUBLE)
             / CAST(next_t - prev_t AS DOUBLE))
  END AS close_interp,
  (close IS NULL) AS was_gap
FROM w
"""
)


# --- q_sma_roll: SMA(20) + rolling min/max(10) ---

def q_sma_roll(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = sma(_candles(spark, sf_dir), 20)
    c = rolling(c, "close", 10, aggs=["min", "max"])
    return c.select(
        "market", "code", "candle_length", "ts", "close",
        "sma_20", "roll_min_10", "roll_max_10",
    )


O_SMA_ROLL = candles_sql(
    """
SELECT market, code, candle_length, ts, close,
  CASE WHEN count(close) OVER w20 >= 20 THEN avg(close) OVER w20 END AS sma_20,
  CASE WHEN count(close) OVER w10 >= 10 THEN min(close) OVER w10 END AS roll_min_10,
  CASE WHEN count(close) OVER w10 >= 10 THEN max(close) OVER w10 END AS roll_max_10
FROM candles
WINDOW
  w20 AS (PARTITION BY market, code, candle_length ORDER BY ts
          ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
  w10 AS (PARTITION BY market, code, candle_length ORDER BY ts
          ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
"""
)


# --- q_lag_lead: per-series shift analytics ---

def q_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_lag_lead(_candles(spark, sf_dir)).select(
        "market", "code", "candle_length", "ts", "close",
        "lag_close", "lead_close", "delta", "ret", "rn",
    )


O_LAG_LEAD = candles_sql(
    """
SELECT market, code, candle_length, ts, close,
  lag(close) OVER w AS lag_close,
  lead(close) OVER w AS lead_close,
  close - lag(close) OVER w AS delta,
  CASE WHEN lag(close) OVER w <> 0
       THEN (close - lag(close) OVER w) / lag(close) OVER w END AS ret,
  row_number() OVER w AS rn
FROM candles
WINDOW w AS (PARTITION BY market, code, candle_length ORDER BY ts)
"""
)


# --- q_vwap: cumulative daily VWAP ---

def q_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vwap(_candles(spark, sf_dir)).select(
        "market", "code", "candle_length", "ts", "close", "volume", "vwap"
    )


O_VWAP = candles_sql(
    """
SELECT market, code, candle_length, ts, close, volume,
  CASE WHEN sum(volume) OVER w <> 0
       THEN sum(close * volume) OVER w / sum(volume) OVER w END AS vwap
FROM candles
WINDOW w AS (PARTITION BY market, code, candle_length, date_trunc('day', ts)
             ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""
)


# --- q_topk_volume: top-3 volume bars per (code, day) ---

def q_topk_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _candles(spark, sf_dir).withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    t = top_k(
        c,
        partition=["market", "code", "day"],
        order=[F.col("volume").desc(), F.col("ts").asc()],
        k=3,
    )
    return t.select("market", "code", "day", "ts", "volume", "rank_k")


O_TOPK_VOLUME = candles_sql(
    """
SELECT market, code, day, ts, volume, rank_k FROM (
  SELECT market, code, strftime(ts, '%Y-%m-%d') AS day, ts, volume,
         row_number() OVER (
           PARTITION BY market, code, date_trunc('day', ts)
           ORDER BY volume DESC, ts ASC) AS rank_k
  FROM candles
) WHERE rank_k <= 3
"""
)


# --- q_ema_12: recursive indicator via applyInPandas; oracle is the
#     closed-form weighted sum built from the shared _ema_closed helper
#     (O_EMA_12 itself is defined after the helper, below O_MACD, so the
#     EMA_LAG truncation depth has a single source of truth) ---

def q_ema_12(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ema(_candles(spark, sf_dir), 12).select(
        "market", "code", "candle_length", "ts", "close", "ema_12"
    )


# --- q_asof_trades: as-of join of raw events against their series'
#     candles (latest bar at-or-before each event) ---

def q_asof_trades(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    trades = events.select(
        "event_id",
        F.lit("SYN").alias("market"),
        F.col("event_type").alias("code"),
        "ts",
        "value",
    )
    c = _candles(spark, sf_dir)
    out = asof_join(trades, c, on=["market", "code"], right_cols=["close", "volume"])
    return out.select(
        "event_id", "code", "ts", "value",
        F.col("close_asof"), F.col("volume_asof"),
    )


O_ASOF_TRADES = candles_sql(
    """
SELECT e.event_id, e.event_type AS code, e.ts, e.value,
       c.close AS close_asof, c.volume AS volume_asof
FROM events e
ASOF LEFT JOIN candles c
  ON e.event_type = c.code AND e.ts >= c.ts
"""
)


# --- q_rolling_corr: rolling 60-bar correlation between two series ---
# The classic pair-analytics window op. Full windows only (rn >= 60) so
# both engines agree on definedness; one pair = one task — computing
# many pairs would partition the window by the pair key.

def q_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _candles(spark, sf_dir)
    a = c.where(F.col("code") == "click").select("ts", F.col("close").alias("ca"))
    b = c.where(F.col("code") == "view").select("ts", F.col("close").alias("cb"))
    j = a.join(b, "ts")
    w = Window.orderBy("ts").rowsBetween(-59, 0)
    wn = Window.orderBy("ts")
    return (
        j.withColumn("corr60", F.round(F.corr("ca", "cb").over(w), 6))
        .withColumn("rn", F.row_number().over(wn))
        .where(F.col("rn") >= 60)
        .select("ts", "ca", "cb", "corr60")
    )


O_ROLLING_CORR = candles_sql(
    """
, a AS (SELECT ts, close AS ca FROM candles WHERE code = 'click'),
b AS (SELECT ts, close AS cb FROM candles WHERE code = 'view'),
j AS (SELECT a.ts, ca, cb FROM a JOIN b USING (ts))
SELECT ts, ca, cb, corr60 FROM (
  SELECT ts, ca, cb,
         round(corr(ca, cb) OVER (ORDER BY ts
               ROWS BETWEEN 59 PRECEDING AND CURRENT ROW), 6) AS corr60,
         row_number() OVER (ORDER BY ts) AS rn
  FROM j
) WHERE rn >= 60
"""
)



# --- q_validate_candles: batch data-quality report over the candle
#     derivation (all-zero violation counts on the clean corpus; the
#     n_rows column pins the compare to real data) ---

def q_validate_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mora_spark.schema import validate_candles

    return validate_candles(_candles(spark, sf_dir))


O_VALIDATE_CANDLES = candles_sql(
    """
SELECT count(*) AS n_rows,
       CAST(sum(CASE WHEN market IS NULL OR code IS NULL
                 OR candle_length IS NULL OR ts IS NULL
            THEN 1 ELSE 0 END) AS BIGINT) AS null_key,
       CAST(sum(CASE WHEN octet_length(encode(market)) > 10
            THEN 1 ELSE 0 END) AS BIGINT) AS market_too_long,
       CAST(sum(CASE WHEN octet_length(encode(code)) > 18
            THEN 1 ELSE 0 END) AS BIGINT) AS code_too_long,
       CAST(sum(CASE WHEN EXTRACT(year FROM ts) = 0
            THEN 1 ELSE 0 END) AS BIGINT) AS year_zero_sentinel,
       CAST(sum(CASE WHEN candle_length <= 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS bad_length,
       CAST(sum(CASE WHEN high < low THEN 1 ELSE 0 END)
            AS BIGINT) AS inverted_ohlc
FROM candles
"""
)


# --- q_time_window: TIME-RANGE window frame (rangeBetween) ---
# Trailing 1-hour stats per series ordered by event time, not row
# count: unlike q_sma_roll's ROWS frame, gaps in the series shrink
# the window (exact mora-style "last hour of bars" semantics).

def q_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _candles(spark, sf_dir)
    w = (
        Window.partitionBy("market", "code", "candle_length")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3599, 0)
    )
    return c.select(
        "market",
        "code",
        "candle_length",
        "ts",
        "close",
        F.avg("close").over(w).alias("avg_1h"),
        F.max("high").over(w).alias("high_1h"),
        F.min("low").over(w).alias("low_1h"),
        F.sum("volume").over(w).alias("vol_1h"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
    )


O_TIME_WINDOW = candles_sql(
    """
SELECT market, code, candle_length, ts, close,
       avg(close) OVER w AS avg_1h,
       max(high) OVER w AS high_1h,
       min(low) OVER w AS low_1h,
       sum(volume) OVER w AS vol_1h,
       count(*) OVER w AS n_1h
FROM candles
WINDOW w AS (PARTITION BY market, code, candle_length
             ORDER BY epoch(ts)
             RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
"""
)


# --- q_obv / q_atr: volume-flow and volatility indicators ---

def q_obv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mora_spark.operators.windows import obv

    return obv(_candles(spark, sf_dir)).select(
        "market", "code", "candle_length", "ts", "close", "volume", "obv"
    )


O_OBV = candles_sql(
    """
, d AS (
  SELECT market, code, candle_length, ts, close, volume,
         close - lag(close) OVER (PARTITION BY market, code, candle_length
                                  ORDER BY ts) AS d
  FROM candles
)
SELECT market, code, candle_length, ts, close, volume,
       CAST(sum(CAST(CASE WHEN d > 0 THEN volume
                          WHEN d < 0 THEN -volume
                          ELSE 0.0 END AS DECIMAL(38,10)))
            OVER (PARTITION BY market, code, candle_length ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS obv
FROM d
"""
)


def q_atr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mora_spark.operators.windows import atr

    return atr(_candles(spark, sf_dir), n=14).select(
        "market", "code", "candle_length", "ts", "tr", "atr_14"
    )


O_ATR = candles_sql(
    """
, t AS (
  SELECT market, code, candle_length, ts,
         CASE WHEN lag(close) OVER w IS NULL THEN high - low
              ELSE greatest(high - low,
                            abs(high - lag(close) OVER w),
                            abs(low - lag(close) OVER w)) END AS tr
  FROM candles
  WINDOW w AS (PARTITION BY market, code, candle_length ORDER BY ts)
)
SELECT market, code, candle_length, ts, tr,
       CASE WHEN count(tr) OVER w14 >= 14
            THEN round(avg(tr) OVER w14, 6) END AS atr_14
FROM t
WINDOW w14 AS (PARTITION BY market, code, candle_length ORDER BY ts
               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
"""
)


# --- q_stochastic: stochastic oscillator %K / %D ---

def q_stochastic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mora_spark.operators.windows import stochastic

    return stochastic(_candles(spark, sf_dir), n=14, d=3).select(
        "market", "code", "candle_length", "ts", "close",
        "stoch_k_14", "stoch_d_3",
    )


O_STOCHASTIC = candles_sql(
    """
, k AS (
  SELECT market, code, candle_length, ts, close,
    CASE WHEN count(close) OVER w >= 14 THEN
      CASE WHEN max(high) OVER w > min(low) OVER w
           THEN round(100.0 * (close - min(low) OVER w)
                      / (max(high) OVER w - min(low) OVER w), 6)
           ELSE 50.0 END
    END AS stoch_k_14
  FROM candles
  WINDOW w AS (PARTITION BY market, code, candle_length ORDER BY ts
               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)
SELECT market, code, candle_length, ts, close, stoch_k_14,
       CASE WHEN count(stoch_k_14) OVER wd >= 3
            THEN round(avg(stoch_k_14) OVER wd, 6) END AS stoch_d_3
FROM k
WINDOW wd AS (PARTITION BY market, code, candle_length ORDER BY ts
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""
)


# --- q_donchian: Donchian channel (n-bar extremes; exact, no rounding) ---

# --- q_drawdown: running-peak drawdown (risk analytics) ---

def q_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mora_spark.operators.windows import drawdown

    return drawdown(_candles(spark, sf_dir)).select(
        "market", "code", "candle_length", "ts", "close",
        "peak", "drawdown",
    )


O_DRAWDOWN = candles_sql(
    """
SELECT market, code, candle_length, ts, close,
       max(high) OVER w AS peak,
       (close - max(high) OVER w) / max(high) OVER w AS drawdown
FROM candles
WINDOW w AS (PARTITION BY market, code, candle_length ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""
)


def q_donchian(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mora_spark.operators.windows import donchian

    return donchian(_candles(spark, sf_dir), n=20).select(
        "market", "code", "candle_length", "ts", "close",
        "dc_up_20", "dc_dn_20", "dc_mid_20", "dc_width_20",
    )


O_DONCHIAN = candles_sql(
    """
SELECT market, code, candle_length, ts, close,
       dc_up_20, dc_dn_20,
       (dc_up_20 + dc_dn_20) / 2.0 AS dc_mid_20,
       dc_up_20 - dc_dn_20 AS dc_width_20
FROM (
  SELECT market, code, candle_length, ts, close,
    CASE WHEN count(close) OVER w >= 20 THEN max(high) OVER w END AS dc_up_20,
    CASE WHEN count(close) OVER w >= 20 THEN min(low) OVER w END AS dc_dn_20
  FROM candles
  WINDOW w AS (PARTITION BY market, code, candle_length ORDER BY ts
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
)
"""
)


# --- q_anomaly_zscore: rolling z-score outlier flags ---

def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mora_spark.operators.windows import zscore_anomaly

    return zscore_anomaly(_candles(spark, sf_dir), n=60, threshold=3.0).select(
        "market", "code", "candle_length", "ts", "close",
        "z_60", "is_anomaly",
    )


O_ANOMALY_ZSCORE = candles_sql(
    """
SELECT market, code, candle_length, ts, close, z_60,
       CASE WHEN z_60 IS NOT NULL THEN abs(z_60) > 3.0 END AS is_anomaly
FROM (
  SELECT market, code, candle_length, ts, close,
         CASE WHEN sd > 0 THEN round((close - mu) / sd, 6) END AS z_60
  FROM (
    SELECT market, code, candle_length, ts, close,
      CASE WHEN count(close) OVER w >= 60
           THEN round(avg(close) OVER w, 6) END AS mu,
      CASE WHEN count(close) OVER w >= 60
           THEN round(stddev_samp(close) OVER w, 6) END AS sd
    FROM candles
    WINDOW w AS (PARTITION BY market, code, candle_length ORDER BY ts
                 ROWS BETWEEN 59 PRECEDING AND CURRENT ROW)
  )
)
"""
)


# --- q_heikin_ashi: recursive smoothed-candle transform ---
# ha_open is the alpha=1/2 EWM of the lagged ha_close seeded with
# (open_1+close_1)/2, so the oracle expands it with the O_EMA_12
# closed form at span 3 (weights are exact powers of two; the EMA_LAG
# truncation is ~(1/2)^600 ≈ 1e-181, far inside the gate tolerance).

def q_heikin_ashi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mora_spark.operators.ema import heikin_ashi

    return heikin_ashi(_candles(spark, sf_dir)).select(
        "market", "code", "candle_length", "ts",
        "ha_open", "ha_high", "ha_low", "ha_close",
    )


def _o_heikin_ashi() -> str:
    return candles_sql(
        f"""
, hc AS (
  SELECT market, code, candle_length, ts, high, low,
         (open + high + low + close) / 4.0 AS ha_close,
         row_number() OVER w AS rn,
         CASE WHEN lag(close) OVER w IS NULL
              THEN (open + close) / 2.0
              ELSE lag((open + high + low + close) / 4.0) OVER w
         END AS src
  FROM candles
  WINDOW w AS (PARTITION BY market, code, candle_length ORDER BY ts)
),
ho AS ({_ema_closed("hc", "src", 3, "ha_open")})
SELECT h.market, h.code, h.candle_length, h.ts,
       o.ha_open,
       greatest(h.high, o.ha_open, h.ha_close) AS ha_high,
       least(h.low, o.ha_open, h.ha_close) AS ha_low,
       h.ha_close
FROM hc h
JOIN ho o ON o.market = h.market AND o.code = h.code
         AND o.candle_length = h.candle_length AND o.rn = h.rn
"""
    )


# --- q_macd: MACD + signal + histogram (one grouped pandas pass) ---
# Oracle: both EMA recursions expanded in closed form (the O_EMA_12
# construction), with the MACD line snapped to the 1e-6 grid via
# floor(x*1e6 + 0.5)/1e6 before the signal-stage expansion — the same
# IEEE expression the operator applies, so the grids coincide exactly.
# The expansion truncates at EMA_LAG=600 lagged terms: for the slowest
# recursion (span 26) the dropped mass is (25/27)^600 ≈ 9e-21 relative
# — far below float64 resolution, so the only engine-vs-oracle
# difference left is intrinsic summation-order noise (~1e-14 relative,
# the same residual every grid-snapped oracle here carries). At the
# previous 400-lag cut the truncation alone was ~4e-14 relative —
# large enough to flip a snap on an unlucky data draw.

def q_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mora_spark.operators.ema import macd

    return macd(_candles(spark, sf_dir)).select(
        "market", "code", "candle_length", "ts", "close",
        "macd", "macd_signal", "macd_hist",
    )


EMA_LAG = 600  # truncation depth; see the q_macd note above


def _ema_closed(src: str, val: str, span: int, out: str) -> str:
    """Closed-form EMA over ``src`` (needs rn): one EMA_LAG-deep sum."""
    a = f"2.0 / {span + 1}.0"
    return f"""
  SELECT t.market, t.code, t.candle_length, t.ts, t.rn,
         sum((CASE WHEN j.rn = 1 THEN 1.0 ELSE {a} END)
             * power(1.0 - {a}, t.rn - j.rn) * j.{val}) AS {out}
  FROM {src} t
  JOIN {src} j
    ON j.market = t.market AND j.code = t.code
   AND j.candle_length = t.candle_length
   AND j.rn BETWEEN t.rn - {EMA_LAG} AND t.rn
  GROUP BY t.market, t.code, t.candle_length, t.ts, t.rn"""


O_MACD = candles_sql(
    f"""
, seq AS (
  SELECT *, row_number() OVER (
    PARTITION BY market, code, candle_length ORDER BY ts) AS rn
  FROM candles
),
e12 AS ({_ema_closed("seq", "close", 12, "v")}),
e26 AS ({_ema_closed("seq", "close", 26, "v")}),
m AS (
  SELECT e12.market, e12.code, e12.candle_length, e12.ts, e12.rn,
         floor((e12.v - e26.v) * 1e6 + 0.5) / 1e6 AS macd
  FROM e12
  JOIN e26 ON e12.market = e26.market AND e12.code = e26.code
          AND e12.candle_length = e26.candle_length AND e12.rn = e26.rn
),
sig AS ({_ema_closed("m", "macd", 9, "v")})
SELECT s.market, s.code, s.candle_length, s.ts, c.close, m.macd,
       floor(s.v * 1e6 + 0.5) / 1e6 AS macd_signal,
       floor((m.macd - floor(s.v * 1e6 + 0.5) / 1e6) * 1e6 + 0.5) / 1e6
         AS macd_hist
FROM sig s
JOIN m ON m.market = s.market AND m.code = s.code
      AND m.candle_length = s.candle_length AND m.rn = s.rn
JOIN seq c ON c.market = s.market AND c.code = s.code
          AND c.candle_length = s.candle_length AND c.rn = s.rn
"""
)


# O_EMA_12 shares _ema_closed (and thus EMA_LAG) with O_MACD — at depth
# 600 the span-12 truncation error is (11/13)^600 ≈ 1e-44 relative,
# far inside the gate tolerance; no grid snap is needed because the
# operator emits the raw recursion.
O_EMA_12 = candles_sql(
    f"""
, seq AS (
  SELECT *, row_number() OVER (
    PARTITION BY market, code, candle_length ORDER BY ts) AS rn
  FROM candles
),
e12 AS ({_ema_closed("seq", "close", 12, "ema_12")})
SELECT e.market, e.code, e.candle_length, e.ts, c.close, e.ema_12
FROM e12 e
JOIN seq c ON c.market = e.market AND c.code = e.code
          AND c.candle_length = e.candle_length AND c.rn = e.rn
"""
)


# --- q_bollinger: trailing-volatility bands ---

def q_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mora_spark.operators.windows import bollinger

    return bollinger(_candles(spark, sf_dir), n=20, k=2.0).select(
        "market", "code", "candle_length", "ts", "close",
        "bb_mid_20", "bb_sd_20", "bb_up_20", "bb_dn_20",
    )


O_BOLLINGER = candles_sql(
    """
SELECT market, code, candle_length, ts, close,
       bb_mid_20, bb_sd_20,
       round(bb_mid_20 + 2.0 * bb_sd_20, 6) AS bb_up_20,
       round(bb_mid_20 - 2.0 * bb_sd_20, 6) AS bb_dn_20
FROM (
  SELECT market, code, candle_length, ts, close,
    CASE WHEN count(close) OVER w >= 20
         THEN round(avg(close) OVER w, 6) END AS bb_mid_20,
    CASE WHEN count(close) OVER w >= 20
         THEN round(stddev_samp(close) OVER w, 6) END AS bb_sd_20
  FROM candles
  WINDOW w AS (PARTITION BY market, code, candle_length ORDER BY ts
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
)
"""
)


# --- q_rsi: relative strength index (Cutler's SMA variant) ---
# The pure-window formulation is cross-engine exact; Wilder's recursive
# smoothing is EMA territory (operators.ema, q_ema_12).

def q_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mora_spark.operators.windows import rsi

    return rsi(_candles(spark, sf_dir), n=14).select(
        "market", "code", "candle_length", "ts", "close", "rsi_14"
    )


O_RSI = candles_sql(
    """
, d AS (
  SELECT market, code, candle_length, ts, close,
         close - lag(close) OVER (PARTITION BY market, code, candle_length
                                  ORDER BY ts) AS d
  FROM candles
), g AS (
  SELECT *, CASE WHEN d > 0 THEN d ELSE 0.0 END AS gain,
            CASE WHEN d < 0 THEN -d ELSE 0.0 END AS loss
  FROM d
)
SELECT market, code, candle_length, ts, close,
       CASE WHEN cnt >= 14 THEN
         CASE WHEN al = 0 THEN 100.0
              ELSE round(100.0 - 100.0 / (1 + ag / al), 6) END
       END AS rsi_14
FROM (
  SELECT market, code, candle_length, ts, close,
         count(d) OVER w AS cnt,
         avg(gain) OVER w AS ag,
         avg(loss) OVER w AS al
  FROM g
  WINDOW w AS (PARTITION BY market, code, candle_length ORDER BY ts
               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)
"""
)


QUERIES = {
    "q_candles_1m": q_candles_1m,
    "q_bollinger": q_bollinger,
    "q_rsi": q_rsi,
    "q_macd": q_macd,
    "q_obv": q_obv,
    "q_atr": q_atr,
    "q_stochastic": q_stochastic,
    "q_donchian": q_donchian,
    "q_drawdown": q_drawdown,
    "q_heikin_ashi": q_heikin_ashi,
    "q_anomaly_zscore": q_anomaly_zscore,
    "q_time_window": q_time_window,
    "q_upsert_lww": q_upsert_lww,
    "q_range_scan": q_range_scan,
    "q_resample_5m": q_resample_5m,
    "q_resample_1h": q_resample_1h,
    "q_resample_anchored": q_resample_anchored,
    "q_mtf_join": q_mtf_join,
    "q_gapfill": q_gapfill,
    "q_gapfill_interp": q_gapfill_interp,
    "q_sma_roll": q_sma_roll,
    "q_lag_lead": q_lag_lead,
    "q_vwap": q_vwap,
    "q_topk_volume": q_topk_volume,
    "q_ema_12": q_ema_12,
    "q_asof_trades": q_asof_trades,
    "q_rolling_corr": q_rolling_corr,
    "q_validate_candles": q_validate_candles,
}

ORACLES = {
    "q_candles_1m": O_CANDLES_1M,
    "q_bollinger": O_BOLLINGER,
    "q_rsi": O_RSI,
    "q_macd": O_MACD,
    "q_obv": O_OBV,
    "q_atr": O_ATR,
    "q_stochastic": O_STOCHASTIC,
    "q_donchian": O_DONCHIAN,
    "q_drawdown": O_DRAWDOWN,
    "q_heikin_ashi": _o_heikin_ashi(),
    "q_anomaly_zscore": O_ANOMALY_ZSCORE,
    "q_time_window": O_TIME_WINDOW,
    "q_upsert_lww": O_UPSERT_LWW,
    "q_range_scan": O_RANGE_SCAN,
    "q_resample_5m": _resample_oracle(300),
    "q_resample_1h": _resample_oracle(3600),
    "q_resample_anchored": O_RESAMPLE_ANCHORED,
    "q_mtf_join": O_MTF_JOIN,
    "q_gapfill": O_GAPFILL,
    "q_gapfill_interp": O_GAPFILL_INTERP,
    "q_sma_roll": O_SMA_ROLL,
    "q_lag_lead": O_LAG_LEAD,
    "q_vwap": O_VWAP,
    "q_topk_volume": O_TOPK_VOLUME,
    "q_ema_12": O_EMA_12,
    "q_asof_trades": O_ASOF_TRADES,
    "q_rolling_corr": O_ROLLING_CORR,
    "q_validate_candles": O_VALIDATE_CANDLES,
}
