"""Relational declared queries over the TPC-H-ish star schema.

The reference is a single-table engine with no joins/aggregates
(SURVEY §2.B); this module is the general relational surface the
rebuild commits to. Everything is built-in DataFrame API — Catalyst
handles pushdown/pruning/reordering; small dimensions are explicitly
broadcast.
"""

from __future__ import annotations

import operator

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from mora_spark.datasets import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- q_tpch_q1: pricing summary report (scan + big hash agg) ---

def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("sum_disc_price"),
            F.sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


O_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       sum(l_extendedprice) AS sum_base_price,
       sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
       sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
       avg(l_quantity) AS avg_qty,
       avg(l_extendedprice) AS avg_price,
       avg(l_discount) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# --- q_tpch_q3: shipping priority (3-way join + agg + top-k) ---

def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15")
    )
    l = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


O_TPCH_Q3 = """
SELECT l_orderkey, o_orderdate,
       sum(l_extendedprice * (1 - l_discount)) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# --- q_revenue_by_nation: 6-way join (Q5-flavored) ---

def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .where(c.c_nationkey == s.s_nationkey)
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .where(
            (F.col("r_name") == "ASIA")
            & (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1998-01-01"))
        )
        .groupBy("n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


O_REVENUE_BY_NATION = """
SELECT n_name,
       sum(l_extendedprice * (1 - l_discount)) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


# --- q_rollup_acctbal / q_cube_orders: multi-dim aggs ---

def q_rollup_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.sum("c_acctbal").alias("total_acctbal"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


O_ROLLUP_ACCTBAL = """
SELECT r_name, n_name,
       sum(c_acctbal) AS total_acctbal,
       count(*) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def q_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("o_totalprice").alias("total_price"),
    )


O_CUBE_ORDERS = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       sum(o_totalprice) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither rollup nor cube): per-status,
    per-priority, and grand-total aggregates in one shuffle — the
    general form the rollup/cube queries are special cases of."""
    o = _t(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus", "o_orderpriority",
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("o_totalprice").alias("total_price"),
    )


O_GROUPING_SETS = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       sum(o_totalprice) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


# --- q_setops: union / intersect / except with provenance tags ---

def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust_nations = (
        _t(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("nationkey"))
        .distinct()
    )
    supp_nations = (
        _t(spark, sf_dir, "supplier")
        .select(F.col("s_nationkey").alias("nationkey"))
        .distinct()
    )
    both = cust_nations.intersect(supp_nations).withColumn(
        "tag", F.lit("both")
    )
    cust_only = cust_nations.exceptAll(supp_nations).withColumn(
        "tag", F.lit("cust_only")
    )
    supp_only = supp_nations.exceptAll(cust_nations).withColumn(
        "tag", F.lit("supp_only")
    )
    either = cust_nations.union(supp_nations).distinct().withColumn(
        "tag", F.lit("either")
    )
    return both.unionByName(cust_only).unionByName(supp_only).unionByName(
        either
    )


O_SETOPS = """
WITH cn AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
     sn AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
SELECT nationkey, 'both' AS tag FROM (SELECT * FROM cn INTERSECT SELECT * FROM sn)
UNION ALL
SELECT nationkey, 'cust_only' AS tag FROM (SELECT * FROM cn EXCEPT SELECT * FROM sn)
UNION ALL
SELECT nationkey, 'supp_only' AS tag FROM (SELECT * FROM sn EXCEPT SELECT * FROM cn)
UNION ALL
SELECT nationkey, 'either' AS tag FROM (SELECT * FROM cn UNION SELECT * FROM sn)
"""


# --- q_semi_anti: existence joins ---

def q_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    with_orders = c.join(
        o, c.c_custkey == o.o_custkey, "left_semi"
    ).select("c_custkey").withColumn("tag", F.lit("has_orders"))
    without = c.join(
        o, c.c_custkey == o.o_custkey, "left_anti"
    ).select("c_custkey").withColumn("tag", F.lit("no_orders"))
    return with_orders.unionByName(without)


O_SEMI_ANTI = """
SELECT c_custkey, 'has_orders' AS tag FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
UNION ALL
SELECT c_custkey, 'no_orders' AS tag FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# --- q_full_outer: two-source reconciliation (FULL OUTER join) ---
# The join flavor the rest of the suite doesn't exercise: daily order
# counts vs daily lineitem-ship counts, full-outer on the date so days
# present on only one side survive with a typed presence tag. Dates
# emitted as formatted strings (never DATE columns — pandas round-trip
# differs between engines).

def q_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    l = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.date_format("l_shipdate", "yyyy-MM-dd").alias("d"))
        .agg(F.count(F.lit(1)).alias("n_ships"))
    )
    j = o.join(l, "d", "full_outer")
    return j.select(
        "d",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("n_ships", F.lit(0)).alias("n_ships"),
        F.when(F.col("n_orders").isNull(), F.lit("ship_only"))
        .when(F.col("n_ships").isNull(), F.lit("order_only"))
        .otherwise(F.lit("both"))
        .alias("presence"),
    )


O_FULL_OUTER = """
WITH o AS (
  SELECT strftime(o_orderdate, '%Y-%m-%d') AS d, count(*) AS n_orders
  FROM orders GROUP BY 1
), l AS (
  SELECT strftime(l_shipdate, '%Y-%m-%d') AS d, count(*) AS n_ships
  FROM lineitem GROUP BY 1
)
SELECT coalesce(o.d, l.d) AS d,
       coalesce(n_orders, 0) AS n_orders,
       coalesce(n_ships, 0) AS n_ships,
       CASE WHEN n_orders IS NULL THEN 'ship_only'
            WHEN n_ships IS NULL THEN 'order_only'
            ELSE 'both' END AS presence
FROM o FULL OUTER JOIN l ON o.d = l.d
"""


# --- q_order_rank: per-customer top-3 orders by price ---

def q_order_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


O_ORDER_RANK = """
SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
) WHERE rk <= 3
"""


# --- q_percentiles: exact continuous quantiles per event type ---

def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
        F.expr("percentile(value, 0.99)").alias("p99"),
        F.avg("value").alias("avg_value"),
        F.count(F.lit(1)).alias("n"),
    )


O_PERCENTILES = """
SELECT event_type,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.9) AS p90,
       quantile_cont(value, 0.99) AS p99,
       avg(value) AS avg_value,
       count(*) AS n
FROM events
GROUP BY event_type
"""


# --- q_sessionize: 30-min-gap sessionization (lag + cumulative sum) ---

def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_session = F.when(
        gap.isNull() | (gap > 1800), F.lit(1)
    ).otherwise(F.lit(0))
    sess = (
        e.withColumn("new_s", new_session)
        .withColumn(
            "session_id",
            F.sum("new_s").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
    )


O_SESSIONIZE = """
WITH g AS (
  SELECT *,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, CAST(sum(new_s) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS session_id
  FROM g
)
SELECT user_id, session_id,
       min(ts) AS session_start,
       max(ts) AS session_end,
       count(*) AS n_events,
       sum(value) AS sum_value
FROM s
GROUP BY user_id, session_id
"""


# --- q_interval_join: bucketed point-in-interval range join ---
# Hot windows (minutes with >= 2 events of a type, padded ±5 min)
# interval-joined back to the event stream. The operator quantizes
# intervals into buckets so the range join runs as an equi hash join
# (mora_spark.operators.interval).

def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mora_spark.operators.interval import interval_join

    e = _t(spark, sf_dir, "events")
    mn = F.date_trunc("minute", F.col("ts"))
    hot = (
        e.groupBy(F.col("event_type"), mn.alias("mn"))
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 2)
        .select(
            "event_type",
            (F.col("mn") - F.expr("INTERVAL 5 MINUTES")).alias("win_start"),
            (F.col("mn") + F.expr("INTERVAL 5 MINUTES")).alias("win_end"),
        )
    )
    j = interval_join(
        e.select("event_type", "ts", "value"),
        hot,
        ts_col="ts",
        on=["event_type"],
        bucket_seconds=600,
    )
    return j.groupBy("event_type", "win_start").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
    )


O_INTERVAL_JOIN = """
WITH hot AS (
  SELECT event_type,
         date_trunc('minute', ts) - INTERVAL 5 MINUTE AS win_start,
         date_trunc('minute', ts) + INTERVAL 5 MINUTE AS win_end
  FROM events
  GROUP BY event_type, date_trunc('minute', ts)
  HAVING count(*) >= 2
)
SELECT h.event_type, h.win_start,
       count(*) AS n_events,
       sum(e.value) AS sum_value
FROM hot h
JOIN events e ON e.event_type = h.event_type
             AND e.ts BETWEEN h.win_start AND h.win_end
GROUP BY h.event_type, h.win_start
"""


# --- q_json_props: semi-structured (JSON) column extraction ---
# events.props is a JSON string; extract a typed field and aggregate.
# get_json_object stays JVM-side (Jackson) — no Python in the loop.

def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.avg("k").alias("avg_k"),
            F.sum("k").alias("sum_k"),
        )
    )


O_JSON_PROPS = """
SELECT event_type,
       count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       avg(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS avg_k,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k
FROM events
GROUP BY event_type
"""


# --- q_approx_profile: sketch aggregates with a tolerance-banded
#     oracle ---
# HLL distinct + approximate percentiles — the profiling pass you run
# on 100 TB before exact queries. Sketch OUTPUTS are implementation-
# defined (no engine can hash-match them), so the checkable contract is
# their ERROR BOUND: the query emits the exact anchors (cross-engine-
# verified against DuckDB) plus boolean in-band verdicts computed
# against exact aggregates; the oracle recomputes the anchors and
# asserts TRUE. A sketch drifting outside its documented bound flips a
# boolean and fails the driver's hash compare.
#   - approx_count_distinct(rsd=0.02): banded at 3*rsd (σ≈rsd for
#     HLL++), floor 8 absolute for tiny groups.
#   - percentile_approx(accuracy=10000): rank-error guarantee is
#     n/accuracy, so the verdict checks the EMPIRICAL CDF position of
#     the returned value: |count(value <= v)/n - p| within
#     max(0.005, 2/n) — generous vs the 1e-4 guarantee, still far
#     below any real sketch breakage.
# Plan shape: two map-side-combined passes over events (one for the
# sketches + exact anchors, one for the CDF counts), rejoined on the
# 5-row event_type key via broadcast — no all-row shuffle beyond the
# grouped aggregations themselves.

def q_approx_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    pcts = F.percentile_approx("value", [0.5, 0.95, 0.99], 10000)
    g = e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", 0.02).alias("au"),
        F.count(F.lit(1)).alias("n"),
        pcts.getItem(0).alias("a50"),
        pcts.getItem(1).alias("a95"),
        pcts.getItem(2).alias("a99"),
    )
    cdf = (
        e.join(F.broadcast(g), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("exact_users").alias("exact_users"),
            F.first("au").alias("au"),
            F.first("n").alias("n"),
            *[
                F.sum(
                    F.when(cmp(F.col("value"), F.col(a)), 1).otherwise(0)
                ).alias(c)
                for a, c, cmp in [
                    ("a50", "lt50", operator.lt),
                    ("a95", "lt95", operator.lt),
                    ("a99", "lt99", operator.lt),
                    ("a50", "le50", operator.le),
                    ("a95", "le95", operator.le),
                    ("a99", "le99", operator.le),
                ]
            ],
        )
    )
    users_ok = (
        F.abs(F.col("au") - F.col("exact_users"))
        <= F.greatest(F.lit(8.0), F.col("exact_users") * 0.06)
    )
    band = F.greatest(F.lit(0.005), F.lit(2.0) / F.col("n"))

    def pct_ok(lt: str, le: str, p: float):
        # The sketch value occupies the RANK INTERVAL
        # [count(value < v), count(value <= v)] / n in the empirical
        # CDF; pass if that interval overlaps [p-band, p+band]. Tie-
        # robust: a mass of rows tied exactly at v widens the interval
        # instead of flipping the verdict (ADVICE r5).
        return (F.col(lt) / F.col("n") <= F.lit(p) + band) & (
            F.col(le) / F.col("n") >= F.lit(p) - band
        )

    return cdf.select(
        "event_type",
        "exact_users",
        users_ok.alias("users_ok"),
        pct_ok("lt50", "le50", 0.5).alias("p50_ok"),
        pct_ok("lt95", "le95", 0.95).alias("p95_ok"),
        pct_ok("lt99", "le99", 0.99).alias("p99_ok"),
    )


O_APPROX_PROFILE = """
SELECT event_type,
       count(DISTINCT user_id) AS exact_users,
       TRUE AS users_ok,
       TRUE AS p50_ok, TRUE AS p95_ok, TRUE AS p99_ok
FROM events
GROUP BY event_type
"""


# --- q_pivot_daily: pivot (wide reshape) with an explicit value list ---
# Explicit values keep the plan single-pass (no extra distinct job) and
# the output schema deterministic for the oracle.

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_pivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .groupBy("day")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.round(F.sum("value"), 6))
    )


O_PIVOT_DAILY = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       round(sum(CASE WHEN event_type = 'click' THEN value END), 6) AS click,
       round(sum(CASE WHEN event_type = 'error' THEN value END), 6) AS error,
       round(sum(CASE WHEN event_type = 'purchase' THEN value END), 6) AS purchase,
       round(sum(CASE WHEN event_type = 'signup' THEN value END), 6) AS signup,
       round(sum(CASE WHEN event_type = 'view' THEN value END), 6) AS view
FROM events
GROUP BY strftime(ts, '%Y-%m-%d')
"""


# --- q_value_histogram: fixed-width binning ---

def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    bin_w = 50.0
    return (
        e.withColumn(
            "bin", (F.floor(F.col("value") / bin_w) * bin_w).cast("double")
        )
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


O_VALUE_HISTOGRAM = """
SELECT event_type,
       CAST(floor(value / 50.0) * 50.0 AS DOUBLE) AS bin,
       count(*) AS n
FROM events
GROUP BY event_type, CAST(floor(value / 50.0) * 50.0 AS DOUBLE)
"""


# --- q_drift_psi: distribution-drift monitor between two periods ---
# The data-quality gate a continuously-ingesting training pipeline
# runs before trusting a new slice: per event_type, the Population
# Stability Index of the value distribution between period A (first
# half of the corpus by ts) and period B, over the same fixed-width
# bins as q_value_histogram. PSI = sum over common bins of
# (pa - pb) * ln(pa / pb); one-sided bins (mass in only one period)
# are reported as counts instead of epsilon-clamped into the sum, so
# the statistic stays exactly engine-reproducible. Each term is
# rounded through decimal(38,10) before summation so the total is
# independent of partition/summation order. Scale shape: one
# map-side-combined count agg keyed (type, period, bin) — bounded
# distinct keys whatever the corpus — a 10-row totals join, and a
# bin-level full outer; nothing grows with row count after the scan.

DRIFT_SPLIT = "2024-01-16 00:00:00"


def q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    return psi_drift(_t(spark, sf_dir, "events"))


def value_shares(e: DataFrame, bin_w: float = 50.0) -> DataFrame:
    """Per-(event_type, bin) probability mass of the value column over
    fixed-width bins — the distribution summary both PSI surfaces
    compare. One map-side-combined count agg on bounded keys plus a
    broadcast totals join; nothing grows past the scan."""
    bin_c = (F.floor(F.col("value") / bin_w) * bin_w).cast("double")
    c = e.groupBy("event_type", bin_c.alias("bin")).agg(
        F.count(F.lit(1)).alias("n")
    )
    t = c.groupBy("event_type").agg(F.sum("n").alias("tot"))
    return c.join(F.broadcast(t), "event_type").select(
        "event_type",
        "bin",
        (F.col("n").cast("double") / F.col("tot")).alias("share"),
    )


def psi_between(a: DataFrame, b: DataFrame) -> DataFrame:
    """Per-type PSI between two :func:`value_shares` tables. Common
    bins contribute (sa - sb) * ln(sa / sb), rounded through
    decimal(38,10) before summation so the statistic is independent of
    partition/summation order; one-sided bins are reported as counts,
    not epsilon-clamped into the sum."""
    aa = a.select("event_type", "bin", F.col("share").alias("sa"))
    bb = b.select(
        F.col("event_type").alias("event_type_b"),
        F.col("bin").alias("bin_b"),
        F.col("share").alias("sb"),
    )
    j = aa.join(
        bb,
        (F.col("event_type") == F.col("event_type_b"))
        & (F.col("bin") == F.col("bin_b")),
        "full_outer",
    ).select(
        F.coalesce("event_type", "event_type_b").alias("event_type"),
        "sa",
        "sb",
    )
    both = F.col("sa").isNotNull() & F.col("sb").isNotNull()
    term = (F.col("sa") - F.col("sb")) * F.log(F.col("sa") / F.col("sb"))
    return j.groupBy("event_type").agg(
        F.sum(F.when(both, term.cast("decimal(38,10)")))
        .cast("double")
        .alias("psi"),
        F.sum(F.when(both, 1).otherwise(0)).alias("n_bins_common"),
        F.sum(F.when(F.col("sb").isNull(), 1).otherwise(0)).alias(
            "n_bins_a_only"
        ),
        F.sum(F.when(F.col("sa").isNull(), 1).otherwise(0)).alias(
            "n_bins_b_only"
        ),
    )


def psi_drift(e: DataFrame, split: str = DRIFT_SPLIT) -> DataFrame:
    """PSI between two ts periods of ONE table. Counts are aggregated
    in a single pass keyed (type, period, bin) and then split — both
    sides of :func:`psi_between`'s full outer share the identical
    aggregation subtree, so the scan+exchange is reused rather than
    run once per period (the shape a 100 TB scan cares about)."""
    p = F.when(
        F.col("ts") < F.lit(split).cast("timestamp"), "a"
    ).otherwise("b")
    bin_c = (F.floor(F.col("value") / 50.0) * 50.0).cast("double")
    c = e.groupBy(
        "event_type", p.alias("p"), bin_c.alias("bin")
    ).agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("event_type", "p").agg(F.sum("n").alias("tot"))
    s = c.join(F.broadcast(t), ["event_type", "p"]).select(
        "event_type",
        "p",
        "bin",
        (F.col("n").cast("double") / F.col("tot")).alias("share"),
    )
    return psi_between(
        s.where(F.col("p") == "a").drop("p"),
        s.where(F.col("p") == "b").drop("p"),
    )


O_DRIFT_PSI = f"""
WITH c AS (
  SELECT event_type,
         CASE WHEN ts < TIMESTAMP '{DRIFT_SPLIT}' THEN 'a' ELSE 'b' END AS p,
         CAST(floor(value / 50.0) * 50.0 AS DOUBLE) AS bin,
         count(*) AS n
  FROM events GROUP BY 1, 2, 3
), t AS (
  SELECT event_type, p, sum(n) AS tot FROM c GROUP BY 1, 2
), s AS (
  SELECT c.event_type, c.p, c.bin, CAST(c.n AS DOUBLE) / t.tot AS share
  FROM c JOIN t USING (event_type, p)
), a AS (SELECT event_type, bin, share AS sa FROM s WHERE p = 'a'),
   b AS (SELECT event_type, bin, share AS sb FROM s WHERE p = 'b'),
   j AS (
  SELECT coalesce(a.event_type, b.event_type) AS event_type, sa, sb
  FROM a FULL OUTER JOIN b
    ON a.event_type = b.event_type AND a.bin = b.bin
)
SELECT event_type,
  CAST(sum(CASE WHEN sa IS NOT NULL AND sb IS NOT NULL
       THEN CAST((sa - sb) * ln(sa / sb) AS DECIMAL(38,10)) END)
       AS DOUBLE) AS psi,
  CAST(sum(CASE WHEN sa IS NOT NULL AND sb IS NOT NULL THEN 1 ELSE 0 END)
       AS BIGINT) AS n_bins_common,
  CAST(sum(CASE WHEN sb IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_bins_a_only,
  CAST(sum(CASE WHEN sa IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_bins_b_only
FROM j GROUP BY event_type
"""


# --- q_data_profile: per-column completeness/cardinality profile ---
# The first pass of any training-data pipeline: null counts + exact
# distinct counts per column in ONE aggregation job (sketch twins in
# q_approx_profile).

PROFILE_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def q_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in PROFILE_COLS:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    return e.agg(*aggs)


O_DATA_PROFILE = "SELECT count(*) AS n_rows, " + ", ".join(
    f"count({c}) AS nn_{c}, count(DISTINCT {c}) AS nd_{c}"
    for c in PROFILE_COLS
) + " FROM events"


# --- q_sql_shared: the SQL surface — ONE ANSI statement executed
#     verbatim by both Spark (spark.sql via mora_spark.sql.run_sql)
#     and the DuckDB oracle. Join + window + aggregate in the shared
#     dialect: the strongest possible engine-equivalence statement.

SQL_SHARED = """
SELECT o_orderpriority,
       c_mktsegment,
       count(*) AS n_orders,
       sum(o_totalprice) AS total_price,
       max(rank_in_segment) AS worst_rank
FROM (
  SELECT o.o_orderpriority, c.c_mktsegment, o.o_totalprice,
         row_number() OVER (PARTITION BY c.c_mktsegment
                            ORDER BY o.o_totalprice DESC, o.o_orderkey)
           AS rank_in_segment
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
) t
WHERE rank_in_segment <= 100
GROUP BY o_orderpriority, c_mktsegment
"""


def q_sql_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mora_spark.sql import run_sql

    return run_sql(spark, sf_dir, SQL_SHARED)


# --- q_user_stats: per-entity profile agg ---

def q_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
        # Deterministic mean: double summation order differs between
        # engines and round(,6) still straddles ties, so sum exactly in
        # decimal, then divide once in double — identical operands on
        # both sides, identical quotient.
        F.round(
            F.sum(F.col("value").cast("decimal(38,10)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_value"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


O_USER_STATS = """
SELECT user_id,
       count(*) AS n_events,
       count(DISTINCT event_type) AS n_types,
       round(CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE)
             / count(*), 6) AS avg_value,
       min(ts) AS first_ts,
       max(ts) AS last_ts
FROM events
GROUP BY user_id
"""


# --- q_scalar_funcs: string/date/math scalar function coverage ---

def q_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_brand", 1, 5).alias("brand_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        (F.col("p_retailprice") * 1.1).alias("price_up"),
        F.floor("p_retailprice").alias("price_floor"),
        F.when(F.col("p_size") > 25, "large")
        .when(F.col("p_size") > 10, "medium")
        .otherwise("small")
        .alias("size_class"),
    )


O_SCALAR_FUNCS = """
SELECT p_partkey,
       upper(p_name) AS name_upper,
       length(p_name) AS name_len,
       substring(p_brand, 1, 5) AS brand_prefix,
       concat_ws('|', p_brand, p_type) AS brand_type,
       abs(p_size - 25) AS size_dist,
       p_retailprice * 1.1 AS price_up,
       CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
       CASE WHEN p_size > 25 THEN 'large'
            WHEN p_size > 10 THEN 'medium'
            ELSE 'small' END AS size_class
FROM part
"""


# --- q_tpch_q6: forecast revenue change (pure scan+filter agg) ---
# The plan should be a single scan with every predicate pushed to
# parquet and no shuffle beyond the final single-row reduce.

def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice") * F.col("l_discount")
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


O_TPCH_Q6 = """
SELECT sum(l_extendedprice * l_discount) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


# --- q_tpch_q14: promotion effect (join + conditional agg) ---

def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-09-01"))
        & (F.col("l_shipdate") < F.lit("1997-10-01"))
    )
    p = _t(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type").startswith("PROMO"), disc)
                    .otherwise(F.lit(0.0))
                )
                / F.sum(disc)
            ).alias("promo_revenue_pct")
        )
    )


O_TPCH_Q14 = """
SELECT 100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                        THEN l_extendedprice * (1 - l_discount)
                        ELSE 0.0 END)
       / sum(l_extendedprice * (1 - l_discount)) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
"""


# --- q_tpch_q18: large-volume customers (agg-filtered semi join) ---
# The HAVING-driven semi join: aggregate lineitem once, filter, then
# join back. Q18_QTY tuned so the synthetic data yields a non-empty,
# small result.

Q18_QTY = 110


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > Q18_QTY)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


O_TPCH_Q18 = f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM orders
JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > {Q18_QTY}) big
  ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


# --- q_tpch_q22: idle rich customers (scalar subquery + anti join) ---
# Q22-flavored: above-average-balance customers with no RECENT orders
# (the synthetic data gives every customer at least one order ever).
# Exercises a scalar aggregate broadcast against a left anti join.

Q22_CUTOFF = "1998-01-01"


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit(Q22_CUTOFF)
    )
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.crossJoin(broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.sum("c_acctbal").alias("total_bal"),
        )
    )


O_TPCH_Q22 = f"""
SELECT c_nationkey,
       count(*) AS n_custs,
       sum(c_acctbal) AS total_bal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                   WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '{Q22_CUTOFF} 00:00:00')
GROUP BY c_nationkey
"""


# --- q_skew_join: salted equi-join on a hot-keyed fact table ---
# events has ~150 distinct user_ids over the whole stream (10k rows at
# sf0.01) — hot keys everywhere, the shape AQE's skew splitting does
# NOT cover (it only splits shuffled sort-merge sides). salted_join
# SAMPLES the fact side first: keys above the share threshold are split
# across 8 deterministic sub-buckets with only their slice of the
# customer dimension replicated 8x; the uniform remainder takes a plain
# equi-join and the halves are unioned. The thresholds here put most
# keys in the salted half and the light tail in the plain half, so the
# driver row exercises BOTH branches plus the union. The salt is
# invisible in the result: output == the plain equi-join, which is
# exactly what the oracle runs.

def q_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mora_spark.operators.skew import salted_join

    e = _t(spark, sf_dir, "events").select("user_id", "event_type", "value")
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(
        e, c, on=["user_id"], salt=8, sample_fraction=0.2, hot_share=0.005
    )
    return joined.groupBy("c_mktsegment", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        # Exact decimal summation (same trick as q_user_stats): double
        # addition order differs between engines and partitionings.
        F.sum(F.col("value").cast("decimal(38,10)"))
        .cast("double")
        .alias("total_value"),
    )


O_SKEW_JOIN = """
SELECT c_mktsegment, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE) AS total_value
FROM events
JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment, event_type
"""


# --- q_funnel: ordered conversion funnel (view > click > purchase) ---
# Product-analytics staple the single-table reference cannot express
# (no windows/joins exist there; SURVEY §2.B). Per (user, day): did a
# view happen, then a click strictly AFTER a view, then a purchase
# strictly after such a click — order enforced by running mins over the
# (ts, event_id)-ordered per-user-day window, so the whole funnel is
# ONE shuffle (by user_id, day) + two window passes + one hash agg.
# At 100 TB: partitions are (user, day) — naturally high-cardinality
# and bounded per key, no skew funnel, no self-join per step (the
# classic k-way-join funnel formulation shuffles k times and explodes
# on hot users; this shape stays linear in events).

def funnel_daily(e: DataFrame) -> DataFrame:
    """Per-day view>click>purchase funnel counts over an
    ``events``-shaped DataFrame (used by q_funnel and by
    tools/scale_probe.py on scaled inputs). The ordered-step machinery
    is the generic :func:`mora_spark.operators.funnel.funnel_steps`."""
    from mora_spark.operators.funnel import funnel_steps

    u = funnel_steps(
        e.withColumn("day", F.date_trunc("day", F.col("ts"))),
        steps=("view", "click", "purchase"),
        keys=("user_id", "day"),
    )
    return u.groupBy("day").agg(
        F.sum("s1").cast("long").alias("n_view"),
        F.sum("s2").cast("long").alias("n_view_click"),
        F.sum("s3").cast("long").alias("n_full_funnel"),
    )


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return funnel_daily(_t(spark, sf_dir, "events"))


O_FUNNEL = """
WITH o AS (
  SELECT user_id, event_id, ts, event_type,
         date_trunc('day', ts) AS day,
         min(CASE WHEN event_type = 'view' THEN ts END) OVER (
           PARTITION BY user_id, date_trunc('day', ts)
           ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS fv
  FROM events
), c AS (
  SELECT *,
         min(CASE WHEN event_type = 'click' AND fv IS NOT NULL
                  THEN ts END) OVER (
           PARTITION BY user_id, day ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS fqc
  FROM o
), u AS (
  SELECT user_id, day,
         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS s1,
         max(CASE WHEN event_type = 'click' AND fv IS NOT NULL
                  THEN 1 ELSE 0 END) AS s2,
         max(CASE WHEN event_type = 'purchase' AND fqc IS NOT NULL
                  THEN 1 ELSE 0 END) AS s3
  FROM c GROUP BY user_id, day
)
SELECT day,
       CAST(sum(s1) AS BIGINT) AS n_view,
       CAST(sum(s2) AS BIGINT) AS n_view_click,
       CAST(sum(s3) AS BIGINT) AS n_full_funnel
FROM u GROUP BY day
"""


# --- q_retention_cohort: day-cohort retention matrix ---
# Users are cohorted by first-active day; each (cohort, day-offset)
# cell counts users active that many days later. Two shuffles, both on
# user_id (distinct + cohort agg reuse one exchange under AQE); the
# rejoin is an equi-join keyed by user_id, never a broadcast of the
# user population (unbounded at 100 TB). (user, day) rows are distinct
# by construction so the cell count is count(*), not count(distinct).

def retention_cohort(e: DataFrame) -> DataFrame:
    """Day-cohort retention matrix over an ``events``-shaped DataFrame
    (used by q_retention_cohort and by tools/scale_probe.py)."""
    dk = e.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    cohort = dk.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    j = dk.join(cohort, "user_id")
    # Calendar-based day difference (matches DuckDB date_diff under any
    # session timezone) — epoch-seconds arithmetic would truncate a
    # 23-hour DST day to n-1.
    off = F.datediff("day", "cohort_day").cast("long")
    return j.groupBy("cohort_day", off.alias("day_offset")).agg(
        F.count(F.lit(1)).alias("n_users")
    )


def q_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    return retention_cohort(_t(spark, sf_dir, "events"))


O_RETENTION_COHORT = """
WITH dk AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
), cohort AS (
  SELECT user_id, min(day) AS cohort_day FROM dk GROUP BY user_id
)
SELECT cohort_day,
       CAST(date_diff('day', cohort_day, day) AS BIGINT) AS day_offset,
       count(*) AS n_users
FROM dk JOIN cohort USING (user_id)
GROUP BY cohort_day, day_offset
"""


# --- q_seasonality: day-of-week x hour activity profile ---
# The classic periodicity heatmap over the event stream: one map-side-
# combined hash agg on a derived (dow, hour) key — a single shuffle of
# at most 168 groups whatever the corpus size. English day names are
# engine-identical ('EEEE' == DuckDB dayname()); the value sum goes
# through decimal so summation order cannot perturb the hash.

def q_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format("ts", "EEEE").alias("dow"),
            F.hour("ts").cast("long").alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,10)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


O_SEASONALITY = """
SELECT dayname(ts) AS dow,
       CAST(extract(hour FROM ts) AS BIGINT) AS hour,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(38,10))) AS DOUBLE) AS sum_value
FROM events
GROUP BY dow, hour
"""


QUERIES = {
    "q_tpch_q1": q_tpch_q1,
    "q_skew_join": q_skew_join,
    "q_funnel": q_funnel,
    "q_retention_cohort": q_retention_cohort,
    "q_seasonality": q_seasonality,
    "q_tpch_q3": q_tpch_q3,
    "q_revenue_by_nation": q_revenue_by_nation,
    "q_rollup_acctbal": q_rollup_acctbal,
    "q_cube_orders": q_cube_orders,
    "q_grouping_sets": q_grouping_sets,
    "q_setops": q_setops,
    "q_semi_anti": q_semi_anti,
    "q_full_outer": q_full_outer,
    "q_order_rank": q_order_rank,
    "q_percentiles": q_percentiles,
    "q_sessionize": q_sessionize,
    "q_user_stats": q_user_stats,
    "q_scalar_funcs": q_scalar_funcs,
    "q_tpch_q6": q_tpch_q6,
    "q_tpch_q14": q_tpch_q14,
    "q_tpch_q18": q_tpch_q18,
    "q_tpch_q22": q_tpch_q22,
    "q_interval_join": q_interval_join,
    "q_json_props": q_json_props,
    "q_approx_profile": q_approx_profile,
    "q_drift_psi": q_drift_psi,
    "q_pivot_daily": q_pivot_daily,
    "q_value_histogram": q_value_histogram,
    "q_data_profile": q_data_profile,
    "q_sql_shared": q_sql_shared,
}

ORACLES = {
    "q_tpch_q1": O_TPCH_Q1,
    "q_skew_join": O_SKEW_JOIN,
    "q_funnel": O_FUNNEL,
    "q_retention_cohort": O_RETENTION_COHORT,
    "q_seasonality": O_SEASONALITY,
    "q_tpch_q3": O_TPCH_Q3,
    "q_revenue_by_nation": O_REVENUE_BY_NATION,
    "q_rollup_acctbal": O_ROLLUP_ACCTBAL,
    "q_cube_orders": O_CUBE_ORDERS,
    "q_grouping_sets": O_GROUPING_SETS,
    "q_setops": O_SETOPS,
    "q_semi_anti": O_SEMI_ANTI,
    "q_full_outer": O_FULL_OUTER,
    "q_order_rank": O_ORDER_RANK,
    "q_percentiles": O_PERCENTILES,
    "q_sessionize": O_SESSIONIZE,
    "q_user_stats": O_USER_STATS,
    "q_scalar_funcs": O_SCALAR_FUNCS,
    "q_tpch_q6": O_TPCH_Q6,
    "q_tpch_q14": O_TPCH_Q14,
    "q_tpch_q18": O_TPCH_Q18,
    "q_tpch_q22": O_TPCH_Q22,
    "q_interval_join": O_INTERVAL_JOIN,
    "q_json_props": O_JSON_PROPS,
    "q_approx_profile": O_APPROX_PROFILE,
    "q_drift_psi": O_DRIFT_PSI,
    "q_pivot_daily": O_PIVOT_DAILY,
    "q_value_histogram": O_VALUE_HISTOGRAM,
    "q_data_profile": O_DATA_PROFILE,
    "q_sql_shared": SQL_SHARED,
}
