"""M3 — analytic surface (SURVEY.md §2b E5-E6, E8-E11, E21).

SQL window functions, grouping sets, non-equi joins, and the two
genuinely composite operators the reference's world lacks a built-in
for: the as-of join (E6) and range/interval joins (E5).

Scale notes (100 TB):
* Every window query here shuffles ONCE on its partition key; frames are
  bounded (rows/range) so state per key is O(frame), not O(partition).
* The as-of join is implemented as union + single keyed window pass —
  the scalable idiom (no per-row lookups, no broadcast of a fact table).
* Range joins put the equi-key in the join condition so Spark plans a
  hash/sort-merge join on the key with the range as a post-filter —
  never a cartesian product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kafka_stream_faust_deprecated_spark.functions.rounding import round_det
from kafka_stream_faust_deprecated_spark.io import load_table
from kafka_stream_faust_deprecated_spark.operators.range_frame import (
    global_range_count,
)
from kafka_stream_faust_deprecated_spark.registry import register


# ---------------------------------------------------------------------------
# E10 — ranking / analytic window functions
# ---------------------------------------------------------------------------

@register(
    "window_ranking",
    oracle="""
SELECT o_orderkey,
       c_mktsegment,
       o_totalprice,
       row_number()   OVER w AS rn,
       rank()         OVER w AS rnk,
       dense_rank()   OVER w AS drnk,
       ntile(4)       OVER w AS quartile,
       (floor((percent_rank() OVER w) * 1000000.0 + 0.5) / 1000000.0) AS pct_rank,
       (floor((cume_dist()    OVER w) * 1000000.0 + 0.5) / 1000000.0) AS cum_dist
FROM orders JOIN customer ON o_custkey = c_custkey
WHERDUMMY
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey)
""".replace("WHERDUMMY", "WHERE o_totalprice > 350000"),
    tags=("E10",),
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number/rank/dense_rank/ntile/percent_rank/cume_dist per market
    segment — one shuffle on the partition key, one sort."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 350000)
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "o_orderkey",
            "c_mktsegment",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
            round_det(F.percent_rank().over(w), 6).alias("pct_rank"),
            round_det(F.cume_dist().over(w), 6).alias("cum_dist"),
        )
    )


@register(
    "window_lag_lead",
    oracle="""
SELECT o_custkey,
       o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       o_totalprice,
       (floor((lag(o_totalprice)  OVER w) * 10000.0 + 0.5) / 10000.0)                         AS prev_price,
       (floor((lead(o_totalprice) OVER w) * 10000.0 + 0.5) / 10000.0)                         AS next_price,
       (floor((o_totalprice - COALESCE(lag(o_totalprice) OVER w, 0.0)) * 10000.0 + 0.5) / 10000.0) AS price_delta,
       datediff('day', lag(o_orderdate) OVER w, o_orderdate)       AS days_since_prev
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    tags=("E10",),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead with arithmetic between adjacent rows per customer."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        "o_totalprice",
        round_det(F.lag("o_totalprice").over(w), 4).alias("prev_price"),
        round_det(F.lead("o_totalprice").over(w), 4).alias("next_price"),
        round_det(F.col("o_totalprice") - F.coalesce(F.lag("o_totalprice").over(w), F.lit(0.0)), 4).alias("price_delta"),
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("days_since_prev"),
    )


@register(
    "window_frames",
    oracle="""
SELECT o_custkey,
       o_orderkey,
       o_totalprice,
       (floor((sum(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 10000.0 + 0.5) / 10000.0) AS running_total,
       (floor((avg(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) * 10000.0 + 0.5) / 10000.0)          AS ma3,
       count(*) OVER (
           ORDER BY o_totalprice
           RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW)          AS n_within_5k
FROM orders
WHERE o_custkey < 50
""",
    tags=("E10", "E11"),
)
def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS and RANGE frames: running total, 3-row moving average (the
    batch generalization of the reference SMA, S6/S22), and a
    value-range frame over the global ordering.

    The global RANGE count is NOT an unpartitioned ``Window.orderBy``
    (one-task at scale); it is the bucketed two-pass decomposition in
    ``operators/range_frame.py`` — bucket-partitioned windows plus a
    bucket-level offset scan, identical semantics."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 50)
    counted = global_range_count(
        o.select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"),
        value_col="o_totalprice",
        width=5000.0,
        id_cols=("o_orderkey",),
        out_col="n_within_5k",
    )
    wseq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return counted.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        round_det(F.sum("o_totalprice").over(wseq.rowsBetween(Window.unboundedPreceding, 0)), 4).alias("running_total"),
        round_det(F.avg("o_totalprice").over(wseq.rowsBetween(-2, 0)), 4).alias("ma3"),
        F.col("n_within_5k"),
    )


# ---------------------------------------------------------------------------
# E9 — rollup / cube / grouping sets
# ---------------------------------------------------------------------------

@register(
    "rollup_revenue",
    oracle="""
SELECT r_name                                        AS region,
       n_name                                        AS nation,
       CAST(GROUPING(r_name) AS INTEGER)             AS g_region,
       CAST(GROUPING(n_name) AS INTEGER)             AS g_nation,
       count(*)                                      AS n_customers,
       (floor((sum(c_acctbal)) * 10000.0 + 0.5) / 10000.0)                      AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
    tags=("E9",),
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (region, nation) with GROUPING indicators — subtotal rows
    carry NULL keys; grouping() disambiguates real NULLs."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .withColumnRenamed("r_name", "region")
        .withColumnRenamed("n_name", "nation")
    )
    return (
        joined.rollup("region", "nation")
        .agg(
            F.grouping("region").cast("int").alias("g_region"),
            F.grouping("nation").cast("int").alias("g_nation"),
            F.count(F.lit(1)).alias("n_customers"),
            round_det(F.sum("c_acctbal"), 4).alias("total_acctbal"),
        )
        .select(
            "region", "nation", "g_region", "g_nation", "n_customers", "total_acctbal"
        )
    )


@register(
    "cube_order_stats",
    oracle="""
SELECT o_orderstatus,
       o_orderpriority,
       count(*)                      AS n_orders,
       (floor((avg(o_totalprice)) * 10000.0 + 0.5) / 10000.0)   AS avg_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    tags=("E9",),
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping combinations in one
    pass (Catalyst Expand operator — one shuffle)."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        round_det(F.avg("o_totalprice"), 4).alias("avg_price"),
    )


@register(
    "grouping_sets_events",
    oracle="""
SELECT event_type,
       strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       count(*)               AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)   AS total_value
FROM events
GROUP BY GROUPING SETS ((event_type), (strftime(date_trunc('day', ts), '%Y-%m-%d')), ())
""",
    tags=("E9",),
)
def grouping_sets_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via SQL: per-type totals, per-day totals,
    and the grand total in one shuffle.

    Determinism hardening (round 6): the ``day`` expression is inlined
    into the grouping set in BOTH engines — alias resolution inside
    ``GROUP BY GROUPING SETS`` is the one construct whose rules differ
    across engine versions — and ``value`` (a 2-decimal column) is
    summed as DECIMAL(18,2), which is exact and order-independent, so
    the double cast of the total is bit-identical regardless of
    partial-aggregation order in either engine.
    """
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("ksfd_events_gs")
    return spark.sql(
        """
        SELECT event_type,
               date_format(date_trunc('day', ts), 'yyyy-MM-dd') AS day,
               count(*)             AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM ksfd_events_gs
        GROUP BY GROUPING SETS ((event_type), (date_format(date_trunc('day', ts), 'yyyy-MM-dd')), ())
        """
    )


# ---------------------------------------------------------------------------
# E5 — range / interval joins (equi key + range post-filter, never cartesian)
# ---------------------------------------------------------------------------

@register(
    "range_join_price_bands",
    oracle="""
WITH bands(band, lo, hi) AS (
    VALUES ('low', 0.0, 100000.0),
           ('mid', 100000.0, 300000.0),
           ('high', 300000.0, 1000000.0)
)
SELECT b.band,
       count(*)                    AS n_orders,
       (floor((sum(o_totalprice)) * 10000.0 + 0.5) / 10000.0) AS band_total
FROM orders o
JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
GROUP BY b.band
""",
    tags=("E5",),
)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join of a fact table against tiny range-band dims: Spark
    broadcasts the bands (BroadcastNestedLoopJoin over 3 rows) — the
    correct plan at any fact scale."""
    o = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [("low", 0.0, 100000.0), ("mid", 100000.0, 300000.0), ("high", 300000.0, 1000000.0)],
        "band string, lo double, hi double",
    )
    return (
        o.join(
            F.broadcast(bands),
            (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            round_det(F.sum("o_totalprice"), 4).alias("band_total"),
        )
    )


@register(
    "interval_join_events",
    oracle="""
SELECT p.event_id                       AS purchase_id,
       p.user_id,
       count(c.event_id)                AS clicks_before,
       (floor((COALESCE(sum(c.value), 0.0)) * 10000.0 + 0.5) / 10000.0) AS click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.user_id = p.user_id
 AND c.ts >= p.ts - INTERVAL 1 HOUR
 AND c.ts <= p.ts
GROUP BY p.event_id, p.user_id
""",
    tags=("E5",),
)
def interval_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: clicks within the hour before each purchase, same
    user. The equi-key (user_id) drives the join distribution; the time
    range is a post-join filter — scales as a keyed join, not O(n^2)."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_id"),
        F.col("value").alias("c_value"),
    )
    return (
        p.join(
            c,
            (p.user_id == c.c_user)
            & (c.c_ts >= p.p_ts - F.expr("INTERVAL 1 HOUR"))
            & (c.c_ts <= p.p_ts),
            "left",
        )
        .groupBy("purchase_id", "user_id")
        .agg(
            F.count("c_id").alias("clicks_before"),
            round_det(F.coalesce(F.sum("c_value"), F.lit(0.0)), 4).alias("click_value"),
        )
    )


# ---------------------------------------------------------------------------
# E6 — as-of join (nearest prior event; no Spark built-in)
# ---------------------------------------------------------------------------

@register(
    "asof_join_signup",
    oracle="""
WITH signups AS (
    SELECT user_id, ts, value
    FROM (
        SELECT user_id, ts, value,
               row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'signup'
    ) WHERE rn = 1
),
purchases AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase')
SELECT p.event_id                                   AS purchase_id,
       p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S')          AS purchase_ts,
       strftime(s.ts, '%Y-%m-%d %H:%M:%S')          AS signup_ts,
       (floor((s.value) * 10000.0 + 0.5) / 10000.0)                            AS signup_value,
       datediff('second', s.ts, p.ts)               AS secs_since_signup
FROM purchases p
ASOF LEFT JOIN signups s ON p.user_id = s.user_id AND p.ts >= s.ts
""",
    tags=("E6",),
)
def asof_join_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, Spark-first: tag both sides, union, one window pass
    per user carrying the last-seen signup forward (last(..., ignorenulls)
    over an unbounded-preceding frame), then keep purchase rows.

    This is the scale-correct composition for E6 (SURVEY §2b): a single
    shuffle on the key, sorted once, streamed — equivalent to DuckDB's
    native ASOF JOIN. Ties (signup at exactly the purchase ts) sort
    signup-first so `p.ts >= s.ts` matches the oracle's closed bound.
    """
    ev = load_table(spark, sf_dir, "events")

    # Dedup signups per (user, ts) — keeps the composition deterministic
    # when duplicate timestamps exist (last-write-wins, as ma_agg.py:91).
    sd = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    signups = (
        ev.where(F.col("event_type") == "signup")
        .withColumn("rn", F.row_number().over(sd))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "ts",
            F.lit(0).alias("side"),  # signups sort before purchases on ties
            F.lit(None).cast("long").alias("purchase_id"),
            F.col("value").alias("s_value"),
        )
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        F.col("event_id").alias("purchase_id"),
        F.lit(None).cast("double").alias("s_value"),
    )

    unioned = signups.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "user_id",
        "ts",
        "side",
        "purchase_id",
        F.last(F.when(F.col("side") == 0, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("signup_ts_raw"),
        F.last(F.when(F.col("side") == 0, F.col("s_value")), ignorenulls=True)
        .over(w)
        .alias("signup_value_raw"),
    )
    return carried.where(F.col("side") == 1).select(
        F.col("purchase_id"),
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.date_format("signup_ts_raw", "yyyy-MM-dd HH:mm:ss").alias("signup_ts"),
        round_det(F.col("signup_value_raw"), 4).alias("signup_value"),
        (F.unix_timestamp("ts") - F.unix_timestamp("signup_ts_raw")).alias(
            "secs_since_signup"
        ),
    )


# ---------------------------------------------------------------------------
# E8 — approximate count-distinct (rows-only: HLL sketches differ by impl)
# ---------------------------------------------------------------------------

@register("approx_count_distinct", oracle=None, tags=("E8",))
def approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distincts per group. No oracle — sketch
    estimates are implementation-specific; tests assert <5% relative
    error vs the exact count instead (tests/test_operators.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.01).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register("approx_percentile_price", oracle=None, tags=("E8",))
def approx_percentile_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles per group via Spark's mergeable
    percentile_approx sketch (G-K/QuantileSummaries). No oracle — sketch
    boundaries are implementation-specific; tests bound the rank error
    against the exact percentile instead (tests/test_operators.py).
    The sketch is the 100 TB path: fixed-size partial state per
    partition, merged on one shuffle — the exact percentile's
    sort-within-group is the thing it avoids."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 10_000).alias("p50"),
        F.percentile_approx("l_extendedprice", 0.95, 10_000).alias("p95"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# E21 — batch dedup (keep-latest per key; QUALIFY twin)
# ---------------------------------------------------------------------------

@register(
    "dedup_latest_event",
    oracle="""
SELECT event_id, user_id, event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       (floor((value) * 10000.0 + 0.5) / 10000.0) AS value
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY user_id, event_type
        ORDER BY ts DESC, event_id DESC
    ) AS rn
    FROM events
)
WHERE rn = 1
""",
    tags=("E21",),
)
def dedup_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the latest event per (user, type) — the batch generalization
    of the reference's last-write-wins state upsert (S4/S5,
    faust_app/ma_agg.py:89-91). One shuffle on the dedup key."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            round_det(F.col("value"), 4).alias("value"),
        )
    )


@register(
    "percentile_summary",
    oracle="""
SELECT l_returnflag,
       (floor((quantile_cont(l_extendedprice, 0.25)) * 10000.0 + 0.5) / 10000.0) AS p25,
       (floor((quantile_cont(l_extendedprice, 0.50)) * 10000.0 + 0.5) / 10000.0) AS median,
       (floor((quantile_cont(l_extendedprice, 0.75)) * 10000.0 + 0.5) / 10000.0) AS p75,
       (floor((quantile_cont(l_extendedprice, 0.99)) * 10000.0 + 0.5) / 10000.0) AS p99,
       (floor((median(l_quantity)) * 10000.0 + 0.5) / 10000.0)                   AS median_qty
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("E7", "E16"),
)
def percentile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile`` ==
    DuckDB ``quantile_cont``): the distribution profile an e-commerce /
    telemetry rollup actually reports. Exact percentiles buffer each
    group's values on one reducer — fine for bounded group counts; at
    unbounded cardinality switch to ``approx_percentile`` (t-digest,
    mergeable partials), which the oracle cannot hash-match but the E8
    pattern (rows-only + error-bound pytest) covers."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        round_det(F.percentile("l_extendedprice", F.lit(0.25)), 4).alias("p25"),
        round_det(F.percentile("l_extendedprice", F.lit(0.50)), 4).alias("median"),
        round_det(F.percentile("l_extendedprice", F.lit(0.75)), 4).alias("p75"),
        round_det(F.percentile("l_extendedprice", F.lit(0.99)), 4).alias("p99"),
        round_det(F.median("l_quantity"), 4).alias("median_qty"),
    )


# ---------------------------------------------------------------------------
# E7/E9 — pivot / unpivot (wide<->long reshaping)
# ---------------------------------------------------------------------------

@register(
    "pivot_status_revenue",
    oracle="""
SELECT o_orderpriority,
       (floor((coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 0)) * 100.0 + 0.5) / 100.0) AS total_f,
       (floor((coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 0)) * 100.0 + 0.5) / 100.0) AS total_o,
       (floor((coalesce(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 0)) * 100.0 + 0.5) / 100.0) AS total_p
FROM orders
GROUP BY o_orderpriority
""",
    tags=("E7", "E9"),
)
def pivot_status_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one output column per order status. The value list is
    EXPLICIT (not discovered) — at 100 TB an implicit pivot first runs a
    distinct-scan of the pivot column on the driver; with literal values
    the plan is a single partial->final aggregate, same as any groupBy
    (pivot lowers to one agg with `count per value` CASE branches)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum("o_totalprice"))
        .select(
            "o_orderpriority",
            round_det(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("total_f"),
            round_det(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("total_o"),
            round_det(F.coalesce(F.col("P"), F.lit(0.0)), 2).alias("total_p"),
        )
    )


@register(
    "unpivot_pricing_metrics",
    oracle="""
WITH wide AS (
    SELECT l_returnflag,
           (floor((CAST(sum(l_quantity) AS DOUBLE)) * 100.0 + 0.5) / 100.0)  AS sum_qty,
           (floor((sum(l_extendedprice)) * 100.0 + 0.5) / 100.0)             AS sum_price,
           (floor((avg(l_discount)) * 1000000.0 + 0.5) / 1000000.0)                  AS avg_disc
    FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'sum_qty'   AS metric, sum_qty   AS value FROM wide
UNION ALL
SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM wide
UNION ALL
SELECT l_returnflag, 'avg_disc'  AS metric, avg_disc  AS value FROM wide
""",
    tags=("E7", "E13"),
)
def unpivot_pricing_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide metric columns -> (metric, value) long form —
    the feed shape for metric stores / plotting. `unpivot` is a zero-
    shuffle projection (each row expands to n_metrics rows in place), so
    it composes with the upstream agg at no extra exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        round_det(F.sum("l_quantity").cast("double"), 2).alias("sum_qty"),
        round_det(F.sum("l_extendedprice"), 2).alias("sum_price"),
        round_det(F.avg("l_discount"), 6).alias("avg_disc"),
    )
    return wide.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_price", "avg_disc"], "metric", "value"
    )


# ---------------------------------------------------------------------------
# E7/E16 — statistical aggregates (moments, correlation, regression)
# ---------------------------------------------------------------------------

@register(
    "stats_moments",
    oracle="""
WITH base AS (
    SELECT l_returnflag,
           (floor((stddev_samp(l_extendedprice)) * 100.0 + 0.5) / 100.0)                AS sd_price,
           (floor((var_samp(l_quantity)) * 10000.0 + 0.5) / 10000.0)                        AS var_qty,
           (floor((corr(l_quantity, l_extendedprice)) * 1000000.0 + 0.5) / 1000000.0)           AS corr_qty_price,
           (floor((covar_pop(l_quantity, l_extendedprice)) * 100.0 + 0.5) / 100.0)      AS covar_qty_price,
           (floor((regr_slope(l_extendedprice, l_quantity)) * 10000.0 + 0.5) / 10000.0)     AS slope,
           (floor((regr_intercept(l_extendedprice, l_quantity)) * 100.0 + 0.5) / 100.0) AS intercept,
           (floor((regr_r2(l_extendedprice, l_quantity)) * 1000000.0 + 0.5) / 1000000.0)        AS r2
    FROM lineitem GROUP BY l_returnflag
),
mom AS (
    SELECT l_returnflag,
           avg(l_quantity - 25)       AS mu,
           avg((l_quantity - 25) ^ 2) AS r2m,
           avg((l_quantity - 25) ^ 3) AS r3m,
           avg((l_quantity - 25) ^ 4) AS r4m
    FROM lineitem GROUP BY l_returnflag
),
cm AS (
    SELECT l_returnflag,
           r2m - mu ^ 2                                    AS m2,
           r3m - 3 * mu * r2m + 2 * mu ^ 3                 AS m3,
           r4m - 4 * mu * r3m + 6 * mu ^ 2 * r2m - 3 * mu ^ 4 AS m4
    FROM mom
)
SELECT base.*,
       (floor((m3 / (m2 ^ 1.5)) * 1000000.0 + 0.5) / 1000000.0)  AS skew_qty,
       (floor((m4 / (m2 ^ 2) - 3) * 1000000.0 + 0.5) / 1000000.0) AS kurt_qty
FROM base JOIN cm USING (l_returnflag)
""",
    tags=("E7", "E16"),
)
def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate family: stddev/variance, correlation,
    population covariance, least-squares regression, and the 3rd/4th
    standardized moments (skewness, excess kurtosis). All are mergeable
    partial aggregates in Spark (one exchange, map-side combine) — the
    oracle rebuilds skew/kurtosis from raw moments centered at a fixed
    shift (25 ~ E[l_quantity]) because DuckDB's skewness/kurtosis are
    the *sample*-corrected estimators while Spark's are population."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        round_det(F.stddev_samp("l_extendedprice"), 2).alias("sd_price"),
        round_det(F.var_samp("l_quantity"), 4).alias("var_qty"),
        round_det(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        round_det(F.covar_pop("l_quantity", "l_extendedprice"), 2).alias("covar_qty_price"),
        round_det(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        round_det(F.regr_intercept("l_extendedprice", "l_quantity"), 2).alias("intercept"),
        round_det(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        round_det(F.skewness("l_quantity"), 6).alias("skew_qty"),
        round_det(F.kurtosis("l_quantity"), 6).alias("kurt_qty"),
    )


HIST_BUCKETS = 20


@register(
    "price_histogram",
    oracle=f"""
WITH bounds AS (
    SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi FROM lineitem
),
b AS (
    SELECT least({HIST_BUCKETS - 1},
                 CAST(floor((l_extendedprice - lo)
                            / greatest((hi - lo) / {HIST_BUCKETS}, 1e-12)) AS BIGINT)) AS bucket,
           lo, hi
    FROM lineitem CROSS JOIN bounds
),
h AS (SELECT bucket, lo, hi, count(*)::BIGINT AS n FROM b GROUP BY 1, 2, 3)
SELECT bucket,
       (floor((lo + bucket * greatest((hi - lo) / {HIST_BUCKETS}, 1e-12)) * 10000.0 + 0.5) / 10000.0) AS bucket_lo,
       (floor((lo + (bucket + 1) * greatest((hi - lo) / {HIST_BUCKETS}, 1e-12)) * 10000.0 + 0.5) / 10000.0) AS bucket_hi,
       n,
       (floor((n * 1.0 / sum(n) OVER ()) * 10000.0 + 0.5) / 10000.0) AS share
FROM h
""",
    tags=("E7",),
)
def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram with DATA-DERIVED bounds — the profiling
    primitive behind skew detection and partition planning. Two passes:
    a min/max aggregate (one row, broadcast back) then a single scan
    assigning ``floor((v - lo) / width)`` buckets with the top edge
    clamped into the last bucket.

    Scale shape: the bounds row is a broadcast scalar (never a sort);
    bucketing is a pure projection; the histogram itself is a partial
    agg shuffle to HIST_BUCKETS rows, and the share normalization runs
    as a window sum over that bucket-count-bounded relation
    (whitelisted single-partition pattern).

    The width is floored at 1e-12 in BOTH engines: a degenerate corpus
    where every price is equal would otherwise divide by zero — Spark
    floor(x/0) yields null buckets while DuckDB errors on the cast, so
    the engines would diverge exactly when the guard matters. With the
    floor, both put every row in bucket 0."""
    li = load_table(spark, sf_dir, "lineitem")
    bounds = li.agg(
        F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi")
    )
    width = F.greatest(
        (F.col("hi") - F.col("lo")) / HIST_BUCKETS, F.lit(1e-12)
    )
    bucket = F.least(
        F.lit(HIST_BUCKETS - 1),
        F.floor((F.col("l_extendedprice") - F.col("lo")) / width),
    ).cast("long")
    h = (
        li.select("l_extendedprice")
        .crossJoin(F.broadcast(bounds))
        .groupBy(bucket.alias("bucket"), "lo", "hi")
        .agg(F.count("*").alias("n"))
    )
    w_all = Window.partitionBy()
    return h.select(
        "bucket",
        round_det(F.col("lo") + F.col("bucket") * width, 4).alias("bucket_lo"),
        round_det(F.col("lo") + (F.col("bucket") + 1) * width, 4).alias("bucket_hi"),
        "n",
        round_det(F.col("n") / F.sum("n").over(w_all), 4).alias("share"),
    )
