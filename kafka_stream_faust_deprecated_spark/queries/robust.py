"""Dominance analysis, robust statistics, changepoint detection, and
seasonal decomposition (round-7 wave 5).

The capabilities this module adds, each as an oracle-checked query:

* ``skyline_pareto_frontier``   — the 2-D skyline (Pareto-optimal set)
  of the part catalog under (minimize price, maximize size): the
  classic dominance query OLAP engines ship as SKYLINE OF, computed
  with the sort-sweep formulation instead of the naive O(n^2)
  NOT-EXISTS self-join.
* ``robust_mad_outliers``       — median / MAD robust z-scores per
  event type with the Iglewicz-Hoaglin |z| > 3.5 outlier cut: the
  outlier screen that, unlike mean/stddev z-scores, is not itself
  corrupted by the outliers it hunts.
* ``cusum_changepoint``         — per-event-type CUSUM (cumulative sum
  of deviations from the series mean) with the argmax |CUSUM| reported
  as the changepoint candidate: the standard level-shift detector for
  monitoring pipelines.
* ``seasonal_decompose_events`` — the hour-of-day seasonal profile per
  event type (seasonal means, offsets from the type mean, and the
  fraction of variance the seasonal component explains): the
  decomposition every anomaly detector needs before it can separate
  "3am is always quiet" from "3am broke".

Wave 5b adds temporal alignment, attribution, and BPE pair mining:

* ``attribution_linear_touch``  — linear multi-touch attribution:
  every purchase splits one unit of credit equally across the user's
  click/view touches in the preceding 3 days, aggregated per touch
  type — the marketing-analytics shape whose naive form is a corpus
  self-join but whose real fan-out is bounded by per-user activity.
* ``nearest_event_join``        — the BIDIRECTIONAL nearest-neighbor
  temporal join (each purchase paired with the user's nearest click in
  either direction): the sensor-alignment primitive as-of joins only
  half-solve, computed in ONE user-keyed sort via last/first
  IGNORE NULLS windows instead of two joins.
* ``bpe_merge_pairs``           — the pair-count step of a BPE
  tokenizer trainer: collapse the corpus to its word-frequency table
  FIRST, generate adjacent character pairs over the vocabulary only,
  and rank merge candidates by frequency-weighted pair count.

Reference parity note: the reference app (``faust_app/ma_agg.py``, 308
lines) has no dominance / robust-stats / changepoint surface; these
extend the engine for the large-scale analytics mandate
(SURVEY.md §2b/§2c).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kafka_stream_faust_deprecated_spark.functions.rounding import (
    round_det,
    sql_round_det,
)
from kafka_stream_faust_deprecated_spark.io import load_table_parallel
from kafka_stream_faust_deprecated_spark.registry import register

# --------------------------------------------------------------------------
# skyline_pareto_frontier
# --------------------------------------------------------------------------


@register(
    "skyline_pareto_frontier",
    oracle="""
WITH p AS (
    SELECT p_partkey, CAST(p_retailprice AS DECIMAL(12,2)) AS price_d, p_size
    FROM part
),
lvl AS (
    SELECT price_d, max(p_size) AS max_sz FROM p GROUP BY 1
),
marked AS (
    SELECT price_d, max_sz,
           max(max_sz) OVER (
               ORDER BY price_d
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS prev_max
    FROM lvl
),
fp AS (
    SELECT price_d, max_sz FROM marked
    WHERE prev_max IS NULL OR max_sz > prev_max
)
SELECT p.p_partkey,
       CAST(p.price_d AS DOUBLE) AS price,
       p.p_size,
       CAST(dense_rank() OVER (ORDER BY p.price_d) AS BIGINT)
           AS frontier_rank
FROM p JOIN fp ON p.price_d = fp.price_d AND p.p_size = fp.max_sz
""",
    tags=("E7", "E10", "E12"),
)
def skyline_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Pareto frontier of the part catalog under (minimize
    retail price, maximize size): a part is on the skyline iff no part
    is both no-more-expensive and no-smaller with at least one strict.
    Computed by the sort-sweep identity — collapse to per-price max
    size, then a price-ordered running max marks exactly the price
    levels whose max size strictly exceeds every strictly-cheaper
    level; ties survive together (equal (price, size) rows never
    dominate each other). Every comparison is on the exact
    DECIMAL(12,2) price and integer size — no float predicate, so the
    frontier set is bit-identical across engines.

    Scale shape: the naive skyline is an O(n^2) NOT-EXISTS self-join;
    this plan is one price-keyed exchange with map-side combine (the
    per-price max), a running-max window over the DISTINCT-PRICE
    relation — bounded by the 2-decimal price domain, not the catalog
    (the equi_depth_histogram class) — and one broadcast join of the
    frontier price levels (at most |size domain| rows: frontier sizes
    strictly increase) back to the catalog scan.
    """
    p = load_table_parallel(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice").cast("decimal(12,2)").alias("price_d"),
        "p_size",
    )
    lvl = p.groupBy("price_d").agg(F.max("p_size").alias("max_sz"))
    sweep = Window.orderBy("price_d").rowsBetween(
        Window.unboundedPreceding, -1
    )
    fp = (
        lvl.withColumn("prev_max", F.max("max_sz").over(sweep))
        .where(F.col("prev_max").isNull() | (F.col("max_sz") > F.col("prev_max")))
        .select(
            F.col("price_d").alias("f_price"), F.col("max_sz").alias("f_size")
        )
    )
    frontier = p.join(
        F.broadcast(fp),
        (F.col("price_d") == F.col("f_price")) & (F.col("p_size") == F.col("f_size")),
    ).select("p_partkey", "price_d", "p_size")
    return frontier.select(
        "p_partkey",
        F.col("price_d").cast("double").alias("price"),
        "p_size",
        F.dense_rank()
        .over(Window.orderBy("price_d"))
        .cast("bigint")
        .alias("frontier_rank"),
    )


# --------------------------------------------------------------------------
# robust_mad_outliers
# --------------------------------------------------------------------------

#: Iglewicz-Hoaglin modified-z-score constant and cut: z = 0.6745 *
#: (x - median) / MAD, outlier when |z| > 3.5. The cut compares the
#: 4-dp-rounded z in both engines, so the flagged set cannot flicker
#: on last-ulp drift.
MAD_Z_SCALE = 0.6745
MAD_Z_CUT = 3.5


@register(
    "robust_mad_outliers",
    oracle=f"""
WITH st AS (
    SELECT event_type, count(*)::BIGINT AS n,
           {sql_round_det("quantile_cont(value, 0.5)", 4)} AS med
    FROM events GROUP BY 1
),
d AS (
    SELECT e.event_type, e.value, st.n, st.med,
           abs(e.value - st.med) AS dev
    FROM events e JOIN st USING (event_type)
),
m AS (
    SELECT event_type,
           {sql_round_det("quantile_cont(dev, 0.5)", 4)} AS mad
    FROM d GROUP BY 1
),
z AS (
    SELECT d.event_type, d.n, d.med, m.mad,
           {sql_round_det(
               f"{MAD_Z_SCALE} * (d.value - d.med) / nullif(m.mad, 0)", 4)} AS z
    FROM d JOIN m USING (event_type)
)
SELECT event_type, n, med, mad,
       sum(CASE WHEN abs(z) > {MAD_Z_CUT} THEN 1 ELSE 0 END)::BIGINT
           AS n_outliers,
       {sql_round_det(
           f"CAST(sum(CASE WHEN abs(z) > {MAD_Z_CUT} THEN 1 ELSE 0 END)"
           " AS DOUBLE) / n", 4)} AS outlier_share,
       max(abs(z)) AS max_abs_z
FROM z GROUP BY event_type, n, med, mad
""",
    tags=("E7", "E16"),
)
def robust_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier screen per event type: the exact
    median of value, the median absolute deviation around it, the count
    and share of rows whose Iglewicz-Hoaglin modified z-score
    ``0.6745 * (x - med) / MAD`` exceeds {MAD_Z_CUT} in magnitude, and
    the max |z| observed. Both medians are exact interpolated
    percentiles over the identical double multiset (no summation
    anywhere), rounded to 4 dp before any downstream arithmetic, so
    every per-row z is the same fixed double expression in both
    engines; the outlier cut compares the ROUNDED z (the
    [[verify-contract]] threshold rule) and max |z| is
    order-independent.

    Scale shape: two event-type-keyed aggregations (median, then MAD)
    with the 5-row stats broadcast back between them — the corpus is
    scanned twice and never re-keyed on anything unbounded. Exact
    per-group percentiles sort each group at scale; the 100 TB path
    swaps both for ``approx_percentile`` (same two-pass shape, sketch
    merge instead of sort) once the +-0.1% quantile error is
    acceptable — the cut logic is unchanged.
    """
    ev = load_table_parallel(spark, sf_dir, "events").select(
        "event_type", "value"
    )
    st = ev.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        round_det(F.percentile("value", F.lit(0.5)), 4).alias("med"),
    )
    d = ev.join(F.broadcast(st), "event_type").withColumn(
        "dev", F.abs(F.col("value") - F.col("med"))
    )
    m = d.groupBy("event_type").agg(
        round_det(F.percentile("dev", F.lit(0.5)), 4).alias("mad")
    )
    z = d.join(F.broadcast(m), "event_type").withColumn(
        "z",
        round_det(
            F.lit(MAD_Z_SCALE)
            * (F.col("value") - F.col("med"))
            / F.nullif(F.col("mad"), F.lit(0.0)),
            4,
        ),
    )
    flag = F.when(F.abs(F.col("z")) > MAD_Z_CUT, 1).otherwise(0)
    return z.groupBy("event_type", "n", "med", "mad").agg(
        F.sum(flag).cast("bigint").alias("n_outliers"),
        round_det(F.sum(flag).cast("double") / F.col("n"), 4).alias(
            "outlier_share"
        ),
        F.max(F.abs(F.col("z"))).alias("max_abs_z"),
    )


# --------------------------------------------------------------------------
# cusum_changepoint
# --------------------------------------------------------------------------


@register(
    "cusum_changepoint",
    oracle=f"""
WITH ev AS (
    SELECT event_type, ts, event_id,
           CAST(value AS DECIMAL(18,2)) AS d
    FROM events
),
st AS (
    SELECT event_type, count(*)::BIGINT AS n,
           {sql_round_det("CAST(sum(d) AS DOUBLE) / count(*)", 4)} AS mean_v
    FROM ev GROUP BY 1
),
c AS (
    SELECT ev.event_type, ev.ts, ev.event_id, st.n, st.mean_v,
           sum(ev.d) OVER (
               PARTITION BY ev.event_type ORDER BY ev.ts, ev.event_id
               ROWS UNBOUNDED PRECEDING
           ) AS run,
           row_number() OVER (
               PARTITION BY ev.event_type ORDER BY ev.ts, ev.event_id
           ) AS i
    FROM ev JOIN st USING (event_type)
),
k AS (
    SELECT event_type, ts, event_id, n, mean_v, i,
           {sql_round_det("abs(CAST(run AS DOUBLE) - i * mean_v)", 4)}
               AS abs_cusum
    FROM c
),
r AS (
    SELECT *, row_number() OVER (
        PARTITION BY event_type
        ORDER BY abs_cusum DESC, ts, event_id
    ) AS rk
    FROM k
)
SELECT event_type, n, mean_v,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS cp_ts,
       i::BIGINT AS cp_index,
       abs_cusum AS max_abs_cusum
FROM r WHERE rk = 1
""",
    tags=("E7", "E10", "E15"),
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type CUSUM changepoint candidate: walk the series in
    (ts, event_id) order, accumulate S_i = sum of the first i values,
    form CUSUM_i = S_i - i * mean (the cumulative deviation from the
    series mean — a level shift makes |CUSUM| peak at the shift point),
    and report the row with the maximum |CUSUM| per type with its
    timestamp and position. The running sum is an EXACT DECIMAL(18,2)
    prefix sum (order-fixed, associativity-immune), the mean is rounded
    to 4 dp before use, and the argmax ranks on the ROUNDED |CUSUM|
    with a (ts, event_id) lexicographic tiebreak — the
    [[verify-contract]] rank rule, so the winner cannot flicker between
    engines.

    Scale shape: one event-type-keyed exchange feeds both windows (the
    prefix sum and the argmax rank reuse the same partitioning); the
    5-row mean/count stats broadcast back. With few huge groups the
    per-group sort is the bound — the 100 TB path is the textbook
    two-pass distributed prefix sum (range-partition each series by
    time, per-partition local sums, broadcast the per-partition
    offsets) with identical output.
    """
    ev = load_table_parallel(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        "event_id",
        F.col("value").cast("decimal(18,2)").alias("d"),
    )
    st = ev.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        round_det(F.sum("d").cast("double") / F.count("*"), 4).alias("mean_v"),
    )
    order = Window.partitionBy("event_type").orderBy("ts", "event_id")
    run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    k = (
        ev.join(F.broadcast(st), "event_type")
        .withColumn("run", F.sum("d").over(run))
        .withColumn("i", F.row_number().over(order))
        .withColumn(
            "abs_cusum",
            round_det(
                F.abs(F.col("run").cast("double") - F.col("i") * F.col("mean_v")),
                4,
            ),
        )
    )
    rk = Window.partitionBy("event_type").orderBy(
        F.col("abs_cusum").desc(), "ts", "event_id"
    )
    return (
        k.withColumn("rk", F.row_number().over(rk))
        .where(F.col("rk") == 1)
        .select(
            "event_type",
            "n",
            "mean_v",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("cp_ts"),
            F.col("i").cast("bigint").alias("cp_index"),
            F.col("abs_cusum").alias("max_abs_cusum"),
        )
    )


# --------------------------------------------------------------------------
# seasonal_decompose_events
# --------------------------------------------------------------------------


@register(
    "seasonal_decompose_events",
    oracle=f"""
WITH ev AS (
    SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr,
           CAST(value AS DECIMAL(18,2)) AS d
    FROM events
),
h AS (
    SELECT event_type, hr, count(*)::BIGINT AS n_h,
           sum(d) AS sy, sum(d * d) AS syy
    FROM ev GROUP BY 1, 2
),
t AS (
    SELECT event_type, hr, n_h, sy, syy,
           sum(n_h) OVER (PARTITION BY event_type) AS n_t,
           sum(sy) OVER (PARTITION BY event_type) AS sy_t,
           sum(syy) OVER (PARTITION BY event_type) AS syy_t,
           CAST({sql_round_det(
               "CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n_h", 6)}
               AS DECIMAL(18,6)) AS ssb_term
    FROM h
),
agg AS (
    SELECT event_type, hr, n_h, sy, n_t, sy_t, syy_t,
           CAST(sum(ssb_term) OVER (PARTITION BY event_type) AS DOUBLE)
               AS ssb_raw
    FROM t
)
SELECT event_type, hr, n_h,
       {sql_round_det("CAST(sy AS DOUBLE) / n_h", 4)} AS hod_avg,
       {sql_round_det("CAST(sy_t AS DOUBLE) / n_t", 4)} AS type_avg,
       {sql_round_det(
           "CAST(sy AS DOUBLE) / n_h - CAST(sy_t AS DOUBLE) / n_t", 4)}
           AS seasonal_offset,
       {sql_round_det(
           "(ssb_raw - CAST(sy_t AS DOUBLE) * CAST(sy_t AS DOUBLE) / n_t)"
           " / nullif(CAST(syy_t AS DOUBLE)"
           "          - CAST(sy_t AS DOUBLE) * CAST(sy_t AS DOUBLE) / n_t, 0)",
           4)} AS seasonal_strength
FROM agg
""",
    tags=("E7", "E10", "E15"),
)
def seasonal_decompose_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal decomposition per event type: for every
    (type, hour) cell the row count, the hour mean, the type mean, the
    seasonal offset (hour mean - type mean), and the type's seasonal
    strength — the between-hour share of total variance
    ``SSB / SST`` (the eta-squared of hour-of-day), which is ~0 when
    the hour explains nothing and ~1 when the series is pure
    seasonality. All moments are EXACT decimal sums; SSB's per-hour
    terms ``sy_h^2 / n_h`` are rounded to 6-dp DECIMAL before the
    cross-hour sum (the mi_contrib idiom) so no float is ever summed in
    either engine.

    Scale shape: ONE corpus exchange — the (type, hour) aggregate with
    map-side combine; every window after it runs over the bounded
    |types| x 24 relation partitioned by type. The output is
    catalog-sized, never corpus-sized.
    """
    ev = load_table_parallel(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").cast("bigint").alias("hr"),
        F.col("value").cast("decimal(18,2)").alias("d"),
    )
    h = ev.groupBy("event_type", "hr").agg(
        F.count("*").cast("bigint").alias("n_h"),
        F.sum("d").alias("sy"),
        F.sum(F.col("d") * F.col("d")).alias("syy"),
    )
    byt = Window.partitionBy("event_type")
    t = h.select(
        "event_type",
        "hr",
        "n_h",
        "sy",
        F.sum("n_h").over(byt).alias("n_t"),
        F.sum("sy").over(byt).alias("sy_t"),
        F.sum("syy").over(byt).alias("syy_t"),
        round_det(
            F.col("sy").cast("double") * F.col("sy").cast("double") / F.col("n_h"),
            6,
        )
        .cast("decimal(18,6)")
        .alias("ssb_term"),
    )
    agg = t.withColumn(
        "ssb_raw", F.sum("ssb_term").over(byt).cast("double")
    )
    sy = F.col("sy").cast("double")
    sy_t = F.col("sy_t").cast("double")
    syy_t = F.col("syy_t").cast("double")
    sst = syy_t - sy_t * sy_t / F.col("n_t")
    return agg.select(
        "event_type",
        "hr",
        "n_h",
        round_det(sy / F.col("n_h"), 4).alias("hod_avg"),
        round_det(sy_t / F.col("n_t"), 4).alias("type_avg"),
        round_det(sy / F.col("n_h") - sy_t / F.col("n_t"), 4).alias(
            "seasonal_offset"
        ),
        round_det(
            (F.col("ssb_raw") - sy_t * sy_t / F.col("n_t"))
            / F.nullif(sst, F.lit(0.0)),
            4,
        ).alias("seasonal_strength"),
    )


# --------------------------------------------------------------------------
# attribution_linear_touch
# --------------------------------------------------------------------------

#: Attribution lookback window (days before the purchase) and the
#: touch types that earn credit.
ATTR_WINDOW_DAYS = 3
ATTR_TOUCH_TYPES = ("click", "view")


@register(
    "attribution_linear_touch",
    oracle=f"""
WITH p AS (
    SELECT user_id, event_id AS pid, ts AS pts
    FROM events WHERE event_type = 'purchase'
),
t AS (
    SELECT user_id, event_type, event_id AS tid, ts AS tts
    FROM events WHERE event_type IN ('click', 'view')
),
j AS (
    SELECT p.pid, t.event_type, t.tid,
           count(*) OVER (PARTITION BY p.pid) AS n_touch
    FROM p JOIN t
      ON p.user_id = t.user_id
     AND t.tts <= p.pts
     AND t.tts >= p.pts - INTERVAL {ATTR_WINDOW_DAYS} DAY
),
c AS (
    SELECT event_type, tid, pid,
           CAST({sql_round_det("1.0 / n_touch", 6)} AS DECIMAL(18,6))
               AS credit
    FROM j
)
SELECT event_type,
       count(*)::BIGINT AS n_touches_credited,
       count(DISTINCT pid)::BIGINT AS n_purchases_touched,
       CAST(sum(credit) AS DOUBLE) AS total_credit
FROM c GROUP BY event_type
""",
    tags=("E3", "E5", "E7"),
)
def attribution_linear_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase distributes one
    unit of conversion credit equally across the user's click/view
    touches in the {ATTR_WINDOW_DAYS} days up to the purchase, and the
    credit is rolled up per touch type (touch count, distinct purchases
    reached, total credit). Per-touch credit ``1 / n_touch`` is rounded
    to 6-dp DECIMAL before the cross-row sum (the mi_contrib idiom), so
    the totals are exact and summation-order-independent in both
    engines.

    Scale shape: the purchase x touch pairing is a user-keyed equi-join
    with the time-window predicate applied as a post-join filter — both
    sides exchange ONCE on user_id and the fan-out is bounded by
    per-user activity in the lookback window, never the corpus. The
    fan-out is then IMMEDIATELY collapsed to the (purchase, touch-type)
    count relation (map-side combine — at most |touch types| rows per
    purchase survive), the per-purchase total rides a skinny
    pid-keyed window over that collapsed relation, and per-type credit
    is ``cnt * round(1/n_touch, 6)`` — exactly the per-touch sum, since
    every touch of one purchase shares the same n_touch. The raw
    fan-out rows are never re-exchanged.
    """
    ev = load_table_parallel(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("pid"), F.col("ts").alias("pts")
    )
    t = ev.where(F.col("event_type").isin(*ATTR_TOUCH_TYPES)).select(
        "user_id",
        "event_type",
        F.col("ts").alias("tts"),
    )
    j = p.join(t, "user_id").where(
        (F.col("tts") <= F.col("pts"))
        & (
            F.col("tts")
            >= F.col("pts") - F.expr(f"INTERVAL {ATTR_WINDOW_DAYS} DAY")
        )
    )
    per_type = j.groupBy("pid", "event_type").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    per_type = per_type.withColumn(
        "n_touch", F.sum("cnt").over(Window.partitionBy("pid"))
    )
    c = per_type.select(
        "event_type",
        "pid",
        "cnt",
        (
            F.col("cnt").cast("decimal(18,0)")
            * round_det(F.lit(1.0) / F.col("n_touch"), 6).cast("decimal(18,6)")
        ).alias("credit"),
    )
    return c.groupBy("event_type").agg(
        F.sum("cnt").cast("bigint").alias("n_touches_credited"),
        F.count("*").cast("bigint").alias("n_purchases_touched"),
        F.sum("credit").cast("double").alias("total_credit"),
    )


# --------------------------------------------------------------------------
# nearest_event_join
# --------------------------------------------------------------------------


@register(
    "nearest_event_join",
    oracle="""
WITH ev AS (
    SELECT user_id, event_type, event_id, ts,
           epoch(date_trunc('second', ts))::BIGINT AS sec
    FROM events WHERE event_type IN ('purchase', 'click')
),
w AS (
    SELECT user_id, event_type, event_id, ts, sec,
           last_value(CASE WHEN event_type = 'click' THEN sec END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_click_sec,
           first_value(CASE WHEN event_type = 'click' THEN sec END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_click_sec
    FROM ev
)
SELECT user_id, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       (sec - prev_click_sec) AS prev_gap_sec,
       (next_click_sec - sec) AS next_gap_sec,
       CASE
           WHEN prev_click_sec IS NULL AND next_click_sec IS NULL THEN 'none'
           WHEN next_click_sec IS NULL THEN 'prev'
           WHEN prev_click_sec IS NULL THEN 'next'
           WHEN sec - prev_click_sec <= next_click_sec - sec THEN 'prev'
           ELSE 'next'
       END AS nearest_side,
       CASE
           WHEN prev_click_sec IS NULL AND next_click_sec IS NULL THEN NULL
           WHEN next_click_sec IS NULL THEN sec - prev_click_sec
           WHEN prev_click_sec IS NULL THEN next_click_sec - sec
           WHEN sec - prev_click_sec <= next_click_sec - sec
               THEN sec - prev_click_sec
           ELSE next_click_sec - sec
       END AS nearest_gap_sec
FROM w
WHERE event_type = 'purchase'
""",
    tags=("E5", "E6", "E10"),
)
def nearest_event_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidirectional nearest-neighbor temporal join: pair every
    purchase with the same user's nearest click in EITHER direction
    (as-of joins are backward-only — sensor alignment and
    session-stitching need both sides), reporting both gaps, the chosen
    side, and the winning gap, ties to the earlier click. Gaps are
    exact integer SECOND differences on the second-truncated epoch
    (`unix_timestamp` == duckdb `epoch(date_trunc('second', ts))`, the
    sessionize_capped idiom — TZ-free and NTZ-safe); no float anywhere,
    so the chosen side cannot flicker between engines.

    Scale shape: ONE user-keyed exchange and one sort serve the whole
    query — both event roles are interleaved in a single per-user
    timeline and the prev/next click timestamps come from last/first
    IGNORE-NULLS frames over it. The naive formulation (purchase x
    click join + per-purchase min-|gap| rank) shuffles the fan-out
    product; this plan never materializes it.
    """
    ev = (
        load_table_parallel(spark, sf_dir, "events")
        .where(F.col("event_type").isin("purchase", "click"))
        .select(
            "user_id",
            "event_type",
            "event_id",
            "ts",
            F.unix_timestamp("ts").alias("sec"),
        )
    )
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    click_sec = F.when(F.col("event_type") == "click", F.col("sec"))
    w = ev.select(
        "user_id",
        "event_type",
        "event_id",
        "ts",
        "sec",
        F.last(click_sec, ignorenulls=True)
        .over(order.rowsBetween(Window.unboundedPreceding, -1))
        .alias("prev_click_sec"),
        F.first(click_sec, ignorenulls=True)
        .over(order.rowsBetween(1, Window.unboundedFollowing))
        .alias("next_click_sec"),
    )
    prev_gap = F.col("sec") - F.col("prev_click_sec")
    next_gap = F.col("next_click_sec") - F.col("sec")
    both_null = (
        F.col("prev_click_sec").isNull() & F.col("next_click_sec").isNull()
    )
    prev_wins = (
        F.col("next_click_sec").isNull()
        | (F.col("prev_click_sec").isNotNull() & (prev_gap <= next_gap))
    )
    return w.where(F.col("event_type") == "purchase").select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        prev_gap.alias("prev_gap_sec"),
        next_gap.alias("next_gap_sec"),
        F.when(both_null, "none")
        .when(prev_wins, "prev")
        .otherwise("next")
        .alias("nearest_side"),
        F.when(both_null, F.lit(None).cast("long"))
        .when(prev_wins, prev_gap)
        .otherwise(next_gap)
        .alias("nearest_gap_sec"),
    )


# --------------------------------------------------------------------------
# bpe_merge_pairs
# --------------------------------------------------------------------------

#: Number of top merge candidates reported (with full deterministic
#: tiebreaks the cut cannot flicker).
BPE_TOP_PAIRS = 30


@register(
    "bpe_merge_pairs",
    oracle=f"""
WITH words AS (
    SELECT w AS word, count(*)::BIGINT AS freq
    FROM (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ) t
    WHERE w <> ''
    GROUP BY w
),
pairs AS (
    SELECT pair, sum(freq)::BIGINT AS pair_count,
           count(*)::BIGINT AS n_words
    FROM (
        SELECT freq,
               unnest([substr(word, i, 2)
                       for i in generate_series(1, length(word) - 1)]) AS pair
        FROM words
        WHERE length(word) >= 2
    ) t
    GROUP BY pair
),
ranked AS (
    SELECT pair, pair_count, n_words,
           row_number() OVER (ORDER BY pair_count DESC, pair) AS merge_rank
    FROM pairs
)
SELECT pair, pair_count, n_words, merge_rank::BIGINT AS merge_rank
FROM ranked
WHERE merge_rank <= {BPE_TOP_PAIRS}
""",
    tags=("E7", "E25"),
)
def bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pair-count step of a BPE tokenizer trainer: the top
    {BPE_TOP_PAIRS} adjacent character pairs by frequency-weighted
    count (the merge candidates), with the number of distinct words
    containing each pair and the deterministic merge rank
    (count DESC, pair ASC — integer counts plus a total lexicographic
    order, so the ranking is bit-identical across engines).

    Scale shape: the trainer's defining trick is here — the corpus
    collapses to its WORD-FREQUENCY table first (one vocab-keyed
    exchange with map-side combine; BPE never rescans the corpus), and
    pair generation is a codegen substring transform over the
    vocabulary relation only, with pair counts summing word
    frequencies. The rank/limit runs over the alphabet^2-bounded pair
    relation (TakeOrdered heap — no sort exchange of anything
    corpus-sized).
    """
    docs = load_table_parallel(spark, sf_dir, "documents").select("text")
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("freq"))
    )
    pairs = (
        words.where(F.length("word") >= 2)
        .select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(word) - 1), "
                    "i -> substring(word, i, 2))"
                )
            ).alias("pair"),
        )
        .groupBy("pair")
        .agg(
            F.sum("freq").cast("bigint").alias("pair_count"),
            F.count("*").cast("bigint").alias("n_words"),
        )
    )
    ranked = pairs.withColumn(
        "merge_rank",
        F.row_number()
        .over(Window.orderBy(F.col("pair_count").desc(), "pair"))
        .cast("bigint"),
    )
    return ranked.where(F.col("merge_rank") <= BPE_TOP_PAIRS).select(
        "pair", "pair_count", "n_words", "merge_rank"
    )


# --------------------------------------------------------------------------
# weighted_median_price  (round-7 wave 7)
# --------------------------------------------------------------------------

#: Weighted quantiles reported, as integer percent points. The pick is
#: the inverted-CDF lower weighted quantile: the smallest value whose
#: cumulative weight reaches q of the total — an EXACT integer/decimal
#: predicate (cumw * 100 >= q * total), never a float comparison.
WEIGHTED_QS = (25, 50, 75)


@register(
    "weighted_median_price",
    oracle=f"""
WITH lvl AS (
    SELECT CAST(p_retailprice AS DECIMAL(12,2)) AS price_d,
           sum(CAST(l_quantity AS DECIMAL(18,2))) AS w
    FROM lineitem JOIN part ON p_partkey = l_partkey
    GROUP BY 1
),
c AS (
    SELECT price_d, w,
           sum(w) OVER (ORDER BY price_d
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cumw,
           sum(w) OVER () AS total
    FROM lvl
),
q AS (SELECT unnest([{", ".join(str(q) for q in WEIGHTED_QS)}]) AS pct)
SELECT q.pct::BIGINT AS pct,
       min(c.price_d)::DOUBLE AS price,
       CAST(max(c.total) AS DOUBLE) AS total_weight
FROM q JOIN c ON c.cumw * 100 >= q.pct * c.total
GROUP BY q.pct
""",
    tags=("E7", "E10"),
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted price quantiles (p25 / p50 / p75): the price
    below which {WEIGHTED_QS} percent of SOLD UNITS (not of parts)
    fall — the weighted-median primitive SQL lacks, as the inverted
    CDF over the price-level weight distribution. The pick predicate
    is exact integer x DECIMAL arithmetic (``cumw * 100 >= pct *
    total``), so the chosen prices are bit-identical across engines.

    Scale shape: the corpus collapses to the DISTINCT-PRICE level
    first (one price-keyed exchange with map-side combine of
    DECIMAL weights — the part dim broadcasts into the fact scan);
    the cumulative-weight window and the quantile pick run over the
    2-decimal-price-domain-bounded level relation (the
    equi_depth_histogram class, whitelisted single-partition), with
    the 3-row quantile spec broadcast onto it.
    """
    li = load_table_parallel(spark, sf_dir, "lineitem").select(
        "l_partkey", F.col("l_quantity").cast("decimal(18,2)").alias("qty")
    )
    part = load_table_parallel(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_retailprice").cast("decimal(12,2)").alias("price_d")
    )
    lvl = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("price_d")
        .agg(F.sum("qty").alias("w"))
    )
    c = lvl.select(
        "price_d",
        "w",
        F.sum("w")
        .over(
            Window.orderBy("price_d").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("cumw"),
        F.sum("w").over(Window.partitionBy()).alias("total"),
    )
    qs = F.explode(F.array(*[F.lit(q) for q in WEIGHTED_QS])).alias("pct")
    picked = c.select(qs, "price_d", "cumw", "total").where(
        F.col("cumw") * 100 >= F.col("pct") * F.col("total")
    )
    return picked.groupBy("pct").agg(
        F.min("price_d").cast("double").alias("price"),
        F.max("total").cast("double").alias("total_weight"),
    ).select(F.col("pct").cast("bigint").alias("pct"), "price", "total_weight")


# --------------------------------------------------------------------------
# source_quantile_normalization  (round-7 wave 7)
# --------------------------------------------------------------------------


@register(
    "source_quantile_normalization",
    oracle=f"""
WITH r AS (
    SELECT doc_id, source, n_chars,
           row_number() OVER (
               PARTITION BY source ORDER BY n_chars, doc_id
           ) AS src_rank,
           count(*) OVER (PARTITION BY source) AS src_n
    FROM documents
)
SELECT doc_id, source, n_chars, src_rank::BIGINT AS src_rank,
       src_n::BIGINT AS src_n,
       {sql_round_det(
           "CAST(src_rank - 1 AS DOUBLE) / nullif(src_n - 1, 0)", 6)}
           AS src_pct
FROM r
""",
    tags=("E10", "E25"),
)
def source_quantile_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quantile normalization of document length: each
    document's rank percentile within ITS OWN source (rank by
    (n_chars, doc_id) — a total order, so ranks are exact integers and
    identical in both engines; percentile = (rank-1)/(n-1)). This is
    the feature-calibration step that makes 'long for a crawl page'
    and 'long for a paper' comparable before cross-source quality
    cuts or mixture weighting.

    Scale shape: ONE source-keyed exchange serves both windows (rank
    and group count share the partitioning); output is corpus-sized by
    design (a per-document feature column). With few huge sources the
    per-source sort is the bound — the 100 TB refinement is the
    two-pass distributed rank (range-partition by (source, n_chars),
    per-partition counts broadcast as offsets), identical output.
    """
    docs = load_table_parallel(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    r = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number().over(w).cast("bigint").alias("src_rank"),
        F.count("*").over(Window.partitionBy("source")).cast("bigint").alias(
            "src_n"
        ),
    )
    return r.select(
        "doc_id",
        "source",
        "n_chars",
        "src_rank",
        "src_n",
        round_det(
            (F.col("src_rank") - 1).cast("double")
            / F.nullif((F.col("src_n") - 1).cast("double"), F.lit(0.0)),
            6,
        ).alias("src_pct"),
    )


# --------------------------------------------------------------------------
# gini_concentration_index  (round-7 wave 7)
# --------------------------------------------------------------------------


@register(
    "gini_concentration_index",
    oracle=f"""
WITH r AS (
    SELECT source, n_chars,
           row_number() OVER (
               PARTITION BY source ORDER BY n_chars, doc_id
           ) AS i
    FROM documents
),
s AS (
    SELECT source,
           count(*)::BIGINT AS n_docs,
           sum(n_chars)::BIGINT AS total_chars,
           sum(i * n_chars)::BIGINT AS weighted_sum
    FROM r GROUP BY source
)
SELECT source, n_docs, total_chars,
       {sql_round_det(
           "(2.0 * weighted_sum - (n_docs + 1.0) * total_chars)"
           " / (CAST(n_docs AS DOUBLE) * total_chars)", 6)} AS gini
FROM s
""",
    tags=("E7", "E10"),
)
def gini_concentration_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Gini coefficient of document length — the
    concentration diagnostic (0 = every doc equal, -> 1 = a few giants
    hold all the mass) curation runs before trusting per-source token
    budgets. Computed from the rank identity ``G = (2 * sum(i * x_i) -
    (n+1) * sum(x_i)) / (n * sum(x_i))`` over the ascending
    (n_chars, doc_id) total order: every sum is an exact BIGINT, so
    the only float is one fixed closed-form expression per source.

    Scale shape: ONE source-keyed exchange serves the rank window and
    the moment aggregate (shared partitioning, map-side-combinable
    integer sums); output is |sources| rows. Same two-pass
    distributed-rank refinement as source_quantile_normalization at
    100 TB.
    """
    docs = load_table_parallel(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    r = docs.select(
        "source", "n_chars", F.row_number().over(w).alias("i")
    )
    s = r.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum(F.col("i") * F.col("n_chars")).cast("bigint").alias("weighted_sum"),
    )
    return s.select(
        "source",
        "n_docs",
        "total_chars",
        round_det(
            (
                2.0 * F.col("weighted_sum")
                - (F.col("n_docs") + F.lit(1.0)) * F.col("total_chars")
            )
            / (F.col("n_docs").cast("double") * F.col("total_chars")),
            6,
        ).alias("gini"),
    )
