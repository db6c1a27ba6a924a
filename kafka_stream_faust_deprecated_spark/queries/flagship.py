"""M0 flagship — batch twin of the reference's 5-second sliding SMA.

The reference (faust_app/ma_agg.py:49-81) computes, per symbol, every
second: over the last 5 seconds of per-second ticks — only when all 5
seconds are present (``len(window_data) == 5``, :57) —

* ``sum_of_vwap``  = sum of vwap over seconds with nonzero size   (:58)
* ``count_of_vwap``= count of those seconds                        (:59)
* ``real/filled``  = conditional counts on ``real_or_filled``      (:60-61)
* ``sma_value``    = sum/count, 0 when count==0                    (:70)
* ``start``/``end``= min/max event time actually present           (:67-68)

Batch twin over the driver's ``events`` table (FIXTURES.md §B maps
``(user_id, ts, value)`` to ``(symbol, current_time, vwap_price_per_sec)``):
a 5-ROW sliding window per user ordered by event time, with the same
exactly-5 completeness gate and the same conditional-aggregation and
guarded-division semantics. ``value > 0`` plays the role of the
``size_per_sec != 0`` filter and ``event_type = 'purchase'`` the role of
``real_or_filled == 'real'``.

Spark plan shape: single shuffle on ``user_id`` (window partitioning);
all aggregates evaluate in one Window physical operator, JVM-side, no
Python. At 100 TB this is the right plan: one exchange, per-partition
sort, streaming frame evaluation — no state blowup (frame is 5 rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_stream_faust_deprecated_spark.functions.rounding import round_det
from kafka_stream_faust_deprecated_spark.io import load_table
from kafka_stream_faust_deprecated_spark.registry import register

_ORACLE = """
WITH deduped AS (
    SELECT user_id, ts, value, event_type
    FROM (
        SELECT user_id, ts, value, event_type,
               row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events
    )
    WHERE rn = 1
),
windowed AS (
    SELECT
        user_id,
        ts,
        count(*) OVER w AS window_data_count,
        CAST(sum(CASE WHEN value > 0 THEN value END) OVER w AS DOUBLE) AS sum_of_vwap,
        count(CASE WHEN value > 0 THEN 1 END) OVER w AS count_of_vwap,
        count(CASE WHEN event_type = 'purchase' THEN 1 END) OVER w AS real_data_count,
        count(CASE WHEN event_type <> 'purchase' THEN 1 END) OVER w AS filled_data_count,
        min(ts) OVER w AS win_start,
        max(ts) OVER w AS win_end
    FROM deduped
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
)
SELECT
    user_id,
    strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_sec,
    strftime(win_start, '%Y-%m-%d %H:%M:%S') AS start,
    strftime(win_end, '%Y-%m-%d %H:%M:%S') AS "end",
    '5_MA_data' AS ma_type,
    (floor((COALESCE(sum_of_vwap / NULLIF(count_of_vwap, 0), 0.0)) * 10000.0 + 0.5) / 10000.0) AS sma_value,
    (floor((COALESCE(sum_of_vwap, 0.0)) * 10000.0 + 0.5) / 10000.0) AS sum_of_vwap,
    count_of_vwap,
    window_data_count,
    real_data_count,
    filled_data_count
FROM windowed
WHERE window_data_count = 5
"""


@register("flagship_sma_5row", oracle=_ORACLE, tags=("flagship", "window", "E11"))
def flagship_sma_5row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 5-row sliding SMA with completeness gate (S6-S15, E11)."""
    events = load_table(spark, sf_dir, "events")

    # S4/S5 — last-write-wins dedup per (user_id, ts): the reference's
    # dict-key overwrite (ma_agg.py:91). Highest event_id wins. Done on
    # the SAME partitioning as the sliding window below (user_id, sorted
    # by ts, event_id desc — the sort the window needs is a prefix), so
    # the whole query is ONE exchange + ONE sort: dedup rides along as a
    # lag() comparison instead of costing its own (user_id, ts) shuffle.
    dd = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").desc())
    deduped = (
        events.select("user_id", "ts", "value", "event_type", "event_id")
        .withColumn(
            "is_first", F.coalesce(F.col("ts") != F.lag("ts").over(dd), F.lit(True))
        )
        .where(F.col("is_first"))
        .drop("is_first", "event_id")
    )

    # S6/S22 — 5-row sliding frame per user (batch twin of 5s/1s hopping).
    w = Window.partitionBy("user_id").orderBy("ts").rowsBetween(-4, 0)

    value_ok = F.col("value") > 0  # twin of size_per_sec != 0 (ma_agg.py:58)
    is_real = F.col("event_type") == "purchase"  # twin of 'real' (ma_agg.py:60)

    windowed = deduped.select(
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("window_data_count"),  # S8 gate input
        F.sum(F.when(value_ok, F.col("value"))).over(w).alias("sum_of_vwap"),  # S9
        F.count(F.when(value_ok, True)).over(w).alias("count_of_vwap"),  # S10
        F.count(F.when(is_real, True)).over(w).alias("real_data_count"),  # S11
        F.count(F.when(~is_real, True)).over(w).alias("filled_data_count"),  # S11
        F.min("ts").over(w).alias("win_start"),  # S13
        F.max("ts").over(w).alias("win_end"),  # S13
    )

    return windowed.where(F.col("window_data_count") == 5).select(  # S8
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_sec"),  # S19
        F.date_format("win_start", "yyyy-MM-dd HH:mm:ss").alias("start"),
        F.date_format("win_end", "yyyy-MM-dd HH:mm:ss").alias("end"),
        F.lit("5_MA_data").alias("ma_type"),  # S15
        round_det(F.coalesce(  # S12 guarded division
                F.col("sum_of_vwap") / F.nullif(F.col("count_of_vwap"), F.lit(0)),
                F.lit(0.0),
            ), 4).alias("sma_value"),
        round_det(F.coalesce(F.col("sum_of_vwap"), F.lit(0.0)), 4).alias("sum_of_vwap"),
        "count_of_vwap",
        "window_data_count",
        "real_data_count",
        "filled_data_count",
    )
