"""Batch twins of the streaming window operators (E19), oracle-checked.

The exact same library functions (streaming/windows.py) run here on
batch DataFrames — which is the point: one code path, two execution
modes. DuckDB has no window()/session_window(), so the oracles rebuild
the semantics from first principles (date_trunc, shifted unions,
gaps-and-islands).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_stream_faust_deprecated_spark.io import load_table
from kafka_stream_faust_deprecated_spark.registry import register
from kafka_stream_faust_deprecated_spark.streaming.windows import (
    sessionize,
    sliding_aggregate,
    tumbling_aggregate,
)


@register(
    "tumbling_window_events",
    oracle="""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
       event_type,
       count(*)             AS n,
       round(sum(value), 4) AS total_value,
       round(avg(value), 4) AS avg_value
FROM events
GROUP BY 1, 2
""",
    tags=("E19", "S23"),
)
def tumbling_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling windows per event type — aligned tumbling windows
    are equivalent to a date_trunc groupBy (what the oracle does)."""
    return tumbling_aggregate(load_table(spark, sf_dir, "events"))


@register(
    "sliding_window_events",
    oracle="""
WITH expanded AS (
    SELECT date_trunc('hour', ts)                   AS win_start, value FROM events
    UNION ALL
    SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS win_start, value FROM events
)
SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S')                 AS win_start,
       strftime(win_start + INTERVAL 2 HOUR, '%Y-%m-%d %H:%M:%S') AS win_end,
       count(*)             AS n,
       round(sum(value), 4) AS total_value
FROM expanded
GROUP BY win_start
""",
    tags=("E19", "S22"),
)
def sliding_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2h/1h hopping windows: every event belongs to exactly 2 windows —
    the oracle materializes that expansion with a shifted UNION ALL."""
    return sliding_aggregate(load_table(spark, sf_dir, "events"))


@register(
    "session_window_events",
    oracle="""
WITH ordered AS (
    SELECT user_id, ts, value,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS new_sess
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
    SELECT *, sum(new_sess) OVER (
        PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
    ) AS sess_id
    FROM ordered
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_last,
       count(*)             AS n_events,
       round(sum(value), 4) AS total_value
FROM sess
GROUP BY user_id, sess_id
""",
    tags=("E19",),
)
def session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessions per user; the oracle derives identical
    sessions via gaps-and-islands (lag + cumulative session counter)."""
    return sessionize(load_table(spark, sf_dir, "events"))
