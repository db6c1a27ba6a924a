"""Schema constants.

The stream schemas mirror the reference's two ``faust.Record`` types:

* ``STOCK_TICK_SCHEMA``  <- ``StockData``       (faust_app/ma_agg.py:6-20)
* ``AGGREGATED_SCHEMA``  <- ``AggregatedData``  (faust_app/ma_agg.py:22-34)

The reference carries timestamps as ISO-8601 strings on the wire and
parses them per-record (``ma_agg.py:87``); this engine keeps real
``TimestampType`` internally and (de)serializes only at the Kafka edge
(SURVEY.md §1.2).

Batch-table schemas for the driver's TPC-H-ish fixtures are listed in
FIXTURES.md §B and come from the Parquet footers at read time — we do not
redeclare them (schema-on-read), but ``BATCH_TABLES`` names the catalog.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Stream input: one tick per (symbol, second).  faust_app/ma_agg.py:6-20
# ---------------------------------------------------------------------------
STOCK_TICK_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("type", T.StringType(), True),
        T.StructField("start", T.StringType(), True),
        T.StructField("end", T.StringType(), True),
        # Event time; the dedup + window key (ma_agg.py:87,91). String on
        # the wire, parsed to timestamp at ingest.
        T.StructField("current_time", T.StringType(), False),
        T.StructField("last_data_time", T.StringType(), True),
        T.StructField("real_data_count", T.LongType(), True),
        T.StructField("filled_data_count", T.LongType(), True),
        T.StructField("real_or_filled", T.StringType(), True),
        T.StructField("vwap_price_per_sec", T.DoubleType(), True),
        T.StructField("size_per_sec", T.LongType(), True),
        T.StructField("volume_till_now", T.DoubleType(), True),
        T.StructField("yesterday_price", T.DoubleType(), True),
        T.StructField("price_change_percentage", T.DoubleType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Stream output: one aggregated row per (symbol, second) when the 5-second
# window is complete.  faust_app/ma_agg.py:22-34, built at :63-76.
# ---------------------------------------------------------------------------
AGGREGATED_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("type", T.StringType(), True),
        T.StructField("MA_type", T.StringType(), False),  # literal '5_MA_data' (ma_agg.py:66)
        T.StructField("start", T.StringType(), False),  # min event time in window (ma_agg.py:67)
        T.StructField("end", T.StringType(), False),  # max event time in window (ma_agg.py:68)
        T.StructField("current_time", T.StringType(), False),  # wall clock (ma_agg.py:69)
        T.StructField("sma_value", T.DoubleType(), False),  # guarded mean (ma_agg.py:70)
        T.StructField("sum_of_vwap", T.DoubleType(), False),  # filtered sum (ma_agg.py:58)
        T.StructField("count_of_vwap", T.LongType(), False),  # filtered count (ma_agg.py:59)
        T.StructField("window_data_count", T.LongType(), False),  # == 5 gate (ma_agg.py:57)
        T.StructField("real_data_count", T.LongType(), False),  # ma_agg.py:60
        T.StructField("filled_data_count", T.LongType(), False),  # ma_agg.py:61
    ]
)

#: Driver-generated batch tables (TESTDATA.md / FIXTURES.md §B).
BATCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
