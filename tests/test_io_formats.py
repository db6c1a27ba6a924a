"""File-format surface: CSV / JSON-lines / ORC round-trips.

The reference's only I/O is Kafka JSON (faust_app/ma_agg.py:40,44); the
engine's batch side must also speak the warehouse interchange formats.
Each round-trip pins (a) value fidelity under an EXPLICIT schema — the
100 TB rule is "never infer schemas in production paths": inference
costs an extra full scan and can silently flip a column's type between
runs — and (b) that the read path benefits from pushdown where the
format supports it (ORC yes, CSV/JSON no pushdown but column pruning
still applies).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_stream_faust_deprecated_spark.io import load_table
from tests.conftest import SF_DIR

#: columns with exact (non-float) equality semantics for the round-trip
KEY_COLS = ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")


def _fingerprint(df):
    """Order-insensitive content hash over all columns (dates formatted,
    floats rounded so text formats' repr round-trip can't flake)."""
    canon = df.select(
        *KEY_COLS,
        F.round("o_totalprice", 4).alias("o_totalprice"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("o_orderdate"),
    )
    row = canon.agg(
        F.sum(F.xxhash64(*canon.columns).cast("decimal(38,0)")).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return row["h"], row["n"]


def test_csv_json_orc_roundtrip(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders")
    want = _fingerprint(orders)
    schema = orders.schema

    csv_dir = str(tmp_path / "orders_csv")
    orders.write.option("header", True).option(
        "timestampFormat", "yyyy-MM-dd HH:mm:ss"
    ).csv(csv_dir)
    back_csv = (
        spark.read.schema(schema)
        .option("header", True)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .csv(csv_dir)
    )
    assert _fingerprint(back_csv) == want

    json_dir = str(tmp_path / "orders_json")
    orders.write.option("timestampFormat", "yyyy-MM-dd HH:mm:ss").json(json_dir)
    back_json = (
        spark.read.schema(schema)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .json(json_dir)
    )
    assert _fingerprint(back_json) == want

    orc_dir = str(tmp_path / "orders_orc")
    orders.write.orc(orc_dir)
    back_orc = spark.read.orc(orc_dir)
    assert _fingerprint(back_orc) == want


def test_orc_filter_pushdown(spark, tmp_path):
    """ORC scans must receive pushed filters like parquet does."""
    orc_dir = str(tmp_path / "orders_orc_pd")
    load_table(spark, SF_DIR, "orders").write.orc(orc_dir)
    q = spark.read.orc(orc_dir).where(F.col("o_orderkey") < 100).select("o_orderkey")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_orderkey" in plan.split(
        "PushedFilters", 1
    )[1].split("]")[0], plan
    assert q.count() > 0
