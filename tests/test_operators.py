"""Operator-level assertions that the oracle harness can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_stream_faust_deprecated_spark.io import load_table
from kafka_stream_faust_deprecated_spark.registry import get_query
from tests.conftest import SF_DIR


def test_approx_count_distinct_accuracy(spark):
    """E8: HLL++ estimates at rsd=0.01 stay within 5% of exact counts."""
    approx = {
        r["l_returnflag"]: r
        for r in get_query("approx_count_distinct").fn(spark, SF_DIR).collect()
    }
    li = load_table(spark, SF_DIR, "lineitem")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("orders"),
            F.countDistinct("l_partkey").alias("parts"),
        )
        .collect()
    }
    assert approx.keys() == exact.keys()
    for flag, a in approx.items():
        e = exact[flag]
        assert abs(a["approx_orders"] - e["orders"]) <= 0.05 * e["orders"]
        assert abs(a["approx_parts"] - e["parts"]) <= 0.05 * e["parts"]


def test_asof_join_carries_nearest_prior(spark):
    """E6: every matched signup_ts is <= purchase_ts (closed bound)."""
    rows = get_query("asof_join_signup").fn(spark, SF_DIR).collect()
    assert rows
    matched = [r for r in rows if r["signup_ts"] is not None]
    assert matched, "expected at least one purchase with a prior signup"
    for r in matched:
        assert r["signup_ts"] <= r["purchase_ts"]
        assert r["secs_since_signup"] >= 0
