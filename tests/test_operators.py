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


def test_approx_percentile_bounded_rank_error(spark):
    """E8: percentile_approx at accuracy=10000 must land within 1% RANK
    of the requested quantile (the sketch's contract is rank error, not
    value error)."""
    approx = {
        r["l_returnflag"]: r
        for r in get_query("approx_percentile_price").fn(spark, SF_DIR).collect()
    }
    li = load_table(spark, SF_DIR, "lineitem")
    for flag, row in approx.items():
        vals = sorted(
            r["l_extendedprice"]
            for r in li.where(F.col("l_returnflag") == flag)
            .select("l_extendedprice")
            .collect()
        )
        n = len(vals)
        assert n == row["n_rows"]
        for q, col in ((0.5, "p50"), (0.95, "p95")):
            import bisect

            rank = bisect.bisect_left(vals, row[col])
            assert abs(rank / n - q) <= 0.01, (flag, col, rank / n)


def test_global_range_count_matches_naive_window(spark):
    """operators.range_frame: the bucketed two-pass decomposition must
    equal the unpartitioned RANGE window exactly — including ties,
    values at exact bucket-width multiples (probe lands on a boundary),
    and empty intermediate buckets."""
    from pyspark.sql.window import Window

    from kafka_stream_faust_deprecated_spark.operators.range_frame import (
        global_range_count,
    )

    vals = (
        [10.0, 10.0, 10.0]          # ties
        + [5000.0, 10000.0]          # exact width multiples
        + [4999.99, 5000.01]         # straddle a boundary
        + [90000.0]                  # isolated: empty buckets between
        + [float(v) for v in range(20000, 26000, 250)]
    )
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id INT, v DOUBLE"
    )
    naive = df.withColumn(
        "n",
        F.count(F.lit(1)).over(Window.orderBy("v").rangeBetween(-5000, 0)),
    )
    fast = global_range_count(df, "v", 5000.0, ("id",), out_col="n")
    expected = {r["id"]: r["n"] for r in naive.collect()}
    got = {r["id"]: r["n"] for r in fast.collect()}
    assert got == expected


def test_asof_join_carries_nearest_prior(spark):
    """E6: every matched signup_ts is <= purchase_ts (closed bound)."""
    rows = get_query("asof_join_signup").fn(spark, SF_DIR).collect()
    assert rows
    matched = [r for r in rows if r["signup_ts"] is not None]
    assert matched, "expected at least one purchase with a prior signup"
    for r in matched:
        assert r["signup_ts"] <= r["purchase_ts"]
        assert r["secs_since_signup"] >= 0
