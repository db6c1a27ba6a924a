"""Data-layout operators: partitioned & bucketed writes and the scan
plans they unlock (SURVEY.md §2b E1 generalized to the write side).

At 100 TB the table LAYOUT is the optimization with the biggest lever:
partition directories turn predicates into directory pruning (no I/O at
all for excluded partitions), and bucketing pre-shuffles a join key at
write time so every subsequent join/agg on that key skips its exchange.
These tests pin both behaviors at the physical-plan level, so a Spark
upgrade or session-config drift that silently re-introduces the shuffle
or the full scan fails CI, not production.
"""

from __future__ import annotations

import pytest

from kafka_stream_faust_deprecated_spark.io import load_table
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def events_by_type(spark, tmp_path_factory):
    """events written partitioned by event_type (the hive-style layout a
    100 TB event table would use with a date/type key)."""
    path = str(tmp_path_factory.mktemp("layout") / "events_by_type")
    ev = load_table(spark, SF_DIR, "events")
    ev.write.partitionBy("event_type").parquet(path)
    return path


def test_partitioned_write_roundtrip(spark, events_by_type):
    """Partitioning must not change content: same rows, and the
    partition column survives as a readable column."""
    ev = load_table(spark, SF_DIR, "events")
    back = spark.read.parquet(events_by_type)
    assert back.count() == ev.count()
    want = {(r["event_type"], r["n"]) for r in
            ev.groupBy("event_type").agg({"*": "count"}).withColumnRenamed("count(1)", "n").collect()}
    got = {(r["event_type"], r["n"]) for r in
           back.groupBy("event_type").agg({"*": "count"}).withColumnRenamed("count(1)", "n").collect()}
    assert got == want


def test_static_partition_pruning(spark, events_by_type):
    """A filter on the partition column must become a PartitionFilter
    (directory pruning — zero I/O for other partitions), NOT a data
    filter evaluated after reading every file."""
    back = spark.read.parquet(events_by_type)
    q = back.where("event_type = 'purchase'").select("event_id", "value")
    plan = _plan(q)
    assert "PartitionFilters" in plan and "purchase" in plan.split("PartitionFilters", 1)[1].split("]")[0], plan
    # and the scan must actually skip files: only the one matching
    # directory's files are read
    q.collect()
    scan = [n for n in plan.split("\n") if "FileScan" in n]
    assert scan, plan


def test_dynamic_partition_pruning(spark, events_by_type):
    """Join the partitioned fact to a FILTERED tiny dim on the partition
    column: Spark must inject the dim's build-side values into the fact
    scan at runtime (DPP) instead of scanning every partition."""
    back = spark.read.parquet(events_by_type)
    dim = spark.createDataFrame(
        [("purchase", 1.0), ("signup", 0.0)], "event_type STRING, weight DOUBLE"
    ).where("weight > 0.5")
    q = back.join(dim, "event_type").groupBy("event_type").count()
    assert "dynamicpruning" in _plan(q).lower(), _plan(q)
    assert q.collect()[0]["event_type"] == "purchase"


def test_bucketed_join_skips_exchange(spark, tmp_path_factory):
    """Two tables bucketed+sorted on the join key at write time must
    sort-merge join with ZERO Exchange nodes — the write-time shuffle is
    amortized across every downstream join/agg on that key (the bucketed
    layout a 100 TB fact/fact pipeline ships to)."""
    base = tmp_path_factory.mktemp("bucketed")
    o = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
       .option("path", str(base / "b_orders")).saveAsTable("b_orders"))
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
       .option("path", str(base / "b_lineitem")).saveAsTable("b_lineitem"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table("b_orders")
            .join(spark.table("b_lineitem"),
                  spark.table("b_orders").o_orderkey == spark.table("b_lineitem").l_orderkey)
            .select("o_orderkey", "l_linenumber")
        )
        plan = _plan(j)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert j.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
