"""Pin the SCALE.md claim that AQE actually splits skewed join
partitions at runtime — configured is not demonstrated.

The fixture builds a join where one key holds ~90% of the bytes (the
shape salting guards against when the dim CAN'T broadcast), lowers the
skew thresholds so the local data size triggers the optimizer, and
asserts the FINAL adaptive plan carries the ``skew=true`` marker on the
sort-merge join — i.e. the hot partition was split into multiple tasks
instead of becoming the straggler.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SKEW_CONF = {
    # force a shuffle join: the point is skew handling, not broadcast
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    # local fixture sizes: hot partition ~3 MB vs ~KB-sized medians
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256k",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
}


@pytest.fixture()
def skew_conf(spark):
    old = {k: spark.conf.get(k, None) for k in SKEW_CONF}
    for k, v in SKEW_CONF.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join(spark, skew_conf):
    """Note the boundary this test sits on deliberately: the consumer is
    a global count — no required distribution — so the default rule may
    split. A consumer that REQUIRES the join's partitioning (e.g.
    groupBy on the join key) blocks the split unless
    ``spark.sql.adaptive.forceOptimizeSkewedJoin`` trades an extra
    shuffle for it; that's the knob to flip on a real cluster when the
    downstream agg rides the join key."""
    # incompressible ~96-char payload the aggregate CONSUMES — a pruned
    # or constant column never crosses the shuffle, and shuffle skew is
    # measured in compressed bytes
    def pad():
        return F.concat(
            F.md5(F.col("id").cast("string")),
            F.md5((F.col("id") + 7).cast("string")),
            F.md5((F.col("id") * 3 + 1).cast("string")),
        )

    # 30k rows on key 0 (~3 MB) + a uniform tail over 2k other keys
    hot = spark.range(30_000).select(F.lit(0).alias("k"), pad().alias("pl"))
    tail = spark.range(20_000).select(
        (F.col("id") % 2000 + 1).alias("k"), pad().alias("pl")
    )
    left = hot.union(tail)
    right = spark.range(2_001).select(F.col("id").alias("k"))
    joined = left.join(right, "k").select(
        F.count(F.lit(1)).alias("n"), F.max("pl").alias("mx")
    )
    assert joined.collect()[0]["n"] == 50_000  # join itself is correct
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, (
        "AQE did not split the hot partition — skew-join handling is "
        f"not engaging:\n{plan[:2000]}"
    )
