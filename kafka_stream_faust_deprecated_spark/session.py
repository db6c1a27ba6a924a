"""SparkSession factory tuned for both local testing and cluster scale.

Local runs use ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads, one JVM).
The config choices are the ones that matter at 100 TB on a real cluster:

* AQE on (runtime re-planning, skew-join splitting, partition coalescing)
* shuffle partitions sized to the parallelism at hand, not the 200 default
* Arrow-batched Python interchange for the few Pandas-UDF paths
* UTC session timezone — the reference container ran TZ=Asia/Taipei and
  normalized to UTC by hand (``faust_app/ma_agg.py:46-47``); we make UTC
  the engine-wide invariant instead.

Local-fixture caveat: the testdata parquet files are written as a SINGLE
row group, so ``spark.sql.files.maxPartitionBytes``/``openCostInBytes``
cannot split them — a byte-range split with no row-group boundary inside
it produces an empty partition. Expression-heavy scans therefore go
through ``io.load_table_parallel``, which repartitions only when the
scan under-splits relative to cluster parallelism (a no-op at real
multi-split scale). Do not "fix" local bench numbers with file-split
configs; they cannot take effect on these fixtures.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _local_cpus() -> int:
    try:
        return max(1, int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    except ValueError:
        return 32


def get_spark(
    app_name: str = "ksfd-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    On a real cluster the ``master`` / memory settings come from
    spark-submit; everything set here is master-agnostic semantics or
    adaptive behavior that scales with the cluster.
    """
    cpus = _local_cpus()
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        # Semantics
        .config("spark.sql.session.timeZone", "UTC")
        # Adaptive execution: coalesce small shuffle partitions, split
        # skewed ones, demote/promote join strategies at runtime.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Shuffle sizing: on a 1000-executor cluster this is overridden to
        # ~2-3x total cores via spark-submit; locally match the thread pool.
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for Pandas-UDF / toPandas interchange (vectorized transfer).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Parquet: push filters + prune columns at the scan.
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # Broadcast threshold: dims like region/nation/supplier are tiny
        # even at 100 TB fact scale; 64 MB keeps them broadcast.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
    )

    if "SPARK_LOCAL_MASTER" not in os.environ and not os.environ.get("MASTER"):
        builder = builder.master(f"local[{cpus}]")
        builder = builder.config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")
        )

    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
