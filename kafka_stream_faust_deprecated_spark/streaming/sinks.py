"""Effectively-once streaming sinks (S2 generalized).

Structured Streaming guarantees exactly-once STATE via the checkpoint
(offsets + state store versions), but the SINK side is only as good as
the writer: after a crash the last micro-batch may be replayed, so a
naive append sink duplicates it. The reference sidesteps this by
leaning on Kafka's at-least-once producer (``faust_app/ma_agg.py:78``
— ``await aggregated_topic.send``); downstream consumers see dupes on
failure/retry.

This module provides the file-sink idempotence pattern that upgrades
at-least-once replay to effectively-once OUTPUT:

* every micro-batch writes under ``_batch_id=<id>`` (a partition
  column derived from the ``foreachBatch`` batch id);
* the write uses DYNAMIC partition overwrite, so replaying batch N
  replaces partition ``_batch_id=N`` in place instead of appending a
  second copy — the write is a per-batch upsert keyed by batch id;
* readers either prune the column away or use it for incremental
  consumption (batch id is monotonically increasing).

At 100 TB this is also the right physical layout: each micro-batch is
an independent partition directory, so replay touches one directory,
concurrent readers never see partial batches (directory swap is
atomic-enough on object stores with a committer), and compaction can
rewrite old ``_batch_id`` partitions without touching the stream head.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BATCH_ID_COL = "_batch_id"


def idempotent_parquet_sink(out_dir: str) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` function that writes each micro-batch to
    ``out_dir`` partitioned by batch id with dynamic partition
    overwrite — replaying a batch (crash between sink commit and
    checkpoint commit) overwrites its own partition instead of
    duplicating rows.

    Usage::

        q = (df.writeStream
               .foreachBatch(idempotent_parquet_sink("/data/out"))
               .option("checkpointLocation", ckpt)
               .trigger(availableNow=True)
               .start())
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn(BATCH_ID_COL, F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(BATCH_ID_COL)
            .parquet(out_dir)
        )

    return write_batch


def read_sink(spark, out_dir: str) -> DataFrame:
    """Read an idempotent-sink directory back, dropping the bookkeeping
    partition column."""
    return spark.read.parquet(out_dir).drop(BATCH_ID_COL)
