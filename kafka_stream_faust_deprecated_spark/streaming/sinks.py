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


BUCKET_COL = "_bucket"


def upsert_latest_sink(
    spark,
    out_dir: str,
    key_cols: tuple[str, ...],
    ts_col: str,
    tiebreak_col: str,
    n_buckets: int = 16,
) -> Callable[[DataFrame, int], None]:
    """Streaming materialized view: maintain a latest-row-per-key table
    (the reference's S4 keyed upsert, persisted) without a transactional
    table format.

    Each micro-batch MERGEs into the table by key-hash bucket:

    1. rows are bucketed by ``pmod(hash(key), n_buckets)``;
    2. only the buckets the batch touches are read back from the table
       (partition pruning — untouched buckets see zero I/O);
    3. touched buckets are re-deduped to latest-per-key and rewritten
       via dynamic partition overwrite.

    Per-batch work is O(batch + touched-bucket size), not O(table): at
    100 TB, size ``n_buckets`` so one bucket ~ a few GB and a batch
    touches few buckets. Honesty note: multi-bucket overwrite is not
    atomic across buckets — a crash mid-write can leave buckets at
    different batch versions until the replayed batch re-merges them
    (the merge is idempotent: re-applying a batch yields the same
    latest-per-key rows). Cross-bucket atomicity needs a transactional
    table format on top.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        key_hash = F.hash(*[F.col(c) for c in key_cols])
        b = batch_df.withColumn(BUCKET_COL, F.pmod(key_hash, F.lit(n_buckets)))
        # Probe table existence explicitly via the Hadoop FileSystem (works
        # on any FS Spark can read, incl. object stores) instead of
        # catching a broad Exception around the read: a transient read
        # failure (FS hiccup, corrupt footer, permissions) must FAIL the
        # micro-batch so the checkpoint retries it — treating it as
        # "first batch" would rewrite touched buckets without their
        # previously persisted keys (silent data loss).
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        jpath = jvm.org.apache.hadoop.fs.Path(out_dir)
        table_exists = jpath.getFileSystem(hconf).exists(jpath)
        existing = spark.read.parquet(out_dir) if table_exists else None
        if existing is not None:
            touched = [r[0] for r in b.select(BUCKET_COL).distinct().collect()]
            merged = existing.where(F.col(BUCKET_COL).isin(touched)).unionByName(b)
        else:
            merged = b
        from pyspark.sql.window import Window

        w = Window.partitionBy(*key_cols).orderBy(
            F.col(ts_col).desc(), F.col(tiebreak_col).desc()
        )
        latest = (
            merged.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        if existing is not None:
            # The merge reads the same path it overwrites, so the merged
            # rows must be durably materialized BEFORE the overwrite.
            # localCheckpoint would pin blocks on executors only — an
            # executor loss mid-overwrite would force recompute from a
            # partially-truncated target. Stage to a sibling directory
            # instead: the final overwrite scans the staged files, so any
            # task retry re-reads durable staging, never the target.
            staging = f"{out_dir}__staging_b{batch_id}"
            latest.write.mode("overwrite").parquet(staging)
            latest = spark.read.parquet(staging)
        else:
            staging = None
        (
            latest.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(BUCKET_COL)
            .parquet(out_dir)
        )
        if staging is not None:  # best-effort cleanup; replay overwrites it
            spath = jvm.org.apache.hadoop.fs.Path(staging)
            spath.getFileSystem(hconf).delete(spath, True)

    return write_batch


def read_upsert_table(spark, out_dir: str) -> DataFrame:
    """Read the materialized latest-per-key table, dropping bookkeeping."""
    return spark.read.parquet(out_dir).drop(BUCKET_COL)
