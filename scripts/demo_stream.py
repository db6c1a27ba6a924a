"""End-to-end streaming demo: the reference pipeline, Kafka-less.

Reproduces the full shape of the reference app (faust_app/ma_agg.py)
with the deterministic file edges — the exact transformations the Kafka
path uses (io.kafka_tick_source / streaming.build_kafka_sma_job differ
only in source/sink format):

    tick NDJSON files           (stands in for topic kafka_per_sec_data)
      -> sma_aggregate          (S3-S21: watermark, sliding 5s/1s window,
                                 dedup, exactly-5 gate, conditional aggs)
      -> idempotent_parquet_sink(stands in for topic kafka_MA_data_aggregated;
                                 survives micro-batch replay)

Run:  python scripts/demo_stream.py [workdir]

Prints per-micro-batch progress and the first aggregated rows, then
shows that re-running with the same checkpoint processes nothing new
(exactly-once restart semantics).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_stream_faust_deprecated_spark import get_spark
from kafka_stream_faust_deprecated_spark.io import file_tick_source
from kafka_stream_faust_deprecated_spark.streaming.sma import sma_aggregate
from kafka_stream_faust_deprecated_spark.streaming.sinks import (
    idempotent_parquet_sink,
    read_sink,
)
from tests.tick_fixture import build_fixture


def run_stream(spark, src_dir: str, out_dir: str, ckpt: str) -> None:
    ticks = file_tick_source(spark, src_dir, max_files_per_trigger=1)
    out = sma_aggregate(ticks)
    q = (
        out.writeStream.foreachBatch(idempotent_parquet_sink(out_dir))
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="sma_demo_")
    src_dir = os.path.join(work, "ticks")
    out_dir = os.path.join(work, "aggregated")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(src_dir, exist_ok=True)

    # Two NDJSON files = two micro-batches (maxFilesPerTrigger=1), split
    # mid-stream so windows span the file boundary.
    ticks = build_fixture()
    half = len(ticks) // 2
    for name, chunk in (("batch1.json", ticks[:half]), ("batch2.json", ticks[half:])):
        with open(os.path.join(src_dir, name), "w") as f:
            for t in chunk:
                f.write(json.dumps(t) + "\n")

    spark = get_spark(app_name="sma-demo")
    print(f"workdir: {work}")
    run_stream(spark, src_dir, out_dir, ckpt)

    result = read_sink(spark, out_dir)
    n = result.count()
    print(f"\naggregated rows: {n}")
    result.orderBy("symbol", "start").show(10, truncate=False)

    # Restart with the same checkpoint: no new files -> no new rows.
    run_stream(spark, src_dir, out_dir, ckpt)
    n2 = read_sink(spark, out_dir).count()
    print(f"rows after checkpoint restart with no new data: {n2} (unchanged: {n == n2})")
    assert n == n2


if __name__ == "__main__":
    main()
