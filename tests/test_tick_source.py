"""Custom Python DataSource golden tests (S1 architecture parity).

The stock_ticks source must behave like the Kafka connector it stands
in for: planned parallel partitions keyed by symbol, offset-tracked
streaming with pure-replay reads, and byte-identical payloads between
the batch and streaming paths — proven by piping BOTH through the
unchanged decode_ticks -> sma_aggregate pipeline and comparing rows.
"""

from __future__ import annotations

from datetime import timedelta

from pyspark.sql import functions as F

from kafka_stream_faust_deprecated_spark.io import decode_ticks
from kafka_stream_faust_deprecated_spark.sources import (
    register_tick_source,
    tick_payload,
)
from kafka_stream_faust_deprecated_spark.sources.tick_source import T0
from kafka_stream_faust_deprecated_spark.streaming.sma import sma_aggregate

SYMBOLS, SECONDS, PARTS, RATE = 3, 40, 4, 9


def _batch(spark):
    register_tick_source(spark)
    return (
        spark.read.format("stock_ticks")
        .option("symbols", str(SYMBOLS))
        .option("seconds", str(SECONDS))
        .option("partitions", str(PARTS))
        .load()
    )


def _stream(spark):
    register_tick_source(spark)
    return (
        spark.readStream.format("stock_ticks")
        .option("symbols", str(SYMBOLS))
        .option("seconds", str(SECONDS))
        .option("partitions", str(PARTS))
        .option("rate", str(RATE))
        .load()
    )


def _drain(spark, df, name, tmp_path):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        # latestOffset plateaus at `seconds`; processAllAvailable returns
        # once the cursor catches up.
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_batch_read_deterministic_and_partition_planned(spark):
    df = _batch(spark)
    rows = sorted(r.json for r in df.collect())
    assert len(rows) == SYMBOLS * SECONDS
    assert rows == sorted(r.json for r in _batch(spark).collect())
    # expected payloads, byte for byte
    want = sorted(
        tick_payload(k, i) for k in range(SYMBOLS) for i in range(SECONDS)
    )
    assert rows == want
    # the source PLANS the parallelism: one task per requested partition,
    # symbol k served by partition k mod P
    assert df.rdd.getNumPartitions() == PARTS
    used = df.select(F.spark_partition_id().alias("p")).distinct().count()
    assert used == min(SYMBOLS, PARTS)


def test_stream_equals_batch_payloads(spark, tmp_path):
    got = sorted(r.json for r in _drain(spark, _stream(spark), "ticks_raw", tmp_path))
    want = sorted(r.json for r in _batch(spark).collect())
    assert got == want, "offset-ranged replay must regenerate the batch set"


def test_stream_sma_pipeline_matches_batch_twin(spark, tmp_path):
    """End to end: custom source -> JVM JSON decode -> watermarked
    sliding window -> exactly-5 gate, streaming vs batch twin. Append
    mode can only emit windows the final watermark passed, so the
    expectation is the batch rows whose window closed by then."""
    streamed = _drain(
        spark,
        sma_aggregate(decode_ticks(_stream(spark))),
        "ticks_sma",
        tmp_path,
    )
    batch_rows = sma_aggregate(decode_ticks(_batch(spark))).collect()

    # final watermark = max event time - 5 s watermark delay
    wm = T0.replace(tzinfo=None) + timedelta(seconds=SECONDS - 1 - 5)
    closed = [
        r
        for r in batch_rows
        if wm >= T0.replace(tzinfo=None) + timedelta(
            seconds=int(r["window_end"][11:13]) * 3600
            + int(r["window_end"][14:16]) * 60
            + int(r["window_end"][17:19])
        )
    ]
    got = sorted(tuple(r) for r in streamed)
    want = sorted(tuple(r) for r in closed)
    assert want, "fixture must close at least one full window"
    assert got == want
