"""Custom Python DataSource golden tests (S1 architecture parity).

The stock_ticks source must behave like the Kafka connector it stands
in for: planned parallel partitions keyed by symbol, offset-tracked
streaming with pure-replay reads, and byte-identical payloads between
the batch and streaming paths — proven by piping BOTH through the
unchanged decode_ticks -> sma_aggregate pipeline and comparing rows.
"""

from __future__ import annotations

from datetime import timedelta

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafka_stream_faust_deprecated_spark.io import decode_ticks
from kafka_stream_faust_deprecated_spark.sources import (
    register_tick_source,
    tick_payload,
)
from kafka_stream_faust_deprecated_spark.sources.tick_source import (
    T0,
    _RangePartition,
)
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


@settings(max_examples=50, deadline=None)
@given(
    rates=st.lists(st.integers(1, 9), min_size=1, max_size=12),
    n_parts=st.integers(1, 6),
    n_syms=st.integers(1, 5),
)
def test_offset_split_replay_invariance(rates, n_parts, n_syms):
    """Kafka-offset property, fuzzed (pure Python, no session): however
    the micro-batch planner splits [0, cap) into offset ranges, the
    union of every partition's pure-replay reads equals the one-shot
    batch read — byte-identical, no gaps, no duplicates."""
    cap = 15
    cuts, cursor = [0], 0
    for r in rates:
        cursor = min(cursor + r, cap)
        cuts.append(cursor)
    got: list[str] = []
    for s, e in zip(cuts, cuts[1:]):
        for p in range(n_parts):
            got.extend(
                j for (j,) in _RangePartition(p, n_parts, n_syms, s, e).rows()
            )
    want = [
        j
        for p in range(n_parts)
        for (j,) in _RangePartition(p, n_parts, n_syms, 0, cuts[-1]).rows()
    ]
    assert sorted(got) == sorted(want)


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


def test_checkpoint_restart_continues_from_committed_offset(spark, tmp_path):
    """The Kafka-restart property: a second query on the SAME checkpoint
    (fresh reader instance, raised cap) must resume from the committed
    cursor — no re-emission of phase-1 ranges, no gaps."""
    register_tick_source(spark)
    ckpt = str(tmp_path / "ckpt_shared")
    out = str(tmp_path / "out")

    def _phase(seconds):
        df = (
            spark.readStream.format("stock_ticks")
            .option("symbols", str(SYMBOLS))
            .option("seconds", str(seconds))
            .option("partitions", str(PARTS))
            .option("rate", "7")
            .load()
        )
        q = (
            df.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return [r.json for r in spark.read.parquet(out).collect()]

    first = _phase(20)
    total = _phase(45)  # same checkpoint, fresh reader, raised cap
    assert sorted(first) == sorted(
        tick_payload(k, i) for k in range(SYMBOLS) for i in range(20)
    )
    assert sorted(total) == sorted(
        tick_payload(k, i) for k in range(SYMBOLS) for i in range(45)
    ), "restart must append exactly the post-checkpoint range: no dups, no gaps"


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
