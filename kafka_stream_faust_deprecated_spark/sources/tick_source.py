"""Custom Python DataSource: a deterministic stock-tick generator with
Kafka-shaped semantics (S1, faust_app/ma_agg.py:40).

The sandbox has no broker, so the Kafka path is exercised through file
twins; this source closes the remaining architectural gap — a SOURCE
with partition-planned parallel reads and offset-tracked streaming
replay, the two properties that define the Kafka connector contract:

* **Partitioning** (batch reader): symbol k is served by partition
  k mod P — exactly Kafka's key-hash partition assignment, so
  per-symbol order is preserved within a partition and the read
  parallelism is planned by the source, not inherited from a file
  layout.
* **Offsets** (stream reader): the stream offset is a single monotone
  cursor ``{"second": n}`` (= seconds [0, n) emitted for every
  symbol). The stream reader is the ``SimpleDataSourceStreamReader``
  variant DELIBERATELY: its ``read(start)`` receives the restored
  offset every batch, so a query resumed from a checkpoint continues
  from exactly where the offset log says — a cursor held only in
  reader memory (the non-simple API's shape) would reset on restart
  and re-emit committed ranges. Generation is a pure function of the
  offset range, so ``readBetweenOffsets`` replay of any planned range
  regenerates byte-identical payloads — the property that makes
  offset replay exactly-once downstream. (A production connector
  needing planned parallel reads per micro-batch implements the
  partitioned ``streamReader`` against a system that, like Kafka,
  answers "what is the latest offset" externally; this generator has
  no external clock, so the restart-safe simple variant is the
  correct one.)

Rows are emitted in the WIRE format (one ``json`` string column, the
reference's StockData record serialized exactly as its Kafka topic
carries it) so the same ``io.decode_ticks`` JVM decode path runs
unchanged: ``spark.readStream.format("stock_ticks")`` is a drop-in for
``kafka_tick_source`` in every pipeline here.

Options (all strings, per the DataSource API): ``symbols`` (default
3), ``seconds`` (ticks per symbol, batch size & stream cap, default
60), ``partitions`` (default 4), ``rate`` (seconds admitted per
micro-batch, default 10).
"""

from __future__ import annotations

import json
from datetime import datetime, timedelta, timezone
from typing import Iterator, Sequence, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

#: Fixed epoch so every read is reproducible (no wall clock anywhere).
T0 = datetime(2024, 3, 1, 0, 0, 0, tzinfo=timezone.utc)

FORMAT_NAME = "stock_ticks"


def _symbol(k: int) -> str:
    return f"S{k:03d}"


def tick_payload(k: int, i: int) -> str:
    """The deterministic StockData wire record for (symbol k, second i).

    Field recipe mirrors the test fixture's shape (FIXTURES.md §A1):
    vwap is an affine ramp per symbol, every 7th second of symbol 0 has
    size 0 (exercises the S9/S10 size filter), and real/filled
    alternates (exercises S11)."""
    ts = T0 + timedelta(seconds=i)
    real = (i + k) % 2 == 0
    return json.dumps(
        {
            "symbol": _symbol(k),
            "type": "stock",
            "start": ts.isoformat(),
            "end": (ts + timedelta(seconds=1)).isoformat(),
            "current_time": ts.isoformat(),
            "last_data_time": ts.isoformat(),
            "real_data_count": 1 if real else 0,
            "filled_data_count": 0 if real else 1,
            "real_or_filled": "real" if real else "filled",
            "vwap_price_per_sec": 100.0 + 10.0 * k + 0.5 * i,
            "size_per_sec": 0 if (k == 0 and i % 7 == 0) else (i + k) % 20 + 1,
            "volume_till_now": 1000.0 + i,
            "yesterday_price": 100.0 + 10.0 * k,
            "price_change_percentage": 0.5,
        },
        sort_keys=True,
    )


class _Opts:
    def __init__(self, options: dict):
        self.symbols = int(options.get("symbols", "3"))
        self.seconds = int(options.get("seconds", "60"))
        self.partitions = int(options.get("partitions", "4"))
        self.rate = int(options.get("rate", "10"))


class _RangePartition(InputPartition):
    """Partition p's symbols, seconds [start, end)."""

    def __init__(self, p: int, n_partitions: int, n_symbols: int, start: int, end: int):
        self.p = p
        self.n_partitions = n_partitions
        self.n_symbols = n_symbols
        self.start = start
        self.end = end

    def rows(self) -> Iterator[Tuple[str]]:
        for k in range(self.p, self.n_symbols, self.n_partitions):
            for i in range(self.start, self.end):
                yield (tick_payload(k, i),)


class StockTickBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.o = _Opts(options)

    def partitions(self) -> Sequence[InputPartition]:
        o = self.o
        return [
            _RangePartition(p, o.partitions, o.symbols, 0, o.seconds)
            for p in range(o.partitions)
        ]

    def read(self, partition: _RangePartition) -> Iterator[Tuple[str]]:
        return partition.rows()


class StockTickSimpleStreamReader(SimpleDataSourceStreamReader):
    """Restart-safe by construction: every ``read`` starts from the
    offset Spark hands it (fresh start -> ``initialOffset``; restart ->
    the checkpoint's last planned offset), never from reader memory."""

    def __init__(self, options: dict):
        self.o = _Opts(options)

    def initialOffset(self) -> dict:
        return {"second": 0}

    def _rows(self, start: int, end: int) -> Iterator[Tuple[str]]:
        # list-backed iterator: the engine's prefetch cache copy.copy()s
        # it for replay, which a generator cannot support
        return iter(
            [
                (tick_payload(k, i),)
                for k in range(self.o.symbols)
                for i in range(start, end)
            ]
        )

    def read(self, start: dict) -> Tuple[Iterator[Tuple[str]], dict]:
        s = start["second"]
        e = min(s + self.o.rate, self.o.seconds)
        return self._rows(s, e), {"second": max(s, e)}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple[str]]:
        # Replay of a planned-but-uncommitted batch after recovery:
        # pure regeneration, byte-identical to the original read.
        return self._rows(start["second"], end["second"])

    def commit(self, end: dict) -> None:
        # Nothing to clean up: regeneration is pure, like Kafka retention.
        pass


class StockTickDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return "json string"

    def reader(self, schema) -> DataSourceReader:
        return StockTickBatchReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return StockTickSimpleStreamReader(self.options)


def register_tick_source(spark) -> None:
    """Idempotent format registration; after this,
    ``spark.read.format("stock_ticks")`` / ``readStream`` work."""
    spark.dataSource.register(StockTickDataSource)
