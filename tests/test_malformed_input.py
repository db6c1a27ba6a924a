"""Malformed-payload contract of the JSON decode path.

The reference crashes its agent on a bad payload
(datetime.fromisoformat at faust_app/ma_agg.py:87 raises and Faust
skips/retries the event); a distributed engine must neither crash nor
silently eat data. These tests pin both decoders: the bare decoder's
PERMISSIVE null-row behavior (bad rows never reach a window), and the
audited decoder's quarantine flag + payload retention.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from kafka_stream_faust_deprecated_spark.io import decode_ticks, decode_ticks_audited
from kafka_stream_faust_deprecated_spark.streaming import sma_aggregate
from tests.tick_fixture import make_tick

GOOD = json.dumps(make_tick("AAA", 1, 100.0, 5, True))
BROKEN_SYNTAX = '{"symbol": "BBB", "current_time": '  # truncated JSON
MISSING_FIELDS = json.dumps({"type": "stock", "vwap_price_per_sec": 1.0})
BAD_TIMESTAMP = json.dumps({**make_tick("CCC", 2, 50.0, 1, True), "current_time": "not-a-time"})


def _df(spark):
    return spark.createDataFrame(
        [(GOOD,), (BROKEN_SYNTAX,), (MISSING_FIELDS,), (BAD_TIMESTAMP,)],
        "json string",
    )


def test_bare_decoder_yields_null_rows_that_never_window(spark):
    decoded = decode_ticks(_df(spark))
    assert decoded.count() == 4  # PERMISSIVE: nothing dropped at decode
    assert decoded.where(F.col("ts").isNull()).count() == 3
    # ...and null-ts rows never produce a window row downstream.
    out = sma_aggregate(decoded)
    assert all(r["symbol"] == "AAA" or r["symbol"] is None for r in out.collect())
    assert out.where(F.col("symbol").isNull()).count() == 0


def test_audited_decoder_flags_and_retains_payloads(spark):
    audited = decode_ticks_audited(_df(spark))
    bad = {r["json"]: r for r in audited.where("_malformed").collect()}
    assert set(bad) == {BROKEN_SYNTAX, MISSING_FIELDS, BAD_TIMESTAMP}
    # Dead-letter rows keep their original payload bytes verbatim.
    assert all(r["json"] is not None for r in bad.values())
    good = audited.where(~F.col("_malformed")).collect()
    assert len(good) == 1
    assert good[0]["symbol"] == "AAA" and good[0]["ts"] is not None
