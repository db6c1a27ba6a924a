"""Pin the bench wire line under the driver's stdout capture.

The driver records only the LAST 2000 characters of bench.py's stdout;
BENCH_r05 and BENCH_r06 both came back ``parsed: null`` because the
printed per-query dict grew with the headline suite and the line's
head (the opening brace, flagship, every r5-comparable entry) fell off
the capture. The fix is structural — ``bench.WIRE`` is a FROZEN subset
that does not grow with ``bench.HEADLINE`` — and this test makes the
budget mechanical: the WORST-CASE printed line (every number at its
widest plausible rendering) must stay under 1900 bytes. Adding a wire
entry without shrinking another fails here, not in the next driver
round.
"""

import json

import bench


def _worst_case_line() -> str:
    # Mirror bench.main()'s compact dict with every value at the widest
    # rendering the formatters can produce: 2-dp query seconds up to
    # 5 digits (a 99999-second query would be a different bug), the
    # tpch suite total, 3-dp calibrations, and streaming ints at the
    # fixture ceiling.
    compact = {
        "metric": "headline_queries_total",
        "value": 9999999.999,
        "unit": "sec",
        "queries": {
            **{q: 99999.99 for q in bench.WIRE},
            "tpch_suite_21q": 99999.99,
        },
        "sf": 0.1,
        "calibration_sec": 99999.999,
        "calibration_stages_sec": 99999.999,
        "streaming": {
            b: {
                "ticks_in": 99999999,
                "rows_out": 99999999,
                "sec": 99999.999,
                "ticks_per_sec": 99999999,
                "sec_spread": 99999.99,
            }
            for b in ("rocksdb", "hdfs")
        },
    }
    return json.dumps(compact, separators=(",", ":"))


def test_wire_line_fits_driver_capture():
    line = _worst_case_line()
    assert len(line) < 1900, (
        f"worst-case wire line is {len(line)} bytes; the driver captures "
        "2000 — shrink bench.WIRE (it is a frozen subset, not a mirror "
        "of HEADLINE)"
    )


def test_wire_is_subset_of_headline():
    missing = [q for q in bench.WIRE if q not in bench.HEADLINE]
    assert not missing, f"WIRE entries not in HEADLINE: {missing}"
    # Frozen size: growing WIRE requires consciously re-checking the
    # byte budget above (the two tests move together).
    assert len(bench.WIRE) <= 40


def test_isolated_time_records_explicit_error(monkeypatch):
    """A failed --isolate child must surface as an explicit
    'error: ...' marker in the returned value (r9 advice: a silently
    missing 'isolated' entry is indistinguishable from a run that
    never happened, defeating the artifact's purpose)."""
    import subprocess

    class _NoJson:
        returncode = 1
        stdout = "no json here\n"
        stderr = "Traceback ...\nboom: root cause tail"

    monkeypatch.setattr(subprocess, "run", lambda *a, **k: _NoJson())
    out = bench._isolated_time("ann_cosine_lsh", "/tmp")
    assert isinstance(out, str) and out.startswith("error:")
    assert "exit 1" in out and "root cause tail" in out

    def _raise_timeout(*a, **k):
        raise subprocess.TimeoutExpired(cmd="x", timeout=900)

    monkeypatch.setattr(subprocess, "run", _raise_timeout)
    out = bench._isolated_time("ann_cosine_lsh", "/tmp")
    assert isinstance(out, str) and out.startswith("error: timeout")

    # A JSON line naming the query but MISSING isolated_sec (partial
    # write, structured log echo) must fall through to the marker,
    # never KeyError out of main() before BENCH_SELF is written.
    class _Partial:
        returncode = 0
        stdout = '{"query": "q"}\n'
        stderr = ""

    monkeypatch.setattr(subprocess, "run", lambda *a, **k: _Partial())
    out = bench._isolated_time("q", "/tmp")
    assert isinstance(out, str) and out.startswith("error:")

    class _Ok:
        returncode = 0
        stdout = 'warmup junk\n{"query": "q", "isolated_sec": 1.23}\n'
        stderr = ""

    monkeypatch.setattr(subprocess, "run", lambda *a, **k: _Ok())
    assert bench._isolated_time("q", "/tmp") == 1.23


def test_wire_keeps_cross_round_anchors():
    # The entries every round-over-round perf comparison reads; losing
    # any of these silently would orphan the historical record.
    for anchor in (
        "flagship_sma_5row",
        "agg_pricing_summary",  # the calibration query itself
        "tpch_q5_local_supplier_volume",
        "ann_cosine_ivf",
        "pipeline_curate",
        "kmeans_train_3iter",
    ):
        assert anchor in bench.WIRE


def test_streaming_noise_treatment_pins():
    """r10 verdict #2: the streaming ticks/s measurement gets the same
    min-of-N + spread treatment as every headline entry, and r10
    verdict #3 adds join_salted_skew to the isolate ledger. Pin the
    knobs so a refactor can't silently drop back to a single warm
    drain or shrink the isolate set."""
    assert bench.STREAM_REPS >= 3
    # The wire worst-case above must mirror what main() emits per
    # provider — sec_spread is part of the frozen streaming shape now.
    assert '"sec_spread"' in _worst_case_line()
    assert set(bench.ISOLATE) >= {"ann_cosine_lsh", "join_salted_skew"}


def test_stream_fixture_is_cached_and_sized():
    """The tick fixture is a pure function of (symbols, seconds); the
    min-of-N treatment drains it 8 times per bench run, so it must be
    built once and reused, not re-serialized per drain."""
    a_dir, a_n = bench._stream_fixture(3, 4)
    b_dir, b_n = bench._stream_fixture(3, 4)
    assert a_dir == b_dir and a_n == b_n == 12
    import os

    path = os.path.join(a_dir, "ticks.ndjson")
    with open(path) as fh:
        assert sum(1 for _ in fh) == 12
    # A different size gets its own fixture.
    c_dir, c_n = bench._stream_fixture(2, 2)
    assert c_dir != a_dir and c_n == 4


def test_stream_band_breach_detector():
    """r13 verdict #4: bench.py auto-triggers the fresh-process
    streaming record when a provider's reported min-drain throughput
    leaves the healthy 15k-25k ticks/s band (r15 runB precedent: all
    drains uniformly 4x slow, batch unaffected, hand-run isolated
    record read 18.1k/18.1k). Pin the band and the detector."""
    assert bench.STREAM_BAND_TICKS == (15_000, 25_000)
    inband = {
        "rocksdb": {"ticks_per_sec": 20_606},
        "hdfs": {"ticks_per_sec": 21_279},
    }
    assert bench._stream_band_breached(inband) == []
    low = {
        "rocksdb": {"ticks_per_sec": 5_200},  # the r15 runB shape
        "hdfs": {"ticks_per_sec": 18_000},
    }
    assert bench._stream_band_breached(low) == ["rocksdb"]
    # Suspiciously fast is ALSO out-of-band (a short-circuited drain
    # would otherwise sail through as a great number).
    high = {"rocksdb": {"ticks_per_sec": 80_000}}
    assert bench._stream_band_breached(high) == ["rocksdb"]


def test_isolated_streaming_records_explicit_error(monkeypatch):
    """Same contract as --isolate: a failed fresh-process streaming run
    must surface an explicit error marker, never a silently absent
    record."""
    import subprocess

    class Boom:
        returncode = 1
        stdout = "not json\n"
        stderr = "java.lang.OutOfMemoryError: boom\n"

    monkeypatch.setattr(subprocess, "run", lambda *a, **k: Boom())
    rec = bench._isolated_streaming_record()
    assert isinstance(rec, str) and rec.startswith("error: exit 1")
    assert "OutOfMemoryError" in rec

    good = {"streaming_isolated": {"rocksdb": {"ticks_per_sec": 18100}},
            "drains": {"rocksdb": [3.3, 3.4, 3.5]}}

    class Ok:
        returncode = 0
        stdout = "noise\n" + json.dumps(good) + "\n"
        stderr = ""

    monkeypatch.setattr(subprocess, "run", lambda *a, **k: Ok())
    assert bench._isolated_streaming_record() == good
