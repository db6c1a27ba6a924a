"""Golden tests for the streaming PSI drift monitor (S4/E22).

Pins: (1) the final per-key PSI is IDENTICAL whether the comparison
stream arrives as one file or split across two (cumulative counts are
batch-boundary invariant); (2) that final value equals a pure-Python
replay of the batch psi_value_drift formula over the same reference
profile; (3) a comparison window drawn from the reference itself
converges to PSI ~ 0; (4) update-mode emission produces one row per
key per micro-batch that saw the key, with monotonically nondecreasing
n_cmp.
"""

from __future__ import annotations

import json
import math
import os
import time
from datetime import datetime, timedelta, timezone

import numpy as np

from kafka_stream_faust_deprecated_spark.queries.monitor import PSI_EPS
from kafka_stream_faust_deprecated_spark.streaming.drift import (
    _psi,
    _round_det,
    psi_drift_stateful,
)

T0 = datetime(2024, 3, 1, tzinfo=timezone.utc)

#: Deterministic synthetic profile: two keys with different shapes.
REF_VALUES = {
    "click": [round(1.0 + 0.37 * i % 50, 2) for i in range(200)],
    "purchase": [round(5.0 + (i * i) % 97 / 3.0, 2) for i in range(150)],
}
#: Comparison window: "click" drawn from the same recipe (no drift),
#: "purchase" shifted (drift).
CMP_VALUES = {
    "click": [round(1.0 + 0.37 * (i + 7) % 50, 2) for i in range(160)],
    "purchase": [round(25.0 + (i * 3) % 40 / 2.0, 2) for i in range(120)],
}


def _profile(values):
    """Reference profile exactly as the batch query derives it:
    4-dp-rounded decile cuts + 6-dp-rounded bucket shares."""
    cuts = [
        _round_det(float(np.percentile(values, q * 10, method="linear")), 4)
        for q in range(1, 10)
    ]

    def bucket(v):
        return sum(1 for c in cuts if v > c)

    counts = [0] * 10
    for v in values:
        counts[bucket(v)] += 1
    shares = [_round_det(c / len(values), 6) for c in counts]
    return cuts, shares


def _write(rows, path):
    with open(path, "w") as fh:
        for i, (et, v) in enumerate(rows):
            ts = (T0 + timedelta(seconds=i)).strftime("%Y-%m-%d %H:%M:%S")
            fh.write(json.dumps({"event_type": et, "value": v, "ts": ts}) + "\n")


def _stream_df(spark, src):
    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", "1")
        .load(str(src))
        .selectExpr("value AS json")
    )
    return raw.selectExpr(
        "get_json_object(json, '$.event_type') AS event_type",
        "CAST(get_json_object(json, '$.value') AS DOUBLE) AS value",
    )


def _run(spark, tmp_path, name, files, cuts, shares):
    src = tmp_path / "src"
    src.mkdir(parents=True)
    for i, (fname, rows) in enumerate(files):
        p = src / fname
        _write(rows, str(p))
        t = time.time() - 100 + i * 10
        os.utime(p, (t, t))
    q = (
        psi_drift_stateful(_stream_df(spark, src), cuts, shares)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(f"SELECT * FROM {name}").collect()


def _final_per_key(rows):
    out = {}
    for r in rows:
        if r.event_type not in out or r.n_cmp >= out[r.event_type].n_cmp:
            out[r.event_type] = r
    return out


def _python_psi(values, cuts, shares):
    counts = [0] * 10
    for v in values:
        counts[sum(1 for c in cuts if v > c)] += 1
    return _psi(counts, len(values), shares)


def test_final_psi_is_split_invariant_and_matches_replay(spark, tmp_path):
    cuts, shares = {}, {}
    for et, vals in REF_VALUES.items():
        cuts[et], shares[et] = _profile(vals)

    interleaved = [
        (et, v)
        for pair in zip(CMP_VALUES["click"], CMP_VALUES["purchase"])
        for et, v in zip(("click", "purchase"), pair)
    ] + [("click", v) for v in CMP_VALUES["click"][len(CMP_VALUES["purchase"]):]]

    one = _run(
        spark, tmp_path / "one", "drift_one",
        [("all.json", interleaved)], cuts, shares,
    )
    half = len(interleaved) // 2
    two = _run(
        spark, tmp_path / "two", "drift_two",
        [("a.json", interleaved[:half]), ("b.json", interleaved[half:])],
        cuts, shares,
    )
    f1, f2 = _final_per_key(one), _final_per_key(two)
    assert set(f1) == set(f2) == {"click", "purchase"}
    for et in f1:
        assert f1[et].n_cmp == f2[et].n_cmp == len(CMP_VALUES[et])
        assert f1[et].psi == f2[et].psi
        expect = _python_psi(CMP_VALUES[et], cuts[et], shares[et])
        assert f1[et].psi == expect
    # the shifted key drifts hard, the same-recipe key barely moves
    assert f1["purchase"].psi > 1.0
    assert f1["click"].psi < 0.25
    # two-file run: n_cmp nondecreasing per key across emissions
    seen = {}
    for r in two:
        assert r.n_cmp >= seen.get(r.event_type, 0)
        seen[r.event_type] = r.n_cmp


def test_null_values_carry_no_bucket(spark, tmp_path):
    """Parity on null-bearing input (ADVICE r7): batch psi_value_drift
    drops NULL values via its grid join, so the streaming monitor must
    neither count them in n_cmp nor bucket them (pandas surfaces the
    SQL NULL as NaN, which would otherwise land in bucket 0)."""
    cuts, shares = {}, {}
    for et, vals in REF_VALUES.items():
        cuts[et], shares[et] = _profile(vals)
    vals = CMP_VALUES["click"]
    rows = []
    for i, v in enumerate(vals):
        rows.append(("click", v))
        if i % 10 == 0:
            rows.append(("click", None))
    out = _run(
        spark, tmp_path / "nulls", "drift_nulls", [("n.json", rows)], cuts, shares
    )
    fin = _final_per_key(out)
    assert fin["click"].n_cmp == len(vals)
    assert fin["click"].psi == _python_psi(vals, cuts["click"], shares["click"])


def test_reference_against_itself_is_near_zero(spark, tmp_path):
    cuts, shares = {}, {}
    for et, vals in REF_VALUES.items():
        cuts[et], shares[et] = _profile(vals)
    rows = [(et, v) for et, vals in REF_VALUES.items() for v in vals]
    out = _run(
        spark, tmp_path / "self", "drift_self", [("ref.json", rows)], cuts, shares
    )
    fin = _final_per_key(out)
    for et, vals in REF_VALUES.items():
        # same data, same buckets -> every (p - q) ln(p/q) term is 0
        assert fin[et].psi == _python_psi(vals, cuts[et], shares[et])
        assert abs(fin[et].psi) < 1e-9


def test_final_psi_matches_batch_query_output(spark, tmp_path):
    """TRUE cross-implementation parity (round 7): the streaming
    monitor, fed the real events table's comparison window and the
    profile exported by ``psi_reference_profile`` (the offline half of
    the deployment), must reproduce the batch ``psi_value_drift``
    query's published psi and n_cmp bit-for-bit. The earlier replay
    test compares the stream against a Python re-run of ``_psi``
    itself, which is circular with respect to the final-rounding
    contract — this one is not (it caught the 6-dp-vs-4-dp final
    rounding mismatch this round)."""
    from kafka_stream_faust_deprecated_spark.queries.monitor import (
        PSI_SPLIT,
        psi_reference_profile,
        psi_value_drift,
    )

    sf_dir = "/root/testdata/sf0.001"
    cuts, shares = psi_reference_profile(spark, sf_dir)
    batch = {
        r.event_type: r for r in psi_value_drift(spark, sf_dir).collect()
    }

    from kafka_stream_faust_deprecated_spark.io import load_table

    cmp_rows = (
        load_table(spark, sf_dir, "events")
        .where(f"ts >= timestamp'{PSI_SPLIT} 00:00:00'")
        .select("event_type", "value")
        .collect()
    )
    src = tmp_path / "src"
    src.mkdir(parents=True)
    with open(src / "cmp.json", "w") as fh:
        for r in cmp_rows:
            fh.write(
                json.dumps({"event_type": r.event_type, "value": r.value})
                + "\n"
            )
    q = (
        psi_drift_stateful(_stream_df(spark, src), cuts, shares)
        .writeStream.format("memory")
        .queryName("drift_vs_batch")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    fin = _final_per_key(spark.sql("SELECT * FROM drift_vs_batch").collect())
    assert set(fin) == set(batch)
    for et, b in batch.items():
        assert fin[et].n_cmp == b.n_cmp, et
        assert fin[et].psi == b.psi, (et, fin[et].psi, b.psi)


def test_drift_checkpoint_restart_resumes_counts(spark, tmp_path, state_backend):
    """Durability: stop the monitor mid-stream, start a NEW query on
    the same checkpoint, feed the rest — the cumulative bucket counts
    must come back from the state store, so the final PSI equals the
    uninterrupted single-run value (which the split-invariance test
    already ties to the batch formula)."""
    cuts, shares = {}, {}
    for et, vals in REF_VALUES.items():
        cuts[et], shares[et] = _profile(vals)
    rows = [("click", v) for v in CMP_VALUES["click"]]
    half = len(rows) // 2

    src = tmp_path / "src"
    src.mkdir(parents=True)
    _write(rows[:half], str(src / "a.json"))
    os.utime(src / "a.json", (time.time() - 100, time.time() - 100))

    collected: list = []

    def _start():
        # foreachBatch, not the memory sink — memory-sink queries
        # refuse checkpoint recovery by design.
        return (
            psi_drift_stateful(_stream_df(spark, src), cuts, shares)
            .writeStream.foreachBatch(
                lambda df, _epoch: collected.extend(df.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )

    q1 = _start()
    q1.awaitTermination(300)
    _write(rows[half:], str(src / "b.json"))
    os.utime(src / "b.json", (time.time() - 50, time.time() - 50))
    q2 = _start()
    q2.awaitTermination(300)

    fin = _final_per_key(collected)
    assert fin["click"].n_cmp == len(CMP_VALUES["click"]), (
        "state lost across restart"
    )
    assert fin["click"].psi == _python_psi(
        CMP_VALUES["click"], cuts["click"], shares["click"]
    )


def test_psi_formula_parity_with_monitor_constants():
    """The module's epsilon floor is the batch query's (one constant,
    imported not copied) and the term formula is non-negative."""
    assert PSI_EPS == 1e-06
    p, q = 0.3, 0.1
    term = (p - q) * math.log(p / q)
    assert term > 0.0
