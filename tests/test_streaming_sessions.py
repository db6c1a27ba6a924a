"""Golden tests for streaming capped sessionization (E19/E22).

``sessionize_capped_stateful`` must be ROW-IDENTICAL to the batch
``sessionize_capped_df`` transform over the same on-time events —
gap_session numbering, cap splits, timestamps, durations, everything.
The fixture crosses every boundary class: gap breaks, cap splits
mid-gap-session, multi-event sub-sessions, and a single-event session.
"""

from __future__ import annotations

import json
import os
import time
from datetime import datetime, timedelta, timezone

from kafka_stream_faust_deprecated_spark.queries.extras import (
    sessionize_capped_df,
)
from kafka_stream_faust_deprecated_spark.streaming.sessions import (
    sessionize_capped_stateful,
)

GAP = 60  # test-sized: new session after >60 s idle
CAP = 300  # split a gap-session every 300 s from its first event

T0 = datetime(2024, 3, 1, tzinfo=timezone.utc)


def _events():
    """(user_id, event_id, offset_sec) — deterministic fixture.

    user 1: run of events 0..120s at 30s steps (one sub-session),
            then a >GAP gap, then a long run crossing CAP -> cap split.
    user 2: single event (singleton session), then gap, then a pair.
    """
    rows = []
    eid = 0

    def add(u, off):
        nonlocal eid
        eid += 1
        rows.append((u, eid, off))

    for off in (0, 30, 60, 90, 120):          # u1 session 1.0
        add(1, off)
    # gap (>60) then run 300..660 at 30s steps: crosses CAP at 600
    for off in range(300, 661, 30):           # u1 session 2.0 / 2.1
        add(1, off)
    add(2, 10)                                # u2 session 1.0 (singleton)
    add(2, 500)                               # u2 session 2.0 (pair)
    add(2, 530)
    return rows


def _flush(off: int):
    return [(1, 9001, off), (2, 9002, off)]


def _write(rows, path):
    with open(path, "w") as fh:
        for u, eid, off in rows:
            ts = (T0 + timedelta(seconds=off)).strftime("%Y-%m-%d %H:%M:%S")
            fh.write(json.dumps({"user_id": u, "event_id": eid, "ts": ts}) + "\n")


def _stream_df(spark, src):
    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", "1")
        .load(str(src))
        .selectExpr("value AS json")
    )
    return raw.selectExpr(
        "get_json_object(json, '$.user_id') AS user_id",
        "get_json_object(json, '$.event_id') AS event_id",
        "get_json_object(json, '$.ts') AS ts",
    ).selectExpr(
        "CAST(user_id AS LONG) AS user_id",
        "CAST(event_id AS LONG) AS event_id",
        "to_timestamp(ts) AS ts",
    )


def _run(spark, tmp_path, name, files):
    src = tmp_path / "src"
    src.mkdir()
    for i, (fname, rows) in enumerate(files):
        p = src / fname
        _write(rows, str(p))
        t = time.time() - 100 + i * 10
        os.utime(p, (t, t))
    q = (
        sessionize_capped_stateful(_stream_df(spark, src), gap=GAP, cap=CAP)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(f"SELECT * FROM {name}").collect()


def _key(r):
    return (r["user_id"], r["gap_session"], r["sub_session"])


def _expected(spark, rows):
    ev = spark.createDataFrame(
        [
            (u, eid, (T0 + timedelta(seconds=off)).replace(tzinfo=None))
            for u, eid, off in rows
        ],
        "user_id long, event_id long, ts timestamp",
    )
    return {_key(r): r for r in sessionize_capped_df(ev, gap=GAP, cap=CAP).collect()}


def test_streaming_sessions_match_batch_twin(spark, tmp_path):
    """Every on-time session closed by the flush batch must equal the
    batch transform's row for the same (user, gap_session, sub)."""
    fixture = _events()
    flush_off = 100_000
    got = _run(
        spark,
        tmp_path,
        "sess_twin",
        [("f1.json", fixture), ("f2.json", _flush(flush_off))],
    )
    flush_day = (T0 + timedelta(seconds=flush_off)).strftime("%Y-%m-%d")
    closed = [r for r in got if not r["session_start"].startswith(flush_day)]
    exp = _expected(spark, fixture)
    assert {_key(r) for r in closed} == set(exp)
    for r in closed:
        e = exp[_key(r)]
        for c in (
            "n_events",
            "session_start",
            "session_end",
            "duration_sec",
        ):
            assert r[c] == e[c], (c, _key(r), r[c], e[c])


def test_streaming_sessions_cap_split_counts(spark, tmp_path):
    """The cap split happens mid-gap-session: user 1's second
    gap-session must appear as sub 0 (300..570) and sub 1 (600..660),
    both under gap_session 2."""
    got = _run(
        spark,
        tmp_path,
        "sess_split",
        [("f1.json", _events()), ("f2.json", _flush(100_000))],
    )
    u1 = {
        (r["gap_session"], r["sub_session"]): r
        for r in got
        if r["user_id"] == 1 and r["session_start"].startswith("2024-03-01")
    }
    assert set(u1) == {(1, 0), (2, 0), (2, 1)}
    assert u1[(1, 0)]["n_events"] == 5
    assert u1[(2, 0)]["n_events"] == 10   # 300..570 inclusive, 30s steps
    assert u1[(2, 1)]["n_events"] == 3    # 600, 630, 660
    assert u1[(2, 0)]["duration_sec"] == 270
    assert u1[(2, 1)]["duration_sec"] == 60


def test_streaming_sessions_checkpoint_restart(spark, tmp_path, state_backend):
    """Durability: stop the sessionizer mid-fixture — with user 1's
    second gap-session HALF-FED, the hardest state to lose — restart a
    new query on the same checkpoint, feed the rest + flush. The closed
    sessions must equal the batch twin exactly, with no session split
    at the restart boundary and no duplicates (append mode + restored
    open-session state). Uses foreachBatch: memory-sink queries refuse
    checkpoint recovery."""
    fixture = _events()
    first = [r for r in fixture if r[2] <= 400]
    rest = [r for r in fixture if r[2] > 400]
    assert first and rest  # the split lands inside u1's gap-session 2

    src = tmp_path / "src"
    src.mkdir()
    collected: list = []

    def _start():
        return (
            sessionize_capped_stateful(_stream_df(spark, src), gap=GAP, cap=CAP)
            .writeStream.foreachBatch(
                lambda df, _epoch: collected.extend(df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )

    p1 = src / "f1.json"
    _write(first, str(p1))
    os.utime(p1, (time.time() - 100, time.time() - 100))
    q1 = _start()
    q1.awaitTermination(300)

    p2 = src / "f2.json"
    _write(rest, str(p2))
    os.utime(p2, (time.time() - 50, time.time() - 50))
    p3 = src / "f3.json"
    _write(_flush(100_000), str(p3))
    os.utime(p3, (time.time() - 40, time.time() - 40))
    q2 = _start()
    q2.awaitTermination(300)

    flush_day = (T0 + timedelta(seconds=100_000)).strftime("%Y-%m-%d")
    closed = [
        r for r in collected if not r["session_start"].startswith(flush_day)
    ]
    keys = [_key(r) for r in closed]
    assert len(keys) == len(set(keys)), "restart re-emitted sessions"
    exp = _expected(spark, fixture)
    assert set(keys) == set(exp)
    for r in closed:
        e = exp[_key(r)]
        for c in ("n_events", "session_start", "session_end", "duration_sec"):
            assert r[c] == e[c], (c, _key(r), r[c], e[c])


def test_streaming_sessions_timeout_closes_idle(spark, tmp_path):
    """WITHOUT a flush event for user 2, the event-time timeout (armed
    at last+gap) must still close user 2's final session once user 1's
    flush advances the watermark past it."""
    fixture = _events()
    got = _run(
        spark,
        tmp_path,
        "sess_timeout",
        [("f1.json", fixture), ("f2.json", [(1, 9001, 100_000)])],
    )
    u2 = {
        (r["gap_session"], r["sub_session"]): r
        for r in got
        if r["user_id"] == 2
    }
    assert (2, 0) in u2, f"idle user's last session not closed: {sorted(u2)}"
    assert u2[(2, 0)]["n_events"] == 2
