"""Streaming capped sessionization (E19/E22/S4): the batch
``sessionize_capped`` contract as ``applyInPandasWithState``.

Batch twin: ``queries/extras.py::sessionize_capped`` — a new session
starts after a >gap idle period, and a gap-session splits into
cap-second sub-sessions measured from ITS OWN first event. Plain
``session_window`` streaming cannot express the cap (it merges on gap
only); this operator keeps one tuple of per-user state and emits each
(gap_session, sub_session) row exactly once, when it CLOSES:

* a gap break closes the open sub-session (and starts gap_session+1);
* crossing a cap boundary closes it (and starts sub_session+1 within
  the same gap-session);
* the event-time timeout closes it once the watermark passes
  last_event + gap — no in-order event can extend it, and late events
  below the watermark are dropped before the operator runs.

gap_session numbering matches the batch twin's cumulative-break count
(1-based per user), so the streaming output is row-identical to the
batch transform over the same (on-time) events — pinned by
tests/test_streaming_sessions.py.

State hygiene: after a timeout the (cleared) tuple is retained WITHOUT
a re-armed timeout so the per-user gap_session counter survives idle
periods — one small tuple per user key, bounded by user cardinality.
A production deployment that must bound state by ACTIVE users would
TTL the tuple and re-derive the counter from the sink's max
gap_session per user on revival (the row-identity contract is
unchanged; only the counter's storage moves).
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id LONG, gap_session LONG, sub_session LONG, n_events LONG, "
    "session_start STRING, session_end STRING, duration_sec LONG"
)

#: (gap_start, gid, sub, n, mn, mx, open) — the open sub-session plus
#: the per-user gap_session counter.
STATE_SCHEMA = (
    "gap_start LONG, gid LONG, sub LONG, n LONG, mn LONG, mx LONG, open BOOLEAN"
)


def _iso(sec: int) -> str:
    return datetime.fromtimestamp(sec, tz=timezone.utc).strftime(
        "%Y-%m-%d %H:%M:%S"
    )


def _row(user: int, gid: int, sub: int, n: int, mn: int, mx: int) -> dict:
    return {
        "user_id": user,
        "gap_session": gid,
        "sub_session": sub,
        "n_events": n,
        "session_start": _iso(mn),
        "session_end": _iso(mx),
        "duration_sec": mx - mn,
    }


def _session_fn(gap: int, cap: int):
    def fn(
        key: Tuple[int], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user = int(key[0])
        if state.hasTimedOut:
            gap_start, gid, sub, n, mn, mx, open_ = state.get
            # Keep the gid counter, clear the open session, arm no new
            # timeout (nothing left to close).
            state.update((0, gid, 0, 0, 0, 0, False))
            if open_:
                yield pd.DataFrame([_row(user, gid, sub, n, mn, mx)])
            return

        if state.exists:
            gap_start, gid, sub, n, mn, mx, open_ = state.get
        else:
            gap_start, gid, sub, n, mn, mx, open_ = 0, 0, 0, 0, 0, 0, False

        # No ordering guarantee across a group's Arrow batches within a
        # micro-batch — sort by (second, event_id) so session boundaries
        # are a pure function of the data (same rationale as the SMA
        # state fn). Cross-batch order is fixed by the offset log.
        events: list[tuple[int, int]] = []
        for pdf in pdfs:
            for ts, eid in zip(pdf["ts"], pdf["event_id"]):
                events.append((int(pd.Timestamp(ts).timestamp()), int(eid)))
        events.sort()

        out: list[dict] = []
        for ep, _eid in events:
            if not open_:
                gid += 1
                gap_start, sub, n, mn, mx, open_ = ep, 0, 1, ep, ep, True
            elif ep - mx > gap:
                out.append(_row(user, gid, sub, n, mn, mx))
                gid += 1
                gap_start, sub, n, mn, mx = ep, 0, 1, ep, ep
            else:
                s2 = (ep - gap_start) // cap
                if s2 != sub:
                    out.append(_row(user, gid, sub, n, mn, mx))
                    sub, n, mn, mx = s2, 1, ep, ep
                else:
                    n += 1
                    mx = max(mx, ep)

        state.update((gap_start, gid, sub, n, mn, mx, open_))
        if open_:
            # Close once the watermark proves no in-order event can
            # extend the open sub-session.
            state.setTimeoutTimestamp((mx + gap + 1) * 1000)
        if out:
            yield pd.DataFrame(out)

    return fn


def sessionize_capped_stateful(
    events: DataFrame,
    gap: int,
    cap: int,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Streaming-only: capped sessionization via explicit keyed state.

    ``events`` must be a streaming DataFrame with columns
    (user_id, event_id, ts)."""
    ev = events.withColumn("ts", F.date_trunc("second", F.col("ts")))
    ev = ev.withWatermark("ts", watermark)
    return ev.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap, cap),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
