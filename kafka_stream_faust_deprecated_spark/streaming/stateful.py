"""Explicit keyed Python state (E22/S4): the reference agent loop as
``applyInPandasWithState``.

The reference's core is arbitrary per-key Python over a mutable dict —
``faust_app/ma_agg.py:49-91``: one ``defaultdict`` entry per symbol,
mutated per tick, pruned per tick, emitting when 5 consecutive seconds
are buffered. The declarative pipeline (streaming/sma.py) is the
idiomatic-Spark answer; THIS module is the escape hatch for logic that
genuinely cannot be expressed as windowed aggregation: the exact same
dict-state loop, run distributed — Spark groups rows by symbol, ships
each group's Arrow batches to Python, and checkpoints the state tuple
in the state store between micro-batches.

Semantics (matches the declarative pipeline, pinned by the same golden):

* keep-first per (symbol, second) dedup (S5) — first arrival wins;
* a window [b, b+4] emits ONCE, as soon as all 5 seconds are present
  (per-batch, update-style — the reference emits per tick while full);
* state prune (S21): buffered seconds older than
  ``watermark - window_size`` can no longer complete an unemitted
  window, so they are dropped, bounding state per key;
* a straggler behind the watermark can only re-create partial state the
  exactly-5 gate suppresses — finalized output never changes.

Scale: state per key is <= window_size + watermark-delay seconds of
ticks; keys shard across executors by the groupBy hash. The Python hop
costs one Arrow round-trip per key-batch — use the declarative pipeline
when the logic fits it.

Why ``applyInPandasWithState`` and not ``transformWithStateInPandas``:
Spark 4's StatefulProcessor API exists in this build, but its streaming
Python driver worker imports ``google.protobuf``, which is not
installed in this environment (probed: the worker crashes with
``ImportError: cannot import name 'descriptor' from 'google.protobuf'``
during runner initialization; re-probed 2026-08-15, twice — ``import
google.protobuf`` still raises ModuleNotFoundError in both the r9 and
r10 builder sessions, gate stands). The GroupState API below has no such
dependency; porting this function to a StatefulProcessor is mechanical
(the state tuple becomes a ValueState, the loop body is unchanged).

Re-probed 2026-08-13: ``importlib.util.find_spec('google.protobuf')``
still raises ``ModuleNotFoundError: No module named 'google'``, and
``pip install --dry-run protobuf`` fails with no route to any package
index (``Name or service not known`` — the sandbox has no network), so
the dependency cannot be installed in-round. The GroupState path
remains the supported implementation here.
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

MA_TYPE_TAG = "5_MA_data"

OUTPUT_SCHEMA = (
    "symbol STRING, type STRING, MA_type STRING, start STRING, end STRING, "
    "sma_value DOUBLE, sum_of_vwap DOUBLE, count_of_vwap LONG, "
    "window_data_count LONG, real_data_count LONG, filled_data_count LONG, "
    "window_start STRING, window_end STRING"
)

#: per-symbol buffered seconds (parallel arrays) + emitted window starts
STATE_SCHEMA = (
    "secs ARRAY<LONG>, vwaps ARRAY<DOUBLE>, sizes ARRAY<LONG>, "
    "reals ARRAY<BOOLEAN>, typ STRING, emitted ARRAY<LONG>"
)

WINDOW_SIZE = 5


def _iso(sec: int) -> str:
    return datetime.fromtimestamp(sec, tz=timezone.utc).isoformat()


def _sma_state_fn(
    key: Tuple[str], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """The reference's per-symbol loop, one invocation per (symbol,
    micro-batch). ``state`` survives between batches via the state store.

    Idle-key TTL (the state-hygiene fix the reference lacks — its
    defaultdict grows with every symbol ever seen, ``ma_agg.py:42``):
    after each batch the key arms an EVENT-TIME timeout just past its
    newest buffered second + window size. If the watermark passes that
    point with no new data, no unemitted window can ever complete (the
    prune below would drop every buffered second), so the timed-out
    invocation removes the key's state entirely. A later revival simply
    rebuilds from empty — it cannot re-emit: re-completing an emitted
    window would need all five of its seconds at/above a watermark that
    has already passed beyond them. Only observable delta vs keeping
    state forever: the S14 first-value ``type`` is re-learned from the
    revival tick (constant per symbol in practice)."""
    if state.hasTimedOut:
        state.remove()
        return
    if state.exists:
        secs, vwaps, sizes, reals, typ, emitted = state.get
        buf: dict[int, tuple[float, int, bool]] = {
            s: (v, z, r) for s, v, z, r in zip(secs, vwaps, sizes, reals)
        }
        emitted_set = set(emitted)
    else:
        buf, emitted_set, typ = {}, set(), None

    # applyInPandasWithState gives NO ordering guarantee across the Arrow
    # batches of a group within a micro-batch (the reference gets its
    # arrival order from the Kafka partition log). "Keep-first" must not
    # depend on that nondeterministic order, so collect the micro-batch's
    # rows and sort them by a deterministic total order (second, then
    # value fields) before applying keep-first: which duplicate wins is
    # then a pure function of the data. Across micro-batches the earlier
    # batch still wins (it reached state first) — that order IS
    # deterministic, fixed by the checkpointed offset log.
    batch_rows: list[tuple[int, float, int, bool, str]] = []
    for pdf in pdfs:
        for ts, vwap, size, rf, tp in zip(
            pdf["ts"], pdf["vwap_price_per_sec"], pdf["size_per_sec"],
            pdf["real_or_filled"], pdf["type"],
        ):
            sec = int(pd.Timestamp(ts).timestamp())  # second-truncate (S5)
            batch_rows.append((sec, float(vwap), int(size), rf == "real", tp))
    batch_rows.sort()
    for sec, vwap, size, real, tp in batch_rows:
        if sec not in buf:  # keep-first dedup (deterministic: sorted above)
            buf[sec] = (vwap, size, real)
        if typ is None:
            typ = tp  # S14 first-value

    # S21 prune: seconds that cannot complete any unemitted window.
    wm_sec = state.getCurrentWatermarkMs() // 1000
    if wm_sec > 0:
        cutoff = wm_sec - WINDOW_SIZE
        buf = {s: v for s, v in buf.items() if s >= cutoff}
        emitted_set = {b for b in emitted_set if b >= cutoff}

    rows: list[dict[str, Any]] = []
    for b in sorted(buf):
        if b in emitted_set:
            continue
        members = [buf.get(b + k) for k in range(WINDOW_SIZE)]
        if any(m is None for m in members):
            continue  # exactly-5 gate (S8)
        nz = [m for m in members if m[1] != 0]  # S9/S10 size filter
        s_vwap = sum(m[0] for m in nz)
        c_vwap = len(nz)
        rows.append(
            {
                "symbol": key[0],
                "type": typ,
                "MA_type": MA_TYPE_TAG,
                "start": _iso(b),
                "end": _iso(b + WINDOW_SIZE - 1),
                "sma_value": round(s_vwap / c_vwap, 10) if c_vwap else 0.0,  # S12
                "sum_of_vwap": s_vwap if c_vwap else 0.0,
                "count_of_vwap": c_vwap,
                "window_data_count": WINDOW_SIZE,
                "real_data_count": sum(1 for m in members if m[2]),
                "filled_data_count": sum(1 for m in members if not m[2]),
                "window_start": _iso(b),
                "window_end": _iso(b + WINDOW_SIZE),
            }
        )
        emitted_set.add(b)

    items = sorted(buf.items())
    if not items:
        # everything this key buffered is behind the watermark prune —
        # nothing retained can complete, drop the state row now.
        if state.exists:
            state.remove()
    else:
        state.update(
            (
                [s for s, _ in items],
                [v for _, (v, _, _) in items],
                [z for _, (_, z, _) in items],
                [r for _, (_, _, r) in items],
                typ,
                sorted(emitted_set),
            )
        )
        # Arm the idle-key TTL: fires once the watermark proves no
        # unemitted window over the buffered seconds can complete.
        state.setTimeoutTimestamp((items[-1][0] + WINDOW_SIZE + 1) * 1000)
    if rows:
        yield pd.DataFrame(rows)


def sma_aggregate_stateful(ticks: DataFrame, watermark: str = "5 seconds") -> DataFrame:
    """Streaming-only: the SMA contract via explicit Python state.

    ``ticks`` must be a streaming DataFrame with columns
    (symbol, ts, vwap_price_per_sec, size_per_sec, real_or_filled, type).
    """
    ticks = ticks.withColumn("ts", F.date_trunc("second", F.col("ts")))
    ticks = ticks.withWatermark("ts", watermark)
    return (
        ticks.groupBy("symbol")
        .applyInPandasWithState(
            _sma_state_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
