"""Streaming per-key heavy hitters via the Space-Saving sketch
(S4/E22): bounded state for an UNBOUNDED value domain.

The reference's keyed tables grow with the number of distinct values a
key ever sees (`faust_app/ma_agg.py:23-27` holds per-symbol dicts); a
100 TB stream with an open-ended value domain (URLs, user agents,
error strings) cannot afford that. Space-Saving (Metwally et al.,
"Efficient computation of frequent and top-k elements in data
streams", ICDT 2005) keeps exactly ``capacity`` counters per key and
guarantees, for every emitted (value, est, err):

* ``est >= true_count``            (never undercounts),
* ``est - err <= true_count``      (err bounds the overcount),
* any value with ``true_count > n / capacity`` is IN the sketch
  (the classic frequent-elements guarantee).

Summaries are emitted per (user, EPISODE): an episode closes — and the
next one opens at ``episode + 1`` — whenever the user goes idle for
more than ``horizon`` seconds of event time, detected in-loop on the
sorted events (an intra- or cross-batch gap) or by the event-time
timeout once the watermark proves no in-order event can extend it.
Episode numbering therefore keys the output rows the same way
``sessions.py`` keys sub-sessions: a user active in two separated
bursts produces two well-defined summaries, not a silent duplicate of
one contract (the per-user episode counter survives timeouts exactly
like the sessions module's gap_session counter — cleared sketch, no
re-armed timeout).

When a key's distinct-value count within an episode never exceeds
``capacity`` the sketch degenerates to exact counting (err = 0
everywhere) and the emitted top-k is ROW-IDENTICAL to the batch twin
``heavy_hitters_exact_df`` (which derives the same episodes from the
same >horizon gap rule) — pinned by
tests/test_streaming_heavy_hitters.py, which also pins the three
guarantees above in a constructed overflow regime and the two-burst
episode split.

Determinism: events are sorted by (ts, event_id) inside each
micro-batch (no Arrow-batch ordering guarantee) and every tie in the
sketch (min-counter eviction, top-k ranking) breaks on the VALUE
string, so the output is a pure function of the on-time event set.
State is one ≤capacity-entry sketch per ACTIVE user (JSON string) plus
the episode counter — bounded by active keys × capacity, independent
of stream length or value cardinality.
"""

from __future__ import annotations

import json
from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.window import Window

OUTPUT_SCHEMA = (
    "user_id LONG, episode LONG, event_type STRING, est_count LONG, "
    "max_err LONG, n_events LONG, rnk INT"
)

#: sketch = JSON {"c": {value: [count, err]}, "n": total} ('' = no open
#: episode); last = max event-time second seen (drives the timeout and
#: the in-loop gap check); episode = the OPEN episode's 1-based number
#: (or the last closed one while no episode is open).
STATE_SCHEMA = "sketch STRING, last LONG, episode LONG"


def _update(sketch: dict, value: str, capacity: int) -> None:
    c = sketch["c"]
    sketch["n"] += 1
    if value in c:
        c[value][0] += 1
        return
    if len(c) < capacity:
        c[value] = [1, 0]
        return
    # Evict the min-count counter; tie-break on the value string so
    # eviction is a pure function of the data.
    victim = min(c, key=lambda v: (c[v][0], v))
    vcount = c[victim][0]
    del c[victim]
    c[value] = [vcount + 1, vcount]


def _topk(sketch: dict, user: int, episode: int, k: int) -> list[dict]:
    n = sketch["n"]
    ranked = sorted(
        sketch["c"].items(), key=lambda kv: (-kv[1][0], kv[1][1], kv[0])
    )
    return [
        {
            "user_id": user,
            "episode": episode,
            "event_type": v,
            "est_count": cnt,
            "max_err": err,
            "n_events": n,
            "rnk": i + 1,
        }
        for i, (v, (cnt, err)) in enumerate(ranked[:k])
    ]


def _hh_fn(capacity: int, k: int, horizon: int):
    def fn(
        key: Tuple[int], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user = int(key[0])
        if state.hasTimedOut:
            sketch_json, last, episode = state.get
            # Keep the episode counter, clear the sketch, arm no new
            # timeout (nothing left to close) — the sessions pattern.
            state.update(("", 0, episode))
            if sketch_json:
                rows = _topk(json.loads(sketch_json), user, episode, k)
                if rows:
                    yield pd.DataFrame(rows)
            return

        if state.exists:
            sketch_json, last, episode = state.get
            sketch = json.loads(sketch_json) if sketch_json else None
        else:
            sketch, last, episode = None, 0, 0

        events: list[tuple[int, int, str]] = []
        for pdf in pdfs:
            for ts, eid, et in zip(
                pdf["ts"], pdf["event_id"], pdf["event_type"]
            ):
                events.append(
                    (int(pd.Timestamp(ts).timestamp()), int(eid), str(et))
                )
        events.sort()

        out: list[dict] = []
        for ep_time, _eid, et in events:
            if sketch is not None and ep_time - last > horizon:
                # >horizon idle gap inside the data: close the episode
                # now so the split is a pure function of event time,
                # not of micro-batch boundaries.
                out.extend(_topk(sketch, user, episode, k))
                sketch = None
            if sketch is None:
                episode += 1
                sketch, last = {"c": {}, "n": 0}, 0
            _update(sketch, et, capacity)
            last = max(last, ep_time)

        state.update(
            (
                json.dumps(sketch, sort_keys=True) if sketch else "",
                last,
                episode,
            )
        )
        if sketch is not None:
            state.setTimeoutTimestamp((last + horizon + 1) * 1000)
        if out:
            yield pd.DataFrame(out)

    return fn


def heavy_hitters_stateful(
    events: DataFrame,
    capacity: int = 8,
    k: int = 5,
    horizon: int = 60,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Streaming-only: per-(user, episode) top-k event types under a
    ``capacity``-counter Space-Saving budget. ``events`` must be a
    streaming DataFrame with columns (user_id, event_id, ts,
    event_type); an episode's summary emits once it closes — a
    >``horizon``-second event-time gap in the data, or the watermark
    passing ``last_event + horizon``."""
    ev = events.withColumn("ts", F.date_trunc("second", F.col("ts")))
    ev = ev.withWatermark("ts", watermark)
    return ev.groupBy("user_id").applyInPandasWithState(
        _hh_fn(capacity, k, horizon),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def heavy_hitters_exact_df(
    events: DataFrame, k: int = 5, horizon: int = 60
) -> DataFrame:
    """Batch twin: EXACT per-(user, episode) top-k event types with the
    sketch's tie-break (count desc, value asc) and err = 0 — equals
    the streaming output whenever no episode exceeds the counter
    budget. Episodes derive from the same rule the stream applies:
    a new one starts after a >``horizon``-second idle gap (cumulative
    gap-break count per user, 1-based — the sessionization idiom).

    ``events`` needs columns (user_id, event_id, ts, event_type); the
    only exchange is the user-keyed sort the episode window needs,
    which the count aggregates and rank window then reuse."""
    sec = F.unix_timestamp(F.date_trunc("second", F.col("ts")))
    w_ord = Window.partitionBy("user_id").orderBy("sec_ep", "event_id")
    ep = (
        events.withColumn("sec_ep", sec)
        .withColumn("prev", F.lag("sec_ep").over(w_ord))
        .withColumn(
            "brk",
            F.when(
                F.col("prev").isNull()
                | (F.col("sec_ep") - F.col("prev") > horizon),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "episode",
            F.sum("brk")
            .over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        )
    )
    cnt = ep.groupBy("user_id", "episode", "event_type").agg(
        F.count(F.lit(1)).alias("est_count")
    )
    tot = ep.groupBy("user_id", "episode").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    w = Window.partitionBy("user_id", "episode").orderBy(
        F.col("est_count").desc(), "event_type"
    )
    return (
        cnt.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .join(tot, ["user_id", "episode"])
        .select(
            "user_id",
            "episode",
            "event_type",
            "est_count",
            F.lit(0).cast("long").alias("max_err"),
            "n_events",
            "rnk",
        )
    )
