"""Property tests for the audit/factor/mixture module
(queries/audit.py) — value equivalence is the oracle harness's job
(tests/test_oracle.py runs every registered query differentially);
these pin the operator-specific guarantees the oracle comparison
cannot see: the FK audit matches a brute-force set-membership scan,
the PK audit matches a Counter replay, the CAPM regression matches a
NumPy least-squares replay, the intraday shares sum to one, the
autocorrelation matches NumPy, and the mixture plan's shares are a
valid distribution with temperature flattening the natural one.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np

from kafka_stream_faust_deprecated_spark.io import load_table_parallel
from kafka_stream_faust_deprecated_spark.queries import audit as A
from kafka_stream_faust_deprecated_spark.queries import ticker as T
from tests.conftest import SF_DIR
from tests.test_ticker_queries import _closes, _round_det, _ticks


# --------------------------------------------------------------- FK


def test_fk_audit_matches_bruteforce(spark):
    """Per-edge orphan counts equal the brute-force set-membership
    scan, and every edge of the schema is reported exactly once."""
    out = {r.edge: r for r in A.fk_integrity_audit(spark, SF_DIR).collect()}
    assert set(out) == {e[0] for e in A.FK_EDGES}
    for edge, ct, ck, pt, pk in A.FK_EDGES:
        child = [
            r[0]
            for r in load_table_parallel(spark, SF_DIR, ct).select(ck).collect()
        ]
        parents = {
            r[0]
            for r in load_table_parallel(spark, SF_DIR, pt).select(pk).collect()
        }
        orphans = sum(1 for k in child if k not in parents)
        r = out[edge]
        assert r.child_rows == len(child)
        assert r.orphans == orphans
        assert r.orphan_share == _round_det(orphans / len(child), 6)


# --------------------------------------------------------------- PK


def test_pk_audit_matches_counter(spark):
    """Per-table row/key/dup counts equal a Counter replay (lineitem's
    composite key included)."""
    out = {r.tbl: r for r in A.pk_uniqueness_audit(spark, SF_DIR).collect()}
    assert set(out) == {t for t, _ in A.PK_KEYS}
    for tbl, keys in A.PK_KEYS:
        rows = (
            load_table_parallel(spark, SF_DIR, tbl).select(*keys).collect()
        )
        c = Counter(tuple(r) for r in rows)
        r = out[tbl]
        assert r.n_rows == len(rows)
        assert r.n_keys == len(c)
        assert r.dup_keys == sum(1 for v in c.values() if v > 1)
        assert r.max_dup == max(c.values())


# ------------------------------------------------------------- beta


def _returns_by_user(byday):
    """Rounded daily returns per user, replaying the engine contract
    (zero previous close -> no return)."""
    series = _closes(byday)
    rets: dict[int, dict[str, float]] = {}
    for uid, days in series.items():
        rets[uid] = {}
        for i in range(1, len(days)):
            prev = days[i - 1][1]
            if prev == 0:
                continue
            rets[uid][days[i][0]] = _round_det(days[i][1] / prev - 1.0, 6)
    return rets


def test_beta_matches_numpy_replay(spark):
    """Beta/alpha/R^2 match a NumPy replay of the regression against
    the equal-weight market; R^2 is in [0, 1]."""
    rets = _returns_by_user(_ticks(spark))
    mkt: dict[str, float] = {}
    for day in {d for m in rets.values() for d in m}:
        vals = [m[day] for m in rets.values() if day in m]
        mkt[day] = _round_det(sum(vals) / len(vals), 6)
    out = {r.user_id: r for r in A.beta_capm_daily(spark, SF_DIR).collect()}
    expected = {u for u, m in rets.items() if len(m) >= A.BETA_MIN_DAYS}
    assert set(out) == expected
    for uid in expected:
        days = sorted(rets[uid])
        x = np.array([mkt[d] for d in days])  # market
        y = np.array([rets[uid][d] for d in days])  # symbol
        n = len(days)
        num = n * float(np.sum(x * y)) - float(np.sum(x)) * float(np.sum(y))
        var_m = n * float(np.sum(x * x)) - float(np.sum(x)) ** 2
        var_r = n * float(np.sum(y * y)) - float(np.sum(y)) ** 2
        r = out[uid]
        assert r.n_days == n
        if var_m == 0.0:
            assert r.beta is None
            continue
        beta = num / var_m
        assert abs(r.beta - beta) < 1e-4
        assert abs(r.alpha - (float(np.sum(y)) - beta * float(np.sum(x))) / n) < 1e-4
        if var_r > 0:
            assert abs(r.r2 - num * num / (var_m * var_r)) < 1e-4
            assert -1e-9 <= r.r2 <= 1.0 + 1e-9


# --------------------------------------------------------- intraday


def test_intraday_shares_sum_to_one(spark):
    """Volume replay per (type, hour) matches, and each type's hour
    shares sum to ~1 (exactly 1 up to the per-cell rounding)."""
    byday = _ticks(spark)
    vol: dict[tuple[str, int], int] = {}
    rows = (
        load_table_parallel(spark, SF_DIR, "events")
        .select("event_type", "ts", "props")
        .collect()
    )
    import json

    for r in rows:
        k = (r.event_type, r.ts.hour)
        vol[k] = vol.get(k, 0) + int(json.loads(r.props)["k"])
    out = {
        (r.event_type, r.hod): r
        for r in A.intraday_volume_curve(spark, SF_DIR).collect()
    }
    assert set(out) == set(vol)
    by_type: dict[str, float] = {}
    for (et, hod), r in out.items():
        assert r.volume == vol[(et, hod)]
        total = sum(v for (e, _), v in vol.items() if e == et)
        assert r.vol_share == _round_det(r.volume / total, 6)
        by_type[et] = by_type.get(et, 0.0) + r.vol_share
    for et, s in by_type.items():
        assert abs(s - 1.0) < 24 * 5e-7 + 1e-9


# --------------------------------------------------------- autocorr


def test_turnover_autocorr_matches_numpy(spark):
    """Lag-1 volume autocorrelation matches NumPy over the lagged
    pairs, and is within [-1, 1]."""
    byday = _ticks(spark)
    vols: dict[int, list[tuple[str, int]]] = {}
    for (uid, day), ticks in byday.items():
        vols.setdefault(uid, []).append((day, sum(t[3] for t in ticks)))
    for v in vols.values():
        v.sort()
    out = {r.user_id: r for r in A.turnover_autocorr(spark, SF_DIR).collect()}
    expected = {u for u, v in vols.items() if len(v) - 1 >= A.AC_MIN_PAIRS}
    assert set(out) == expected
    for uid in expected:
        seq = [v for _, v in vols[uid]]
        x = np.array(seq[1:], dtype=float)
        y = np.array(seq[:-1], dtype=float)
        n = len(x)
        num = n * float(np.sum(x * y)) - float(np.sum(x)) * float(np.sum(y))
        vx = n * float(np.sum(x * x)) - float(np.sum(x)) ** 2
        vy = n * float(np.sum(y * y)) - float(np.sum(y)) ** 2
        r = out[uid]
        assert r.n_pairs == n
        if vx == 0.0 or vy == 0.0:
            assert r.autocorr is None
        else:
            assert abs(r.autocorr - num / math.sqrt(vx * vy)) < 1e-4
            assert -1.0 - 1e-9 <= r.autocorr <= 1.0 + 1e-9


# ---------------------------------------------------------- mixture


def test_mixture_plan_is_valid_distribution(spark):
    """Token counts match the normalized-whitespace replay; both share
    columns are distributions (sum ~1); temperature flattening holds:
    above-average buckets shrink, below-average grow (sqrt crossover at
    the weight-normalized pivot), i.e. epochs_at_parity > 1 exactly for
    buckets smaller than the pivot."""
    docs = load_table_parallel(spark, SF_DIR, "documents").select(
        "lang", "source", "text"
    ).collect()
    tok: dict[tuple[str, str], int] = {}
    ndoc: dict[tuple[str, str], int] = {}
    for r in docs:
        normed = re.sub(r"\s+", " ", (r.text or "").strip().lower())
        k = (r.lang, r.source)
        tok[k] = tok.get(k, 0) + len(normed.split(" "))
        ndoc[k] = ndoc.get(k, 0) + 1
    out = {
        (r.lang, r.source): r
        for r in A.mixture_temperature_plan(spark, SF_DIR).collect()
    }
    assert set(out) == set(tok)
    total_tok = sum(tok.values())
    wts = {k: _round_det(math.sqrt(v), 6) for k, v in tok.items()}
    total_wt = sum(wts.values())
    nat_sum = tgt_sum = 0.0
    for k, r in out.items():
        assert r.tokens == tok[k]
        assert r.n_docs == ndoc[k]
        assert abs(r.natural_share - tok[k] / total_tok) < 1e-5
        assert abs(r.target_share - wts[k] / total_wt) < 1e-5
        assert abs(r.epochs_at_parity - r.target_share / r.natural_share) < 1e-3
        nat_sum += r.natural_share
        tgt_sum += r.target_share
    assert abs(nat_sum - 1.0) < len(out) * 5e-7 + 1e-9
    assert abs(tgt_sum - 1.0) < len(out) * 5e-7 + 1e-9
    # temperature monotonicity: epochs decrease as bucket size grows
    order = sorted(out.values(), key=lambda r: r.tokens)
    for a, b in zip(order, order[1:]):
        assert a.epochs_at_parity >= b.epochs_at_parity - 1e-6
