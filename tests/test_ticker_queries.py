"""Property tests for the ticker-analytics module (queries/ticker.py) —
value equivalence is the oracle harness's job (tests/test_oracle.py runs
every registered query differentially); these pin the operator-specific
guarantees the oracle comparison cannot see: the OHLC candles match an
independent pandas resample, VWAP sits inside the day's range and
matches a NumPy replay, the Bollinger/RSI/drawdown outputs match NumPy
rolling-window replays of their textbook definitions, and the
correlation matrix matches a NumPy Pearson computation over the same
rounded-return contract.
"""

from __future__ import annotations

import math

import numpy as np

from kafka_stream_faust_deprecated_spark.io import load_table_parallel
from kafka_stream_faust_deprecated_spark.queries import ticker as T
from tests.conftest import SF_DIR


def _round_det(x: float, digits: int) -> float:
    """Python replica of the shared cross-engine rounding contract."""
    s = float(10**digits)
    return math.floor(x * s + 0.5) / s


def _ticks(spark):
    """(user, day, price, vol) ticks ordered by (ts, event_id), plus a
    per-(user, day) dict of the ordered tick lists."""
    import json

    rows = (
        load_table_parallel(spark, SF_DIR, "events")
        .select("user_id", "ts", "value", "props", "event_id")
        .collect()
    )
    byday: dict[tuple[int, str], list] = {}
    for r in rows:
        day = r.ts.strftime("%Y-%m-%d")
        vol = int(json.loads(r.props)["k"])
        byday.setdefault((r.user_id, day), []).append(
            (r.ts, r.event_id, round(r.value, 2), vol)
        )
    for v in byday.values():
        v.sort(key=lambda t: (t[0], t[1]))
    return byday


def _closes(byday):
    """Per-user day-ordered (day, close) series."""
    series: dict[int, list[tuple[str, float]]] = {}
    for (uid, day), ticks in byday.items():
        series.setdefault(uid, []).append((day, ticks[-1][2]))
    for v in series.values():
        v.sort()
    return series


# ------------------------------------------------------------- OHLC


def test_ohlc_matches_pandas_replay(spark):
    """Every candle's OHLCV equals the (ts, event_id)-ordered replay,
    and low <= open, close <= high holds row-wise."""
    byday = _ticks(spark)
    out = {
        (r.user_id, r.day): r
        for r in T.ohlc_bars_daily(spark, SF_DIR).collect()
    }
    assert set(out) == set(byday)
    for key, ticks in byday.items():
        r = out[key]
        px = [t[2] for t in ticks]
        assert r.open == px[0] and r.close == px[-1]
        assert r.high == max(px) and r.low == min(px)
        assert r.volume == sum(t[3] for t in ticks)
        assert r.n_ticks == len(ticks)
        assert r.low <= min(r.open, r.close) <= max(r.open, r.close) <= r.high


# ------------------------------------------------------------- VWAP


def test_vwap_matches_replay_and_brackets(spark):
    """VWAP equals the exact notional/volume replay (under the 4-dp
    contract) and sits inside [low, high] of the same day."""
    byday = _ticks(spark)
    out = {(r.user_id, r.day): r for r in T.vwap_daily(spark, SF_DIR).collect()}
    assert set(out) == set(byday)
    for key, ticks in byday.items():
        r = out[key]
        vol = sum(t[3] for t in ticks)
        # exact integer-cents notional — the DECIMAL sum replayed
        notional_cents = sum(round(t[2] * 100) * t[3] for t in ticks)
        assert r.volume == vol
        if vol == 0:
            assert r.vwap is None
            continue
        assert r.vwap == _round_det(notional_cents / 100.0 / vol, 4)
        px = [t[2] for t in ticks]
        assert min(px) - 1e-9 <= r.vwap <= max(px) + 1e-9
        cents = sum(round(p * 100) for p in px)
        assert r.mean_px == _round_det(cents / 100.0 / len(px), 4)


# -------------------------------------------------------- Bollinger


def test_bollinger_matches_numpy_rolling(spark):
    """SMA/sigma/bands equal a NumPy rolling replay over the daily
    closes; the breakout flag is consistent with the rounded bands;
    only full windows are emitted."""
    series = _closes(_ticks(spark))
    out = {
        (r.user_id, r.day): r
        for r in T.bollinger_bands(spark, SF_DIR).collect()
    }
    expected_keys = set()
    for uid, days in series.items():
        cents = [round(c * 100) for _, c in days]
        for i in range(T.BOLL_N - 1, len(days)):
            day = days[i][0]
            expected_keys.add((uid, day))
            w = cents[i - T.BOLL_N + 1 : i + 1]
            # exact integer-cents moments — the DECIMAL sums replayed
            mu = sum(w) / 100.0 / T.BOLL_N
            ssq = sum(c * c for c in w) / 10000.0 / T.BOLL_N
            sigma = math.sqrt(max(ssq - mu * mu, 0.0))
            r = out[(uid, day)]
            assert abs(r.sma - _round_det(mu, 4)) < 1e-6
            assert abs(r.sigma - _round_det(sigma, 4)) < 1e-6
            upper = _round_det(mu + T.BOLL_K * sigma, 4)
            lower = _round_det(mu - T.BOLL_K * sigma, 4)
            assert abs(r.upper_band - upper) < 1e-6
            assert abs(r.lower_band - lower) < 1e-6
            want = 1 if r.close > r.upper_band else (-1 if r.close < r.lower_band else 0)
            assert r.breakout == want
    assert set(out) == expected_keys


# -------------------------------------------------------------- RSI


def test_rsi_matches_numpy_replay(spark):
    """RSI equals the Cutler replay (full 14-delta windows only) and
    is bounded in [0, 100]."""
    series = _closes(_ticks(spark))
    out = {(r.user_id, r.day): r for r in T.rsi_cutler(spark, SF_DIR).collect()}
    expected_keys = set()
    for uid, days in series.items():
        cents = [round(c * 100) for _, c in days]
        deltas = [cents[i] - cents[i - 1] for i in range(1, len(cents))]
        for i in range(T.RSI_N - 1, len(deltas)):
            day = days[i + 1][0]
            expected_keys.add((uid, day))
            w = deltas[i - T.RSI_N + 1 : i + 1]
            # exact integer-cents gain/loss sums — the DECIMAL replayed
            sg = sum(d for d in w if d > 0) / 100.0
            sl = sum(-d for d in w if d < 0) / 100.0
            r = out[(uid, day)]
            assert 0.0 <= r.rsi <= 100.0
            if sl == 0:
                assert r.rsi == 100.0
            else:
                assert (
                    abs(r.rsi - _round_det(100.0 - 100.0 / (1.0 + sg / sl), 4))
                    < 1e-6
                )
            assert abs(r.avg_gain - _round_det(sg / T.RSI_N, 4)) < 1e-6
            assert abs(r.avg_loss - _round_det(sl / T.RSI_N, 4)) < 1e-6
    assert set(out) == expected_keys


# --------------------------------------------------------- drawdown


def test_max_drawdown_matches_numpy_replay(spark):
    """The per-symbol max drawdown equals the running-peak replay, the
    trough day is the FIRST argmax under the rounded contract, and the
    value is in [0, 1)."""
    series = _closes(_ticks(spark))
    out = {r.user_id: r for r in T.max_drawdown_daily(spark, SF_DIR).collect()}
    assert set(out) == set(series)
    for uid, days in series.items():
        peak, best, best_day, best_peak, best_close = 0.0, -1.0, None, None, None
        for day, close in days:
            peak = max(peak, close)
            dd = _round_det((peak - close) / peak, 6)
            if dd > best:
                best, best_day, best_peak, best_close = dd, day, peak, close
        r = out[uid]
        assert 0.0 <= r.max_drawdown < 1.0
        assert r.max_drawdown == best
        assert r.trough_day == best_day
        assert r.peak == best_peak and r.trough_close == best_close
        assert r.n_days == len(days)


# ------------------------------------------------------ correlation


def test_correlation_matches_numpy(spark):
    """Pairwise correlations equal a NumPy Pearson computation over
    the same rounded-return contract; |corr| <= 1; pairs are unique
    with user_a < user_b and n_days >= the floor."""
    import json

    byday = _ticks(spark)
    vol_by_user: dict[int, int] = {}
    for (uid, _), ticks in byday.items():
        vol_by_user[uid] = vol_by_user.get(uid, 0) + sum(t[3] for t in ticks)
    topk = sorted(vol_by_user, key=lambda u: (-vol_by_user[u], u))[: T.CORR_TOP_K]
    series = _closes(byday)
    rets: dict[int, dict[str, float]] = {}
    for uid in topk:
        days = series[uid]
        rets[uid] = {
            days[i][0]: _round_det(days[i][1] / days[i - 1][1] - 1.0, 6)
            for i in range(1, len(days))
        }
    out = {(r.user_a, r.user_b): r for r in T.symbol_return_correlation(spark, SF_DIR).collect()}
    expected = set()
    for a in topk:
        for b in topk:
            if a >= b:
                continue
            common = sorted(set(rets[a]) & set(rets[b]))
            if len(common) < T.CORR_MIN_DAYS:
                continue
            expected.add((a, b))
            x = np.array([rets[a][d] for d in common])
            y = np.array([rets[b][d] for d in common])
            n = len(common)
            num = n * float(np.sum(x * y)) - float(np.sum(x)) * float(np.sum(y))
            vx = max(n * float(np.sum(x * x)) - float(np.sum(x)) ** 2, 0.0)
            vy = max(n * float(np.sum(y * y)) - float(np.sum(y)) ** 2, 0.0)
            r = out[(a, b)]
            assert r.n_days == n
            if vx == 0.0 or vy == 0.0:
                assert r.corr is None
            else:
                assert abs(r.corr - num / math.sqrt(vx * vy)) < 1e-4
                assert -1.0 - 1e-9 <= r.corr <= 1.0 + 1e-9
    assert set(out) == expected
