"""Property tests for the stats/mining module (queries/mining.py) —
value equivalence is the oracle harness's job (tests/test_oracle.py
runs every registered query differentially); these pin the
operator-specific guarantees the oracle comparison cannot see: the
gap-fill grid is complete/regular and LOCF really carries the last
observation, the OLS estimates match an independent NumPy fit, mutual
information obeys its information-theoretic identities, and the basket
rules obey the support/confidence/lift consistency equations.
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
from pyspark.sql import functions as F

from kafka_stream_faust_deprecated_spark.io import load_table_parallel
from kafka_stream_faust_deprecated_spark.queries import mining as M
from tests.conftest import SF_DIR


# ---------------------------------------------------- gap fill / LOCF


def test_gapfill_grid_complete_and_locf(spark):
    """Every user carries exactly the shared calendar span (complete
    regular grid), observed days pass through untouched, and each
    filled day's value equals the user's most recent observed day's
    value (LOCF) — NULL only before the first observation."""
    rows = M.timeseries_gap_fill(spark, SF_DIR).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    spans = {tuple(sorted(r.day for r in rs)) for rs in by_user.values()}
    assert len(spans) == 1, "all users must share one calendar grid"
    days = spans.pop()
    assert len(days) == len(set(days))
    for rs in by_user.values():
        rs.sort(key=lambda r: r.day)
        last_seen = None
        for r in rs:
            if r.gap_filled == 0:
                assert r.n_events > 0
                last_seen = r.avg_value_filled
            else:
                assert r.n_events == 0
                assert r.avg_value_filled == last_seen  # None before first
    # at least one genuine gap and one genuine observation exist
    assert any(r.gap_filled == 1 for r in rows)
    assert any(r.gap_filled == 0 for r in rows)


# ------------------------------------------------------ OLS trend


def test_trend_matches_numpy_polyfit(spark):
    """The closed-form per-group slope/intercept agree with an
    independent NumPy least-squares fit of the same points, and R^2
    lies in [0, 1]."""
    ev = (
        load_table_parallel(spark, SF_DIR, "events")
        .select(
            "event_type",
            F.datediff(
                F.to_date("ts"), F.lit(M.TREND_EPOCH).cast("date")
            ).alias("x"),
            "value",
        )
        .collect()
    )
    pts = defaultdict(lambda: ([], []))
    for r in ev:
        pts[r.event_type][0].append(float(r.x))
        pts[r.event_type][1].append(float(r.value))
    got = {r.event_type: r for r in M.groupwise_linear_trend(spark, SF_DIR).collect()}
    assert set(got) == set(pts)
    for et, (xs, ys) in pts.items():
        slope, intercept = np.polyfit(np.array(xs), np.array(ys), 1)
        assert abs(got[et].slope - slope) < 1e-3, et
        assert abs(got[et].intercept - intercept) < 1e-2, et
        assert 0.0 <= got[et].r2 <= 1.0
        assert got[et].n == len(xs)


# ------------------------------------------- mutual information


def test_mi_identities(spark):
    """Marginals sum to the total, probabilities are consistent, the
    reported MI total equals the sum of the cell contributions, and MI
    is bounded by min(H(lang), H(source))."""
    rows = M.categorical_mutual_information(spark, SF_DIR).collect()
    n = rows[0].n_total
    assert all(r.n_total == n for r in rows)
    assert sum(r.c_xy for r in rows) == n
    lang_m = {r.lang: r.c_lang for r in rows}
    src_m = {r.source: r.c_src for r in rows}
    assert sum(lang_m.values()) == n
    assert sum(src_m.values()) == n
    mi = rows[0].mi_total
    assert all(abs(r.mi_total - mi) < 1e-9 for r in rows)
    assert abs(sum(r.mi_contrib for r in rows) - mi) < 1e-6
    h_lang = -sum(c / n * math.log2(c / n) for c in lang_m.values())
    h_src = -sum(c / n * math.log2(c / n) for c in src_m.values())
    # rounding each cell at 4 dp perturbs the total by < #cells * 5e-5
    slack = 5e-5 * len(rows) + 1e-9
    assert -slack <= mi <= min(h_lang, h_src) + slack


# ----------------------------------------------------- basket rules


def test_basket_rules_consistency(spark):
    """Every rule's support/confidence/lift reproduce from its integer
    counts, the support cut holds exactly, pairs are canonically
    oriented, and the pair count never exceeds either marginal."""
    rows = M.basket_copurchase_rules(spark, SF_DIR).collect()
    assert rows, "expected rules above min support at test scale"
    n_orders = rows[0].n_orders
    for r in rows:
        assert r.brand_a < r.brand_b
        assert r.n_ab * M.BASKET_SUPPORT_DEN >= n_orders
        assert r.n_ab <= min(r.n_a, r.n_b)
        # 4-dp rounded values sit within half an ulp-of-grid of the
        # exact ratio (don't re-round in Python: round_det is HALF_UP,
        # Python round is banker's — midpoints would disagree)
        assert abs(r.support - r.n_ab / n_orders) <= 5.0001e-5
        assert abs(r.conf_a_to_b - r.n_ab / r.n_a) <= 5.0001e-5
        assert abs(r.conf_b_to_a - r.n_ab / r.n_b) <= 5.0001e-5
        assert r.lift > 0


# ------------------------------------------------ session path mining


def test_session_paths_match_python_replay(spark):
    """The top paths equal an independent Python replay over the raw
    events (first PATH_LEN types per user-day in (ts, event_id) order),
    and shares are counts over the total session count."""
    ev = (
        load_table_parallel(spark, SF_DIR, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    sessions = defaultdict(list)
    for r in ev:
        sessions[(r.user_id, r.ts.date())].append((r.ts, r.event_id, r.event_type))
    from collections import Counter

    paths = Counter()
    for key, rows in sessions.items():
        rows.sort()
        paths[">".join(t for _, _, t in rows[: M.PATH_LEN])] += 1
    total = sum(paths.values())
    expected = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[: M.PATH_TOP_K]
    out = sorted(
        M.session_path_mining(spark, SF_DIR).collect(), key=lambda r: r.rnk
    )
    assert [(r.path, r.n_sessions) for r in out] == expected
    for r in out:
        assert r.share == round(r.n_sessions / total, 4)


# --------------------------------------------------------------- EWMA


def test_ewma_matches_numpy_fold(spark):
    """Every row's EWMA equals the finite weighted fold over its own
    reported window of daily averages, replayed in NumPy from the raw
    daily aggregation."""
    rows = M.ewma_smoothing_capped(spark, SF_DIR).collect()
    series = defaultdict(dict)
    for r in rows:
        series[r.event_type][r.day] = r
    a, b = M.EWMA_ALPHA, 1 - M.EWMA_ALPHA
    for et, days in series.items():
        ordered = [days[d] for d in sorted(days)]
        for i, r in enumerate(ordered):
            win = ordered[max(0, i - (M.EWMA_WINDOW - 1)) : i + 1]
            assert r.window_n == len(win)
            num = sum(
                x.day_avg * b ** (len(win) - 1 - j) for j, x in enumerate(win)
            )
            expect = round(num * a / (1 - b ** len(win)), 4)
            assert abs(r.ewma - expect) < 1e-9, (et, r.day)
        # smoothing shrinks variance vs the raw dailies
        raw = np.var([r.day_avg for r in ordered])
        smooth = np.var([r.ewma for r in ordered])
        assert smooth <= raw


# ------------------------------------------------- conversion latency


def test_conversion_latency_matches_python(spark):
    """Counts and quantiles match a Python replay of first-signup ->
    first-subsequent-purchase delays."""
    ev = (
        load_table_parallel(spark, SF_DIR, "events")
        .select("user_id", "ts", "event_type")
        .collect()
    )
    signup, purchase = {}, defaultdict(list)
    for r in ev:
        if r.event_type == "signup":
            signup[r.user_id] = min(signup.get(r.user_id, r.ts), r.ts)
        elif r.event_type == "purchase":
            purchase[r.user_id].append(r.ts)
    delays = []
    for u, s in signup.items():
        after = [p for p in purchase.get(u, []) if p >= s]
        if after:
            d = min(after).replace(microsecond=0) - s.replace(microsecond=0)
            delays.append(int(d.total_seconds()))
    (r,) = M.conversion_latency_percentiles(spark, SF_DIR).collect()
    assert r.n_signups == len(signup)
    assert r.n_converted == len(delays)
    assert r.conv_rate == round(len(delays) / len(signup), 4)
    arr = np.asarray(sorted(delays), dtype=float)
    assert r.min_sec == int(arr.min()) and r.max_sec == int(arr.max())
    for q, col in ((0.25, r.p25_sec), (0.5, r.p50_sec), (0.9, r.p90_sec)):
        assert abs(col - round(float(np.quantile(arr, q)), 4)) < 1e-9
