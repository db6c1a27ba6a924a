"""Property tests for the robust/dominance module (queries/robust.py) —
value equivalence is the oracle harness's job (tests/test_oracle.py
runs every registered query differentially); these pin the
operator-specific guarantees the oracle comparison cannot see: the
skyline really is the non-dominated set (checked against a brute-force
O(n^2) dominance scan), the MAD screen matches an independent NumPy
median/MAD computation, the CUSUM argmax matches a NumPy prefix-sum
replay, and the seasonal decomposition obeys its variance identities.
"""

from __future__ import annotations

import numpy as np

from kafka_stream_faust_deprecated_spark.io import load_table_parallel
from kafka_stream_faust_deprecated_spark.queries import robust as R
from tests.conftest import SF_DIR


# ------------------------------------------------------------ skyline


def test_skyline_matches_bruteforce_dominance(spark):
    """The returned frontier equals the brute-force non-dominated set
    under (min price, max size), and frontier sizes strictly increase
    with price level."""
    parts = (
        load_table_parallel(spark, SF_DIR, "part")
        .select("p_partkey", "p_retailprice", "p_size")
        .collect()
    )
    pts = [(round(r.p_retailprice, 2), r.p_size, r.p_partkey) for r in parts]
    expected = set()
    for price, size, key in pts:
        dominated = any(
            (op <= price and os >= size and (op < price or os > size))
            for op, os, _ in pts
        )
        if not dominated:
            expected.add(key)
    rows = R.skyline_pareto_frontier(spark, SF_DIR).collect()
    assert {r.p_partkey for r in rows} == expected
    lvl = sorted({(r.price, r.p_size, r.frontier_rank) for r in rows})
    for (p0, s0, r0), (p1, s1, r1) in zip(lvl, lvl[1:]):
        if p1 > p0:
            assert s1 > s0, "frontier sizes must strictly increase"
            assert r1 > r0
        else:  # ties share price, size, and rank
            assert (s1, r1) == (s0, r0)


# ------------------------------------------------------ MAD outliers


def test_mad_matches_numpy(spark):
    """Median, MAD, and the outlier count per type match an
    independent NumPy computation of the Iglewicz-Hoaglin screen."""
    ev = (
        load_table_parallel(spark, SF_DIR, "events")
        .select("event_type", "value")
        .collect()
    )
    vals = {}
    for r in ev:
        vals.setdefault(r.event_type, []).append(r.value)
    out = {r.event_type: r for r in R.robust_mad_outliers(spark, SF_DIR).collect()}
    assert set(out) == set(vals)
    for et, v in vals.items():
        a = np.asarray(v)
        med = round(float(np.median(a)), 4)
        mad = round(float(np.median(np.abs(a - med))), 4)
        r = out[et]
        assert r.n == len(a)
        assert r.med == med
        assert r.mad == mad
        z = np.round(0.6745 * (a - med) / mad, 4)
        assert r.n_outliers == int(np.sum(np.abs(z) > 3.5))
        assert abs(r.max_abs_z - float(np.max(np.abs(z)))) < 1e-9


# ------------------------------------------------------------- CUSUM


def test_cusum_matches_numpy_replay(spark):
    """The reported changepoint position and |CUSUM| peak match a
    NumPy replay of the exact prefix-sum definition per type."""
    ev = (
        load_table_parallel(spark, SF_DIR, "events")
        .select("event_type", "ts", "event_id", "value")
        .collect()
    )
    series = {}
    for r in ev:
        series.setdefault(r.event_type, []).append((r.ts, r.event_id, r.value))
    out = {r.event_type: r for r in R.cusum_changepoint(spark, SF_DIR).collect()}
    assert set(out) == set(series)
    for et, rows in series.items():
        rows.sort(key=lambda t: (t[0], t[1]))
        v = np.asarray([round(x, 2) for _, _, x in rows])
        mean = round(float(v.sum()) / len(v), 4)
        cusum = np.round(np.abs(np.cumsum(v) - (np.arange(len(v)) + 1) * mean), 4)
        r = out[et]
        assert r.n == len(v)
        assert r.mean_v == mean
        peak = float(cusum.max())
        assert abs(r.max_abs_cusum - peak) < 1e-9
        # reported index is the EARLIEST attaining the peak
        assert r.cp_index == int(np.argmax(cusum)) + 1


# -------------------------------------------------------- seasonality


def test_seasonal_identities(spark):
    """Per type: 24 hour cells, counts sum to the type total, the
    n-weighted mean of hour offsets is ~0, and the seasonal strength
    is a valid variance fraction in [0, 1]."""
    rows = R.seasonal_decompose_events(spark, SF_DIR).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for et, rs in by_type.items():
        assert len(rs) == 24
        assert len({r.hr for r in rs}) == 24
        n_t = sum(r.n_h for r in rs)
        # one shared type_avg and strength per type
        assert len({r.type_avg for r in rs}) == 1
        assert len({r.seasonal_strength for r in rs}) == 1
        s = rs[0].seasonal_strength
        assert 0.0 <= s <= 1.0
        w_off = sum(r.n_h * r.seasonal_offset for r in rs) / n_t
        assert abs(w_off) < 1e-3  # offsets are centered (4-dp rounding slack)
        for r in rs:
            assert abs((r.hod_avg - r.type_avg) - r.seasonal_offset) < 2e-4


# -------------------------------------------------------- attribution


def test_attribution_credit_conservation(spark):
    """Total credit across touch types equals the number of purchases
    with >= 1 touch in the window (each such purchase distributes
    exactly one unit, modulo 6-dp rounding), and every count is
    internally consistent."""
    rows = R.attribution_linear_touch(spark, SF_DIR).collect()
    assert {r.event_type for r in rows} <= set(R.ATTR_TOUCH_TYPES)
    ev = (
        load_table_parallel(spark, SF_DIR, "events")
        .select("user_id", "event_type", "event_id", "ts")
        .collect()
    )
    touches = [
        (r.user_id, r.ts) for r in ev if r.event_type in R.ATTR_TOUCH_TYPES
    ]
    from datetime import timedelta

    look = timedelta(days=R.ATTR_WINDOW_DAYS)
    attributed = sum(
        1
        for r in ev
        if r.event_type == "purchase"
        and any(u == r.user_id and r.ts - look <= t <= r.ts for u, t in touches)
    )
    total_credit = sum(r.total_credit for r in rows)
    assert abs(total_credit - attributed) < 1e-2  # 6-dp per-touch rounding
    n_purch = {r.event_type: r.n_purchases_touched for r in rows}
    assert all(v <= attributed for v in n_purch.values())
    assert max(n_purch.values()) <= attributed <= sum(n_purch.values())


# ----------------------------------------------------- nearest event


def test_nearest_event_matches_bruteforce(spark):
    """Per purchase, the winning gap equals the brute-force min
    |second-gap| over the user's clicks, with the prev-side tiebreak."""
    ev = (
        load_table_parallel(spark, SF_DIR, "events")
        .select("user_id", "event_type", "event_id", "ts")
        .collect()
    )
    import calendar

    def sec(ts):
        return calendar.timegm(ts.replace(microsecond=0).timetuple())

    clicks = {}
    for r in ev:
        if r.event_type == "click":
            clicks.setdefault(r.user_id, []).append((sec(r.ts), r.ts, r.event_id))
    out = {r.event_id: r for r in R.nearest_event_join(spark, SF_DIR).collect()}
    purchases = [r for r in ev if r.event_type == "purchase"]
    assert len(out) == len(purchases)
    for p in purchases:
        r = out[p.event_id]
        cs = clicks.get(p.user_id, [])
        ps = sec(p.ts)
        # brute force uses the full timeline ordering (ts, event_id)
        prevs = [c for c in cs if (c[1], c[2]) < (p.ts, p.event_id)]
        nexts = [c for c in cs if (c[1], c[2]) > (p.ts, p.event_id)]
        if not cs:
            assert r.nearest_side == "none" and r.nearest_gap_sec is None
            continue
        best_prev = max(prevs)[0] if prevs else None
        best_next = min(nexts)[0] if nexts else None
        if best_prev is None:
            assert r.nearest_side == "next"
            assert r.nearest_gap_sec == best_next - ps
        elif best_next is None:
            assert r.nearest_side == "prev"
            assert r.nearest_gap_sec == ps - best_prev
        elif ps - best_prev <= best_next - ps:
            assert r.nearest_side == "prev"
            assert r.nearest_gap_sec == ps - best_prev
        else:
            assert r.nearest_side == "next"
            assert r.nearest_gap_sec == best_next - ps


# --------------------------------------------------------------- BPE


def test_bpe_pairs_match_python_counter(spark):
    """The top merge candidates equal an independent Python
    collections.Counter replay over the word-frequency table."""
    from collections import Counter

    docs = load_table_parallel(spark, SF_DIR, "documents").select("text").collect()
    wf = Counter()
    for d in docs:
        for w in d.text.split(" "):
            if w:
                wf[w] += 1
    pc = Counter()
    nw = Counter()
    for w, f in wf.items():
        seen = set()
        for i in range(len(w) - 1):
            pair = w[i : i + 2]
            pc[pair] += f
            seen.add(pair)
        for pair in seen:
            nw[pair] += 1
    expected = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[: R.BPE_TOP_PAIRS]
    rows = sorted(
        R.bpe_merge_pairs(spark, SF_DIR).collect(), key=lambda r: r.merge_rank
    )
    assert [(r.pair, r.pair_count) for r in rows] == expected
    for r in rows:
        assert r.n_words == nw[r.pair]


# ----------------------------------------------- weighted quantiles


def test_weighted_median_matches_python(spark):
    """Each picked price equals the smallest price whose cumulative
    quantity share reaches the target percent, replayed in Python."""
    li = load_table_parallel(spark, SF_DIR, "lineitem").select(
        "l_partkey", "l_quantity"
    ).collect()
    part = {
        r.p_partkey: round(r.p_retailprice, 2)
        for r in load_table_parallel(spark, SF_DIR, "part")
        .select("p_partkey", "p_retailprice")
        .collect()
    }
    from collections import defaultdict as dd

    w = dd(float)
    for r in li:
        w[part[r.l_partkey]] += r.l_quantity
    total = sum(w.values())
    levels = sorted(w)
    out = {r.pct: r for r in R.weighted_median_price(spark, SF_DIR).collect()}
    assert set(out) == set(R.WEIGHTED_QS)
    for pct in R.WEIGHTED_QS:
        cum = 0.0
        for price in levels:
            cum += w[price]
            if cum * 100 >= pct * total:
                assert out[pct].price == price
                break
        assert abs(out[pct].total_weight - total) < 1e-6
    assert out[25].price <= out[50].price <= out[75].price


# ------------------------------------------- quantile normalization


def test_source_quantile_normalization_properties(spark):
    """Within each source: ranks are a permutation of 1..n, percentiles
    are monotone in (n_chars, doc_id), and span [0, 1]."""
    rows = R.source_quantile_normalization(spark, SF_DIR).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        n = len(rs)
        assert {r.src_rank for r in rs} == set(range(1, n + 1))
        assert all(r.src_n == n for r in rs)
        rs.sort(key=lambda r: (r.n_chars, r.doc_id))
        for i, r in enumerate(rs):
            assert r.src_rank == i + 1
            assert r.src_pct == round(i / (n - 1), 6)
        assert rs[0].src_pct == 0.0 and rs[-1].src_pct == 1.0


# ---------------------------------------------------------- cadence


def test_reorder_intervals_match_python(spark):
    """Gap stats per customer match a Python replay over sorted
    (date, orderkey) sequences; single-order customers are absent."""
    orders = load_table_parallel(spark, SF_DIR, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey"
    ).collect()
    seq = {}
    for r in orders:
        seq.setdefault(r.o_custkey, []).append((r.o_orderdate, r.o_orderkey))
    out = {r.custkey: r for r in M_reorder(spark)}
    for ck, os_ in seq.items():
        if len(os_) < 2:
            assert ck not in out
            continue
        os_.sort()
        gaps = [
            (b[0] - a[0]).days for a, b in zip(os_, os_[1:])
        ]
        r = out[ck]
        assert r.n_orders == len(os_)
        assert r.min_gap_days == min(gaps) and r.max_gap_days == max(gaps)
        assert r.mean_gap_days == round(sum(gaps) / len(gaps), 4)


def M_reorder(spark):
    from kafka_stream_faust_deprecated_spark.queries import mining as M

    return M.order_reorder_intervals(spark, SF_DIR).collect()


# --------------------------------------------------------------- Gini


def test_gini_matches_numpy(spark):
    """Per-source Gini equals the NumPy rank-identity computation and
    sits in [0, 1)."""
    docs = load_table_parallel(spark, SF_DIR, "documents").select(
        "doc_id", "source", "n_chars"
    ).collect()
    by_src = {}
    for r in docs:
        by_src.setdefault(r.source, []).append((r.n_chars, r.doc_id))
    out = {r.source: r for r in R.gini_concentration_index(spark, SF_DIR).collect()}
    assert set(out) == set(by_src)
    for src, xs in by_src.items():
        xs.sort()
        v = np.asarray([x for x, _ in xs], dtype=float)
        n = len(v)
        i = np.arange(1, n + 1)
        g = round((2 * float((i * v).sum()) - (n + 1) * float(v.sum()))
                  / (n * float(v.sum())), 6)
        r = out[src]
        assert r.n_docs == n and r.total_chars == int(v.sum())
        assert abs(r.gini - g) < 1e-9
        assert 0.0 <= r.gini < 1.0
