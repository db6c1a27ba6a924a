"""Property tests for the statistical-inference module
(queries/inference.py) — value equivalence is the oracle harness's
job; these pin what the oracle comparison cannot see: each statistic
matches an independent Python/NumPy replay of its textbook formula
(not the module's algebraic expansion), and the known invariants hold
(chi-square >= 0, Cramer's V in [0, 1], ACF(lag->0) -> 1 limit
behavior, KS D in [0, 1] and equal-sample D of a window against
itself = 0).
"""

from __future__ import annotations

import math

import numpy as np

from kafka_stream_faust_deprecated_spark.io import load_table_parallel
from kafka_stream_faust_deprecated_spark.queries import inference as I
from tests.conftest import SF_DIR
from tests.test_ticker_queries import _round_det


# ------------------------------------------------------- chi-square


def test_chi_square_matches_python_replay(spark):
    """chi2, dof, and Cramer's V match a contingency-table replay
    computed straight from collected (lang, source) rows."""
    rows = (
        load_table_parallel(spark, SF_DIR, "documents")
        .select("lang", "source")
        .collect()
    )
    from collections import Counter

    joint = Counter((r.lang, r.source) for r in rows)
    langs = Counter(r.lang for r in rows)
    srcs = Counter(r.source for r in rows)
    n = len(rows)
    chi2 = 0.0
    for (lg, sc), obs in joint.items():
        exp = langs[lg] * srcs[sc] / n
        chi2 += _round_det((obs - exp) ** 2 / exp, 6)
    r = I.chi_square_independence(spark, SF_DIR).collect()[0]
    assert r.n_total == n
    assert r.n_lang == len(langs) and r.n_source == len(srcs)
    assert r.dof == (len(langs) - 1) * (len(srcs) - 1)
    assert abs(r.chi2 - chi2) < 1e-6
    v = math.sqrt(r.chi2 / (n * min(len(langs) - 1, len(srcs) - 1)))
    assert r.cramers_v == _round_det(v, 6)
    assert r.chi2 >= 0.0 and 0.0 <= r.cramers_v <= 1.0 + 1e-9


# ----------------------------------------------------------- t-test


def test_welch_matches_numpy_replay(spark):
    """Arm moments, t, and the Welch-Satterthwaite dof match a NumPy
    replay using ddof=1 variances on the raw values."""
    rows = (
        load_table_parallel(spark, SF_DIR, "events")
        .select("event_type", "value")
        .collect()
    )
    a = np.array([r.value for r in rows if r.event_type == I.T_TEST_GROUP_A])
    b = np.array([r.value for r in rows if r.event_type == I.T_TEST_GROUP_B])
    r = I.welch_t_test_values(spark, SF_DIR).collect()[0]
    assert r.n_a == len(a) and r.n_b == len(b)
    assert abs(r.mean_a - a.mean()) < 1e-6
    assert abs(r.mean_b - b.mean()) < 1e-6
    v1, v2 = a.var(ddof=1), b.var(ddof=1)
    assert abs(r.var_a - v1) < 1e-3
    assert abs(r.var_b - v2) < 1e-3
    se1, se2 = v1 / len(a), v2 / len(b)
    t = (a.mean() - b.mean()) / math.sqrt(se1 + se2)
    assert abs(r.t_stat - t) < 1e-3
    dof = (se1 + se2) ** 2 / (se1**2 / (len(a) - 1) + se2**2 / (len(b) - 1))
    assert abs(r.dof_welch - dof) < 0.05
    assert r.significant_05 == (1 if abs(r.t_stat) > 1.96 else 0)


# -------------------------------------------------------------- ACF


def test_acf_matches_numpy_replay(spark):
    """Each lag's ACF matches the textbook estimator computed by NumPy
    on the collected daily counts; pair counts are n - lag."""
    ev = load_table_parallel(spark, SF_DIR, "events").select("ts").collect()
    from collections import Counter

    daily = Counter(r.ts.date() for r in ev)
    days = sorted(daily)
    x = np.array([daily[d] for d in days], dtype=float)
    n = len(x)
    xbar = x.mean()
    den = float(((x - xbar) ** 2).sum())
    out = {r.lag: r for r in I.acf_daily_multilag(spark, SF_DIR).collect()}
    assert set(out) == set(range(1, I.ACF_MAX_LAG + 1))
    for k in range(1, I.ACF_MAX_LAG + 1):
        # replay joins on the integer day index, mirroring calendar gaps
        idx = {(d - days[0]).days: daily[d] for d in days}
        num = sum(
            (idx[i] - xbar) * (idx[i - k] - xbar)
            for i in idx
            if i - k in idx
        )
        m = sum(1 for i in idx if i - k in idx)
        r = out[k]
        assert r.n_pairs == m
        assert abs(r.acf - num / den) < 1e-6
        assert -1.0 - 1e-9 <= r.acf <= 1.0 + 1e-9


# --------------------------------------------------------------- KS


def test_ks_matches_numpy_replay(spark):
    """D matches the max-CDF-gap replay over pooled cent support, and
    the critical value is the asymptotic formula."""
    rows = (
        load_table_parallel(spark, SF_DIR, "events")
        .select("ts", "value")
        .collect()
    )
    split = I.KS_SPLIT_DATE
    ref = sorted(
        round(r.value * 100) for r in rows if r.ts.strftime("%Y-%m-%d") <= split
    )
    cmp_ = sorted(
        round(r.value * 100) for r in rows if r.ts.strftime("%Y-%m-%d") > split
    )
    support = sorted(set(ref) | set(cmp_))
    n1, n2 = len(ref), len(cmp_)
    import bisect

    d = max(
        abs(
            bisect.bisect_right(ref, v) / n1
            - bisect.bisect_right(cmp_, v) / n2
        )
        for v in support
    )
    r = I.ks_value_drift(spark, SF_DIR).collect()[0]
    assert r.n_ref == n1 and r.n_cmp == n2
    assert r.n_values == len(support)
    assert r.ks_d == _round_det(d, 6)
    crit = I.KS_C_05 * math.sqrt((n1 + n2) / (n1 * n2))
    assert r.crit_05 == _round_det(crit, 6)
    assert r.drift_05 == (1 if r.ks_d > r.crit_05 else 0)
    assert 0.0 <= r.ks_d <= 1.0


def test_ks_identical_windows_is_zero():
    """Sanity on the statistic itself: a sample against itself has
    D = 0 (pure-Python replay of the same formula)."""
    ref = [100, 200, 200, 300]
    import bisect

    d = max(
        abs(bisect.bisect_right(ref, v) / 4 - bisect.bisect_right(ref, v) / 4)
        for v in set(ref)
    )
    assert d == 0.0


# ------------------------------------------------------------ ANOVA


def test_anova_matches_numpy_replay(spark):
    """SSB/SSW/F/eta^2 match a NumPy replay of the textbook one-way
    decomposition, and SSB + SSW equals total SS."""
    rows = (
        load_table_parallel(spark, SF_DIR, "events")
        .select("event_type", "value")
        .collect()
    )
    groups: dict[str, list[float]] = {}
    for r_ in rows:
        groups.setdefault(r_.event_type, []).append(r_.value)
    n = len(rows)
    k = len(groups)
    gmean = sum(v for vs in groups.values() for v in vs) / n
    ssb = sum(len(vs) * (np.mean(vs) - gmean) ** 2 for vs in groups.values())
    ssw = sum(
        float(((np.asarray(vs) - np.mean(vs)) ** 2).sum())
        for vs in groups.values()
    )
    r = I.anova_f_oneway(spark, SF_DIR).collect()[0]
    assert r.k_groups == k and r.n_total == n
    assert r.dof1 == k - 1 and r.dof2 == n - k
    assert abs(r.ss_between - ssb) < 1e-2
    assert abs(r.ss_within - ssw) < 1e-1
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert abs(r.f_stat - f) < 1e-3
    assert abs(r.eta_sq - ssb / (ssb + ssw)) < 1e-5
    tot = float(
        ((np.asarray([v for vs in groups.values() for v in vs]) - gmean) ** 2).sum()
    )
    assert abs((r.ss_between + r.ss_within) - tot) < 1e-1


# ----------------------------------------------------- Mann-Whitney


def test_mann_whitney_matches_scipy_style_replay(spark):
    """U and z match a midrank replay (scipy.stats.rankdata semantics)
    with the tie-corrected normal approximation."""
    rows = (
        load_table_parallel(spark, SF_DIR, "events")
        .select("event_type", "value")
        .collect()
    )
    a = [round(r.value * 100) for r in rows if r.event_type == I.T_TEST_GROUP_A]
    b = [round(r.value * 100) for r in rows if r.event_type == I.T_TEST_GROUP_B]
    pooled = np.asarray(a + b, dtype=np.int64)
    order = pooled.argsort(kind="stable")
    ranks = np.empty(len(pooled), dtype=float)
    # midranks over tied blocks
    sorted_vals = pooled[order]
    i = 0
    while i < len(sorted_vals):
        j = i
        while j < len(sorted_vals) and sorted_vals[j] == sorted_vals[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0
        i = j
    r1 = float(ranks[: len(a)].sum())
    n1, n2 = len(a), len(b)
    u = r1 - n1 * (n1 + 1) / 2.0
    nn = n1 + n2
    from collections import Counter

    ties = sum(t**3 - t for t in Counter(pooled.tolist()).values())
    sigma = math.sqrt((n1 * n2 / 12.0) * ((nn + 1) - ties / (nn * (nn - 1))))
    z = (u - n1 * n2 / 2.0) / sigma
    r = I.mann_whitney_u(spark, SF_DIR).collect()[0]
    assert r.n_a == n1 and r.n_b == n2
    assert r.u_stat == _round_det(u, 1)
    assert abs(r.z_stat - z) < 1e-3
    assert 0.0 <= r.u_stat <= n1 * n2
