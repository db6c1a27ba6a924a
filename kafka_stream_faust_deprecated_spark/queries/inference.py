"""Statistical-inference / hypothesis-testing operators (wave 11).

The capabilities this module adds, each as an oracle-checked query:

* ``chi_square_independence`` — the lang x source chi-square test of
  independence with Cramer's V effect size: the categorical twin of
  ``categorical_mutual_information`` (which measures dependence in
  bits; this one tests it against the null).
* ``welch_t_test_values``     — Welch's unequal-variance two-sample
  t-test of event value between two event types, with the
  Welch-Satterthwaite degrees of freedom: the A/B-test primitive.
* ``acf_daily_multilag``      — autocorrelation of the daily event
  count at lags 1..7: the seasonality fingerprint (a weekly cycle
  shows as a lag-7 peak) behind forecasting-model choice.
* ``ks_value_drift``          — two-sample Kolmogorov-Smirnov D
  between the month halves of the event value distribution, with the
  asymptotic 5% critical value: the nonparametric drift test PSI
  (``psi_value_drift``) approximates with buckets; KS is exact, no
  binning choice.
* ``anova_f_oneway``          — one-way ANOVA F across ALL event
  types with eta-squared: the k-arm generalization of the t-test.
* ``mann_whitney_u``          — the Mann-Whitney U rank test with
  midrank ties and the tie-corrected normal approximation: the
  nonparametric twin of the t-test.

Reference parity note: the reference app (``faust_app/ma_agg.py``, 308
lines) has no statistical-testing surface; these extend the engine for
the large-scale analytics mandate (SURVEY.md §2b/§2c).

Determinism contract shared by all six: every sufficient statistic is
an exact integer or DECIMAL aggregate (counts, integer-cent sums,
integer products), so the floating-point work is a fixed scalar
expression over exact inputs evaluated identically in both engines;
unordered float SUMs never occur (the chi-square total sums
6-dp DECIMAL terms, order-independent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kafka_stream_faust_deprecated_spark.functions.rounding import (
    round_det,
    sql_round_det,
)
from kafka_stream_faust_deprecated_spark.io import load_table_parallel
from kafka_stream_faust_deprecated_spark.registry import register

# --------------------------------------------------------------------------
# chi_square_independence
# --------------------------------------------------------------------------


@register(
    "chi_square_independence",
    oracle=f"""
WITH joint AS (
    SELECT lang, source, count(*)::BIGINT AS c_xy FROM documents GROUP BY 1, 2
),
m AS (
    SELECT lang, source, c_xy,
           sum(c_xy) OVER (PARTITION BY lang) AS c_lang,
           sum(c_xy) OVER (PARTITION BY source) AS c_src,
           sum(c_xy) OVER () AS n
    FROM joint
),
cell AS (
    SELECT lang, source, c_xy, n::BIGINT AS n,
           CAST({sql_round_det(
               "(CAST(c_xy AS DOUBLE) - CAST(c_lang AS DOUBLE) * c_src / n)"
               " * (CAST(c_xy AS DOUBLE) - CAST(c_lang AS DOUBLE) * c_src / n)"
               " / (CAST(c_lang AS DOUBLE) * c_src / n)", 6)}
               AS DECIMAL(18,6)) AS chi2_term
    FROM m
),
s AS (
    SELECT max(n) AS n_total,
           count(DISTINCT lang)::BIGINT AS n_lang,
           count(DISTINCT source)::BIGINT AS n_source,
           CAST(sum(chi2_term) AS DOUBLE) AS chi2
    FROM cell
)
SELECT n_total, n_lang, n_source,
       (n_lang - 1) * (n_source - 1) AS dof,
       chi2,
       {sql_round_det(
           "sqrt(chi2 / nullif(CAST(n_total AS DOUBLE)"
           " * least(n_lang - 1, n_source - 1), 0.0))", 6)} AS cramers_v
FROM s
""",
    tags=("E7",),
)
def chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between ``lang`` and
    ``source`` over the corpus, with Cramer's V. Expected cell counts
    ``row_tot * col_tot / n`` are exact-integer ratios; each cell's
    ``(obs - exp)^2 / exp`` is rounded to 6 dp and summed as DECIMAL,
    so the statistic cannot depend on summation order in either
    engine. Cramer's V normalizes by ``n * min(r-1, c-1)``.

    Scale shape: ONE corpus exchange (the (lang, source) count with
    map-side combine); every window and the final global aggregate run
    over the catalog-bounded cell relation (|lang| x |source| rows —
    the categorical_mutual_information class), whose single-partition
    exchanges are whitelisted as bounded.
    """
    docs = load_table_parallel(spark, sf_dir, "documents").select("lang", "source")
    joint = docs.groupBy("lang", "source").agg(F.count("*").alias("c_xy"))
    m = joint.select(
        "lang",
        "source",
        "c_xy",
        F.sum("c_xy").over(Window.partitionBy("lang")).alias("c_lang"),
        F.sum("c_xy").over(Window.partitionBy("source")).alias("c_src"),
        F.sum("c_xy").over(Window.partitionBy()).alias("n"),
    )
    exp = F.col("c_lang").cast("double") * F.col("c_src") / F.col("n")
    term = (F.col("c_xy").cast("double") - exp) * (
        F.col("c_xy").cast("double") - exp
    ) / exp
    cell = m.select(
        "lang",
        "source",
        F.col("n").cast("bigint").alias("n"),
        round_det(term, 6).cast("decimal(18,6)").alias("chi2_term"),
    )
    s = cell.agg(
        F.max("n").alias("n_total"),
        F.countDistinct("lang").alias("n_lang"),
        F.countDistinct("source").alias("n_source"),
        F.sum("chi2_term").cast("double").alias("chi2"),
    )
    return s.select(
        "n_total",
        "n_lang",
        "n_source",
        ((F.col("n_lang") - 1) * (F.col("n_source") - 1)).alias("dof"),
        "chi2",
        # nullif: a single-category corpus (1-row sweep) has dof 0 in
        # one axis; ANSI division would throw in BOTH engines.
        round_det(
            F.sqrt(
                F.col("chi2")
                / F.nullif(
                    F.col("n_total").cast("double")
                    * F.least(F.col("n_lang") - 1, F.col("n_source") - 1),
                    F.lit(0.0),
                )
            ),
            6,
        ).alias("cramers_v"),
    )


# --------------------------------------------------------------------------
# welch_t_test_values
# --------------------------------------------------------------------------

#: The two treatment arms compared by the t-test query.
T_TEST_GROUP_A = "click"
T_TEST_GROUP_B = "purchase"


@register(
    "welch_t_test_values",
    oracle=f"""
WITH s AS (
    SELECT event_type,
           count(*)::BIGINT AS n,
           sum(CAST(value AS DECIMAL(18,2))) AS sv,
           sum(CAST(value AS DECIMAL(9,2)) * CAST(value AS DECIMAL(9,2))) AS svv
    FROM events
    WHERE event_type IN ('{T_TEST_GROUP_A}', '{T_TEST_GROUP_B}')
    GROUP BY event_type
),
p AS (
    SELECT
        max(CASE WHEN event_type = '{T_TEST_GROUP_A}' THEN n END) AS n1,
        CAST(max(CASE WHEN event_type = '{T_TEST_GROUP_A}' THEN sv END) AS DOUBLE) AS s1,
        CAST(max(CASE WHEN event_type = '{T_TEST_GROUP_A}' THEN svv END) AS DOUBLE) AS q1,
        max(CASE WHEN event_type = '{T_TEST_GROUP_B}' THEN n END) AS n2,
        CAST(max(CASE WHEN event_type = '{T_TEST_GROUP_B}' THEN sv END) AS DOUBLE) AS s2,
        CAST(max(CASE WHEN event_type = '{T_TEST_GROUP_B}' THEN svv END) AS DOUBLE) AS q2
    FROM s
),
v AS (
    SELECT n1, n2, s1 / n1 AS m1, s2 / n2 AS m2,
           (q1 - s1 * s1 / n1) / nullif(n1 - 1, 0) AS v1,
           (q2 - s2 * s2 / n2) / nullif(n2 - 1, 0) AS v2
    FROM p
)
SELECT n1 AS n_a, n2 AS n_b,
       {sql_round_det("m1", 6)} AS mean_a,
       {sql_round_det("m2", 6)} AS mean_b,
       {sql_round_det("v1", 4)} AS var_a,
       {sql_round_det("v2", 4)} AS var_b,
       {sql_round_det(
           "(m1 - m2) / nullif(sqrt(v1 / n1 + v2 / n2), 0.0)", 4)} AS t_stat,
       {sql_round_det(
           "(v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)"
           " / nullif((v1 / n1) * (v1 / n1) / nullif(n1 - 1, 0)"
           "  + (v2 / n2) * (v2 / n2) / nullif(n2 - 1, 0), 0.0)", 2)} AS dof_welch,
       CASE WHEN abs({sql_round_det(
           "(m1 - m2) / nullif(sqrt(v1 / n1 + v2 / n2), 0.0)", 4)}) > 1.96
            THEN 1 ELSE 0 END AS significant_05
FROM v
""",
    tags=("E7",),
)
def welch_t_test_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t-test of mean event value between the
    '{T_TEST_GROUP_A}' and '{T_TEST_GROUP_B}' arms: per-arm n / mean /
    sample variance, the t statistic under unequal variances, the
    Welch-Satterthwaite degrees of freedom, and the |t| > 1.96 call at
    alpha = 0.05 (evaluated on the ROUNDED t so the flag cannot flip on
    last-bit noise). Sufficient statistics are exact: counts, the
    2-decimal value sum as DECIMAL(18,2), and the value-squared sum as
    a DECIMAL product (4 decimals, exact) — the float expressions
    downstream are fixed scalar arithmetic over those exact one-row
    inputs, identical in both engines.

    Scale shape: one scan with the two-arm filter pushed to parquet,
    collapsing to a 2-row (event_type) aggregate with map-side
    combine; the conditional-aggregation pivot to one row is a
    single-partition exchange over that bounded relation
    (whitelisted — the percentile_summary class).
    """
    ev = (
        load_table_parallel(spark, sf_dir, "events")
        .where(F.col("event_type").isin(T_TEST_GROUP_A, T_TEST_GROUP_B))
        .select("event_type", "value")
    )
    s = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"),
        F.sum(
            F.col("value").cast("decimal(9,2)") * F.col("value").cast("decimal(9,2)")
        ).alias("svv"),
    )

    def arm(col: str, et: str):
        return F.max(F.when(F.col("event_type") == et, F.col(col)))

    p = s.agg(
        arm("n", T_TEST_GROUP_A).alias("n1"),
        arm("sv", T_TEST_GROUP_A).cast("double").alias("s1"),
        arm("svv", T_TEST_GROUP_A).cast("double").alias("q1"),
        arm("n", T_TEST_GROUP_B).alias("n2"),
        arm("sv", T_TEST_GROUP_B).cast("double").alias("s2"),
        arm("svv", T_TEST_GROUP_B).cast("double").alias("q2"),
    )
    # nullif guards: a 1-row arm has n-1 = 0 and a constant-value arm
    # has zero pooled variance; ANSI division would throw in BOTH
    # engines (the groupwise_linear_trend idiom).
    n1, n2 = F.col("n1"), F.col("n2")
    m1, m2 = F.col("s1") / n1, F.col("s2") / n2
    v1 = (F.col("q1") - F.col("s1") * F.col("s1") / n1) / F.nullif(
        n1 - 1, F.lit(0)
    )
    v2 = (F.col("q2") - F.col("s2") * F.col("s2") / n2) / F.nullif(
        n2 - 1, F.lit(0)
    )
    se1, se2 = v1 / n1, v2 / n2
    t = (m1 - m2) / F.nullif(F.sqrt(se1 + se2), F.lit(0.0))
    dof = (se1 + se2) * (se1 + se2) / F.nullif(
        se1 * se1 / F.nullif(n1 - 1, F.lit(0))
        + se2 * se2 / F.nullif(n2 - 1, F.lit(0)),
        F.lit(0.0),
    )
    return p.select(
        n1.alias("n_a"),
        n2.alias("n_b"),
        round_det(m1, 6).alias("mean_a"),
        round_det(m2, 6).alias("mean_b"),
        round_det(v1, 4).alias("var_a"),
        round_det(v2, 4).alias("var_b"),
        round_det(t, 4).alias("t_stat"),
        round_det(dof, 2).alias("dof_welch"),
        F.when(F.abs(round_det(t, 4)) > 1.96, F.lit(1))
        .otherwise(F.lit(0))
        .alias("significant_05"),
    )


# --------------------------------------------------------------------------
# acf_daily_multilag
# --------------------------------------------------------------------------

#: Maximum autocorrelation lag (days). Lag 7 exposes a weekly cycle.
ACF_MAX_LAG = 7

#: Epoch anchoring the integer day index (the fixture's month).
ACF_EPOCH = "2024-01-01"


@register(
    "acf_daily_multilag",
    oracle=f"""
WITH daily AS (
    SELECT datediff('day', DATE '{ACF_EPOCH}', CAST(ts AS DATE))::BIGINT AS idx,
           count(*)::BIGINT AS x
    FROM events GROUP BY 1
),
st AS (
    SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx, sum(x * x)::BIGINT AS sxx
    FROM daily
),
ks AS (SELECT unnest(range(1, {ACF_MAX_LAG + 1}))::INTEGER AS k),
pr AS (
    SELECT k, count(*)::BIGINT AS n_pairs,
           sum(a.x * b.x)::BIGINT AS sxy,
           sum(a.x)::BIGINT AS sa,
           sum(b.x)::BIGINT AS sb
    FROM ks, daily a JOIN daily b ON b.idx = a.idx - ks.k
    GROUP BY k
)
SELECT k AS lag, n_pairs,
       {sql_round_det(
           "(CAST(sxy AS DOUBLE)"
           " - (CAST(sx AS DOUBLE) / n) * (sa + sb)"
           " + n_pairs * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))"
           " / nullif(CAST(sxx AS DOUBLE) - n * (CAST(sx AS DOUBLE) / n)"
           " * (CAST(sx AS DOUBLE) / n), 0.0)", 6)} AS acf
FROM pr, st
""",
    tags=("E7", "E15"),
)
def acf_daily_multilag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily event count at lags 1..{ACF_MAX_LAG}
    (standard estimator: full-series mean and variance in the
    denominator, lagged cross-products over the n-k overlapping days in
    the numerator). Expanded algebraically to exact integer sufficient
    statistics — sum(x_t * x_{{t-k}}), the head/tail sums, sum(x),
    sum(x^2) are all BIGINT — so the float work is one fixed scalar
    expression per lag over exact inputs.

    Scale shape: the corpus collapses to the calendar-bounded daily
    relation (one (day) exchange with map-side combine); the lag
    expansion explodes each of the ~30 rows into {ACF_MAX_LAG} lagged
    probes joined back against the daily relation (broadcast — both
    sides calendar-bounded), and the 1-row stats relation attaches as a
    broadcast cross join (the equi_depth totals idiom, whitelisted).
    """
    ev = load_table_parallel(spark, sf_dir, "events")
    # eager localCheckpoint: the calendar-bounded daily relation feeds
    # THREE subtrees (stats, lag probes, lag join side) whose pruned
    # plans differ, so ReuseExchange cannot merge them — without the
    # checkpoint the corpus would be scanned three times.
    daily = (
        ev.select(
            F.datediff(
                F.to_date("ts"), F.lit(ACF_EPOCH).cast("date")
            ).cast("bigint").alias("idx")
        )
        .groupBy("idx")
        .agg(F.count("*").alias("x"))
        .localCheckpoint(eager=True)
    )
    st = daily.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    probes = daily.select(
        "idx",
        "x",
        F.explode(F.sequence(F.lit(1), F.lit(ACF_MAX_LAG))).alias("k"),
    ).select("x", "k", (F.col("idx") - F.col("k")).alias("jdx"))
    lagged = probes.join(
        F.broadcast(daily.select(F.col("idx").alias("jdx"), F.col("x").alias("y"))),
        "jdx",
    )
    pr = lagged.groupBy("k").agg(
        F.count("*").alias("n_pairs"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum("x").alias("sa"),
        F.sum("y").alias("sb"),
    )
    j = pr.join(F.broadcast(st))
    xbar = F.col("sx").cast("double") / F.col("n")
    # nullif: a constant daily series has zero variance; ANSI division
    # would throw in BOTH engines.
    acf = (
        F.col("sxy").cast("double")
        - xbar * (F.col("sa") + F.col("sb"))
        + F.col("n_pairs") * xbar * xbar
    ) / F.nullif(
        F.col("sxx").cast("double") - F.col("n") * xbar * xbar, F.lit(0.0)
    )
    return j.select(
        F.col("k").cast("int").alias("lag"),
        "n_pairs",
        round_det(acf, 6).alias("acf"),
    )


# --------------------------------------------------------------------------
# ks_value_drift
# --------------------------------------------------------------------------

#: Reference window boundary (inclusive): first half of the month.
KS_SPLIT_DATE = "2024-01-15"

#: Asymptotic two-sample KS critical coefficient at alpha = 0.05.
KS_C_05 = 1.358


@register(
    "ks_value_drift",
    oracle=f"""
WITH b AS (
    SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
           CASE WHEN CAST(ts AS DATE) <= DATE '{KS_SPLIT_DATE}'
                THEN 1 ELSE 0 END AS half1
    FROM events
),
g AS (
    SELECT cents, sum(half1)::BIGINT AS c1, sum(1 - half1)::BIGINT AS c2
    FROM b GROUP BY cents
),
t AS (SELECT sum(c1)::BIGINT AS n1, sum(c2)::BIGINT AS n2,
             count(*)::BIGINT AS n_values FROM g),
c AS (
    SELECT sum(c1) OVER (ORDER BY cents)::BIGINT AS f1,
           sum(c2) OVER (ORDER BY cents)::BIGINT AS f2
    FROM g
),
d AS (
    SELECT max(abs(CAST(f1 AS DOUBLE) / nullif(n1, 0)
                   - CAST(f2 AS DOUBLE) / nullif(n2, 0))) AS raw_d
    FROM c, t
)
SELECT n1 AS n_ref, n2 AS n_cmp, n_values,
       {sql_round_det("raw_d", 6)} AS ks_d,
       {sql_round_det(
           f"{KS_C_05!r} * sqrt(CAST(n1 + n2 AS DOUBLE)"
           " / nullif(CAST(n1 AS DOUBLE) * n2, 0.0))", 6)}
           AS crit_05,
       CASE WHEN {sql_round_det("raw_d", 6)} > {sql_round_det(
           f"{KS_C_05!r} * sqrt(CAST(n1 + n2 AS DOUBLE)"
           " / nullif(CAST(n1 AS DOUBLE) * n2, 0.0))", 6)}
            THEN 1 ELSE 0 END AS drift_05
FROM d, t
""",
    tags=("E7", "E10"),
)
def ks_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test between the event value
    distribution of the first month half (ts <= {KS_SPLIT_DATE}) and
    the rest: D = max |F_ref - F_cmp| over the pooled support, the
    asymptotic critical value c(0.05) * sqrt((n1+n2)/(n1*n2)) with
    c = {KS_C_05}, and the drift call comparing the two ROUNDED values.
    The empirical CDFs are ratios of exact integer cumulative counts
    over exact integer cents, and max over doubles is
    order-independent, so D is bit-identical in both engines.

    Scale shape: the corpus collapses to the value-domain-bounded
    distinct-cents relation in one exchange (map-side combine); the
    cumulative window and the final max run over that bounded relation
    (the equi_depth_histogram class — its single-partition stages are
    whitelisted as bounded), and the 1-row totals attach as broadcast
    cross joins.
    """
    ev = load_table_parallel(spark, sf_dir, "events")
    b = ev.select(
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("cents"),
        F.when(
            F.to_date("ts") <= F.lit(KS_SPLIT_DATE).cast("date"), F.lit(1)
        ).otherwise(F.lit(0)).alias("half1"),
    )
    # eager localCheckpoint: the value-domain-bounded cents relation
    # feeds both the totals aggregate and the CDF window; their pruned
    # subtrees differ, so without it the corpus is scanned twice.
    g = (
        b.groupBy("cents")
        .agg(
            F.sum("half1").alias("c1"),
            F.sum(1 - F.col("half1")).alias("c2"),
        )
        .localCheckpoint(eager=True)
    )
    t = g.agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.count("*").alias("n_values"),
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    c = g.select(
        F.sum("c1").over(w).alias("f1"),
        F.sum("c2").over(w).alias("f2"),
    )
    # nullif: an empty half-window (1-row sweep) has n = 0; ANSI
    # division would throw in BOTH engines.
    d = c.join(F.broadcast(t)).agg(
        F.max(
            F.abs(
                F.col("f1").cast("double") / F.nullif(F.col("n1"), F.lit(0))
                - F.col("f2").cast("double") / F.nullif(F.col("n2"), F.lit(0))
            )
        ).alias("raw_d")
    )
    j = d.join(F.broadcast(t))
    crit = round_det(
        F.lit(KS_C_05)
        * F.sqrt(
            (F.col("n1") + F.col("n2")).cast("double")
            / F.nullif(F.col("n1").cast("double") * F.col("n2"), F.lit(0.0))
        ),
        6,
    )
    ks_d = round_det(F.col("raw_d"), 6)
    return j.select(
        F.col("n1").alias("n_ref"),
        F.col("n2").alias("n_cmp"),
        "n_values",
        ks_d.alias("ks_d"),
        crit.alias("crit_05"),
        F.when(ks_d > crit, F.lit(1)).otherwise(F.lit(0)).alias("drift_05"),
    )


# --------------------------------------------------------------------------
# anova_f_oneway
# --------------------------------------------------------------------------


@register(
    "anova_f_oneway",
    oracle=f"""
WITH s AS (
    SELECT event_type,
           count(*)::BIGINT AS n,
           sum(CAST(value AS DECIMAL(18,2))) AS sv,
           sum(CAST(value AS DECIMAL(9,2)) * CAST(value AS DECIMAL(9,2))) AS svv
    FROM events GROUP BY event_type
),
t AS (
    SELECT event_type, n,
           CAST(sv AS DOUBLE) AS sv, CAST(svv AS DOUBLE) AS svv,
           sum(n) OVER ()::BIGINT AS n_tot,
           CAST(sum(sv) OVER () AS DOUBLE) AS sv_tot,
           count(*) OVER ()::BIGINT AS k
    FROM s
),
terms AS (
    SELECT n_tot, k,
           CAST({sql_round_det(
               "n * (sv / n - sv_tot / n_tot) * (sv / n - sv_tot / n_tot)", 6)}
               AS DECIMAL(18,6)) AS ssb_term,
           CAST({sql_round_det("svv - sv * sv / n", 6)}
               AS DECIMAL(18,6)) AS ssw_term
    FROM t
),
agg AS (
    SELECT max(n_tot) AS n_total, max(k) AS k_groups,
           CAST(sum(ssb_term) AS DOUBLE) AS ssb,
           CAST(sum(ssw_term) AS DOUBLE) AS ssw
    FROM terms
)
SELECT k_groups, n_total,
       {sql_round_det("ssb", 2)} AS ss_between,
       {sql_round_det("ssw", 2)} AS ss_within,
       (k_groups - 1) AS dof1,
       (n_total - k_groups) AS dof2,
       {sql_round_det(
           "(ssb / nullif(k_groups - 1, 0))"
           " / nullif(ssw / nullif(n_total - k_groups, 0), 0.0)", 4)} AS f_stat,
       {sql_round_det("ssb / nullif(ssb + ssw, 0.0)", 6)} AS eta_sq
FROM agg
""",
    tags=("E7",),
)
def anova_f_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F test of mean event value across ALL event types
    (the k-arm generalization of ``welch_t_test_values``): between- and
    within-group sums of squares from exact per-type sufficient
    statistics, the F statistic, and the eta-squared effect size. Each
    group's SSB/SSW term is a fixed scalar over exact DECIMAL inputs,
    rounded to 6 dp and summed as DECIMAL — order-independent in both
    engines.

    Scale shape: one corpus scan collapsing to the |event_type|-bounded
    moment relation with map-side combine; the total windows, the term
    sums, and the final one-row selection all run over that bounded
    relation (single-partition stages whitelisted — the
    welch_t_test_values class).
    """
    ev = load_table_parallel(spark, sf_dir, "events").select("event_type", "value")
    s = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"),
        F.sum(
            F.col("value").cast("decimal(9,2)") * F.col("value").cast("decimal(9,2)")
        ).alias("svv"),
    )
    t = s.select(
        "event_type",
        "n",
        F.col("sv").cast("double").alias("sv"),
        F.col("svv").cast("double").alias("svv"),
        F.sum("n").over(Window.partitionBy()).cast("bigint").alias("n_tot"),
        F.sum(F.col("sv"))
        .over(Window.partitionBy())
        .cast("double")
        .alias("sv_tot"),
        F.count("*").over(Window.partitionBy()).cast("bigint").alias("k"),
    )
    gm = F.col("sv_tot") / F.col("n_tot")
    mean_i = F.col("sv") / F.col("n")
    terms = t.select(
        "n_tot",
        "k",
        round_det(F.col("n") * (mean_i - gm) * (mean_i - gm), 6)
        .cast("decimal(18,6)")
        .alias("ssb_term"),
        round_det(F.col("svv") - F.col("sv") * F.col("sv") / F.col("n"), 6)
        .cast("decimal(18,6)")
        .alias("ssw_term"),
    )
    agg = terms.agg(
        F.max("n_tot").alias("n_total"),
        F.max("k").alias("k_groups"),
        F.sum("ssb_term").cast("double").alias("ssb"),
        F.sum("ssw_term").cast("double").alias("ssw"),
    )
    msb = F.col("ssb") / F.nullif(F.col("k_groups") - 1, F.lit(0))
    msw = F.col("ssw") / F.nullif(F.col("n_total") - F.col("k_groups"), F.lit(0))
    return agg.select(
        "k_groups",
        "n_total",
        round_det(F.col("ssb"), 2).alias("ss_between"),
        round_det(F.col("ssw"), 2).alias("ss_within"),
        (F.col("k_groups") - 1).alias("dof1"),
        (F.col("n_total") - F.col("k_groups")).alias("dof2"),
        round_det(msb / F.nullif(msw, F.lit(0.0)), 4).alias("f_stat"),
        round_det(
            F.col("ssb") / F.nullif(F.col("ssb") + F.col("ssw"), F.lit(0.0)), 6
        ).alias("eta_sq"),
    )


# --------------------------------------------------------------------------
# mann_whitney_u
# --------------------------------------------------------------------------


@register(
    "mann_whitney_u",
    oracle=f"""
WITH b AS (
    SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
           CASE WHEN event_type = '{T_TEST_GROUP_A}' THEN 1 ELSE 0 END AS is_a
    FROM events
    WHERE event_type IN ('{T_TEST_GROUP_A}', '{T_TEST_GROUP_B}')
),
g AS (
    SELECT cents, sum(is_a)::BIGINT AS ca, sum(1 - is_a)::BIGINT AS cb
    FROM b GROUP BY cents
),
t AS (SELECT sum(ca)::BIGINT AS n1, sum(cb)::BIGINT AS n2,
             sum((ca + cb) * (ca + cb) * (ca + cb) - (ca + cb))::BIGINT AS ties
      FROM g),
c AS (
    SELECT ca, cb,
           (sum(ca + cb) OVER (ORDER BY cents)
            - (ca + cb))::BIGINT AS prev_cum
    FROM g
),
r AS (
    -- 2 * rank-sum of sample A stays integral under midrank ties:
    -- each tied block contributes ca * (2*prev + block + 1)
    SELECT sum(ca * (2 * prev_cum + ca + cb + 1))::BIGINT AS r1_twice
    FROM c
)
SELECT n1 AS n_a, n2 AS n_b,
       {sql_round_det("CAST(r1_twice AS DOUBLE) / 2.0"
                      " - CAST(n1 AS DOUBLE) * (n1 + 1) / 2.0", 1)} AS u_stat,
       {sql_round_det(
           "(CAST(r1_twice AS DOUBLE) / 2.0"
           " - CAST(n1 AS DOUBLE) * (n1 + 1) / 2.0"
           " - CAST(n1 AS DOUBLE) * n2 / 2.0)"
           " / nullif(sqrt((CAST(n1 AS DOUBLE) * n2 / 12.0)"
           " * ((n1 + n2 + 1)"
           " - CAST(ties AS DOUBLE) / (CAST(n1 + n2 AS DOUBLE)"
           " * (n1 + n2 - 1)))), 0.0)", 4)} AS z_stat
FROM r, t
""",
    tags=("E7", "E10"),
)
def mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank test between the '{T_TEST_GROUP_A}' and
    '{T_TEST_GROUP_B}' arms (the nonparametric twin of
    ``welch_t_test_values``): U from the midrank rank-sum of arm A and
    the normal-approximation z with the tie correction. Arithmetic is
    exact until the last step: the doubled rank-sum of a tied block,
    ``ca * (2*prev_cum + block + 1)``, is an exact BIGINT (midranks
    are half-integers, so twice the rank-sum is integral), and the tie
    term sums t^3 - t as BIGINT, so U and z are fixed scalar
    expressions over exact integers in both engines.

    Scale shape: the ks_value_drift template — one corpus exchange
    collapsing to the value-domain-bounded distinct-cents relation
    (map-side combine); the cumulative-rank window and the rank-sum /
    tie aggregates run over that bounded relation (whitelisted), and
    the 1-row totals attach as a broadcast cross join.
    """
    ev = (
        load_table_parallel(spark, sf_dir, "events")
        .where(F.col("event_type").isin(T_TEST_GROUP_A, T_TEST_GROUP_B))
        .select("event_type", "value")
    )
    b = ev.select(
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("cents"),
        F.when(F.col("event_type") == T_TEST_GROUP_A, F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_a"),
    )
    # eager localCheckpoint: same two-consumer shape as ks_value_drift
    # (totals + cumulative-rank window) — one corpus scan, not two.
    g = (
        b.groupBy("cents")
        .agg(
            F.sum("is_a").alias("ca"),
            F.sum(1 - F.col("is_a")).alias("cb"),
        )
        .localCheckpoint(eager=True)
    )
    blk = F.col("ca") + F.col("cb")
    t = g.agg(
        F.sum("ca").alias("n1"),
        F.sum("cb").alias("n2"),
        F.sum(blk * blk * blk - blk).alias("ties"),
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    c = g.select(
        "ca",
        "cb",
        (F.sum(blk).over(w) - blk).cast("bigint").alias("prev_cum"),
    )
    r = c.agg(
        F.sum(
            F.col("ca") * (2 * F.col("prev_cum") + F.col("ca") + F.col("cb") + 1)
        ).alias("r1_twice")
    )
    j = r.join(F.broadcast(t))
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nd = (F.col("n1") + F.col("n2")).cast("double")
    u = F.col("r1_twice").cast("double") / 2.0 - n1d * (F.col("n1") + 1) / 2.0
    sigma = F.sqrt(
        (n1d * n2d / 12.0)
        * (
            (F.col("n1") + F.col("n2") + 1)
            - F.col("ties").cast("double") / (nd * (nd - 1))
        )
    )
    z = (u - n1d * n2d / 2.0) / F.nullif(sigma, F.lit(0.0))
    return j.select(
        F.col("n1").alias("n_a"),
        F.col("n2").alias("n_b"),
        round_det(u, 1).alias("u_stat"),
        round_det(z, 4).alias("z_stat"),
    )
