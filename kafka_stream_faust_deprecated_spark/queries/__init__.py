"""Query library — importing this package registers every query.

Modules map to SURVEY.md §7 milestones:

* ``flagship``   — M0: batch twin of the reference's sliding SMA
* ``relational`` — M1: scans/filters/joins/aggs/sorts/set ops (E1-E4, E7, E12, E13)
* ``scalars``    — M2: string/date/math/array/JSON functions (E14-E18)
* ``analytic``   — M3: SQL window functions, rollup/cube, range + as-of
                   joins, approx distinct, batch dedup (E5-E6, E8-E11, E21)
* ``llm``        — M5: dedup / similarity / text analysis / multimodal
                   (E23-E26)
* ``extras``     — overflow operators added after round 4's freeze
                   (promoted to the front of the round-5 sampled prefix)
"""

from kafka_stream_faust_deprecated_spark.queries import flagship  # noqa: F401

# Imports are NOT guarded: a broken module must fail the registry load
# loudly, not silently shrink the verified query surface.
#
# ORDER MATTERS for external correctness sampling: the driver checks the
# first ~50 registered queries in registration order, so the prefix
# ROTATES each round toward whichever queries have the weakest driver
# record — never away from them. Rounds 1-3 sampled the relational/
# scalars/analytic/temporal surface; round 4 rotated llm/tpch/scale to
# the front for their first record (49/50 green). Round 5 rotates the
# never-driver-checked tail in: extras (the r4 overflow four PLUS every
# operator added during round 5 — chunking, DSIR, SemDeDup, source
# overlap, transition matrix, prepare_training, and the k-means training
# loop, relocated from llm so it lands inside the prefix) and analytic
# (whose newest entries, price_histogram / approx_percentile_price,
# postdate the r1-3 records), followed by tpch (so the repaired q12
# gets its green row) and temporal/relational for re-confirmation.
# flagship stays first — it's the entry query. The full registered
# surface is still self-checked every round via scripts/driver_sim.py →
# SELFCHECK_r{N}.json, and `--perm` sweeps shuffle the order to catch
# session-conf order-dependence the fixed prefix could hide.
for _mod in (
    "extras",
    "layout",
    "curation",
    "mining",
    "robust",
    "ticker",
    "audit",
    "monitor",
    "inference",
    "analytic",
    "temporal",
    "relational",
    "scalars",
    "llm",
    "tpch",
    "scale",
):
    __import__(f"kafka_stream_faust_deprecated_spark.queries.{_mod}")

# Import order alone can't pin the prefix (extras' oracle builders
# import llm at decoration time, registering llm's queries first), so
# the rotation is applied explicitly after every module has loaded.
from kafka_stream_faust_deprecated_spark.registry import promote as _promote

# Round-8 prefix (exactly 50): CORRECTNESS_r06 landed 50/50 green on
# the previous prefix, so every pin there now has a driver row. This
# round clears the verification backlog the round-6 verdict ranked #1:
# the 40 registered queries with NO driver record ever (waves 5b-11
# plus gapfill_forward_fill / stream_static_enrich, which were in no
# pin list), plus grouping_sets_events for a second consecutive green
# row (it was the r5 red row), plus 8 head queries of relational/
# scalars/temporal/llm whose driver rows predate the round-5 rounding
# conversion (commit b9df45a) — starting verdict item #3 early. The
# module order after the pins continues the re-record debt so any
# sampling overflow lands on it. NO new queries this round: surface
# growth is frozen until the driver backlog clears (verdict #2).
_promote(
    (
        "flagship",
        "relational",
        "scalars",
        "temporal",
        "llm",
        "analytic",
        "extras",
        "layout",
        "curation",
        "mining",
        "ticker",
        "audit",
        "monitor",
        "inference",
        "robust",
        "tpch",
        "scale",
    ),
    pin_first=(
        "flagship_sma_5row",
        # never driver-sampled: index-50 demotion from the r6 window
        "sample_mixture_apply",
        # wave 5b — never driver-sampled
        "attribution_linear_touch",
        "nearest_event_join",
        "bpe_merge_pairs",
        # wave 6 — never driver-sampled
        "session_path_mining",
        "ewma_smoothing_capped",
        "conversion_latency_percentiles",
        "dup_graph_link_prediction",
        # wave 7 — never driver-sampled
        "order_reorder_intervals",
        "weighted_median_price",
        "source_quantile_normalization",
        "gini_concentration_index",
        # wave 8 (queries/ticker.py) — never driver-sampled
        "ohlc_bars_daily",
        "vwap_daily",
        "bollinger_bands",
        "rsi_cutler",
        "max_drawdown_daily",
        "symbol_return_correlation",
        # wave 9 (queries/audit.py) — never driver-sampled
        "fk_integrity_audit",
        "pk_uniqueness_audit",
        "beta_capm_daily",
        "intraday_volume_curve",
        "turnover_autocorr",
        "mixture_temperature_plan",
        # wave 10 (queries/monitor.py) — never driver-sampled
        "benford_digit_audit",
        "psi_value_drift",
        "twap_daily",
        "seasonal_residual_anomalies",
        # wave 11 (queries/inference.py + graph/sketch/SQL-surface) —
        # never driver-sampled
        "chi_square_independence",
        "welch_t_test_values",
        "acf_daily_multilag",
        "ks_value_drift",
        "anova_f_oneway",
        "mann_whitney_u",
        "dup_graph_kcore",
        "dup_graph_reachability",
        "distinct_hll_rollup",
        "lateral_topk_per_nation",
        # in NO previous pin list and never sampled (r6 verdict called
        # these two out by name)
        "gapfill_forward_fill",
        "stream_static_enrich",
        # r5 red row, repaired + green in r6 — a second consecutive
        # green row closes the one-red-row-per-round history (verdict
        # item #7)
        "grouping_sets_events",
        # post-b9df45a re-record heads (verdict item #3, started early
        # with the slots left in the 50-query window; the rest of these
        # modules follows immediately after the pins in module order)
        "scan_filter_project",
        "agg_pricing_summary",
        "string_functions",
        "math_functions",
        "tumbling_window_events",
        "sliding_window_events",
        "dedup_exact_documents",
        "neardup_ngram_jaccard",
    ),
)
