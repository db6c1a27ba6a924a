"""Registration-order contract: the driver samples the first ~50
registered queries, so promote()'s module rotation + pin_first lifting
IS the external verification surface. Pin it."""

from __future__ import annotations

import pytest

import kafka_stream_faust_deprecated_spark.queries  # noqa: F401  (registers + promotes)
from kafka_stream_faust_deprecated_spark.registry import _REGISTRY, promote


def test_round7_pins_lead_registration_order():
    names = list(_REGISTRY)
    assert names[0] == "flagship_sma_5row"
    # Round-7 contract (r6 verdict items #2/#3/#7): the 40 queries with
    # NO driver record ever (waves 5b-11 + the two queries that were in
    # no pin list) sit inside the driver's ~50-query sample window,
    # plus grouping_sets_events (second consecutive green row after its
    # r5 red) and the first post-rounding-conversion re-record heads of
    # relational/scalars/temporal/llm.
    backlog = (
        "sample_mixture_apply",
        "attribution_linear_touch",
        "nearest_event_join",
        "bpe_merge_pairs",
        "session_path_mining",
        "ewma_smoothing_capped",
        "conversion_latency_percentiles",
        "dup_graph_link_prediction",
        "order_reorder_intervals",
        "weighted_median_price",
        "source_quantile_normalization",
        "gini_concentration_index",
        "ohlc_bars_daily",
        "vwap_daily",
        "bollinger_bands",
        "rsi_cutler",
        "max_drawdown_daily",
        "symbol_return_correlation",
        "fk_integrity_audit",
        "pk_uniqueness_audit",
        "beta_capm_daily",
        "intraday_volume_curve",
        "turnover_autocorr",
        "mixture_temperature_plan",
        "benford_digit_audit",
        "psi_value_drift",
        "twap_daily",
        "seasonal_residual_anomalies",
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
        "gapfill_forward_fill",
        "stream_static_enrich",
    )
    for q in backlog + (
        "grouping_sets_events",
        "scan_filter_project",
        "agg_pricing_summary",
        "string_functions",
        "math_functions",
        "tumbling_window_events",
        "sliding_window_events",
        "dedup_exact_documents",
        "neardup_ngram_jaccard",
    ):
        assert names.index(q) < 50, f"{q} outside sampled prefix"
    # Overflow past the window continues the post-b9df45a re-record
    # debt (relational module next), so a driver sampling >50 helps.
    assert names[50] in ("filter_predicates", "agg_count_distinct")


def test_promote_unknown_pin_fails_loudly():
    """A typo'd pin must raise, not silently sample the wrong queries."""
    snapshot = list(_REGISTRY.items())
    try:
        with pytest.raises(KeyError, match="no_such_query"):
            promote(("flagship",), pin_first=("no_such_query",))
    finally:
        _REGISTRY.clear()
        _REGISTRY.update(snapshot)


def test_promote_is_stable_and_lossless():
    """Re-promoting reorders but never adds/drops registrations, and
    in-module relative order is preserved for unpinned queries."""
    snapshot = list(_REGISTRY.items())
    before = set(_REGISTRY)
    try:
        promote(("llm", "flagship"), pin_first=("flagship_sma_5row",))
        assert set(_REGISTRY) == before
        names = list(_REGISTRY)
        assert names[0] == "flagship_sma_5row"
        llm_names = [
            n for n, s in _REGISTRY.items()
            if s.fn.__module__.endswith(".llm")
        ]
        orig_llm = [
            n for n, s in snapshot if s.fn.__module__.endswith(".llm")
        ]
        assert llm_names == orig_llm  # stable within module
    finally:
        _REGISTRY.clear()
        _REGISTRY.update(snapshot)
