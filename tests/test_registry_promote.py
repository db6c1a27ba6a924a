"""Registration-order contract: the driver samples the first ~50
registered queries, so promote()'s module rotation + pin_first lifting
IS the external verification surface. Pin it."""

from __future__ import annotations

import pytest

import kafka_stream_faust_deprecated_spark.queries  # noqa: F401  (registers + promotes)
from kafka_stream_faust_deprecated_spark.registry import _REGISTRY, promote


def test_round13_pins_lead_registration_order():
    names = list(_REGISTRY)
    assert names[0] == "flagship_sma_5row"
    # Round-13 contract (r10 verdict #1): pure freshness rotation — the
    # two r5-era rows-only sketches and three r6-era stalest green rows
    # lead, then the first 44 of the 49-query r7-era cohort
    # (alphabetical), with the cohort's last 5 queued at 51+.
    stalest = (
        "approx_count_distinct",
        "approx_percentile_price",
        "vocab_oov_coverage",
        "winsorized_quality_zscore",
        "zorder_layout_quality",
    )
    for i, q in enumerate(stalest):
        assert names.index(q) == 1 + i, f"{q} not at position {1 + i}"
    r7_fill = (
        "acf_daily_multilag",
        "agg_pricing_summary",
        "anova_f_oneway",
        "attribution_linear_touch",
        "benford_digit_audit",
        "beta_capm_daily",
        "bollinger_bands",
        "bpe_merge_pairs",
        "chi_square_independence",
        "conversion_latency_percentiles",
        "dedup_exact_documents",
        "distinct_hll_rollup",
        "dup_graph_kcore",
        "dup_graph_link_prediction",
        "dup_graph_reachability",
        "ewma_smoothing_capped",
        "fk_integrity_audit",
        "gapfill_forward_fill",
        "gini_concentration_index",
        "grouping_sets_events",
        "intraday_volume_curve",
        "ks_value_drift",
        "lateral_topk_per_nation",
        "mann_whitney_u",
        "math_functions",
        "max_drawdown_daily",
        "mixture_temperature_plan",
        "neardup_ngram_jaccard",
        "nearest_event_join",
        "ohlc_bars_daily",
        "order_reorder_intervals",
        "pk_uniqueness_audit",
        "psi_value_drift",
        "rsi_cutler",
        "sample_mixture_apply",
        "scan_filter_project",
        "seasonal_residual_anomalies",
        "session_path_mining",
        "sliding_window_events",
        "source_quantile_normalization",
        "stream_static_enrich",
        "string_functions",
        "symbol_return_correlation",
        "tumbling_window_events",
    )
    assert 1 + len(stalest) + len(r7_fill) == 50
    for i, q in enumerate(r7_fill):
        pos = 1 + len(stalest) + i
        assert names.index(q) == pos, f"{q} not at position {pos}"
    # Positions 51+ queue the r7-cohort remainder as the next prefix
    # (covered this round only if the driver samples deeper than 50).
    overflow = (
        "turnover_autocorr",
        "twap_daily",
        "vwap_daily",
        "weighted_median_price",
        "welch_t_test_values",
    )
    for i, q in enumerate(overflow):
        assert names.index(q) == 50 + i, f"{q} not queued at position {50 + i}"


def test_promote_rejects_unknown_pin():
    with pytest.raises(KeyError):
        promote((), pin_first=("not_a_query",))


def test_promote_is_stable_and_lossless():
    """promote() must never add/drop registrations and must preserve
    in-module relative order — the invariant the pin rotation in
    queries/__init__.py leans on every round."""
    before = dict(_REGISTRY)  # snapshot (name -> entry), insertion-ordered
    try:
        # Re-promote with a different module order and a couple of pins.
        promote(
            ("scalars", "relational"),
            pin_first=("datetime_functions", "filter_predicates"),
        )
        after = dict(_REGISTRY)
        # Lossless: exact same key set, exact same entry objects.
        assert set(after) == set(before)
        for k in before:
            assert after[k] is before[k]
        # Pins lead, in pin order.
        names = list(after)
        assert names[:2] == ["datetime_functions", "filter_predicates"]
        # Stable within a module: relative order of unpinned queries
        # from the same module is preserved.
        from collections import defaultdict

        seq_before, seq_after = defaultdict(list), defaultdict(list)
        pins = {"datetime_functions", "filter_predicates"}
        for name, spec in before.items():
            if name not in pins:
                seq_before[spec.fn.__module__].append(name)
        for name, spec in after.items():
            if name not in pins:
                seq_after[spec.fn.__module__].append(name)
        assert seq_before == seq_after
    finally:
        # Restore this round's registration order exactly.
        _REGISTRY.clear()
        _REGISTRY.update(before)
    assert list(_REGISTRY) == list(before)
