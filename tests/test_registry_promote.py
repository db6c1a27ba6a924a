"""Registration-order contract: the driver samples the first ~50
registered queries, so promote()'s module rotation + pin_first lifting
IS the external verification surface. Pin it."""

from __future__ import annotations

import pytest

import kafka_stream_faust_deprecated_spark.queries  # noqa: F401  (registers + promotes)
from kafka_stream_faust_deprecated_spark.registry import _REGISTRY, promote


def test_round10_pins_lead_registration_order():
    names = list(_REGISTRY)
    assert names[0] == "flagship_sma_5row"
    # Round-10 contract (r8 verdict #1): the sampled window leads with
    # the 8-query r9 queue — dedup_repeated_spans' FIRST driver row plus
    # the 7 pre-b9df45a r4 rows — then the two operators modified this
    # round (containment sketch, PCA), then the stalest (r5) cohort.
    queue = (
        "dedup_repeated_spans",
        "scd2_customer_history",
        "funnel_conversion",
        "cohort_retention",
        "tpch_q19_disjunctive_revenue",
        "tpch_q20_excess_supply",
        "tpch_q21_waiting_supplier",
        "tpch_q22_global_sales_opportunity",
    )
    for i, q in enumerate(queue):
        assert names.index(q) == 1 + i, f"{q} not at position {1 + i}"
    modified = ("neardup_containment_sketch", "embedding_pca_power_iteration")
    for i, q in enumerate(modified):
        assert names.index(q) == 9 + i, f"{q} not at position {9 + i}"
    # The r5 cohort fills the rest of the 50-query window.
    r5_fill = (
        "tpch_q2_min_cost_supplier",
        "tpch_q3_shipping_priority",
        "tpch_q4_order_priority",
        "tpch_q5_local_supplier_volume",
        "tpch_q6_forecast_revenue",
        "tpch_q7_volume_shipping",
        "tpch_q8_market_share",
        "tpch_q9_product_profit",
        "tpch_q10_returned_items",
        "tpch_q11_important_parts",
        "tpch_q12_late_shipment_priority",
        "tpch_q13_customer_distribution",
        "tpch_q14_promo_revenue",
        "tpch_q15_top_supplier",
        "tpch_q16_supplier_part_counts",
        "tpch_q17_small_quantity_revenue",
        "tpch_q18_large_volume_customer",
        "window_ranking",
        "window_lag_lead",
        "window_frames",
        "rollup_revenue",
        "cube_order_stats",
        "range_join_price_bands",
        "interval_join_events",
        "asof_join_signup",
        "dedup_latest_event",
        "percentile_summary",
        "pivot_status_revenue",
        "unpivot_pricing_metrics",
        "stats_moments",
        "price_histogram",
        "dedup_exact_keep_best",
        "events_dau_wau",
        "customer_rfm_segments",
        "dedup_cluster_size_histogram",
        "doc_pack_token_budget",
        "embedding_quantize_int8",
        "doc_chunk_overlap",
        "dsir_importance_weights",
    )
    assert 1 + len(queue) + len(modified) + len(r5_fill) == 50
    for q in r5_fill:
        assert names.index(q) < 50, f"{q} outside sampled prefix"
    # Positions 51+ queue the r5-cohort remainder as the r10 prefix
    # (covered this round only if the driver samples deeper than 50).
    overflow = (
        "pipeline_prepare_training",
        "event_transition_matrix",
        "source_shingle_overlap",
        "corpus_datacard",
        "dup_graph_pagerank",
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
        # Restore the round-10 registration order exactly.
        _REGISTRY.clear()
        _REGISTRY.update(before)
    assert list(_REGISTRY) == list(before)
