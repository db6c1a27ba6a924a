"""Registration-order contract: the driver samples the first ~50
registered queries, so promote()'s module rotation + pin_first lifting
IS the external verification surface. Pin it."""

from __future__ import annotations

import pytest

import kafka_stream_faust_deprecated_spark.queries  # noqa: F401  (registers + promotes)
from kafka_stream_faust_deprecated_spark.registry import _REGISTRY, promote


def test_round16_pins_lead_registration_order():
    names = list(_REGISTRY)
    assert names[0] == "flagship_sma_5row"
    # Round-16 contract (r13 verdict #1): pure freshness rotation — the
    # four r9-era stalest green rows lead (the r15 prefix's 51+
    # overflow the driver never reached), then the first 45 of the
    # 49-query r10-era cohort (alphabetical), with the cohort's last 4
    # queued at 51+. This window clears all debt older than r10.
    stalest = (
        "unpivot_pricing_metrics",
        "window_frames",
        "window_lag_lead",
        "window_ranking",
    )
    for i, q in enumerate(stalest):
        assert names.index(q) == 1 + i, f"{q} not at position {1 + i}"
    r10_fill = (
        "ann_cosine_ivf",
        "ann_cosine_ivfpq",
        "ann_cosine_pq",
        "basket_copurchase_rules",
        "bm25_retrieval_topk",
        "categorical_mutual_information",
        "corpus_datacard",
        "cusum_changepoint",
        "dedup_incremental_ingest",
        "doc_boilerplate_ngrams",
        "doc_perplexity_bigram",
        "doc_quality_gopher",
        "domain_cap_sampling",
        "dup_graph_pagerank",
        "dup_graph_triangle_count",
        "embedding_norm_outliers",
        "entity_resolution_blocked",
        "equi_depth_histogram",
        "event_transition_matrix",
        "global_shuffle_shards",
        "groupwise_linear_trend",
        "hard_negative_mining",
        "heavy_hitters_cms_estimate",
        "heavy_hitters_exact",
        "hot_key_profile",
        "incremental_agg_maintenance",
        "interval_coverage_islands",
        "join_bloom_prefilter",
        "kmeans_lloyd_step",
        "kmeans_train_3iter",
        "label_propagation_communities",
        "lang_confusion_matrix",
        "merge_upsert_snapshot",
        "minhash_estimate_calibration",
        "neardup_shingle_containment",
        "pipeline_prepare_training",
        "pmi_token_cooccurrence",
        "robust_mad_outliers",
        "sample_weighted_aes",
        "seasonal_decompose_events",
        "semantic_dedup_semdedup",
        "sessionize_capped",
        "skyline_pareto_frontier",
        "source_shingle_overlap",
        "source_unigram_divergence",
    )
    assert 1 + len(stalest) + len(r10_fill) == 50
    for i, q in enumerate(r10_fill):
        pos = 1 + len(stalest) + i
        assert names.index(q) == pos, f"{q} not at position {pos}"
    # Positions 51+ queue the r10-cohort remainder as the next prefix
    # (covered this round only if the driver samples deeper than 50).
    overflow = (
        "table_profile_orders",
        "timeseries_gap_fill",
        "token_zipf_slope",
        "train_val_test_split",
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
