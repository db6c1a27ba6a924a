"""Registration-order contract: the driver samples the first ~50
registered queries, so promote()'s module rotation + pin_first lifting
IS the external verification surface. Pin it."""

from __future__ import annotations

import pytest

import kafka_stream_faust_deprecated_spark.queries  # noqa: F401  (registers + promotes)
from kafka_stream_faust_deprecated_spark.registry import _REGISTRY, promote


def test_round14_pins_lead_registration_order():
    names = list(_REGISTRY)
    assert names[0] == "flagship_sma_5row"
    # Round-14 contract (r11 verdict #1): pure freshness rotation — the
    # five r7-era stalest green rows lead (the r13 prefix's 51+
    # overflow the driver never reached), then the first 44 of the
    # 48-query r8-era cohort (alphabetical), with the cohort's last 4
    # queued at 51+.
    stalest = (
        "turnover_autocorr",
        "twap_daily",
        "vwap_daily",
        "weighted_median_price",
        "welch_t_test_values",
    )
    for i, q in enumerate(stalest):
        assert names.index(q) == 1 + i, f"{q} not at position {1 + i}"
    r8_fill = (
        "agg_count_distinct",
        "ann_cosine_lsh",
        "anti_join_customers",
        "array_functions",
        "bitwise_functions",
        "contamination_ngram_overlap",
        "datetime_functions",
        "dedup_connected_components",
        "doc_fingerprint_minhash",
        "doc_quality_score",
        "doc_repetition_ratios",
        "doc_token_counts_bpe",
        "doc_token_stats",
        "doc_unigram_nll",
        "filter_predicates",
        "join_broadcast_dims_revenue",
        "join_full_outer",
        "join_left_with_nulls",
        "join_orders_customer",
        "join_salted_skew",
        "json_agg_by_key",
        "json_functions",
        "json_structured",
        "knn_cosine_bruteforce",
        "lang_id_lexicon",
        "map_functions",
        "mixture_language_sampling",
        "multimodal_extract",
        "multimodal_frame_sample",
        "neardup_embedding_cosine",
        "neardup_minhash_lsh",
        "neardup_simhash",
        "null_conditional_functions",
        "pandas_grouped_agg",
        "pandas_grouped_map_zscore",
        "pandas_scalar_textfeat",
        "pipeline_curate",
        "sample_stratified_hash",
        "scalar_subquery_orders",
        "semi_join_customers",
        "session_window_events",
        "set_ops_custkeys",
        "stream_stream_join_events",
        "tfidf_top_terms",
    )
    assert 1 + len(stalest) + len(r8_fill) == 50
    for i, q in enumerate(r8_fill):
        pos = 1 + len(stalest) + i
        assert names.index(q) == pos, f"{q} not at position {pos}"
    # Positions 51+ queue the r8-cohort remainder as the next prefix
    # (covered this round only if the driver samples deeper than 50).
    overflow = (
        "topk_orders_global",
        "topk_per_group",
        "udtf_word_bigrams",
        "variant_json_path",
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
