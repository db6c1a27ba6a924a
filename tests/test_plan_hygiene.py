"""Physical-plan hygiene for EVERY registered query (the 100 TB gate).

Correctness says a query's values are right; these assertions say its
PLAN would survive a 1000-executor cluster: no unbounded cartesian
products, no nested-loop joins except against provably-tiny broadcast
sides, and no single-partition exchanges except over bounded aggregate
relations. Each exemption is an explicit whitelist entry with the
reason — adding a new scale hazard means consciously editing this file,
not silently shipping it.
"""

from __future__ import annotations

import pytest

from kafka_stream_faust_deprecated_spark.registry import all_specs
from tests.conftest import SF_DIR

#: BroadcastNestedLoopJoin is acceptable ONLY when the broadcast side is
#: O(1)-sized by construction (a handful of rows / one aggregate row) —
#: the probe scan stays a single pass with no shuffle.
BNLJ_WHITELIST = {
    "knn_cosine_bruteforce": "broadcast side = the 5-query set (exact baseline)",
    "range_join_price_bands": "broadcast side = fixed price-band table",
    "tfidf_top_terms": "broadcast side = the 1-row global doc count",
    "kmeans_lloyd_step": "broadcast side = the k x dim centroid table",
    "scalar_subquery_orders": "broadcast side = the 1-row global average",
    "funnel_conversion": "broadcast sides = the three 1-row stage counts",
    "tpch_q11_important_parts": "broadcast side = the 1-row channel-total aggregate",
    "tpch_q20_excess_supply": "broadcast side = the 1-row half-average threshold",
    "tpch_q22_global_sales_opportunity": "broadcast side = the 1-row global avg balance",
    "doc_unigram_nll": "broadcast side = the 1-row corpus token total",
    "price_histogram": "broadcast side = the 1-row min/max bounds",
    "customer_rfm_segments": "broadcast side = the 1-row tercile cutoffs",
}

#: Exchange SinglePartition is acceptable ONLY over relations whose
#: cardinality is bounded independent of data size.
SINGLE_PARTITION_WHITELIST = {
    "tfidf_top_terms": "global count aggregate: 1 row",
    "window_frames": "bucket-level offsets: O(value_domain / width) rows",
    "scalar_subquery_orders": "global average aggregate: 1 row",
    "tpch_q6_forecast_revenue": "global revenue aggregate: 1 partial row per task",
    "tpch_q14_promo_revenue": "global promo-share aggregate: 1 partial row per task",
    "funnel_conversion": "three 1-row stage-count aggregates",
    "tpch_q11_important_parts": "global channel-total aggregate: 1 row",
    "tpch_q15_top_supplier": "global max-revenue aggregate: 1 row",
    "tpch_q17_small_quantity_revenue": "global revenue sum: 1 partial row per task",
    "tpch_q19_disjunctive_revenue": "global revenue sum: 1 partial row per task",
    "tpch_q20_excess_supply": "global threshold aggregate: 1 row",
    "tpch_q22_global_sales_opportunity": "global avg-balance aggregate: 1 row",
    "mixture_language_sampling": "share normalization windows: 1 row per language",
    "doc_unigram_nll": "global token-total aggregate: 1 row",
    "price_histogram": "share normalization window: HIST_BUCKETS rows",
    "customer_rfm_segments": "global percentile aggregate: 1 row",
    "dedup_cluster_size_histogram": "global singleton-count aggregate: 1 row",
}


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for name, spec in sorted(all_specs().items()):
        df = spec.fn(spark, SF_DIR)
        out[name] = df._jdf.queryExecution().executedPlan().toString()
    return out


def test_no_cartesian_products(plans):
    offenders = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert not offenders, f"unbounded cartesian products in: {offenders}"


def test_nested_loop_joins_only_with_tiny_broadcast(plans):
    offenders = [
        n
        for n, p in plans.items()
        if "NestedLoop" in p and n not in BNLJ_WHITELIST
    ]
    assert not offenders, (
        f"nested-loop joins outside the tiny-broadcast whitelist: {offenders}"
    )


def test_single_partition_exchanges_only_over_bounded_relations(plans):
    offenders = [
        n
        for n, p in plans.items()
        if "Exchange SinglePartition" in p and n not in SINGLE_PARTITION_WHITELIST
    ]
    assert not offenders, (
        f"single-partition exchanges outside the bounded whitelist: {offenders}"
    )


def test_whitelists_are_not_stale(plans):
    """An exemption for a query that no longer trips the flag (or no
    longer exists) should be deleted, keeping the whitelists honest."""
    for name in BNLJ_WHITELIST:
        assert name in plans and "NestedLoop" in plans[name], name
    for name in SINGLE_PARTITION_WHITELIST:
        assert name in plans and "Exchange SinglePartition" in plans[name], name
