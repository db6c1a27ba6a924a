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
    "scalar_subquery_orders": "broadcast side = the 1-row global average",
    "funnel_conversion": "broadcast sides = the three 1-row stage counts",
    "tpch_q22_global_sales_opportunity": "broadcast side = the 1-row global avg balance",
    "doc_unigram_nll": "broadcast side = the 1-row corpus token total",
    "dsir_importance_weights": "broadcast side = the 1-row LM normalizer totals",
    "price_histogram": "broadcast side = the 1-row min/max bounds",
    "customer_rfm_segments": "broadcast side = the 1-row tercile cutoffs",
    "dup_graph_pagerank": "broadcast side = the 1-row node-count aggregate",
    "ann_cosine_pq": "broadcast side = the 5-query ADC lookup tables (~2 KB/query)",
    "hot_key_profile": "broadcast side = the 1-row totals aggregate",
    "equi_depth_histogram": "broadcast side = the 1-row total-count aggregate",
    "bm25_retrieval_topk": "broadcast side = the 1-row avgdl/N aggregate",
    "train_val_test_split": "broadcast side = the 1-row total-count aggregate",
    "doc_perplexity_bigram": "broadcast side = the 1-row LM-total aggregate",
    "pmi_token_cooccurrence": "broadcast side = the 1-row corpus doc count",
    "hard_negative_mining": (
        "broadcast side = the 8-row query set; the label<>label predicate "
        "is non-equi by design (same class as knn_cosine_bruteforce)"
    ),
    "timeseries_gap_fill": "broadcast side = the 1-row global day span",
    "session_path_mining": "broadcast side = the 1-row session-total aggregate",
    "conversion_latency_percentiles": (
        "broadcast side = the 1-row signup-count aggregate"
    ),
    "mixture_temperature_plan": (
        "broadcast side = the 1-row corpus-totals aggregate "
        "(the equi_depth_histogram class)"
    ),
    "acf_daily_multilag": (
        "broadcast side = the 1-row series-stats aggregate "
        "(the equi_depth_histogram totals class)"
    ),
    "ks_value_drift": "broadcast sides = the two 1-row sample-totals aggregates",
    "mann_whitney_u": "broadcast side = the 1-row sample-totals/ties aggregate",
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
    "tpch_q11_important_parts": (
        "channel-total window over the per-part agg output: "
        "part-catalog-bounded (r15 window decorrelation)"
    ),
    "tpch_q15_top_supplier": (
        "global-max window over the per-supplier agg output: "
        "supplier-catalog-bounded (r15 window decorrelation)"
    ),
    "tpch_q17_small_quantity_revenue": "global revenue sum: 1 partial row per task",
    "tpch_q19_disjunctive_revenue": "global revenue sum: 1 partial row per task",
    "tpch_q20_excess_supply": (
        "half-average window over the per-supplier agg output: "
        "supplier-catalog-bounded (r15 window decorrelation)"
    ),
    "tpch_q22_global_sales_opportunity": "global avg-balance aggregate: 1 row",
    "mixture_language_sampling": "share normalization windows: 1 row per language",
    "corpus_datacard": "share normalization window: 1 row per (lang, source)",
    "dup_graph_pagerank": "global node-count aggregate: 1 row",
    "doc_unigram_nll": "global token-total aggregate: 1 row",
    "dsir_importance_weights": "global LM-normalizer aggregate: 1 row",
    "price_histogram": "share normalization window: HIST_BUCKETS rows",
    "customer_rfm_segments": "global percentile aggregate: 1 row",
    "dedup_cluster_size_histogram": "global singleton-count aggregate: 1 row",
    "table_profile_orders": "global profiling aggregate: 1 partial row per task",
    "sample_mixture_apply": "share normalization windows: 1 row per language",
    "hot_key_profile": (
        "rank window over the ALREADY-LIMITED top-N rows (HOT_KEY_TOP_N=20) "
        "+ the 1-row totals aggregate"
    ),
    "equi_depth_histogram": (
        "cumulative count over the DISTINCT-VALUE relation — bounded by the "
        "2-decimal price domain, not the corpus (same class as window_frames)"
    ),
    "bm25_retrieval_topk": "global avgdl/N aggregate: 1 partial row per task",
    "train_val_test_split": "global doc-count aggregate: 1 partial row per task",
    "doc_perplexity_bigram": "global LM-total aggregate: 1 partial row per task",
    "pmi_token_cooccurrence": (
        "rank window over the >=PMI_MIN_PAIR-support pair relation — "
        "vocabulary-bounded, not corpus-bounded (same class as "
        "hot_key_profile) + the 1-row doc-count aggregate"
    ),
    "timeseries_gap_fill": "global day-span aggregate: 1 row",
    "categorical_mutual_information": (
        "MI-total / share windows over the (lang, source) joint relation — "
        "catalog-bounded (|lang| x |source| rows, the corpus_datacard class)"
    ),
    "skyline_pareto_frontier": (
        "sort-sweep running max over the DISTINCT-PRICE relation "
        "(2-decimal price domain, the equi_depth_histogram class) + "
        "frontier rank over the skyline itself (<= |size domain| rows: "
        "frontier sizes strictly increase)"
    ),
    "session_path_mining": (
        "rank window over the path relation — bounded by "
        "|event_type|^PATH_LEN, not the corpus"
    ),
    "conversion_latency_percentiles": (
        "global latency percentile aggregate over the per-user delay "
        "relation (<= |users| rows) after two per-user min-aggregates"
    ),
    "weighted_median_price": (
        "cumulative-weight window over the DISTINCT-PRICE level "
        "relation — bounded by the 2-decimal price domain (the "
        "equi_depth_histogram class)"
    ),
    "mixture_temperature_plan": (
        "global corpus-totals aggregate over the (lang, source) bucket "
        "relation: 1 partial row per task (the corpus_datacard class)"
    ),
    "benford_digit_audit": (
        "total window over the 9-row digit relation (the "
        "price_histogram class)"
    ),
    "chi_square_independence": (
        "marginal/total windows + the global chi2 aggregate over the "
        "(lang, source) cell relation — catalog-bounded (the "
        "categorical_mutual_information class)"
    ),
    "welch_t_test_values": (
        "conditional-aggregation pivot over the 2-row per-arm moment "
        "relation: 1 partial row per task"
    ),
    "acf_daily_multilag": (
        "global series-stats aggregate over the calendar-bounded daily "
        "relation: 1 partial row per task"
    ),
    "ks_value_drift": (
        "cumulative-CDF window over the DISTINCT-CENTS relation — "
        "bounded by the 2-decimal value domain (the "
        "equi_depth_histogram class) + the 1-row totals/max aggregates"
    ),
    "anova_f_oneway": (
        "total windows + SSB/SSW sums over the |event_type|-bounded "
        "moment relation: 1 partial row per task (the "
        "welch_t_test_values class)"
    ),
    "mann_whitney_u": (
        "cumulative-rank window over the DISTINCT-CENTS relation — "
        "bounded by the 2-decimal value domain (the "
        "equi_depth_histogram class) + the 1-row rank-sum/ties "
        "aggregates"
    ),
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


#: Corpus row-id columns: a Window or Exchange partitioned on one of
#: these keys processes O(corpus) groups of O(1) rows — the degenerate
#: shuffle shape that slipped into kmeans/IVF assignment in round 4
#: (broadcast-join fan-out ranked by row_number over partitionBy(vec_id),
#: shuffling O(n*k*dim) bytes for a per-row argmax that needs none).
CORPUS_ROW_IDS = ("vec_id", "doc_id")

#: Queries allowed a Window partitioned on a corpus row id, each with
#: the reason the window is NOT a fan-out rank (e.g. the partition key
#: is on a bounded side, or the window input is already per-row unique).
ROW_ID_WINDOW_WHITELIST: dict[str, str] = {
    "tfidf_top_terms": (
        "per-document top-k over the doc's OWN (doc_id, term) aggregate — "
        "group size is the doc's distinct-term count, not a join fan-out"
    ),
    "bm25_retrieval_topk": (
        "dl window sums the doc's OWN (doc_id, term) tf rows — group size "
        "is the doc's distinct-term count, not a join fan-out (same class "
        "as tfidf_top_terms)"
    ),
}

def _row_id_keyed_data_exchange(plan: str) -> bool:
    """True iff the plan has a DATA exchange keyed on a corpus row id.

    Goes through ``plans.exchange_census`` so the loader's parallelism
    shim (since r14 a hash REPARTITION_BY_NUM on the table's unique key
    — io.SHIM_KEYS — instead of a round-robin exchange that paid a
    hidden local sort) is classified as a shim, not as row-id data
    movement: the shim is absent on real cluster scans, which is the
    scale property this test guards."""
    from kafka_stream_faust_deprecated_spark.plans import exchange_census

    census = exchange_census(plan)
    return any(
        rid in [k.strip() for k in keys.split(",")]
        for keys in census["data_keys"]
        for rid in CORPUS_ROW_IDS
    )


#: Queries whose docstring says zero/no shuffle about ONE stage while
#: another stage legitimately shuffles on a row id.
ZERO_SHUFFLE_CLAIM_WHITELIST: dict[str, str] = {
    "dedup_connected_components": (
        "'no shuffle' refers to the singleton cluster_size literal; the "
        "label-propagation loop joins the contracted dup-graph keyed on "
        "node id — O(dup-graph), never O(corpus)"
    ),
    "semantic_dedup_semdedup": (
        "'zero-shuffle' refers to the centroid-assignment projection; the "
        "final survivor anti-join exchanges on vec_id but is column-pruned "
        "to the skinny (vec_id, cid) pair — never the vectors"
    ),
}


def test_no_windows_partitioned_on_corpus_row_ids(plans):
    """A Window partitioned by vec_id/doc_id means every corpus row is
    its own window group — with a join fan-out upstream that is an
    O(n*k) shuffle to compute a per-row argmax/rank that a plain
    projection (array ops over a literal/broadcast side) computes with
    zero shuffle. This is the exact regression class of round 4's
    kmeans_lloyd_step / ann_cosine_ivf plans; this test fails if either
    is ever restored."""
    import re

    pat = re.compile(
        r"(?:Window|WindowGroupLimit) \[[^\]]*\], \[(%s)#\d+"
        % "|".join(CORPUS_ROW_IDS)
    )
    offenders = [
        n
        for n, p in plans.items()
        if n not in ROW_ID_WINDOW_WHITELIST and pat.search(p)
    ]
    assert not offenders, (
        f"Window partitioned on a corpus row id (join-fan-out rank?) in: {offenders}"
    )


def test_zero_shuffle_docstring_claims_hold(plans):
    """Round 4's kmeans regression hid behind a docstring that promised
    'zero shuffle' assignment while the plan shuffled n*k rows on
    vec_id. Keep docstrings honest mechanically: any registered query
    whose docstring claims zero/no shuffle must have a plan with no
    Exchange keyed on a corpus row id."""
    claimers = [
        name
        for name, spec in all_specs().items()
        if spec.fn.__doc__
        and ("zero shuffle" in spec.fn.__doc__ or "zero-shuffle" in spec.fn.__doc__
             or "no shuffle" in spec.fn.__doc__)
    ]
    assert claimers, "expected at least kmeans/IVF to claim zero-shuffle assignment"
    offenders = [
        n
        for n in claimers
        if n not in ZERO_SHUFFLE_CLAIM_WHITELIST
        and _row_id_keyed_data_exchange(plans[n])
    ]
    assert not offenders, (
        f"docstring claims zero/no shuffle but plan shuffles on a corpus row id: {offenders}"
    )


def test_whitelists_are_not_stale(plans):
    """An exemption for a query that no longer trips the flag (or no
    longer exists) should be deleted, keeping the whitelists honest."""
    for name in BNLJ_WHITELIST:
        assert name in plans and "NestedLoop" in plans[name], name
    for name in SINGLE_PARTITION_WHITELIST:
        assert name in plans and "Exchange SinglePartition" in plans[name], name
    import re

    pat = re.compile(
        r"(?:Window|WindowGroupLimit) \[[^\]]*\], \[(%s)#\d+"
        % "|".join(CORPUS_ROW_IDS)
    )
    for name in ROW_ID_WINDOW_WHITELIST:
        assert name in plans and pat.search(plans[name]), name
    for name in ZERO_SHUFFLE_CLAIM_WHITELIST:
        assert name in plans and _row_id_keyed_data_exchange(plans[name]), name


def test_no_forced_broadcast_of_candidate_relations():
    """r8 verdict #2: candidate-pair relations produced by LSH/sketch
    candidate generation grow with corpus duplication — at 100 TB with
    heavy boilerplate a FORCED broadcast of one is the failure mode a
    dedup pass must not have. The verify stages leave the strategy to
    AQE (which broadcasts iff the relation is actually small). Enforce
    mechanically: no query module may hint-broadcast a relation bound
    to a candidate/pair/member name."""
    import pathlib
    import re

    import kafka_stream_faust_deprecated_spark.queries as qpkg

    qdir = pathlib.Path(qpkg.__file__).parent
    # Whole-file match (not line-by-line): a formatter can split
    # F.broadcast(\n    cand) across lines and a line scanner would
    # silently stop enforcing the invariant.
    pat = re.compile(r"F\.broadcast\(\s*(cand|pairs|members|dup_members)\b")
    offenders = []
    for p in sorted(qdir.glob("*.py")):
        src = p.read_text()
        for m in pat.finditer(src):
            line = src.count("\n", 0, m.start()) + 1
            offenders.append(f"{p.name}:{line}")
    assert not offenders, (
        f"forced broadcast of a corpus-growing candidate relation: {offenders}"
    )
