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

# Round-9 prefix: CORRECTNESS_r07 landed 49/50 green + 1 rows-only-by-
# design on the previous prefix, clearing the never-sampled backlog.
# This round finishes the r7-verdict #1 item — the post-b9df45a
# (round-5 rounding conversion) driver re-record: EVERY query whose
# latest driver row predates the conversion (r4 or earlier — the
# remaining relational/scalars/temporal/llm bodies beyond the 8 heads
# r7 re-recorded, plus the scale-module head) rotates into the sampled
# window now; the 7 that don't fit (scale tail + tpch q19-q22, r4
# rows) are pinned IMMEDIATELY after position 50 so they form the r9
# prefix (or get covered if the driver samples deeper). Slot 2 goes to
# the ONE new query this round, neardup_containment_sketch — the
# verdict-#2-mandated 100 TB containment path, which needs its first
# driver row. After this window, every green row in the ledger except
# those 7 pins-in-waiting is post-conversion current-code.
_promote(
    (
        "flagship",
        "scale",
        "tpch",
        "llm",
        "relational",
        "scalars",
        "temporal",
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
    ),
    pin_first=(
        "flagship_sma_5row",
        # NEW this round (r7 verdict #2): the one-sided MinHash
        # containment sketch — first driver row
        "neardup_containment_sketch",
        # llm module, driver rows r1-r4 only (pre-conversion)
        "neardup_minhash_lsh",
        "neardup_simhash",
        "knn_cosine_bruteforce",
        "ann_cosine_lsh",
        "neardup_embedding_cosine",
        "doc_token_stats",
        "doc_token_counts_bpe",
        "doc_quality_score",
        "lang_id_lexicon",
        "tfidf_top_terms",
        "doc_fingerprint_minhash",
        "multimodal_extract",
        "multimodal_frame_sample",
        "sample_stratified_hash",
        "doc_unigram_nll",
        "mixture_language_sampling",
        "dedup_connected_components",
        "doc_repetition_ratios",
        "contamination_ngram_overlap",
        "pipeline_curate",
        # relational module, driver rows r1-r4 only
        "filter_predicates",
        "agg_count_distinct",
        "join_orders_customer",
        "join_left_with_nulls",
        "join_full_outer",
        "join_broadcast_dims_revenue",
        "semi_join_customers",
        "anti_join_customers",
        "topk_orders_global",
        "topk_per_group",
        "set_ops_custkeys",
        "pandas_grouped_agg",
        "pandas_grouped_map_zscore",
        "scalar_subquery_orders",
        # scalars module, driver rows r1-r4 only
        "datetime_functions",
        "array_functions",
        "json_functions",
        "json_agg_by_key",
        "json_structured",
        "map_functions",
        "pandas_scalar_textfeat",
        "udtf_word_bigrams",
        "variant_json_path",
        "null_conditional_functions",
        "bitwise_functions",
        # temporal module, driver rows r1-r4 only
        "session_window_events",
        "stream_stream_join_events",
        # scale module head, driver row r4 only — position 50
        "join_salted_skew",
        # ---- position 51+ : the pre-conversion remainder that doesn't
        # fit the ~50-query window — first in line for the r9 prefix
        "scd2_customer_history",
        "funnel_conversion",
        "cohort_retention",
        "tpch_q19_disjunctive_revenue",
        "tpch_q20_excess_supply",
        "tpch_q21_waiting_supplier",
        "tpch_q22_global_sales_opportunity",
        # NEW this round, added after the window was full — next in
        # line behind the pre-conversion remainder
        "dedup_repeated_spans",
    ),
)
