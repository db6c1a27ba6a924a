"""Property tests for the layout/runtime-filter/sketch module
(queries/layout.py) — the VALUE equivalence is the oracle harness's job
(tests/test_oracle.py runs every registered query differentially); these
pin the operator-specific guarantees the oracle comparison cannot see:
Bloom pruning actually prunes, z-order envelopes actually skip, CMS
error is one-sided, hard negatives never share the anchor's label.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_stream_faust_deprecated_spark.io import load_table
from kafka_stream_faust_deprecated_spark.queries import layout as L
from tests.conftest import SF_DIR


# ---------------------------------------------------------------- bloom


def test_bloom_prefilter_prunes_but_never_drops(spark):
    """The Bloom probe must pass EVERY true match (no false negatives —
    correctness) while rejecting a substantial share of non-matches
    (pruning — the reason the pattern exists)."""
    cust = load_table(spark, SF_DIR, "customer")
    keys = cust.where(F.col("c_acctbal") > L.BLOOM_ACCTBAL_MIN).select("c_custkey")
    orders = load_table(spark, SF_DIR, "orders")
    n_orders = orders.count()
    n_true = orders.join(
        F.broadcast(keys), F.col("o_custkey") == F.col("c_custkey"), "left_semi"
    ).count()

    # Reconstruct the probe the query runs internally: survivors =
    # orders passing the bitset membership test.
    df = L.join_bloom_prefilter(spark, SF_DIR)
    total_kept = df.agg(F.sum("order_cnt")).collect()[0][0] or 0
    assert total_kept == n_true, "Bloom pipeline changed the exact result"

    # Pruning: with ~20% of customers on the build side, the filter
    # must reject a meaningful share of the fact table (fp rate at this
    # geometry is percent-level; anything >60% kept means it's inert).
    assert 0 < n_true < n_orders
    # m/k sized so false positives stay a small fraction of true hits
    # at test scale: kept-by-bloom is checked inside the query via the
    # verify join; here we check the final result is strictly selective.
    assert total_kept < 0.6 * n_orders


# --------------------------------------------------------------- zorder


@pytest.fixture(scope="module")
def zcells(spark):
    rows = L.zorder_layout_quality(spark, SF_DIR).collect()
    return [r.asDict() for r in rows]


def test_zorder_probe_hits_fewer_cells_than_hash(zcells):
    """The entire point of the curve: the probe rectangle overlaps few
    z-order cell envelopes but (essentially) every hash-layout cell."""
    zhit = sum(1 for r in zcells if r["layout"] == "zorder" and r["probe_hit"])
    ztot = sum(1 for r in zcells if r["layout"] == "zorder")
    hhit = sum(1 for r in zcells if r["layout"] == "hash" and r["probe_hit"])
    htot = sum(1 for r in zcells if r["layout"] == "hash")
    assert ztot and htot
    assert zhit / ztot < 0.5 < hhit / htot, (zhit, ztot, hhit, htot)


def test_zorder_envelopes_tighter_than_hash(zcells):
    """Mean per-cell d1-span (d2 carries z's even bits too) must be
    materially tighter under z-order than under the hash layout."""
    def mean_span(layout, lo, hi):
        spans = [
            (r[hi] - r[lo])
            for r in zcells
            if r["layout"] == layout and r["rows_in_cell"] > 1
        ]
        return sum(spans) / len(spans)

    assert mean_span("zorder", "d1_min", "d1_max") < 0.7 * mean_span(
        "hash", "d1_min", "d1_max"
    )


# ------------------------------------------------------------------ ivm


def test_incremental_merge_counts_delta(spark):
    """delta_rows must reconcile exactly with a direct count of the
    post-cutoff orders — the incremental path covered every delta row."""
    df = L.incremental_agg_maintenance(spark, SF_DIR)
    got = df.agg(F.sum("delta_rows")).collect()[0][0] or 0
    orders = load_table(spark, SF_DIR, "orders")
    want = orders.where(
        F.col("o_orderdate") >= F.to_timestamp(F.lit(f"{L.IVM_CUTOFF} 00:00:00"))
    ).count()
    assert got == want


# ------------------------------------------------------- hard negatives


def test_hard_negatives_never_share_anchor_label(spark):
    e = load_table(spark, SF_DIR, "embeddings").select(
        F.col("vec_id"), F.col("label")
    )
    out = L.hard_negative_mining(spark, SF_DIR)
    joined = (
        out.join(e, out.query_id == e.vec_id)
        .select("query_id", "neighbor_label", F.col("label").alias("anchor_label"))
        .collect()
    )
    assert joined, "expected candidates at test scale"
    assert all(r["neighbor_label"] != r["anchor_label"] for r in joined)


def test_hard_negative_ranks_contiguous(spark):
    out = L.hard_negative_mining(spark, SF_DIR).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r["rnk"])
    for q, rnks in by_q.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1)), (q, rnks)
        assert len(rnks) <= L.HNM_K


# ------------------------------------------------------------------ cms


def test_cms_error_is_one_sided(spark):
    """Count-Min never underestimates: est >= exact for every key, and
    the deliberately narrow width must actually exercise collisions
    OR match exactly (tiny fixtures may dodge them) — assert the bound,
    record the regime."""
    rows = L.heavy_hitters_cms_estimate(spark, SF_DIR).collect()
    assert rows
    assert all(r["est_cnt"] >= r["exact_cnt"] for r in rows)
    assert all(r["overcount"] == r["est_cnt"] - r["exact_cnt"] for r in rows)


def test_cms_top1_is_true_heavy_hitter(spark):
    """CMS's guarantee for heavy hitters: the true top key's estimate
    can't be beaten by more than the collision mass — at this width the
    reported top estimate must be >= the true max frequency."""
    events = load_table(spark, SF_DIR, "events")
    true_max = (
        events.groupBy("user_id").count().agg(F.max("count")).collect()[0][0]
    )
    rows = L.heavy_hitters_cms_estimate(spark, SF_DIR).collect()
    assert max(r["est_cnt"] for r in rows) >= true_max


# -------------------------------------------------------------- islands


def test_island_coverage_matches_bruteforce_merge(spark):
    """Re-derive one user's islands with a plain Python sweep-line and
    require exact agreement — the window formulation is subtle enough
    (running max vs lag) to deserve a reference implementation."""
    ev = load_table(spark, SF_DIR, "events")
    rows = L.interval_coverage_islands(spark, SF_DIR).collect()
    assert rows
    by_user = {r["user_id"]: r for r in rows}
    raw = (
        ev.select(
            "user_id",
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
            ).alias("t0"),
        ).collect()
    )
    per_user = {}
    for r in raw:
        per_user.setdefault(r["user_id"], []).append(r["t0"])
    for uid, starts in per_user.items():
        islands = []
        for t0 in sorted(starts):
            t1 = t0 + L.ISLAND_SPAN_US
            if islands and t0 <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], t1)
            else:
                islands.append([t0, t1])
        got = by_user[uid]
        assert got["n_islands"] == len(islands), uid
        assert got["covered_us"] == sum(e - s for s, e in islands), uid
        assert got["max_island_us"] == max(e - s for s, e in islands), uid
        assert got["n_events"] == len(starts), uid


# ------------------------------------------------------------------ pca


def test_pca_direction_is_unit_and_dominant(spark):
    """The returned direction must be (a) unit-norm, (b) a better
    variance direction than the start vector — the monotone Rayleigh
    improvement power iteration guarantees."""
    import math

    rows = L.embedding_pca_power_iteration(spark, SF_DIR).collect()
    assert len(rows) == 64
    v = [0.0] * 64
    for r in rows:
        v[r["component"]] = r["loading"]
    assert abs(math.sqrt(sum(c * c for c in v)) - 1.0) < 1e-3
    assert rows[0]["eigval"] > 0

    emb = load_table(spark, SF_DIR, "embeddings").select("embedding").collect()
    X = [list(map(float, r["embedding"])) for r in emb]
    v0 = [1.0 / math.sqrt(64)] * 64

    def rayleigh(u):
        return sum(sum(x[j] * u[j] for j in range(64)) ** 2 for x in X)

    assert rayleigh(v) >= rayleigh(v0) * 0.999


# ------------------------------------------------------------------ oov


def test_oov_vocab_covers_most_tokens(spark):
    """A top-512 vocab over a synthetic corpus must cover the bulk of
    token OCCURRENCES (Zipf), even while many rare TYPES stay OOV."""
    rows = L.vocab_oov_coverage(spark, SF_DIR).collect()
    assert rows
    total = sum(r["total_tokens"] for r in rows)
    oov = sum(r["oov_tokens"] for r in rows)
    assert total > 0
    assert oov / total < 0.5, (oov, total)
    for r in rows:
        assert 0.0 <= r["oov_rate"] <= 1.0
        assert r["oov_tokens"] <= r["total_tokens"]


def test_hll_rollup_bounds_and_merge_consistency(spark):
    """Merged-sketch estimates sit within the lgK error budget of the
    exact distinct counts; the merged estimate never exceeds the sum of
    daily estimates (union <= disjoint-sum) by more than sketch noise;
    and rerunning yields identical rows (order/partitioning
    insensitivity of the register array)."""
    from kafka_stream_faust_deprecated_spark.queries.layout import (
        distinct_hll_rollup,
    )

    out1 = {r.event_type: r for r in distinct_hll_rollup(spark, SF_DIR).collect()}
    out2 = {r.event_type: r for r in distinct_hll_rollup(spark, SF_DIR).collect()}
    assert out1.keys() == out2.keys() and len(out1) > 0
    for et, r in out1.items():
        # lgK=12 -> ~1.6% RSE; allow 5 sigma-ish headroom on small sets
        assert abs(r.est_merged - r.exact_distinct) <= max(
            0.08 * r.exact_distinct, 3
        )
        assert r.rel_error <= 0.08 or r.exact_distinct < 40
        assert r.est_merged <= r.sum_daily_estimates * 1.02 + 3
        r2 = out2[et]
        assert (r.est_merged, r.sum_daily_estimates, r.exact_distinct) == (
            r2.est_merged,
            r2.sum_daily_estimates,
            r2.exact_distinct,
        )


def test_hll_rollup_builds_each_sketch_once(spark):
    """Round-7 plan-shape pin: the per-(type, day) sketch is aggregated
    ONCE and est_day derived in a follow-up projection. Honesty note:
    the pre-fix form (hll_sketch_agg named twice, once for sk and once
    under hll_sketch_estimate) was ALREADY deduplicated by Catalyst —
    verified: its physical plan carries `Functions [1]` too — so the
    rewrite bought clarity and a guarantee, not a measured 2x. This pin
    keeps the guarantee mechanical: one sketch-build function per
    aggregate level (<= 2 plan mentions, partial + final), so a future
    edit that introduces a NON-identical second sketch build (which
    Catalyst would not dedup) fails here."""
    from kafka_stream_faust_deprecated_spark.queries.layout import (
        distinct_hll_rollup,
    )

    plan = (
        distinct_hll_rollup(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("hll_sketch_agg") <= 2, (
        "daily HLL sketch is being built more than once per aggregate "
        f"level:\n{plan}"
    )
