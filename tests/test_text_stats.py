"""Semantic properties of the distribution-level text/embedding
diagnostics (beyond the oracle equality the differential harness
already enforces): the PMI ranking is a proper contiguous top-k, the
Zipf fit behaves like a rank-frequency law (negative slope, r² in
[0, 1]), and the norm screen only ever emits rows beyond its
advertised threshold.
"""

from __future__ import annotations

from kafka_stream_faust_deprecated_spark.queries.extras import (
    EMB_NORM_Z,
    PMI_MIN_PAIR,
    PMI_TOP_K,
    SAMPLE_WEIGHTED_K,
)
from kafka_stream_faust_deprecated_spark.registry import get_query
from tests.conftest import SF_DIR


def test_pmi_topk_contiguous_and_supported(spark):
    rows = get_query("pmi_token_cooccurrence").fn(spark, SF_DIR).collect()
    assert 0 < len(rows) <= PMI_TOP_K
    assert sorted(r.rnk for r in rows) == list(range(1, len(rows) + 1))
    assert all(r.c12 >= PMI_MIN_PAIR for r in rows)
    assert all(r.w1 < r.w2 for r in rows)
    by_rank = sorted(rows, key=lambda r: r.rnk)
    pmis = [r.pmi for r in by_rank]
    # ranking key is pmi rounded to 6 dp; emitted pmi is 4 dp, so
    # adjacent ranks may only move DOWN beyond rounding slack
    assert all(a >= b - 1e-4 for a, b in zip(pmis, pmis[1:]))


def test_zipf_slope_negative_per_language(spark):
    rows = get_query("token_zipf_slope").fn(spark, SF_DIR).collect()
    assert rows, "corpus has languages"
    for r in rows:
        assert r.vocab > 0 and r.total_tokens >= r.vocab
        assert r.zipf_slope < 0, f"{r.lang}: frequency must fall with rank"
        assert 0.0 <= r.zipf_r2 <= 1.0


def test_source_kl_nonnegative_and_complete(spark):
    """Gibbs' inequality: KL(p_s || q) >= 0, with equality only when the
    source's distribution equals the corpus marginal; every source must
    appear exactly once with full accounting columns."""
    rows = get_query("source_unigram_divergence").fn(spark, SF_DIR).collect()
    assert rows
    assert len({r.source for r in rows}) == len(rows)
    for r in rows:
        assert r.kl_vs_corpus >= 0.0, f"{r.source}: KL must be >= 0"
        assert 0.0 < r.vocab_coverage <= 1.0
        assert r.n_docs > 0 and r.total_tokens >= r.vocab > 0


def test_weighted_sample_deterministic_and_sized(spark):
    q = get_query("sample_weighted_aes").fn
    a = sorted(tuple(r) for r in q(spark, SF_DIR).collect())
    b = sorted(tuple(r) for r in q(spark, SF_DIR).collect())
    assert a == b, "A-ES sample must be bit-identical across runs"
    assert len(a) == SAMPLE_WEIGHTED_K
    assert all(r[1] > 0 for r in a)  # weights positive
    # log-magnitude keys stay in a bounded band at any corpus size
    # (ln(-ln u) in (-23, 3.2) minus ln(weight) >= 0)
    assert all(-32.0 < r[2] < 3.2 for r in a)
    # the log form must keep the head distinguishable: the selected
    # keys cannot all collapse into rounding ties
    assert len({r[2] for r in a}) > SAMPLE_WEIGHTED_K // 2


def test_embedding_norm_outliers_beyond_threshold(spark):
    rows = get_query("embedding_norm_outliers").fn(spark, SF_DIR).collect()
    assert rows, "a gaussian-ish norm distribution has >=2-sigma tails"
    assert all(abs(r.z) >= EMB_NORM_Z for r in rows)
    assert all(r.l2_norm > 0 for r in rows)
    assert len({r.vec_id for r in rows}) == len(rows)
