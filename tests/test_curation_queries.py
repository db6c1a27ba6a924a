"""Property tests for the entity-resolution / graph / curation module
(queries/curation.py) — value equivalence is the oracle harness's job
(tests/test_oracle.py runs every registered query differentially); these
pin the operator-specific guarantees the oracle comparison cannot see:
blocking never links across blocks, LPA communities never span two
connected components, triangle counts match an independent brute force,
the domain cap is deterministic and actually caps.
"""

from __future__ import annotations

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from kafka_stream_faust_deprecated_spark.queries import curation as C
from tests.conftest import SF_DIR


# ------------------------------------------------- entity resolution


def test_er_pairs_respect_block_and_distance(spark):
    """Every emitted link stays inside one block, is canonically
    oriented (a < b), and has a positive distance within the match
    threshold (keys are unique, so distance 0 is impossible)."""
    rows = C.entity_resolution_blocked(spark, SF_DIR).collect()
    assert rows, "expected at least one fuzzy link at test scale"
    for r in rows:
        assert r.a_custkey < r.b_custkey
        assert 1 <= r.dist <= C.ER_MAX_DIST
        # the block is the zero-padded 9-digit id's first 6 digits —
        # both endpoints must reproduce it
        assert f"{r.a_custkey:09d}"[: C.ER_BLOCK_LEN] == r.blk
        assert f"{r.b_custkey:09d}"[: C.ER_BLOCK_LEN] == r.blk


# ------------------------------------------- label propagation / LPA


def _pairs(spark):
    from kafka_stream_faust_deprecated_spark.queries.llm import _simhash_pairs

    return [(r.da, r.db) for r in _simhash_pairs(spark, SF_DIR).collect()]


def _components(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}

def test_lpa_communities_stay_within_components(spark):
    """Labels only travel along edges, so a community can never span
    two connected components; community sizes must also re-aggregate
    consistently and cover every edge-incident node exactly once."""
    pairs = _pairs(spark)
    comp = _components(pairs)
    out = C.label_propagation_communities(spark, SF_DIR).collect()
    assert {r.doc_id for r in out} == set(comp), "node set != edge-incident set"
    label_of = {r.doc_id: r.community for r in out}
    for r in out:
        # the adopted label is itself a node of the same component
        assert comp[r.community] == comp[r.doc_id]
    sizes = defaultdict(int)
    for r in out:
        sizes[r.community] += 1
    for r in out:
        assert r.comm_size == sizes[r.community]
    assert label_of, "empty labeling"


# --------------------------------------------------------- triangles


def test_triangle_counts_match_bruteforce(spark):
    """Per-node triangle counts and coefficients against an independent
    adjacency-set brute force over the same pair list."""
    pairs = _pairs(spark)
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    pair_set = {(a, b) for a, b in pairs}
    tri = defaultdict(int)
    for a, b in pairs:
        for c in adj[a] & adj[b]:
            if b < c and (a, c) in pair_set:  # a < b < c counted once
                tri[a] += 1
                tri[b] += 1
                tri[c] += 1
    out = C.dup_graph_triangle_count(spark, SF_DIR).collect()
    assert {r.doc_id for r in out} == set(adj)
    for r in out:
        assert r.degree == len(adj[r.doc_id])
        assert r.tri_cnt == tri.get(r.doc_id, 0)
        assert 0.0 <= r.clustering_coeff <= 1.0


# -------------------------------------------------------- domain cap


def test_domain_cap_caps_and_is_deterministic(spark):
    out1 = C.domain_cap_sampling(spark, SF_DIR).collect()
    per_src = defaultdict(list)
    for r in out1:
        per_src[r.source].append(r)
    from kafka_stream_faust_deprecated_spark.io import load_table

    true_counts = {
        r.source: r.n
        for r in load_table(spark, SF_DIR, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(per_src) == set(true_counts), "every source must survive the cap"
    for src, rows in per_src.items():
        assert len(rows) == min(C.DOMAIN_CAP, true_counts[src])
        assert sorted(r.rnk for r in rows) == list(range(1, len(rows) + 1))
        assert all(r.src_total == true_counts[src] for r in rows)
    # determinism: the kept set is a pure function of ids
    kept1 = {(r.source, r.doc_id) for r in out1}
    kept2 = {
        (r.source, r.doc_id) for r in C.domain_cap_sampling(spark, SF_DIR).collect()
    }
    assert kept1 == kept2


# -------------------------------------------------------- winsorize


def test_winsorize_bounds_and_clip_fractions(spark):
    out = C.winsorized_quality_zscore(spark, SF_DIR).collect()
    assert out
    for r in out:
        assert r.p05 <= r.p95
        assert r.p05 <= r.mean_wins <= r.p95, "clipped mean must sit in the band"
        # exact p05/p95 put ~5% of mass outside each bound; allow slack
        # for ties and small groups but catch an inert clip outright
        assert 0 <= r.n_clipped_low <= 0.1 * r.n_docs + 2
        assert 0 <= r.n_clipped_high <= 0.1 * r.n_docs + 2
        assert r.std_wins >= 0.0


# ------------------------------------------------ link prediction


def test_link_prediction_candidates_are_nonedges_with_common_neighbors(spark):
    """Every predicted link shares >= 1 neighbor, is NOT an existing
    edge, its Jaccard is consistent with the reported counts, and the
    ranking is by (jaccard DESC, doc_a, doc_b)."""
    from kafka_stream_faust_deprecated_spark.queries.llm import _simhash_pairs
    from kafka_stream_faust_deprecated_spark.queries import curation as C

    pairs = {
        (r.da, r.db) for r in _simhash_pairs(spark, SF_DIR).collect()
    }
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    rows = sorted(
        C.dup_graph_link_prediction(spark, SF_DIR).collect(),
        key=lambda r: r.rnk,
    )
    assert 0 < len(rows) <= C.LINKPRED_TOP_K
    prev = None
    for r in rows:
        assert r.doc_a < r.doc_b
        assert (r.doc_a, r.doc_b) not in pairs, "predicted link already an edge"
        na, nb = adj[r.doc_a], adj[r.doc_b]
        assert r.common_neighbors == len(na & nb) >= 1
        assert r.deg_a == len(na) and r.deg_b == len(nb)
        assert r.jaccard == round(
            len(na & nb) / (len(na) + len(nb) - len(na & nb)), 6
        )
        key = (-r.jaccard, r.doc_a, r.doc_b)
        if prev is not None:
            assert prev < key
        prev = key


def test_kcore_matches_python_peel(spark):
    """Core membership and degrees match a pure-Python peeling replay
    on the collected pair list, and the 2-core contains every triangle
    vertex (a triangle is itself a 2-core)."""
    from kafka_stream_faust_deprecated_spark.queries.llm import _simhash_pairs

    pairs = [(r.da, r.db) for r in _simhash_pairs(spark, SF_DIR).collect()]
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    deg0 = {v: len(ns) for v, ns in adj.items()}
    alive = set(adj)
    edges = set()
    for a, b in pairs:
        edges.add((a, b))
        edges.add((b, a))
    for _ in range(C.KCORE_SWEEPS):
        deg = defaultdict(int)
        for s, _t in edges:
            deg[s] += 1
        alive = {v for v in alive if deg[v] >= C.KCORE_K}
        edges = {(s, t) for s, t in edges if s in alive and t in alive}
    final_deg = defaultdict(int)
    for s, _t in edges:
        final_deg[s] += 1
    out = {r.doc_id: r for r in C.dup_graph_kcore(spark, SF_DIR).collect()}
    assert set(out) == set(deg0)
    for v, r in out.items():
        assert r.degree0 == deg0[v]
        assert r.core_degree == final_deg.get(v, 0)
        assert r.in_core == (1 if final_deg.get(v, 0) > 0 else 0)
        assert r.core_degree <= r.degree0
        # the sweep budget converges at the test SFs (measured <= 6),
        # so membership implies the true k-core degree bound
        if r.in_core:
            assert r.core_degree >= C.KCORE_K


def test_reachability_matches_python_walk_replay(spark):
    """Min depth matches a BFS replay and walk counts match a dynamic-
    programming walk count over the collected edge list; every reached
    node at depth 0 is a seed."""
    from kafka_stream_faust_deprecated_spark.queries.llm import _simhash_pairs

    pairs = [(r.da, r.db) for r in _simhash_pairs(spark, SF_DIR).collect()]
    adj = defaultdict(list)
    for a, b in pairs:
        adj[a].append(b)
        adj[b].append(a)
    seeds = sorted(v for v in adj if v % C.REACH_SEED_MOD == 0)
    # walks[d][v] = number of distinct depth-d walks from any seed to v
    walks = defaultdict(int)
    frontier = {v: 1 for v in seeds}
    total = defaultdict(int)
    mind = {}
    for d in range(C.REACH_MAX_DEPTH + 1):
        for v, c in frontier.items():
            total[v] += c
            mind.setdefault(v, d)
        nxt = defaultdict(int)
        for v, c in frontier.items():
            for u in adj[v]:
                nxt[u] += c
        frontier = nxt
    out = {r.doc_id: r for r in C.dup_graph_reachability(spark, SF_DIR).collect()}
    assert set(out) == set(total)
    for v, r in out.items():
        assert r.min_depth == mind[v]
        assert r.n_walks == total[v]
    for v in seeds:
        assert out[v].min_depth == 0


def test_reachability_survives_fresh_session(spark):
    """The r8 permutation sweep caught reachability red under
    spark.newSession(): the app-wide pair memo hands back a DataFrame
    owned by an OLDER session, and temp views registered on it were
    invisible to the new session's sql(). Pin the fix: same rows from
    the base session and from a fresh session sharing the app."""
    base = {
        (r.doc_id, r.min_depth, r.n_walks)
        for r in C.dup_graph_reachability(spark, SF_DIR).collect()
    }
    fresh = spark.newSession()
    again = {
        (r.doc_id, r.min_depth, r.n_walks)
        for r in C.dup_graph_reachability(fresh, SF_DIR).collect()
    }
    assert base == again
