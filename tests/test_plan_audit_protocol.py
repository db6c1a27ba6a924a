"""Pin the plan-audit drift-adjudication protocol (r13 verdict #3).

r15's first PLANS capture showed a one-cell drift that did not
reproduce in 3 isolated re-reads + a second full audit; the right
response — re-capture before believing — was applied by hand and is
now code in scripts/plan_audit.py: any cell differing from the prior
artifact is re-captured under fresh sessions up to 3 times, transient
drift is discarded, and only reproduced drift is reported.
"""

from __future__ import annotations

import scripts.plan_audit as pa

PRIOR_MD = """# PLANS_r15 — executed-plan audit of the bench headline

prose header line

| query | data exch | keys | bcast | 1-part | shim |
|---|---|---|---|---|---|
| flagship_sma_5row | 1 | user_id | 0 | 0 | 1 |
| vocab_oov_coverage | 2 | token; source | 1 | 1 | 0 |
"""


def test_parse_prior_reads_table_rows_only():
    rows = pa.parse_prior(PRIOR_MD)
    assert set(rows) == {"flagship_sma_5row", "vocab_oov_coverage"}
    assert rows["flagship_sma_5row"] == {
        "data": "1",
        "keys": "user_id",
        "broadcast": "0",
        "single": "0",
        "shim": "1",
    }


def test_adjudicate_match_needs_no_recapture():
    prior = pa.parse_prior(PRIOR_MD)["flagship_sma_5row"]
    cur = {"data": 1, "keys": "user_id", "broadcast": 0, "single": 0, "shim": 1}
    calls = []
    a, n, drifted = pa.adjudicate(
        "flagship_sma_5row", cur, prior, lambda: calls.append(1)
    )
    assert (a, n, drifted) == (cur, 0, False) and not calls


def test_adjudicate_no_prior_keeps_first_capture():
    cur = {"data": 3, "keys": "x", "broadcast": 0, "single": 0, "shim": 0}
    a, n, drifted = pa.adjudicate("new_query", cur, None, lambda: 1 / 0)
    assert (a, n, drifted) == (cur, 0, False)


def test_adjudicate_transient_drift_recaptures_back_to_prior():
    """The r15 vocab_oov_coverage scenario: first read drifts, the
    first fresh-session re-read matches the prior artifact — the
    transient is discarded and the prior-matching audit is kept."""
    prior = pa.parse_prior(PRIOR_MD)["vocab_oov_coverage"]
    drifted_read = {
        "data": 2, "keys": "token; doc_id", "broadcast": 1, "single": 1,
        "shim": 0,
    }
    stable_read = {
        "data": 2, "keys": "token; source", "broadcast": 1, "single": 1,
        "shim": 0,
    }
    reads = [stable_read]
    a, n, drifted = pa.adjudicate(
        "vocab_oov_coverage", drifted_read, prior, lambda: reads.pop(0)
    )
    assert a == stable_read and n == 1 and drifted is False


def test_adjudicate_reproduced_drift_reported_after_3_tries():
    prior = pa.parse_prior(PRIOR_MD)["vocab_oov_coverage"]
    drifted_read = {
        "data": 3, "keys": "token; doc_id", "broadcast": 1, "single": 1,
        "shim": 0,
    }
    calls = []
    a, n, drifted = pa.adjudicate(
        "vocab_oov_coverage",
        drifted_read,
        prior,
        lambda: calls.append(1) or drifted_read,
    )
    assert a == drifted_read and n == pa.RETRIES == 3 and drifted is True
    assert len(calls) == 3
