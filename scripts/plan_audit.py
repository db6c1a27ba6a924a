#!/usr/bin/env python
"""Write PLANS_r{N}.md: an executed-plan audit of every bench headline
query — the per-plan evidence behind SCALE.md's shuffle inventory.

For each query: keyed data-sized exchanges (hash/range partitioning,
with their keys), broadcast exchanges, and single-partition exchanges,
so a reviewer can check "how many times does data move, keyed on what"
without re-running anything. The loader's REPARTITION_BY_NUM exchanges
(since r14 a hash repartition on the table's unique key — io.SHIM_KEYS;
round-robin before that) are counted separately: they are
`load_table_parallel`'s small-fixture parallelism shim, applied only
when the scan yields fewer splits than cores — a real cluster scan of
real data never triggers it.

Drift adjudication (r13 verdict #3): a captured cell occasionally
differs from the prior round's artifact without any code change —
r15's first capture showed a one-cell `vocab_oov_coverage` exchange-key
drift that did not reproduce in 3 isolated re-reads + a second full
audit. That re-capture-before-believing protocol now lives here: any
cell that differs from the prior PLANS_r{N-1}.md is re-captured under a
fresh `spark.newSession()` (fresh SQLConf) up to 3 times; if ANY
re-capture matches the prior artifact the drift is adjudicated
transient and the prior-matching audit is kept; only drift that
reproduces in all 3 re-captures is reported (and flagged in the
header). The header states the re-capture count either way.

Usage: python scripts/plan_audit.py [round_no] [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from kafka_stream_faust_deprecated_spark import get_spark  # noqa: E402
from kafka_stream_faust_deprecated_spark.plans import exchange_census  # noqa: E402
from kafka_stream_faust_deprecated_spark.registry import get_query  # noqa: E402

RETRIES = 3


def audit(plan: str) -> dict:
    c = exchange_census(plan)
    return {
        "data": c["data"],
        "keys": "; ".join(c["data_keys"]) or "—",
        "broadcast": c["broadcast"],
        "single": c["single"],
        "shim": c["shim"],
    }


def parse_prior(text: str) -> dict:
    """Prior artifact's table rows as {query: audit-dict} (cells kept
    as strings — comparison happens on the rendered row, the thing
    that actually lands in the committed artifact)."""
    rows = {}
    for line in text.splitlines():
        if not line.startswith("| ") or line.startswith("| query |"):
            continue
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        if len(cells) != 6 or cells[0] == "---":
            continue
        name, data, keys, bcast, single, shim = cells
        rows[name] = {
            "data": data,
            "keys": keys,
            "broadcast": bcast,
            "single": single,
            "shim": shim,
        }
    return rows


def _as_strings(a: dict) -> dict:
    return {k: str(v) for k, v in a.items()}


def adjudicate(name: str, current: dict, prior: dict | None, recapture) -> tuple:
    """Apply the re-capture protocol to one query's audit.

    Returns (audit_to_report, recaptures_done, drift_reproduced).
    ``recapture`` is a 0-arg callable returning a fresh audit dict.
    """
    if prior is None or _as_strings(current) == prior:
        return current, 0, False
    for i in range(1, RETRIES + 1):
        again = recapture()
        if _as_strings(again) == prior:
            # Transient: the drifting first read did not reproduce.
            return again, i, False
    return current, RETRIES, True


def main() -> None:
    round_no = sys.argv[1] if len(sys.argv) > 1 else "5"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    import bench

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    prior_path = os.path.join(repo, f"PLANS_r{int(round_no) - 1}.md")
    prior = {}
    if os.path.exists(prior_path):
        with open(prior_path) as fh:
            prior = parse_prior(fh.read())

    spark = get_spark(app_name="plan-audit")

    def capture(name: str, sess) -> dict:
        df = get_query(name).fn(sess, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        return audit(plan)

    rows, recaptures, reproduced = [], 0, []
    for name in bench.HEADLINE:
        a, n, drifted = adjudicate(
            name,
            capture(name, spark),
            prior.get(name),
            lambda name=name: capture(name, spark.newSession()),
        )
        recaptures += n
        if drifted:
            reproduced.append(name)
        rows.append((name, a))

    if prior:
        note = (
            f"Drift protocol: diffed against PLANS_r{int(round_no) - 1}.md; "
            f"{recaptures} auto-re-capture(s) under fresh sessions; "
            + (
                f"REPRODUCED drift in: {', '.join(reproduced)}."
                if reproduced
                else "no reproduced drift (any differing first read was "
                "transient and re-read back to the prior plan)."
            )
        )
    else:
        note = "Drift protocol: no prior artifact found; first capture kept."

    out = [
        f"# PLANS_r{round_no} — executed-plan audit of the bench headline",
        "",
        f"Generated by `scripts/plan_audit.py` at {sf_dir}. Columns: keyed",
        "data-sized exchanges (with partition keys), broadcast exchanges",
        "(dims / 1-row scalars), single-partition exchanges (all",
        "whitelisted bounded aggregates — `tests/test_plan_hygiene.py`),",
        "and `shim` = the REPARTITION_BY_NUM loader guard from",
        "`load_table_parallel` (small-fixture parallelism only; a real",
        "cluster scan never triggers it). Reused exchanges are not",
        "double-counted. Queries returning an eager `localCheckpoint`",
        "(minhash/simhash/ann_lsh/curate/prepare_training/overlap) run",
        "their exchanges INSIDE the checkpoint job — the audited plan is",
        "the post-checkpoint tail, so their rows under-report; their",
        "stage shapes are documented in the query docstrings and",
        "enforced by the hygiene tests instead.",
        "",
        note,
        "",
        "| query | data exch | keys | bcast | 1-part | shim |",
        "|---|---|---|---|---|---|",
    ]
    for name, a in rows:
        out.append(
            f"| {name} | {a['data']} | {a['keys']} | {a['broadcast']} "
            f"| {a['single']} | {a['shim']} |"
        )
    path = os.path.join(repo, f"PLANS_r{round_no}.md")
    with open(path, "w") as fh:
        fh.write("\n".join(out) + "\n")
    print(
        f"wrote {os.path.normpath(path)} ({len(rows)} queries, "
        f"{recaptures} re-captures, {len(reproduced)} reproduced drift)"
    )


if __name__ == "__main__":
    main()
