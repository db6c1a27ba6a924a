#!/usr/bin/env python
"""Rewrite SCALE.md's measured-scale-up table from a SCALEPROBE json.

Keeps the prior run's ratio in parentheses (parsed from the existing
table) and appends the new per-scale sample spreads, so a contaminated
cell self-identifies in the committed artifact instead of needing a
judge re-run.

The probe JSON's top-level ``reps`` field drives the column header and
the ideal-linear note; a probe whose replication factor differs from
the existing table's is REFUSED (a 32x probe silently rewriting the 8x
table would mislabel every ratio — ADVICE r7). Older probe JSONs that
keyed the replicated sample ``t8``/``spread8`` are still readable.

Usage: python scripts/refresh_scale_table.py SCALEPROBE_r9.json [round_label]
"""

from __future__ import annotations

import json
import re
import sys

SCALE = "SCALE.md"


def main() -> None:
    probe_path = sys.argv[1]
    label = sys.argv[2] if len(sys.argv) > 2 else "round 9"
    doc = json.load(open(probe_path))
    probe = doc["queries"]
    reps = int(doc.get("reps", 8))
    src = open(SCALE).read()

    # Prior ratios from the existing table rows: "| name | ... | R (…) |"
    prior: dict[str, str] = {}
    for m in re.finditer(r"^\| (\w+) \| [^|]+ \| [^|]+ \| ([0-9.]+) ", src, re.M):
        prior[m.group(1)] = m.group(2)

    # Locate the existing table and refuse a replication-factor
    # mismatch instead of mislabeling it.
    m = re.search(
        r"\| query \| 1x \| (\d+)x \| ratio[^\n]*\n\|---[^\n]*\n(?:\|[^\n]*\n)+",
        src,
    )
    assert m, "existing table not found"
    table_reps = int(m.group(1))
    if table_reps != reps:
        sys.exit(
            f"refusing: probe reps={reps} but the existing SCALE.md table is "
            f"{table_reps}x — a {reps}x probe belongs in its own section, not "
            f"overwriting the {table_reps}x table"
        )

    header_re = re.compile(r"## Measured scale-up \([^)]*\)")
    src = header_re.sub(
        f"## Measured scale-up ({label}; prior-run ratios in parentheses)", src
    )
    # Re-find the table after the header substitution shifted offsets.
    m = re.search(
        r"\| query \| 1x \| (\d+)x \| ratio[^\n]*\n\|---[^\n]*\n(?:\|[^\n]*\n)+",
        src,
    )
    assert m

    table_head = (
        f"| query | 1x | {reps}x | ratio (ideal linear = {reps}.0; prior run"
        f" in parens) | spread 1x/{reps}x |\n|---|---|---|---|---|\n"
    )
    rows = []
    for q, r in probe.items():
        tn = r.get("tN", r.get("t8"))
        sn = r.get("spreadN", r.get("spread8"))
        if tn is None or sn is None:
            sys.exit(f"{q}: probe row missing tN/t8 or spreadN/spread8 keys: {r}")
        p = f" ({prior[q]})" if q in prior else " (new this run)"
        rows.append(
            f"| {q} | {r['t1']:.2f} s | {tn:.2f} s | {r['ratio']:.2f}{p}"
            f" | {r['spread1']:.1f}/{sn:.1f} |"
        )
    new_table = table_head + "\n".join(rows) + "\n"

    src = src[: m.start()] + new_table + src[m.end() :]
    open(SCALE, "w").write(src)
    print(f"rewrote {SCALE}: {len(rows)} rows at {reps}x")


if __name__ == "__main__":
    main()
