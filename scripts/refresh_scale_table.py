#!/usr/bin/env python
"""Rewrite SCALE.md's measured-scale-up table from a SCALEPROBE json.

Keeps the prior run's ratio in parentheses (parsed from the existing
table) and appends the new per-scale sample spreads, so a contaminated
cell self-identifies in the committed artifact instead of needing a
judge re-run.

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
    probe = json.load(open(probe_path))["queries"]
    src = open(SCALE).read()

    # Prior ratios from the existing table rows: "| name | ... | R (…) |"
    prior: dict[str, str] = {}
    for m in re.finditer(r"^\| (\w+) \| [^|]+ \| [^|]+ \| ([0-9.]+) ", src, re.M):
        prior[m.group(1)] = m.group(2)

    header_re = re.compile(r"## Measured scale-up \([^)]*\)")
    src = header_re.sub(
        f"## Measured scale-up ({label}; prior-run ratios in parentheses)", src
    )

    table_head = (
        "| query | 1x | 8x | ratio (ideal linear = 8.0; prior run in parens)"
        " | spread 1x/8x |\n|---|---|---|---|---|\n"
    )
    rows = []
    for q, r in probe.items():
        p = f" ({prior[q]})" if q in prior else " (new this run)"
        rows.append(
            f"| {q} | {r['t1']:.2f} s | {r['t8']:.2f} s | {r['ratio']:.2f}{p}"
            f" | {r['spread1']:.1f}/{r['spread8']:.1f} |"
        )
    new_table = table_head + "\n".join(rows) + "\n"

    # Replace from the old table header line through the last table row.
    m = re.search(
        r"\| query \| 1x \| 8x \| ratio[^\n]*\n\|---[^\n]*\n(?:\|[^\n]*\n)+",
        src,
    )
    assert m, "existing table not found"
    src = src[: m.start()] + new_table + src[m.end() :]
    open(SCALE, "w").write(src)
    print(f"rewrote {SCALE}: {len(rows)} rows")


if __name__ == "__main__":
    main()
