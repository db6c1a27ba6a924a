#!/usr/bin/env python
"""Rewrite SCALE.md's measured-scale-up table from a SCALEPROBE json.

Keeps the prior run's ratio in parentheses and appends the new
per-scale sample spreads, so a contaminated cell self-identifies in
the committed artifact instead of needing a judge re-run. Priors come
from the prior round's probe JSON when given (authoritative), else
from the existing table — parsed ONLY within the located table's own
span: a doc-wide scan also matched the two-point scaling table further
down (same `| name | ... |` shape, but its 4th column is the t32/t8
segment, not a ratio) and the later match silently overwrote the real
prior for every query in the 32x subset (round-13 review finding).

The probe JSON's top-level ``reps`` field drives the column header and
the ideal-linear note; a probe whose replication factor differs from
the existing table's is REFUSED (a 32x probe silently rewriting the 8x
table would mislabel every ratio — ADVICE r7). Older probe JSONs that
keyed the replicated sample ``t8``/``spread8`` are still readable.

Usage: python scripts/refresh_scale_table.py SCALEPROBE_rN.json \
           [round_label] [prior_SCALEPROBE_json]
"""

from __future__ import annotations

import json
import re
import sys

SCALE = "SCALE.md"

# The row group stops before any line that opens a NEW pipe table so
# that a neighboring table placed directly adjacent (no blank line —
# the prose separation in SCALE.md is otherwise the only guard) is
# never swallowed into the match and deleted by the rewrite (ADVICE
# r11). "Opens a new table" is shape-based, not header-text-based: a
# continuation row may not be a separator itself and may not be
# immediately FOLLOWED by a separator line (that makes it the next
# table's header, whatever its first column says).
TABLE_RE = re.compile(
    r"\| query \| 1x \| (\d+)x \| ratio[^\n]*\n\|---[^\n]*\n"
    r"(?:\|(?!---)[^\n]*\n(?!\|---))+"
)

# The measured table's own data-row shape — every row this script ever
# writes matches it ("| name | 0.50 s | 0.60 s | 1.20 (...) | ..."). It
# is both the doc-prior parse (main) and the adjacency audit's orphan
# discriminator (_audit_adjacency): a candidate "adjacent header" that
# parses as a measured DATA row is really a final row orphaned by a
# stray full-width separator, whatever its pipe count says.
DATA_ROW_RE = re.compile(r"^\| (\w+) \| [^|]+ \| [^|]+ \| ([0-9.]+) ", re.M)


def _audit_adjacency(src: str, start: int, end: int) -> None:
    """Refuse when the located span abuts a pipe line that is NOT a
    genuine adjacent table (ADVICE r12). The shape-based row-group
    boundary treats any row immediately followed by a '|---' line as
    the next table's header, so a legitimate final data row followed
    by a stray separator-only divider would be silently excluded from
    the rewrite and left as an orphaned stale row. A directly-following
    pipe line is accepted only as a real header: a non-separator row
    whose NEXT line is a separator with the same pipe count — AND that
    does not itself parse as a measured-table DATA row (ADVICE r13: a
    stray FULL-WIDTH separator after the final data row used to make
    that row read as a new same-width table's header and orphaned it
    silently; pipe count alone can't discriminate because genuine
    neighbors share the width, but every orphanable row matches
    DATA_ROW_RE — this script wrote it). Anything else (a bare '|---',
    a pipe row with no separator, or a row whose 'separator' has a
    different column count) is ambiguous — stop and make the human fix
    SCALE.md rather than strand a stale row."""
    tail = src[end:]
    if tail.startswith("|"):
        lines = tail.split("\n")
        is_header = (
            not lines[0].startswith("|---")
            and len(lines) > 1
            and lines[1].startswith("|---")
            and lines[0].count("|") == lines[1].count("|")
        )
        if not is_header:
            sys.exit(
                "refusing: the line directly after the measured table "
                f"({lines[0]!r}) is pipe-shaped but not a valid adjacent "
                "table header — a stale data row or stray separator would "
                "be orphaned by the rewrite; fix SCALE.md first"
            )
        if DATA_ROW_RE.match(lines[0]):
            sys.exit(
                "refusing: the line directly after the measured table "
                f"({lines[0]!r}) parses as an adjacent table header but "
                "ALSO as one of the measured table's own data rows — a "
                "stray full-width separator has orphaned the final row; "
                "fix SCALE.md first"
            )
    before = src[:start]
    if before.endswith("\n") and before.rstrip("\n").rsplit("\n", 1)[-1].startswith(
        "|---"
    ):
        # Deliberately fires across intervening blank lines too: a
        # stray divider above the table survives the rewrite as an
        # orphan whether or not blank lines separate them (ADVICE r13:
        # the message used to say 'directly precedes').
        sys.exit(
            "refusing: a separator-only pipe line precedes the measured "
            "table header (possibly across blank lines) — a stray divider "
            "would survive the rewrite as an orphan; fix SCALE.md first"
        )


def main() -> None:
    probe_path = sys.argv[1]
    label = sys.argv[2] if len(sys.argv) > 2 else "round 9"
    prior_path = sys.argv[3] if len(sys.argv) > 3 else None
    doc = json.load(open(probe_path))
    probe = doc["queries"]
    reps = int(doc.get("reps", 8))
    src = open(SCALE).read()

    # Locate the existing table and refuse a replication-factor
    # mismatch instead of mislabeling it.
    m = TABLE_RE.search(src)
    assert m, "existing table not found"
    # Exactly one header+separator per span — a multi-table swallow
    # would show up here even if the row-group guard ever regressed.
    span = src[m.start() : m.end()]
    assert span.count("| query |") == 1 and len(
        re.findall(r"^\|---", span, re.M)
    ) == 1, "table match swallowed a neighboring table"
    _audit_adjacency(src, m.start(), m.end())
    table_reps = int(m.group(1))
    if table_reps != reps:
        sys.exit(
            f"refusing: probe reps={reps} but the existing SCALE.md table is "
            f"{table_reps}x — a {reps}x probe belongs in its own section, not "
            f"overwriting the {table_reps}x table"
        )

    # Prior ratios: the prior probe JSON when given, else this table's
    # own rows ("| name | … s | … s | R (…) |") — NEVER the whole doc.
    prior: dict[str, str] = {}
    if prior_path:
        for q, r in json.load(open(prior_path))["queries"].items():
            # An older prior probe with a different row shape must not
            # abort the whole refresh (ADVICE r11) — degrade to
            # "(new this run)" for that query, visibly. Shape covers
            # the whole class: non-dict rows, missing 'ratio', and
            # non-numeric 'ratio' values alike.
            ratio = r.get("ratio") if isinstance(r, dict) else None
            if not isinstance(ratio, (int, float)) or isinstance(ratio, bool):
                print(
                    f"note: prior probe row for {q} has no numeric "
                    "'ratio'; marking it '(new this run)'",
                    file=sys.stderr,
                )
                continue
            prior[q] = f"{ratio:.2f}"
    else:
        for row in DATA_ROW_RE.finditer(src[m.start() : m.end()]):
            prior[row.group(1)] = row.group(2)

    header_re = re.compile(r"## Measured scale-up \([^)]*\)")
    src = header_re.sub(
        f"## Measured scale-up ({label}; prior-run ratios in parentheses)", src
    )
    # Re-find the table after the header substitution shifted offsets.
    m = TABLE_RE.search(src)
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
