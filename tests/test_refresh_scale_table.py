"""Pin refresh_scale_table.py's prior-ratio sourcing.

The round-13 review found the prior-parse regex matched the two-point
scaling table further down SCALE.md (same row shape, but its 4th
column is a t32/t8 segment, not a ratio), and the later match silently
overwrote the real prior for every query in the 32x subset — a
self-perpetuating corruption, since the next refresh re-parses the
wrong parens as priors. Pin both fixes: doc-parsing is scoped to the
located table's own span, and a prior probe JSON overrides the doc.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

_SPEC = importlib.util.spec_from_file_location(
    "refresh_scale_table",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "refresh_scale_table.py",
    ),
)
rst = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(rst)

DOC = """# SCALE.md

## Measured scale-up (round 1; prior-run ratios in parentheses)

| query | 1x | 8x | ratio (ideal linear = 8.0; prior run in parens) | spread 1x/8x |
|---|---|---|---|---|
| alpha_query | 0.50 s | 0.60 s | 1.20 (1.10) | 1.1/1.2 |
| beta_query | 0.40 s | 1.60 s | 4.00 (3.90) | 1.3/1.4 |

## Two-point scaling: 8x vs 32x

| query | 8x ratio | 32x ratio | t32/t8 | ratio32/ratio8 |
|---|---|---|---|---|
| alpha_query | 1.20 | 2.40 | 9.99 | 2.00 |
| beta_query | 4.00 | 8.00 | 7.77 | 2.00 |
"""

PROBE = {
    "reps": 8,
    "queries": {
        "alpha_query": {"t1": 0.55, "tN": 0.66, "ratio": 1.25, "spread1": 1.0, "spreadN": 1.1},
        "beta_query": {"t1": 0.44, "tN": 1.70, "ratio": 3.85, "spread1": 1.2, "spreadN": 1.3},
    },
}


def _run(tmp_path, monkeypatch, argv):
    scale = tmp_path / "SCALE.md"
    scale.write_text(DOC)
    probe = tmp_path / "probe.json"
    probe.write_text(json.dumps(PROBE))
    monkeypatch.setattr(rst, "SCALE", str(scale))
    monkeypatch.setattr(sys, "argv", ["refresh_scale_table.py", str(probe)] + argv)
    rst.main()
    return scale.read_text()


def test_doc_parsed_priors_come_from_the_8x_table_not_the_two_point_table(
    tmp_path, monkeypatch
):
    out = _run(tmp_path, monkeypatch, ["round 2"])
    # The prior paren must be the 8x table's own ratio column — NEVER
    # the two-point table's t32/t8 cell (9.99 / 7.77).
    assert "| alpha_query | 0.55 s | 0.66 s | 1.25 (1.20) |" in out
    assert "| beta_query | 0.44 s | 1.70 s | 3.85 (4.00) |" in out
    assert "(9.99)" not in out and "(7.77)" not in out
    # The two-point table itself is untouched.
    assert "| alpha_query | 1.20 | 2.40 | 9.99 | 2.00 |" in out


def test_directly_adjacent_pipe_table_is_not_swallowed(tmp_path, monkeypatch):
    """ADVICE r11: with NO blank line between the measured table and a
    neighboring pipe table, the greedy row group used to swallow the
    neighbor and the rewrite deleted it. The row group now stops at the
    next header/separator-shaped line."""
    adjacent = DOC.replace(
        "| beta_query | 0.40 s | 1.60 s | 4.00 (3.90) | 1.3/1.4 |\n"
        "\n"
        "## Two-point scaling: 8x vs 32x\n"
        "\n"
        "| query | 8x ratio |",
        "| beta_query | 0.40 s | 1.60 s | 4.00 (3.90) | 1.3/1.4 |\n"
        "| query | 8x ratio |",
    )
    scale = tmp_path / "SCALE.md"
    scale.write_text(adjacent)
    probe = tmp_path / "probe.json"
    probe.write_text(json.dumps(PROBE))
    monkeypatch.setattr(rst, "SCALE", str(scale))
    monkeypatch.setattr(sys, "argv", ["refresh_scale_table.py", str(probe), "round 2"])
    rst.main()
    out = scale.read_text()
    # The neighboring table survives the rewrite intact...
    assert "| query | 8x ratio | 32x ratio | t32/t8 | ratio32/ratio8 |" in out
    assert "| alpha_query | 1.20 | 2.40 | 9.99 | 2.00 |" in out
    assert "| beta_query | 4.00 | 8.00 | 7.77 | 2.00 |" in out
    # ...and the measured table was still rewritten from the probe.
    assert "| alpha_query | 0.55 s | 0.66 s | 1.25 (1.20) |" in out


def test_adjacent_table_with_any_header_text_is_not_swallowed(
    tmp_path, monkeypatch
):
    """The boundary guard is shape-based, not header-text-based: an
    adjacent table whose first column is NOT 'query' must also survive
    (its header row is the line immediately followed by a separator)."""
    adjacent = DOC.replace(
        "| beta_query | 0.40 s | 1.60 s | 4.00 (3.90) | 1.3/1.4 |\n"
        "\n"
        "## Two-point scaling: 8x vs 32x\n"
        "\n"
        "| query | 8x ratio | 32x ratio | t32/t8 | ratio32/ratio8 |\n",
        "| beta_query | 0.40 s | 1.60 s | 4.00 (3.90) | 1.3/1.4 |\n"
        "| metric | 8x ratio | 32x ratio | t32/t8 | ratio32/ratio8 |\n",
    )
    scale = tmp_path / "SCALE.md"
    scale.write_text(adjacent)
    probe = tmp_path / "probe.json"
    probe.write_text(json.dumps(PROBE))
    monkeypatch.setattr(rst, "SCALE", str(scale))
    monkeypatch.setattr(sys, "argv", ["refresh_scale_table.py", str(probe), "round 2"])
    rst.main()
    out = scale.read_text()
    # The neighbor's header and rows survive the rewrite intact.
    assert "| metric | 8x ratio | 32x ratio | t32/t8 | ratio32/ratio8 |" in out
    assert "| alpha_query | 1.20 | 2.40 | 9.99 | 2.00 |" in out
    assert "| alpha_query | 0.55 s | 0.66 s | 1.25 (1.20) |" in out


def test_stray_separator_after_final_row_is_refused_not_orphaned(
    tmp_path, monkeypatch
):
    """ADVICE r12: a legitimate final data row directly followed by a
    separator-only line reads, to the shape-based boundary, like the
    next table's header — the row would be silently excluded from the
    rewrite and left orphaned. The refresh must refuse loudly instead."""
    strayed = DOC.replace(
        "| beta_query | 0.40 s | 1.60 s | 4.00 (3.90) | 1.3/1.4 |\n\n",
        "| beta_query | 0.40 s | 1.60 s | 4.00 (3.90) | 1.3/1.4 |\n"
        "|---|\n\n",
    )
    scale = tmp_path / "SCALE.md"
    scale.write_text(strayed)
    probe = tmp_path / "probe.json"
    probe.write_text(json.dumps(PROBE))
    monkeypatch.setattr(rst, "SCALE", str(scale))
    monkeypatch.setattr(sys, "argv", ["refresh_scale_table.py", str(probe), "round 2"])
    import pytest

    with pytest.raises(SystemExit) as exc:
        rst.main()
    assert "orphan" in str(exc.value)
    # Nothing was rewritten — the doc is byte-identical.
    assert scale.read_text() == strayed


def test_orphaned_pipe_row_after_table_is_refused(tmp_path, monkeypatch):
    """A pipe-shaped line directly after the table that is NOT a valid
    adjacent header (no separator under it) is an orphan-in-waiting."""
    strayed = DOC.replace(
        "| beta_query | 0.40 s | 1.60 s | 4.00 (3.90) | 1.3/1.4 |\n\n",
        "| beta_query | 0.40 s | 1.60 s | 4.00 (3.90) | 1.3/1.4 |\n"
        "|---|---|\n"
        "| stale_row | 9.99 |\n\n",
    )
    scale = tmp_path / "SCALE.md"
    scale.write_text(strayed)
    probe = tmp_path / "probe.json"
    probe.write_text(json.dumps(PROBE))
    monkeypatch.setattr(rst, "SCALE", str(scale))
    monkeypatch.setattr(sys, "argv", ["refresh_scale_table.py", str(probe), "round 2"])
    import pytest

    with pytest.raises(SystemExit):
        rst.main()
    assert scale.read_text() == strayed


def test_prior_probe_row_without_ratio_degrades_to_new_this_run(
    tmp_path, monkeypatch, capsys
):
    """ADVICE r11: an older prior probe whose row lacks 'ratio' must
    not abort the refresh with a KeyError — that query falls through
    to '(new this run)' with a stderr note naming it."""
    prior_probe = tmp_path / "prior.json"
    prior_probe.write_text(
        json.dumps(
            {
                "reps": 8,
                "queries": {
                    "alpha_query": {"t8": 0.6},  # old shape, no 'ratio'
                    "beta_query": {"ratio": 4.44},
                    # shapes that must degrade, not abort (the whole
                    # "different row shape" class, not just a missing
                    # key): string-serialized ratio and a non-dict row
                    "gamma_query": {"ratio": "1.23"},
                    "delta_query": [0.5, 0.6],
                },
            }
        )
    )
    out = _run(tmp_path, monkeypatch, ["round 2", str(prior_probe)])
    assert "| alpha_query | 0.55 s | 0.66 s | 1.25 (new this run) |" in out
    assert "| beta_query | 0.44 s | 1.70 s | 3.85 (4.44) |" in out
    assert "alpha_query" in capsys.readouterr().err


def test_prior_probe_json_overrides_the_doc(tmp_path, monkeypatch):
    prior_probe = tmp_path / "prior.json"
    prior_probe.write_text(
        json.dumps(
            {
                "reps": 8,
                "queries": {
                    "alpha_query": {"ratio": 1.11},
                    "beta_query": {"ratio": 4.44},
                },
            }
        )
    )
    out = _run(tmp_path, monkeypatch, ["round 2", str(prior_probe)])
    assert "| alpha_query | 0.55 s | 0.66 s | 1.25 (1.11) |" in out
    assert "| beta_query | 0.44 s | 1.70 s | 3.85 (4.44) |" in out


def test_matched_width_stray_separator_after_final_row_is_refused(
    tmp_path, monkeypatch
):
    """ADVICE r13: a stray FULL-WIDTH separator (same column count as
    the measured table) after the final data row makes that row parse
    as a valid same-width adjacent-table header — the matched-width
    variant of the ADVICE-r12 scenario. The row ALSO matches the
    measured data-row shape this script itself writes, which is the
    discriminator: refuse, don't orphan."""
    strayed = DOC.replace(
        "| beta_query | 0.40 s | 1.60 s | 4.00 (3.90) | 1.3/1.4 |\n\n",
        "| beta_query | 0.40 s | 1.60 s | 4.00 (3.90) | 1.3/1.4 |\n"
        "|---|---|---|---|---|\n\n",
    )
    scale = tmp_path / "SCALE.md"
    scale.write_text(strayed)
    probe = tmp_path / "probe.json"
    probe.write_text(json.dumps(PROBE))
    monkeypatch.setattr(rst, "SCALE", str(scale))
    monkeypatch.setattr(
        sys, "argv", ["refresh_scale_table.py", str(probe), "round 2"]
    )
    import pytest

    with pytest.raises(SystemExit) as exc:
        rst.main()
    assert "orphaned the final row" in str(exc.value)
    assert scale.read_text() == strayed


def test_preceding_separator_refusal_message_covers_blank_line_gap(
    tmp_path, monkeypatch
):
    """ADVICE r13 (second item): the preceding-separator refusal fires
    across blank lines too (fail-closed, unchanged) — but the message
    must say so instead of claiming the divider 'directly precedes'."""
    strayed = DOC.replace(
        "\n| query | 1x | 8x |",
        "\n|---|\n\n\n| query | 1x | 8x |",
    )
    assert strayed != DOC
    scale = tmp_path / "SCALE.md"
    scale.write_text(strayed)
    probe = tmp_path / "probe.json"
    probe.write_text(json.dumps(PROBE))
    monkeypatch.setattr(rst, "SCALE", str(scale))
    monkeypatch.setattr(
        sys, "argv", ["refresh_scale_table.py", str(probe), "round 2"]
    )
    import pytest

    with pytest.raises(SystemExit) as exc:
        rst.main()
    msg = str(exc.value)
    assert "possibly across blank lines" in msg and "directly" not in msg
    assert scale.read_text() == strayed
