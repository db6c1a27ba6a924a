"""SURVEY.md §2c is the coverage ledger external review audits against —
it must never drift from the actual registry (it did in rounds 2-3:
pipeline_curate shipped registered-and-green but absent from §2c)."""

from __future__ import annotations

import re
from pathlib import Path

import kafka_stream_faust_deprecated_spark.queries  # noqa: F401  (registers)
from kafka_stream_faust_deprecated_spark.registry import all_specs

SURVEY = Path(__file__).resolve().parent.parent / "SURVEY.md"


def _ledger_names() -> set[str]:
    text = SURVEY.read_text()
    m = re.search(
        r"Registered-query ledger.*?```text\n(.*?)```", text, re.DOTALL
    )
    assert m, "SURVEY.md §2c registered-query ledger block not found"
    return set(m.group(1).split())


def test_survey_2c_ledger_matches_registry():
    """The §2c ledger block must equal the registry key set exactly —
    a missing name means undocumented coverage, an extra name means the
    survey claims a query that does not exist."""
    ledger = _ledger_names()
    registry = set(all_specs())
    assert ledger == registry, (
        f"SURVEY §2c ledger out of sync: missing={sorted(registry - ledger)} "
        f"stale={sorted(ledger - registry)}"
    )
