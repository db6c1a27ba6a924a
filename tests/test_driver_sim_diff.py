"""driver_sim mismatch diagnosability (VERDICT r5 "What's wrong" #2).

Rounds 4 and 5 each burned a round-trip on a value-less
``hash_match: false``. ``scripts/driver_sim.run_suite`` now records the
symmetric difference of the normalized row multisets on any mismatch;
this test pins that contract with deliberately broken query/oracle
pairs so a future red driver row is diagnosable from the artifact.
"""

from __future__ import annotations

import json
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "scripts"))

from driver_sim import run_suite  # noqa: E402

from tests.conftest import SF_DIR


def _broken_value(spark, sf_dir):
    return spark.createDataFrame(
        [("a", 1.0), ("b", 2.5)], "k string, v double"
    ).select("k", F.col("v").alias("total"))


def _broken_rows(spark, sf_dir):
    return spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("c", 3.0)], "k string, total double"
    )


@pytest.fixture(scope="module")
def broken_results(spark, duck):
    qs = {"broken_value": _broken_value, "broken_rows": _broken_rows}
    oracles = {
        # Same keys, one differing value (2.0 vs spark's 2.5).
        "broken_value": "SELECT 'a' AS k, 1.0 AS total UNION ALL SELECT 'b', 2.0",
        # Row-count mismatch (2 vs spark's 3).
        "broken_rows": "SELECT 'a' AS k, 1.0 AS total UNION ALL SELECT 'b', 2.0",
    }
    results, failed = run_suite(
        spark, duck, SF_DIR, ["broken_value", "broken_rows"], qs, oracles
    )
    assert sorted(failed) == ["broken_rows", "broken_value"]
    return results


def test_value_mismatch_dumps_symmetric_difference(broken_results):
    r = broken_results["broken_value"]
    assert r["rows_match"] and r["schema_match"] and not r["hash_match"]
    diff = r["diff"]
    assert diff["cols_sorted"] == ["k", "total"]
    # The differing row appears on both sides with its actual values.
    assert ["b", 2.5] in diff["spark_only"]
    assert ["b", 2.0] in diff["oracle_only"]
    # The agreeing row is NOT in the diff.
    assert ["a", 1.0] not in diff["spark_only"]
    # Artifact stays JSON-serializable (the driver writes it verbatim).
    json.dumps(diff)


def test_row_count_mismatch_dumps_extra_rows(broken_results):
    r = broken_results["broken_rows"]
    assert not r["rows_match"] and not r["hash_match"]
    diff = r["diff"]
    assert ["c", 3.0] in diff["spark_only"]
    assert diff["oracle_only"] == []
    json.dumps(diff)
