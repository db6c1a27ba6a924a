"""Planted-fixture semantics for dedup_incremental_ingest.

The shared sf fixtures exercise the operator differentially (the sf0.1
corpus produces all three statuses), but the exact_dup path depends on
where duplicate pairs fall relative to the batch split — this planted
corpus pins every classification positively and deterministically.
"""

from __future__ import annotations

import pytest

from kafka_stream_faust_deprecated_spark.registry import get_query

BASE = (
    "the quick brown fox jumps over the lazy dog again and again "
    "while the value table scans a window of rows in order"
)
# Differ in the FINAL token only: exactly one 3-shingle changes, so
# jaccard = 20/22 ~ 0.91 >= the 0.8 threshold.
NEAR = BASE.replace("in order", "in sequence")
UNIQUE = "completely different content with no overlap to anything else at all here"


@pytest.fixture(scope="module")
def ingest_sf_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("ingest_fixture")
    rows = [
        # existing corpus (doc_id % 10 < 8)
        (0, BASE, "en", "src0", len(BASE)),
        (1, UNIQUE, "en", "src0", len(UNIQUE)),
        # incoming batch (doc_id % 10 >= 8)
        (8, BASE, "en", "src1", len(BASE)),       # exact dup of doc 0
        (9, NEAR, "en", "src1", len(NEAR)),       # near dup of doc 0
        (18, "nothing like the rest of this corpus in any way shape or form", "en", "src1", 62),  # new
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(root / "documents.parquet"))
    return str(root)


def test_incremental_ingest_classifies_all_paths(spark, ingest_sf_dir):
    out = {
        r["doc_id"]: r
        for r in get_query("dedup_incremental_ingest").fn(spark, ingest_sf_dir).collect()
    }
    # Only incoming docs are classified.
    assert sorted(out) == [8, 9, 18]
    assert out[8]["status"] == "exact_dup"
    assert out[8]["matched_doc_id"] == 0
    assert out[8]["jac"] is None
    assert out[9]["status"] == "near_dup"
    assert out[9]["matched_doc_id"] == 0
    assert out[9]["jac"] is not None and out[9]["jac"] >= 0.8
    assert out[18]["status"] == "new"
    assert out[18]["matched_doc_id"] is None
