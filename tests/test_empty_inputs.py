"""Every registered query must SURVIVE a zero-row corpus.

At 100 TB the empty case is not hypothetical: a partition-pruning
predicate, a date filter on a fresh table, or a tenant with no data yet
hands every operator empty inputs. The contract here is deliberately
minimal — construct the plan and execute it without raising — because
"crashes on empty" is the failure class (div-by-zero folded literals,
``array()`` of a collected-empty list, ``min``/``max`` nulls feeding
casts); the VALUES on real data are the oracle harness's job.
"""

from __future__ import annotations

import pytest

from kafka_stream_faust_deprecated_spark.io import TABLES, load_table, table_path
from kafka_stream_faust_deprecated_spark.registry import all_specs
from tests.conftest import SF_DIR


def _shrunk_sf_dir(spark, tmp_path_factory, n_rows: int):
    root = tmp_path_factory.mktemp(f"sf_{n_rows}row")
    for name in TABLES:
        load_table(spark, SF_DIR, name).limit(n_rows).write.mode(
            "overwrite"
        ).parquet(str(root / f"{name}.parquet"))
    return str(root)


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    """A scale-factor dir whose ten tables carry the real schemas and
    ZERO rows (schema copied from the sf0.001 fixtures via limit(0))."""
    return _shrunk_sf_dir(spark, tmp_path_factory, 0)


@pytest.fixture(scope="module")
def one_row_sf_dir(spark, tmp_path_factory):
    """One row per table: the degenerate-statistics class — zero
    variance, a single group, equal min/max bounds, self-only pairs."""
    return _shrunk_sf_dir(spark, tmp_path_factory, 1)


def _sweep(spark, sf_dir):
    failures = {}
    for name, spec in sorted(all_specs().items()):
        try:
            spec.fn(spark, sf_dir).collect()
        except Exception as ex:  # noqa: BLE001
            failures[name] = f"{type(ex).__name__}: {ex}"[:160]
    return failures


def test_every_query_survives_empty_corpus(spark, empty_sf_dir):
    failures = _sweep(spark, empty_sf_dir)
    assert not failures, (
        f"{len(failures)} queries crash on an empty corpus:\n"
        + "\n".join(f"  {n}: {e}" for n, e in sorted(failures.items()))
    )


def test_every_query_survives_one_row_corpus(spark, one_row_sf_dir):
    failures = _sweep(spark, one_row_sf_dir)
    assert not failures, (
        f"{len(failures)} queries crash on a 1-row corpus:\n"
        + "\n".join(f"  {n}: {e}" for n, e in sorted(failures.items()))
    )
