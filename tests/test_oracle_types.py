"""Every oracle's DuckDB result types must survive an Arrow fetch.

Round 4's only driver-red row (`tpch_q12`) was not a semantics bug: the
oracle's bare ``sum(CASE…)`` over INTEGER returns DuckDB HUGEINT
(int128), the one numeric type Arrow cannot represent. A driver that
fetches oracle rows via Arrow/pandas silently widens HUGEINT to DOUBLE,
so the oracle yields 2415.0 where Spark yields LONG 2415 — rows and
schema match, the value hash does not. A plain ``fetchall()`` returns
Python ints either way, which is why the mismatch never reproduced
locally.

This guard compiles every registered oracle with LIMIT 0 (no data scan)
and fails if any output column is HUGEINT — the fix at the query site is
``CAST(sum(…) AS BIGINT)``.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_DIR

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def test_no_oracle_returns_hugeint(con):
    import __spark_entry__ as entry

    offenders = {}
    for name, sql in entry.oracle_sql().items():
        rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
        bad = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if "HUGEINT" in str(t).upper()
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"oracles returning Arrow-unrepresentable HUGEINT (cast to BIGINT): {offenders}"
    )
