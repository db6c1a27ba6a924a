from __future__ import annotations

import os

import duckdb
import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # fast test startup
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")

from kafka_stream_faust_deprecated_spark import get_spark  # noqa: E402
from kafka_stream_faust_deprecated_spark.io import TABLES, table_path  # noqa: E402

#: Small SF for fast differential tests; the driver re-runs at sf0.01.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="ksfd-tests")
    yield s


@pytest.fixture(params=["rocksdb", "hdfs"])
def state_backend(spark, request):
    """Run a stateful-streaming test under BOTH state-store providers
    (r8 verdict #6: the checkpoint-restart goldens pinned only the
    rocksdb default; durability must hold for the heap-backed provider
    too). Teardown restores whatever provider was ACTIVE before the
    fixture ran — not a hard-coded default — so a changed engine
    default or an outer fixture's choice survives this one (r9 advice:
    restoring the literal 'rocksdb' would silently rebind later tests
    if the session conf ever differed)."""
    from kafka_stream_faust_deprecated_spark.session import configure_state_store

    key = "spark.sql.streaming.stateStore.providerClass"
    prior_class = spark.conf.get(key, None)
    configure_state_store(spark, request.param)
    yield request.param
    # Restore the RAW prior conf string — a name round-trip through
    # STATE_STORE_PROVIDERS would silently map an unknown provider
    # class back to the default, the exact rebind hazard this fixture
    # exists to avoid. (configure_state_store's rocksdb extras are
    # provider-scoped confs; leaving them set is inert for any other
    # provider.)
    if prior_class is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, prior_class)


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the fixture tables pre-registered as views,
    mirroring the driver's oracle harness (__spark_entry__.py docstring)."""
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(SF_DIR, name)}')"
        )
    yield con
    con.close()
