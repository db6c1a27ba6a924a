"""The cross-engine rounding contract (functions/rounding.py), tested on
the adversarial inputs that broke F.round vs DuckDB round: exact decimal
midpoints whose double sits just below the printed value."""

from __future__ import annotations

import duckdb

from kafka_stream_faust_deprecated_spark.functions.rounding import (
    round_det,
    sql_round_det,
)

#: the class that diverged: shortest-repr midpoints (51.51125 stores as
#: 51.511249999..), true midpoints, negatives, near-zero negatives
ADVERSARIAL = [
    51.51125, -51.51125, 0.37525, -0.37525, 2.30765, -2.30765,
    0.00005, -0.00005, -0.00003, 0.0, -0.0, 1.0, -1.0,
    123456.78905, -123456.78905, 1e-12, -1e-12,
]


def test_round_det_matches_oracle_twin_on_midpoints(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i, v) for i, v in enumerate(ADVERSARIAL)], "i int, x double")
    got = {
        r["i"]: r["y"]
        for r in df.select("i", round_det(F.col("x"), 4).alias("y")).collect()
    }
    con = duckdb.connect()
    for i, v in enumerate(ADVERSARIAL):
        (dv,) = con.execute(
            f"SELECT {sql_round_det('CAST(? AS DOUBLE)', 4)}", [v]
        ).fetchone()
        assert got[i] == dv, (v, got[i], dv)
        # and no negative zero escapes (the multiset compare sorts by str)
        assert str(got[i]) != "-0.0", v
