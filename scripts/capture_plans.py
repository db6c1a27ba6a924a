#!/usr/bin/env python
"""Dump ``explain("formatted")`` for named queries to plans/r<N>/ files.

Usage: python scripts/capture_plans.py <round> <before|after> <query ...>
       [--sf <sf_dir>]

Writes plans/r<round>/<query>_<tag>.txt — the optimization-round evidence
files the judge diffs against the code.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from kafka_stream_faust_deprecated_spark import get_spark  # noqa: E402
from kafka_stream_faust_deprecated_spark.registry import get_query  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    round_no, tag, *names = args
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        f"r{round_no}",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="ksfd-capture-plans")
    for name in names:
        df = get_query(name).fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"-- {name} ({tag}) at {sf_dir}\n")
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
