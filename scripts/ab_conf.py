#!/usr/bin/env python
"""Interleaved A/B of session-conf candidates over a query slice.

The sandbox's load drifts minute-to-minute (r17 baseline calibration ran
0.393/0.719 vs r16's 0.304/0.152 on identical code), so config candidates
are compared INSIDE one session with per-pass interleaving: for each of
N passes, every (conf, query) cell runs once, conf-major, so load spikes
land on all confs equally; the per-cell estimator is the min across
passes (the bench.py discipline). All confs are runtime SQL confs, so
toggling per cell is safe; each cell is warmed once under its conf
before the measured passes (plans differ per conf -> separate codegen).

Usage: python scripts/ab_conf.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from kafka_stream_faust_deprecated_spark import get_spark  # noqa: E402
from kafka_stream_faust_deprecated_spark.io import load_table  # noqa: E402
from kafka_stream_faust_deprecated_spark.registry import get_query  # noqa: E402

#: Candidate conf sets (applied on top of the engine session factory).
CONFS: dict[str, dict[str, str]] = {
    "base": {},
    # Spark's own docs recommend parallelismFirst=false ("respect the
    # advisory size"); true is a compatibility default. With it false,
    # AQE sizes post-shuffle partitions by bytes (advisory 64m default)
    # instead of fanning every tiny local shuffle to 32 tasks.
    "coalesce": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    },
    # + let AQE rewrite sort-merge joins to shuffled-hash when every
    # post-shuffle partition fits under the threshold (guide 3.1).
    "coalesce+shj": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "67108864",
        "spark.sql.join.preferSortMergeJoin": "false",
    },
}

DEFAULT_QUERIES = (
    "agg_pricing_summary",
    "pk_uniqueness_audit",
    "fk_integrity_audit",
    "dup_graph_kcore",
    "label_propagation_communities",
    "dup_graph_pagerank",
    "dup_graph_reachability",
    "tfidf_top_terms",
    "equi_depth_histogram",
    "basket_copurchase_rules",
    "psi_value_drift",
    "dedup_incremental_ingest",
    "merge_upsert_snapshot",
    "timeseries_gap_fill",
    "symbol_return_correlation",
    "doc_perplexity_bigram",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q13_customer_distribution",
    "tpch_q18_large_volume_customer",
)

PASSES = 3


def _apply(spark, conf: dict[str, str], saved: dict[str, str]) -> None:
    for k, v in conf.items():
        if k not in saved:
            saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)


def _restore(spark, saved: dict[str, str]) -> None:
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _run_once(spark, name: str, sf_dir: str) -> float:
    fn = get_query(name).fn
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    names = args or list(DEFAULT_QUERIES)
    spark = get_spark(app_name="ksfd-ab-conf")
    load_table(spark, sf_dir, "lineitem").count()

    saved: dict[str, str] = {}
    # Warm every (conf, query) cell.
    for cname, conf in CONFS.items():
        _apply(spark, conf, saved)
        for q in names:
            _run_once(spark, q, sf_dir)
        _restore(spark, saved)

    cells: dict[tuple, list[float]] = {}
    for _ in range(PASSES):
        for cname, conf in CONFS.items():
            _apply(spark, conf, saved)
            for q in names:
                cells.setdefault((cname, q), []).append(
                    _run_once(spark, q, sf_dir)
                )
            _restore(spark, saved)

    out = {
        cname: {
            q: round(min(cells[(cname, q)]), 3) for q in names
        }
        for cname in CONFS
    }
    print(json.dumps(out, indent=1))
    base = out["base"]
    print(f"{'query':<34}" + "".join(f"{c:>14}" for c in CONFS), file=sys.stderr)
    for q in names:
        row = f"{q:<34}"
        for cname in CONFS:
            t = out[cname][q]
            ratio = t / base[q] if base[q] else float("nan")
            row += f"{t:>8.3f}({ratio:4.2f})"
        print(row, file=sys.stderr)
    totals = {c: round(sum(out[c].values()), 2) for c in CONFS}
    print(f"TOTALS: {totals}", file=sys.stderr)


if __name__ == "__main__":
    main()
