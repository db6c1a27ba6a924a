"""Headline benchmark — the driver's per-round perf record (BENCH_r{N}).

Runs one representative query per operator family at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints exactly ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

Each query is forced end-to-end with a noop sink write (full
materialization of every output row on the executors, nothing collected
to the driver) — the number measures the plan, not driver serialization.

Each query runs three times — one warm-up (JVM codegen / broadcast
threads / Python workers), then two measured runs of which the MINIMUM
is recorded — so round-over-round deltas compare plans, not cold-start
or GC noise.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_stream_faust_deprecated_spark import get_spark  # noqa: E402
from kafka_stream_faust_deprecated_spark.io import load_table  # noqa: E402
from kafka_stream_faust_deprecated_spark.registry import get_query  # noqa: E402

#: One per operator family (SURVEY.md §2b): scan+window SMA, broadcast
#: star join, hash agg, per-group top-k, window frames, streaming-twin
#: sliding window, exact dedup, MinHash-LSH near-dup, brute-force knn,
#: multi-table LSH ann, TF-IDF, quality scoring.
HEADLINE = (
    "flagship_sma_5row",
    "join_broadcast_dims_revenue",
    "agg_pricing_summary",
    "topk_per_group",
    "window_frames",
    "sliding_window_events",
    "dedup_exact_documents",
    "neardup_minhash_lsh",
    "knn_cosine_bruteforce",
    "ann_cosine_lsh",
    "tfidf_top_terms",
    "doc_quality_score",
    "kmeans_lloyd_step",
    "dedup_connected_components",
    "tpch_q5_local_supplier_volume",
    "join_salted_skew",
    "scd2_customer_history",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark(app_name="ksfd-bench")

    # JVM / codegen / parquet-footer warmup so q1 doesn't pay startup.
    load_table(spark, sf_dir, "lineitem").count()

    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = get_query(name).fn
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        samples = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        times[name] = round(min(samples), 3)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
