"""M2 — scalar function surface (SURVEY.md §2b E14-E18).

Generalizes the reference's only scalar work — ISO-8601 timestamp
parse/format and UTC normalization (S17-S19, faust_app/ma_agg.py:46-47,
67-69,87) — to the full string/date/math/array/JSON surface. Everything
here is built-in ``pyspark.sql.functions`` (JVM-side, whole-stage
codegen); zero Python UDFs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_stream_faust_deprecated_spark.functions.rounding import round_det
from kafka_stream_faust_deprecated_spark.io import load_table
from kafka_stream_faust_deprecated_spark.registry import register


# ---------------------------------------------------------------------------
# E14 — string functions
# ---------------------------------------------------------------------------

@register(
    "string_functions",
    oracle="""
SELECT c_custkey,
       upper(c_name)                                       AS name_upper,
       lower(c_mktsegment)                                 AS seg_lower,
       length(c_name)                                      AS name_len,
       substr(c_name, 1, 8)                                AS name_prefix,
       concat(c_mktsegment, '#', CAST(c_custkey AS VARCHAR)) AS seg_tag,
       trim(concat('  ', c_name, '  '))                    AS name_trimmed,
       replace(c_name, 'Customer', 'Cust')                 AS name_short,
       regexp_extract(c_name, '([0-9]+)', 1)               AS name_digits,
       split_part(c_name, '#', 2)                          AS after_hash,
       CASE WHEN c_name LIKE '%1%' THEN 'has1' ELSE 'no1' END AS has_one
FROM customer
""",
    tags=("E14",),
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/length/substring/concat/trim/replace/regexp/split."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat(F.col("c_mktsegment"), F.lit("#"), F.col("c_custkey").cast("string")).alias(
            "seg_tag"
        ),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("name_trimmed"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("name_digits"),
        F.split(F.col("c_name"), "#").getItem(1).alias("after_hash"),
        F.when(F.col("c_name").like("%1%"), F.lit("has1")).otherwise("no1").alias("has_one"),
    )


# ---------------------------------------------------------------------------
# E15 — date/time functions (S17-S19 generalized)
# ---------------------------------------------------------------------------

@register(
    "datetime_functions",
    oracle="""
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d')                       AS order_date,
       CAST(year(o_orderdate) AS INTEGER)                      AS order_year,
       CAST(month(o_orderdate) AS INTEGER)                     AS order_month,
       CAST(day(o_orderdate) AS INTEGER)                       AS order_day,
       CAST(dayofweek(o_orderdate) AS INTEGER)                 AS order_dow,
       CAST(quarter(o_orderdate) AS INTEGER)                   AS order_quarter,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d')  AS month_start,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d')     AS due_date,
       datediff('day', TIMESTAMP '1995-01-01', o_orderdate)    AS days_since_epoch_start,
       CAST(epoch(o_orderdate) AS BIGINT)                      AS unix_ts
FROM orders
WHERE o_orderdate >= TIMESTAMP '2000-01-01'
""",
    tags=("E15",),
)
def datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/dow/quarter, date_trunc, interval arithmetic,
    datediff, unix epoch — the reference's timestamp handling (S17-S19)
    widened to the full date surface. DOW normalized to Sunday=1 on both
    sides (DuckDB dayofweek is Sunday=0)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") >= "2000-01-01")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        (F.dayofweek("o_orderdate") - F.lit(1)).alias("order_dow"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd"
        ).alias("due_date"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
        F.unix_timestamp("o_orderdate").alias("unix_ts"),
    )


# ---------------------------------------------------------------------------
# E16 — math functions
# ---------------------------------------------------------------------------

@register(
    "math_functions",
    oracle="""
SELECT l_orderkey,
       l_linenumber,
       (floor((l_extendedprice) * 10.0 + 0.5) / 10.0)                        AS price_round1,
       abs(l_discount - 0.05)                           AS disc_dev,
       CAST(floor(l_quantity) AS BIGINT)                AS qty_floor,
       CAST(ceil(l_extendedprice / 1000) AS BIGINT)     AS price_k_ceil,
       (floor((pow(l_quantity, 2)) * 10000.0 + 0.5) / 10000.0)                     AS qty_sq,
       (floor((sqrt(l_extendedprice)) * 10000.0 + 0.5) / 10000.0)                  AS price_sqrt,
       (floor((ln(l_extendedprice)) * 10000.0 + 0.5) / 10000.0)                    AS price_ln,
       (floor((log10(l_extendedprice)) * 10000.0 + 0.5) / 10000.0)                 AS price_log10,
       CAST(l_quantity AS BIGINT) % 7                   AS qty_mod7,
       CASE WHEN l_discount > 0 THEN 1 ELSE 0 END       AS sign_disc,
       (floor((greatest(l_tax, l_discount)) * 10000.0 + 0.5) / 10000.0)            AS max_rate,
       (floor((least(l_tax, l_discount)) * 10000.0 + 0.5) / 10000.0)               AS min_rate
FROM lineitem
WHERE l_orderkey < 500
""",
    tags=("E16",),
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/floor/ceil/pow/sqrt/ln/log10/mod/greatest/least."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        round_det(F.col("l_extendedprice"), 1).alias("price_round1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_k_ceil"),
        round_det(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
        round_det(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        round_det(F.log("l_extendedprice"), 4).alias("price_ln"),
        round_det(F.log10("l_extendedprice"), 4).alias("price_log10"),
        (F.col("l_quantity").cast("long") % 7).alias("qty_mod7"),
        F.when(F.col("l_discount") > 0, F.lit(1)).otherwise(0).alias("sign_disc"),
        round_det(F.greatest("l_tax", "l_discount"), 4).alias("max_rate"),
        round_det(F.least("l_tax", "l_discount"), 4).alias("min_rate"),
    )


# ---------------------------------------------------------------------------
# E17 — array / higher-order functions (over the embeddings table)
# ---------------------------------------------------------------------------

@register(
    "array_functions",
    oracle="""
SELECT vec_id,
       label,
       len(embedding)                                                       AS dim,
       (floor((CAST(embedding[1] AS DOUBLE)) * 10000.0 + 0.5) / 10000.0)                               AS first_elem,
       (floor((list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum')) * 10000.0 + 0.5) / 10000.0)           AS vec_sum,
       (floor((CAST(list_aggregate(embedding, 'max') AS DOUBLE)) * 10000.0 + 0.5) / 10000.0)           AS vec_max,
       (floor((CAST(list_aggregate(embedding, 'min') AS DOUBLE)) * 10000.0 + 0.5) / 10000.0)           AS vec_min,
       len(list_filter(embedding, x -> x > 0))                              AS n_positive,
       (floor((list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) * 10000.0 + 0.5) / 10000.0)
                                                                            AS sq_norm
FROM embeddings
""",
    tags=("E17",),
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/element_at/aggregate/transform/filter over array<float>.

    Higher-order functions run JVM-side per row. Both engines fold the
    sums sequentially over DOUBLE-promoted elements (DuckDB's plain
    list_aggregate('sum') on a FLOAT list is NOT a pure float fold, so
    per-element promotion is the only bit-exact cross-engine contract),
    and rounding uses the explicit floor(x*1e4 + 0.5) form — the sf0.1
    self-sweep caught both the float-accumulator drift and Spark's
    shortest-decimal-repr midpoint rounding here."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        round_det(F.element_at("embedding", 1).cast("double"), 4).alias("first_elem"),
        round_det(
            F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x.cast("double")), 4
        ).alias("vec_sum"),
        round_det(F.array_max("embedding").cast("double"), 4).alias("vec_max"),
        round_det(F.array_min("embedding").cast("double"), 4).alias("vec_min"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
        round_det(
            F.aggregate(
                "embedding",
                F.lit(0.0),
                lambda a, x: a + x.cast("double") * x.cast("double"),
            ),
            4,
        ).alias("sq_norm"),
    )


# ---------------------------------------------------------------------------
# E18 — JSON functions (events.props is a JSON object string)
# ---------------------------------------------------------------------------

@register(
    "json_functions",
    oracle="""
SELECT event_id,
       event_type,
       CAST(json_extract(props, '$.k') AS BIGINT)   AS k_value,
       CASE WHEN json_extract(props, '$.k') IS NOT NULL THEN 1 ELSE 0 END AS has_k,
       CAST(json_extract(props, '$.missing') AS VARCHAR) AS missing_field
FROM events
WHERE event_type IN ('purchase', 'error')
""",
    tags=("E18",),
)
def json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object / JSON-path extraction on the props column
    (FIXTURES.md: props is a JSON object like {"k": 87})."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "error")
    )
    k = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        "event_type",
        k.cast("long").alias("k_value"),
        F.when(k.isNotNull(), F.lit(1)).otherwise(0).alias("has_k"),
        F.get_json_object("props", "$.missing").alias("missing_field"),
    )


@register(
    "json_agg_by_key",
    oracle="""
SELECT event_type,
       (floor((avg(CAST(json_extract(props, '$.k') AS BIGINT))) * 10000.0 + 0.5) / 10000.0) AS avg_k,
       CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
       count(*) AS n
FROM events
GROUP BY event_type
""",
    tags=("E18", "E7"),
)
def json_agg_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over a JSON-extracted field — the scan prunes to
    (event_type, props) only."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        round_det(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "json_structured",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT)        AS k_typed,
       CAST(json_extract_string(props, 'k') AS VARCHAR)  AS k_tuple,
       '{"k":' || CAST(json_extract(props, '$.k') AS BIGINT) || '}' AS roundtrip,
       'STRUCT<k: BIGINT>'                               AS inferred_schema
FROM events
WHERE event_type = 'purchase'
""",
    tags=("E18",),
)
def json_structured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E18 beyond path extraction: ``from_json`` with an explicit
    schema (typed struct, the batch twin of the Kafka-edge decode in
    io.decode_ticks), ``json_tuple`` (multi-field extraction in one
    pass), a ``to_json`` round-trip, and ``schema_of_json`` (schema
    inference from a sample literal, evaluated once at plan time)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    parsed = F.from_json("props", "k BIGINT")
    return ev.select(
        "event_id",
        parsed.getField("k").alias("k_typed"),
        F.json_tuple(F.col("props"), "k").alias("k_tuple"),
        F.to_json(parsed).alias("roundtrip"),
        F.schema_of_json(F.lit('{"k": 1}')).alias("inferred_schema"),
    )


@register(
    "map_functions",
    oracle="""
SELECT event_id,
       'k,type'                                             AS keys_csv,
       2::INTEGER                                           AS n_entries,
       event_type                                           AS type_val,
       CAST(json_extract(props, '$.k') AS VARCHAR)          AS k_val,
       1::BOOLEAN                                           AS has_type,
       0::BOOLEAN                                           AS has_missing,
       'k=' || CAST(json_extract(props, '$.k') AS VARCHAR)
            || ',type=' || event_type                       AS entries_csv
FROM events
WHERE event_type IN ('signup', 'view')
""",
    tags=("E17",),
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E17 map surface: build a map<string,string> per event
    (``map_from_arrays``), then ``map_keys`` / ``size`` /
    ``element_at`` / ``map_contains_key`` / ``map_entries`` +
    ``transform`` over the entry structs. The oracle states the
    expected VALUES directly (DuckDB's map extraction semantics differ
    across versions; the contract under test is Spark's map API)."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("signup", "view")
    )
    k_str = F.get_json_object("props", "$.k")
    m = F.map_from_arrays(
        F.array(F.lit("type"), F.lit("k")),
        F.array(F.col("event_type"), k_str),
    )
    entry_strs = F.transform(
        F.map_entries(m), lambda e: F.concat(e.getField("key"), F.lit("="), e.getField("value"))
    )
    return ev.select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_csv"),
        F.size(m).alias("n_entries"),
        F.element_at(m, "type").alias("type_val"),
        F.element_at(m, "k").alias("k_val"),
        F.map_contains_key(m, "type").alias("has_type"),
        F.map_contains_key(m, "missing").alias("has_missing"),
        F.array_join(F.array_sort(entry_strs), ",").alias("entries_csv"),
    )


@register(
    "pandas_scalar_textfeat",
    oracle="""
SELECT doc_id,
       length(text)                                         AS n_chars,
       length(regexp_replace(text, '[^A-Z]', '', 'g'))      AS n_upper,
       length(text) - length(regexp_replace(text, ' ', '', 'g')) AS n_spaces,
       (floor((length(regexp_replace(text, '[^A-Z]', '', 'g'))
             / greatest(length(text), 1)) * 10000.0 + 0.5) / 10000.0)                AS upper_ratio
FROM documents
""",
    tags=("E22", "E25"),
)
def pandas_scalar_textfeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E22 SCALAR pandas UDF: per-row text features computed vectorized
    in Python (pandas ``.str`` ops over one Arrow batch at a time).
    Unlike the grouped variants there is no shuffle at all — the UDF
    pipelines inside the scan stage. Exists to pin the Arrow
    scalar-batch path against a pure-SQL oracle; in production prefer
    the JVM built-ins (regexp_replace/length) that the oracle uses —
    same result, no Python hop (SURVEY §2b E22 'UDFs are the slow
    path')."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def n_upper(text: pd.Series) -> pd.Series:
        return text.str.count(r"[A-Z]").astype("int64")

    @pandas_udf("long")
    def n_spaces(text: pd.Series) -> pd.Series:
        return text.str.count(" ").astype("int64")

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_upper("text").alias("n_upper"),
        n_spaces("text").alias("n_spaces"),
        round_det(n_upper("text") / F.greatest(F.length("text"), F.lit(1)), 4).alias("upper_ratio"),
    )


@register(
    "udtf_word_bigrams",
    oracle="""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
     b AS (SELECT doc_id,
                  list_transform(generate_series(1, len(words) - 1),
                                 i -> words[i] || ' ' || words[i + 1]) AS bigrams
           FROM w)
SELECT doc_id,
       unnest(bigrams)                              AS bigram,
       unnest(generate_series(0, len(bigrams) - 1)) AS pos
FROM b
""",
    tags=("E22", "E25"),
)
def udtf_word_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E22 Python UDTF (Spark 4 user-defined TABLE function): one input
    row fans out to N output rows — here, positional word bigrams per
    document via LATERAL join. The UDTF is the arbitrary-Python
    generalization of explode: use built-in explode/transform when the
    fan-out is expressible (the oracle shows this one is); the UDTF
    exists for generators with real logic (parsers, samplers,
    beam-search expansions). Arrow-batched like the pandas UDFs; the
    lateral join pipelines inside the scan stage — no shuffle."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="bigram string, pos long")
    class Bigrams:
        def eval(self, text: str):  # noqa: ANN001 - UDTF contract
            words = (text or "").split(" ")
            for i in range(len(words) - 1):
                yield words[i] + " " + words[i + 1], i

    spark.udtf.register("bigrams_udtf", Bigrams)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, b.bigram, b.pos
        FROM udtf_docs d, LATERAL bigrams_udtf(d.text) b
        """
    )


@register(
    "variant_json_path",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k_num,
       json_extract_string(props, '$.k')          AS k_str,
       CASE WHEN json_extract(props, '$.missing') IS NULL
            THEN 1 ELSE 0 END                     AS miss
FROM events
WHERE event_type = 'error'
""",
    tags=("E18",),
)
def variant_json_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E18 via VariantType (Spark 4's binary semi-structured encoding):
    ``parse_json`` once, then typed ``variant_get`` path extraction.
    Against string-path ``get_json_object`` (the json_functions query)
    the variant parses each document ONCE into a binary form that all
    downstream path reads share — the right encoding when many fields
    are extracted from the same JSON at 100 TB. Missing paths yield
    NULL, pinned by the ``miss`` flag."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_type") == "error")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("k_num"),
        F.expr("variant_get(parse_json(props), '$.k', 'string')").alias("k_str"),
        F.when(
            F.expr("variant_get(parse_json(props), '$.missing', 'string')").isNull(),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("miss"),
    )


@register(
    "null_conditional_functions",
    oracle="""
SELECT l_orderkey,
       l_linenumber,
       nullif(l_discount, 0.0)                        AS disc_or_null,
       coalesce(nullif(l_discount, 0.0), -1.0)        AS disc_coalesced,
       ifnull(nullif(l_tax, 0.0), 0.0)                AS tax_ifnull,
       CASE WHEN nullif(l_discount, 0.0) IS NOT NULL
            THEN 'discounted' ELSE 'full_price' END   AS price_class,
       CASE WHEN l_discount = 0.0 THEN NULL
            ELSE (floor((l_extendedprice * l_discount) * 10000.0 + 0.5) / 10000.0) END AS rebate,
       (nullif(l_discount, 0.0) IS NULL)::INTEGER     AS is_full_price
FROM lineitem
WHERE l_orderkey < 1000
""",
    tags=("E14", "E16"),
)
def null_conditional_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling surface: ``nullif`` / ``coalesce`` / ``ifnull`` /
    CASE-with-NULL and null-test projection — the three-valued-logic
    corners every SQL engine must agree on. All JVM expressions inside
    one codegen stage; the filter pushes to the scan."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 1000)
    disc_null = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        disc_null.alias("disc_or_null"),
        F.coalesce(disc_null, F.lit(-1.0)).alias("disc_coalesced"),
        F.ifnull(F.nullif(F.col("l_tax"), F.lit(0.0)), F.lit(0.0)).alias("tax_ifnull"),
        F.when(disc_null.isNotNull(), F.lit("discounted"))
        .otherwise("full_price")
        .alias("price_class"),
        F.when(
            F.col("l_discount") == 0.0, F.lit(None).cast("double")
        )
        .otherwise(round_det(F.col("l_extendedprice") * F.col("l_discount"), 4))
        .alias("rebate"),
        disc_null.isNull().cast("int").alias("is_full_price"),
    )


@register(
    "bitwise_functions",
    oracle="""
SELECT o_orderkey,
       o_orderkey & 255                       AS low_byte,
       o_orderkey | 4096                      AS with_flag,
       xor(o_orderkey, 21845)                 AS xored,
       CAST(o_orderkey << 2 AS BIGINT)        AS shl2,
       CAST(o_orderkey >> 3 AS BIGINT)        AS shr3,
       bit_count(o_orderkey)                  AS popcount,
       CAST(~o_orderkey AS BIGINT)            AS flipped
FROM orders
WHERE o_orderkey < 2000
""",
    tags=("E16",),
)
def bitwise_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise surface: AND/OR/XOR/NOT, shifts, popcount — the
    primitives under bitmap indexes, bloom filters, and the engine's own
    SimHash operator (queries/llm.py)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(21845)).alias("xored"),
        F.shiftleft(k, 2).alias("shl2"),
        F.shiftright(k, 3).alias("shr3"),
        F.bit_count(k).cast("long").alias("popcount"),
        F.bitwise_not(k).alias("flipped"),
    )
