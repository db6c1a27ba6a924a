"""Data-quality audits, market-factor regression, and mixture planning
(round-7 wave 9).

The capabilities this module adds, each as an oracle-checked query:

* ``fk_integrity_audit``      — referential-integrity audit of every
  foreign-key edge in the TPC-H-ish schema: per edge, child rows,
  orphan rows (child key absent from the parent), and the orphan
  share — the ingest gate every lakehouse runs before publishing a
  snapshot.
* ``pk_uniqueness_audit``     — primary-key uniqueness audit across
  all ten fixture tables (including lineitem's composite key): rows,
  distinct keys, duplicated keys, worst duplication factor.
* ``beta_capm_daily``         — per-symbol CAPM regression of daily
  returns against the equal-weight market return (beta, alpha, R^2)
  from exact DECIMAL moment sums — the cross-sectional factor shape.
* ``intraday_volume_curve``   — hour-of-day volume profile per event
  type with each hour's share of the type's total volume: the
  seasonality curve execution schedulers are built on.
* ``turnover_autocorr``       — per-symbol lag-1 autocorrelation of
  daily traded volume (AR(1) persistence of activity) from exact
  integer moment sums.
* ``mixture_temperature_plan``— temperature-based (tau = 0.5) source
  mixture planning over (lang, source) token counts: natural share,
  sqrt-temperature target share, and the implied epochs-at-parity —
  the standard LLM pretraining mixture step.

Reference parity note: the reference app (``faust_app/ma_agg.py``, 308
lines) has no audit / factor-model surface; these extend the engine
for the large-scale analytics mandate (SURVEY.md §2b/§2c).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kafka_stream_faust_deprecated_spark.functions.rounding import (
    round_det,
    sql_round_det,
)
from kafka_stream_faust_deprecated_spark.functions.text import tokens
from kafka_stream_faust_deprecated_spark.io import load_table_parallel
from kafka_stream_faust_deprecated_spark.queries.llm import SQL_NORM
from kafka_stream_faust_deprecated_spark.queries.ticker import (
    _BARS_SQL,
    _T_SQL,
    _daily_bars,
    _ticks,
)
from kafka_stream_faust_deprecated_spark.registry import register

# --------------------------------------------------------------------------
# fk_integrity_audit
# --------------------------------------------------------------------------

#: Every FK edge of the fixture schema: (edge label, child table,
#: child key, parent table, parent key).
FK_EDGES = (
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
)


def _fk_edge_sql(edge: str, ct: str, ck: str, pt: str, pk: str) -> str:
    return f"""
SELECT '{edge}' AS edge,
       count(*)::BIGINT AS child_rows,
       CAST(sum(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS orphans,
       {sql_round_det(
           "CAST(sum(CASE WHEN p." + pk + " IS NULL THEN 1 ELSE 0 END)"
           " AS DOUBLE) / count(*)", 6)} AS orphan_share
FROM {ct} c LEFT JOIN (SELECT DISTINCT {pk} FROM {pt}) p
  ON c.{ck} = p.{pk}
"""


@register(
    "fk_integrity_audit",
    oracle="\nUNION ALL\n".join(_fk_edge_sql(*e) for e in FK_EDGES),
    tags=("E3", "E4", "E7", "E13"),
)
def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: one row per FK edge with the child
    row count, the count of orphans (child keys with no parent), and
    the orphan share. The parent side is collapsed to DISTINCT keys
    before the join, so a (separately audited) duplicate parent key
    can never fan the child out and inflate the counts — the audit
    stays correct even on the corrupt data it exists to catch.

    Scale shape: per edge, one parent-side distinct (keyed exchange,
    map-side combine) + one key-keyed left join + a literal-keyed
    1-row aggregate whose input is the post-partial-agg partition
    count, not the data. Small parents (nation, region, supplier)
    broadcast; the lineitem-side edges shuffle on the join key —
    exactly the minimal movement a 100 TB integrity sweep needs.
    Edges are independent branches of a UNION and schedule
    concurrently.
    """
    out = []
    for edge, ct, ck, pt, pk in FK_EDGES:
        child = load_table_parallel(spark, sf_dir, ct).select(
            F.col(ck).alias("ck")
        )
        parent = (
            load_table_parallel(spark, sf_dir, pt)
            .select(F.col(pk).alias("pk"))
            .distinct()
        )
        joined = child.join(parent, child["ck"] == parent["pk"], "left")
        out.append(
            joined.groupBy(F.lit(edge).alias("edge")).agg(
                F.count(F.lit(1)).alias("child_rows"),
                F.sum(
                    F.when(F.col("pk").isNull(), 1).otherwise(0)
                ).cast("bigint").alias("orphans"),
            )
        )
    u = out[0]
    for df in out[1:]:
        u = u.unionAll(df)
    return u.select(
        "edge",
        "child_rows",
        "orphans",
        round_det(
            F.col("orphans").cast("double") / F.col("child_rows"), 6
        ).alias("orphan_share"),
    )


# --------------------------------------------------------------------------
# pk_uniqueness_audit
# --------------------------------------------------------------------------

#: Declared primary key per fixture table (lineitem's is composite).
PK_KEYS = (
    ("region", ("r_regionkey",)),
    ("nation", ("n_nationkey",)),
    ("customer", ("c_custkey",)),
    ("supplier", ("s_suppkey",)),
    ("part", ("p_partkey",)),
    ("orders", ("o_orderkey",)),
    ("lineitem", ("l_orderkey", "l_linenumber")),
    ("events", ("event_id",)),
    ("documents", ("doc_id",)),
    ("embeddings", ("vec_id",)),
)


def _pk_tbl_sql(tbl: str, keys: tuple[str, ...]) -> str:
    kl = ", ".join(keys)
    return f"""
SELECT '{tbl}' AS tbl,
       CAST(sum(c) AS BIGINT) AS n_rows,
       count(*)::BIGINT AS n_keys,
       CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_keys,
       CAST(max(c) AS BIGINT) AS max_dup
FROM (SELECT count(*) AS c FROM {tbl} GROUP BY {kl})
"""


@register(
    "pk_uniqueness_audit",
    oracle="\nUNION ALL\n".join(_pk_tbl_sql(t, k) for t, k in PK_KEYS),
    tags=("E7", "E13"),
)
def pk_uniqueness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit across all ten fixture tables: per
    table, total rows, distinct declared-key values (lineitem's
    composite (orderkey, linenumber) included), keys that appear more
    than once, and the worst duplication factor. All counts are exact
    integers — nothing to round.

    Scale shape: per table, one key-keyed exchange with map-side
    combine (the groupBy count), then a literal-keyed 1-row rollup of
    the per-partition partials — the per-key relation never moves
    again. Tables are independent UNION branches and schedule
    concurrently; this is the snapshot-publish gate shape.
    """
    out = []
    for tbl, keys in PK_KEYS:
        kc = (
            load_table_parallel(spark, sf_dir, tbl)
            .groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("c"))
        )
        out.append(
            kc.groupBy(F.lit(tbl).alias("tbl")).agg(
                F.sum("c").cast("bigint").alias("n_rows"),
                F.count(F.lit(1)).alias("n_keys"),
                F.sum(F.when(F.col("c") > 1, 1).otherwise(0))
                .cast("bigint")
                .alias("dup_keys"),
                F.max("c").cast("bigint").alias("max_dup"),
            )
        )
    u = out[0]
    for df in out[1:]:
        u = u.unionAll(df)
    return u


# --------------------------------------------------------------------------
# beta_capm_daily
# --------------------------------------------------------------------------

#: Minimum overlapping days for a symbol's regression to be reported.
BETA_MIN_DAYS = 10

#: Daily close-to-close returns; a zero previous close yields a NULL
#: return via nullif (Spark's ANSI mode would otherwise error where
#: DuckDB silently produces inf — the fixture does contain a 0.00
#: price at sf0.1).
_RETS_SQL = f"""
rets AS (
    SELECT user_id, day,
           CAST({sql_round_det(
               "CAST(close_px AS DOUBLE) / nullif(CAST(lag(close_px) OVER ("
               "PARTITION BY user_id ORDER BY day) AS DOUBLE), 0.0) - 1.0",
               6)} AS DECIMAL(18,6)) AS r
    FROM bars
)
"""


@register(
    "beta_capm_daily",
    oracle=f"""
WITH {_T_SQL}, {_BARS_SQL}, {_RETS_SQL},
j AS (
    -- the market mean is a day-keyed WINDOW over the single return
    -- lineage, not an aggregate re-joined onto it: the aggregate+join
    -- diamond evaluates the corpus-sized bar pipeline twice (Spark's
    -- exchange reuse does not fire across the branches)
    SELECT user_id, r,
           CAST({sql_round_det(
               "CAST(sum(r) OVER (PARTITION BY day) AS DOUBLE)"
               " / CAST(count(r) OVER (PARTITION BY day) AS DOUBLE)",
               6)} AS DECIMAL(18,6)) AS m
    FROM rets WHERE r IS NOT NULL
),
mo AS (
    -- the DECIMAL(19,6) casts force DuckDB's int128 multiply path:
    -- DECIMAL(<=18) products are computed in int64 and a |return|
    -- beyond ~1e3 overflows the raw representation product
    SELECT user_id, count(*)::BIGINT AS n_days,
           sum(r) AS sr, sum(m) AS sm,
           sum(CAST(r AS DECIMAL(19,6)) * CAST(m AS DECIMAL(19,6))) AS srm,
           sum(CAST(m AS DECIMAL(19,6)) * CAST(m AS DECIMAL(19,6))) AS smm,
           sum(CAST(r AS DECIMAL(19,6)) * CAST(r AS DECIMAL(19,6))) AS srr
    FROM j GROUP BY user_id HAVING count(*) >= {BETA_MIN_DAYS}
)
SELECT user_id, n_days,
       {sql_round_det(
           "(CAST(n_days AS DOUBLE) * CAST(srm AS DOUBLE)"
           " - CAST(sr AS DOUBLE) * CAST(sm AS DOUBLE))"
           " / nullif(CAST(n_days AS DOUBLE) * CAST(smm AS DOUBLE)"
           "          - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE), 0.0)",
           4)} AS beta,
       {sql_round_det(
           "(CAST(sr AS DOUBLE)"
           " - ((CAST(n_days AS DOUBLE) * CAST(srm AS DOUBLE)"
           "     - CAST(sr AS DOUBLE) * CAST(sm AS DOUBLE))"
           "    / nullif(CAST(n_days AS DOUBLE) * CAST(smm AS DOUBLE)"
           "             - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE), 0.0))"
           "   * CAST(sm AS DOUBLE)) / CAST(n_days AS DOUBLE)", 4)} AS alpha,
       {sql_round_det(
           "(CAST(n_days AS DOUBLE) * CAST(srm AS DOUBLE)"
           " - CAST(sr AS DOUBLE) * CAST(sm AS DOUBLE))"
           " * (CAST(n_days AS DOUBLE) * CAST(srm AS DOUBLE)"
           "    - CAST(sr AS DOUBLE) * CAST(sm AS DOUBLE))"
           " / nullif((CAST(n_days AS DOUBLE) * CAST(smm AS DOUBLE)"
           "           - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE))"
           "          * (CAST(n_days AS DOUBLE) * CAST(srr AS DOUBLE)"
           "             - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE)), 0.0)",
           4)} AS r2
FROM mo
""",
    tags=("E3", "E7", "E10", "E16"),
)
def beta_capm_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-symbol CAPM regression: daily close-to-close returns
    regressed on the equal-weight market return (the cross-sectional
    mean of the SAME rounded returns), reporting beta, alpha, and R^2
    for symbols with >= {BETA_MIN_DAYS} return days. Returns and the
    market series are rounded to 6 dp and FIXED as DECIMAL(18,6), so
    every moment sum is exact and order-independent; beta/alpha/R^2
    are pure double functions of exact moments, rounded to 4 dp;
    degenerate variance yields NULL via nullif.

    Scale shape: the corpus collapses to calendar-bounded bars (one
    (user, day) exchange) exactly ONCE — the market mean attaches as a
    day-keyed WINDOW over the single return lineage (an aggregate
    re-joined onto rets would evaluate the bar pipeline twice; Spark's
    exchange reuse does not fire across the branches), then the
    per-symbol moments partial-aggregate map-side. Every post-bar
    exchange moves the skinny (user, day, r) relation; driver state is
    zero.
    """
    bars = _daily_bars(spark, sf_dir)
    series = Window.partitionBy("user_id").orderBy("day")
    rets = bars.select(
        "user_id",
        "day",
        round_det(
            F.col("close_px").cast("double")
            / F.nullif(
                F.lag("close_px").over(series).cast("double"), F.lit(0.0)
            )
            - 1.0,
            6,
        )
        .cast("decimal(18,6)")
        .alias("r"),
    ).where(F.col("r").isNotNull())
    byday = Window.partitionBy("day")
    j = rets.select(
        "user_id",
        "r",
        round_det(
            F.sum("r").over(byday).cast("double")
            / F.count("r").over(byday).cast("double"),
            6,
        )
        .cast("decimal(18,6)")
        .alias("m"),
    )
    mo = (
        j.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("r").alias("sr"),
            F.sum("m").alias("sm"),
            F.sum(F.col("r") * F.col("m")).alias("srm"),
            F.sum(F.col("m") * F.col("m")).alias("smm"),
            F.sum(F.col("r") * F.col("r")).alias("srr"),
        )
        .where(F.col("n_days") >= BETA_MIN_DAYS)
    )
    n_d = F.col("n_days").cast("double")
    sr, sm = F.col("sr").cast("double"), F.col("sm").cast("double")
    srm = F.col("srm").cast("double")
    smm, srr = F.col("smm").cast("double"), F.col("srr").cast("double")
    num = n_d * srm - sr * sm
    var_m = n_d * smm - sm * sm
    var_r = n_d * srr - sr * sr
    beta = num / F.nullif(var_m, F.lit(0.0))
    return mo.select(
        "user_id",
        "n_days",
        round_det(beta, 4).alias("beta"),
        round_det((sr - beta * sm) / n_d, 4).alias("alpha"),
        round_det(
            num * num / F.nullif(var_m * var_r, F.lit(0.0)), 4
        ).alias("r2"),
    )


# --------------------------------------------------------------------------
# intraday_volume_curve
# --------------------------------------------------------------------------


@register(
    "intraday_volume_curve",
    oracle=f"""
WITH g AS (
    SELECT event_type, CAST(hour(ts) AS INTEGER) AS hod,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS volume,
           count(*)::BIGINT AS n_ticks,
           sum(CAST(value AS DECIMAL(12,2))) AS px_sum
    FROM events GROUP BY 1, 2
)
SELECT event_type, hod, volume, n_ticks,
       {sql_round_det(
           "CAST(volume AS DOUBLE) / nullif(CAST(sum(volume) OVER ("
           "PARTITION BY event_type) AS DOUBLE), 0.0)", 6)} AS vol_share,
       {sql_round_det("CAST(px_sum AS DOUBLE) / n_ticks", 4)} AS avg_px
FROM g
""",
    tags=("E7", "E10", "E15"),
)
def intraday_volume_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day activity profile per event type: traded volume,
    tick count, the hour's share of the type's total volume, and the
    mean tick price. Volume sums are exact integers, the price mean
    divides an exact DECIMAL sum — both shares round under the shared
    contract, so the curve is bit-stable across engines.

    Scale shape: one (event_type, hour) hash aggregate with map-side
    combine collapses the corpus to at most |types| x 24 rows; the
    share window runs over that bounded relation. The canonical
    calendar-profile shape.
    """
    ev = load_table_parallel(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").alias("hod"),
        F.get_json_object("props", "$.k").cast("long").alias("vol"),
        F.col("value").cast("decimal(12,2)").alias("px"),
    )
    g = ev.groupBy("event_type", "hod").agg(
        F.sum("vol").alias("volume"),
        F.count(F.lit(1)).alias("n_ticks"),
        F.sum("px").alias("px_sum"),
    )
    share = F.col("volume").cast("double") / F.nullif(
        F.sum("volume").over(Window.partitionBy("event_type")).cast("double"),
        F.lit(0.0),
    )
    return g.select(
        "event_type",
        "hod",
        "volume",
        "n_ticks",
        round_det(share, 6).alias("vol_share"),
        round_det(
            F.col("px_sum").cast("double") / F.col("n_ticks"), 4
        ).alias("avg_px"),
    )


# --------------------------------------------------------------------------
# turnover_autocorr
# --------------------------------------------------------------------------

#: Minimum lagged pairs for a symbol's autocorrelation to be reported.
AC_MIN_PAIRS = 10


@register(
    "turnover_autocorr",
    oracle=f"""
WITH {_T_SQL},
v AS (
    SELECT user_id, day, CAST(sum(vol) AS DECIMAL(20,0)) AS v
    FROM t GROUP BY 1, 2
),
l AS (
    SELECT user_id, v,
           lag(v) OVER (PARTITION BY user_id ORDER BY day) AS pv
    FROM v
),
mo AS (
    SELECT user_id, count(*)::BIGINT AS n_pairs,
           sum(v) AS sx, sum(pv) AS sy,
           sum(v * pv) AS sxy, sum(v * v) AS sxx, sum(pv * pv) AS syy
    FROM l WHERE pv IS NOT NULL
    GROUP BY user_id HAVING count(*) >= {AC_MIN_PAIRS}
)
SELECT user_id, n_pairs,
       {sql_round_det(
           "(CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)"
           " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
           " / nullif(sqrt("
           "   greatest(CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)"
           "            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0)"
           " * greatest(CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)"
           "            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE), 0.0)"
           "), 0.0)", 4)} AS autocorr
FROM mo
""",
    tags=("E7", "E10", "E16"),
)
def turnover_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-symbol lag-1 autocorrelation of daily traded volume — the
    AR(1) persistence of activity. Daily volumes are exact integers
    held as DECIMAL(20,0) so every cross/self product and sum is
    exact; the Pearson estimate over (v_t, v_{{t-1}}) pairs is a pure
    double function of exact moments, rounded to 4 dp; constant-volume
    symbols yield NULL via the zero-variance nullif guard.

    Scale shape: the corpus collapses to (user, day) volumes (one
    keyed exchange with map-side combine), then ONE user-keyed
    exchange serves both the lag window and the moment aggregate.
    """
    t = _ticks(spark, sf_dir)
    v = t.groupBy("user_id", "day").agg(
        F.sum("vol").cast("decimal(20,0)").alias("v")
    )
    series = Window.partitionBy("user_id").orderBy("day")
    lagged = v.select(
        "user_id", "v", F.lag("v").over(series).alias("pv")
    ).where(F.col("pv").isNotNull())
    mo = (
        lagged.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("v").alias("sx"),
            F.sum("pv").alias("sy"),
            F.sum(F.col("v") * F.col("pv")).alias("sxy"),
            F.sum(F.col("v") * F.col("v")).alias("sxx"),
            F.sum(F.col("pv") * F.col("pv")).alias("syy"),
        )
        .where(F.col("n_pairs") >= AC_MIN_PAIRS)
    )
    n_d = F.col("n_pairs").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    den = F.sqrt(
        F.greatest(n_d * sxx - sx * sx, F.lit(0.0))
        * F.greatest(n_d * syy - sy * sy, F.lit(0.0))
    )
    return mo.select(
        "user_id",
        "n_pairs",
        round_det(
            (n_d * sxy - sx * sy) / F.nullif(den, F.lit(0.0)), 4
        ).alias("autocorr"),
    )


# --------------------------------------------------------------------------
# mixture_temperature_plan
# --------------------------------------------------------------------------

#: Mixture temperature: target share proportional to tokens^TAU. 0.5
#: (sqrt) is the standard multilingual-rebalancing choice.
MIXTURE_TAU = 0.5


@register(
    "mixture_temperature_plan",
    oracle=f"""
WITH b AS (
    SELECT lang, source,
           count(*)::BIGINT AS n_docs,
           CAST(sum(len(string_split({SQL_NORM}, ' '))) AS BIGINT) AS tokens
    FROM documents GROUP BY 1, 2
),
w AS (
    SELECT lang, source, n_docs, tokens,
           CAST({sql_round_det("sqrt(CAST(tokens AS DOUBLE))", 6)}
                AS DECIMAL(18,6)) AS wt
    FROM b
),
tot AS (
    SELECT CAST(sum(tokens) AS BIGINT) AS total_tokens, sum(wt) AS total_wt
    FROM w
)
SELECT w.lang, w.source, w.n_docs, w.tokens,
       {sql_round_det(
           "CAST(w.tokens AS DOUBLE) / CAST(tot.total_tokens AS DOUBLE)",
           6)} AS natural_share,
       {sql_round_det(
           "CAST(w.wt AS DOUBLE) / CAST(tot.total_wt AS DOUBLE)",
           6)} AS target_share,
       {sql_round_det(
           "(" + sql_round_det(
               "CAST(w.wt AS DOUBLE) / CAST(tot.total_wt AS DOUBLE)", 6)
           + ") / nullif("
           + sql_round_det(
               "CAST(w.tokens AS DOUBLE) / CAST(tot.total_tokens AS DOUBLE)",
               6)
           + ", 0.0)", 4)} AS epochs_at_parity
FROM w CROSS JOIN tot
""",
    tags=("E7", "E14", "E25"),
)
def mixture_temperature_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining mixture plan over (lang, source) buckets:
    whitespace-token counts, each bucket's natural share of the
    corpus, its temperature-rebalanced target share (proportional to
    tokens^{MIXTURE_TAU}), and the implied epochs-at-parity (target
    share / natural share — how many passes over the bucket a sampler
    makes when the total budget equals one corpus pass). Bucket
    weights sqrt(tokens) are rounded to 6 dp and FIXED as
    DECIMAL(18,6) before the total, so the (bucket-count-sized) float
    sum can never reorder-diverge; epochs divides the two ROUNDED
    shares, keeping every output a pure function of exact inputs.

    Scale shape: one corpus scan collapsing to (lang, source) buckets
    with map-side combine; the totals are a 1-row aggregate of the
    bucket relation, broadcast back across it (the equi_depth 1-row
    cross-join idiom). Nothing corpus-sized moves twice.
    """
    docs = load_table_parallel(spark, sf_dir, "documents")
    b = (
        docs.select(
            "lang",
            "source",
            F.size(tokens(F.col("text"))).alias("n_tok"),
        )
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("tokens"),
        )
    )
    w = b.withColumn(
        "wt",
        round_det(F.sqrt(F.col("tokens").cast("double")), 6).cast(
            "decimal(18,6)"
        ),
    )
    tot = w.agg(
        F.sum("tokens").cast("bigint").alias("total_tokens"),
        F.sum("wt").alias("total_wt"),
    )
    joined = w.crossJoin(F.broadcast(tot))
    natural = round_det(
        F.col("tokens").cast("double") / F.col("total_tokens").cast("double"),
        6,
    )
    target = round_det(
        F.col("wt").cast("double") / F.col("total_wt").cast("double"), 6
    )
    return joined.select(
        "lang",
        "source",
        "n_docs",
        "tokens",
        natural.alias("natural_share"),
        target.alias("target_share"),
        round_det(target / F.nullif(natural, F.lit(0.0)), 4).alias(
            "epochs_at_parity"
        ),
    )
