"""Scale-technique operators: skew mitigation and dimension maintenance.

These queries demonstrate the two table-maintenance/skew patterns a
100 TB pipeline needs beyond plain joins and aggregations:

* **Salted skew join** — a shuffle join keyed on a LOW-CARDINALITY /
  skewed key routes entire key groups to single reducers (5 distinct
  ``event_type`` values = at most 5 busy tasks no matter how large the
  cluster). Salting splits each fact key into ``N_SALTS`` synthetic
  subkeys and replicates the dimension row per subkey, spreading each
  hot key over ``N_SALTS`` reducers. AQE's skew-join split handles
  *moderate* skew automatically; explicit salting is the pattern for
  pathological keys and is verified here to be result-identical to the
  unsalted join (the DuckDB oracle runs the plain join).

* **SCD2 merge** — slowly-changing-dimension type-2 history build:
  apply a change-set to a dimension snapshot, closing out the previous
  version (``valid_to`` = change date) and appending the new current
  version. Expressed as one left join + one inner join + union, i.e.
  two broadcast-able joins and no window function — the MERGE pattern
  that scales to billion-row dimensions.

The reference has no joins at all (SURVEY §2a "does NOT have"); these
rows are driver-mandated extension surface (E3/E7/E22 applications).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_stream_faust_deprecated_spark.functions.rounding import round_det
from kafka_stream_faust_deprecated_spark.io import load_table
from kafka_stream_faust_deprecated_spark.registry import register

#: Salt fan-out. On a real cluster set this ~= 2-4x the per-key excess
#: (rows_of_hottest_key / rows_per_healthy_task); 32 matches local cores.
N_SALTS = 32

#: Per-event-type weights (the "dimension"). Deliberately tiny so the
#: demo is about key skew, not dimension size — the SHUFFLE_HASH hint
#: below forces the shuffle-join path that salting exists for
#: (broadcast would sidestep the skew, which is the right fix when the
#: dim fits in memory; salting is for when it does not).
_TYPE_WEIGHTS = [
    ("click", 0.1),
    ("view", 0.05),
    ("signup", 1.0),
    ("purchase", 5.0),
    ("error", 0.0),
]


@register(
    "join_salted_skew",
    oracle="""
WITH dim(event_type, weight) AS (
    VALUES ('click', 0.1), ('view', 0.05), ('signup', 1.0),
           ('purchase', 5.0), ('error', 0.0)
)
SELECT e.event_type                         AS event_type,
       count(*)                             AS n,
       (floor((sum(e.value * d.weight)) * 10000.0 + 0.5) / 10000.0)    AS weighted_value
FROM events e JOIN dim d ON e.event_type = d.event_type
GROUP BY 1
""",
    tags=("E3", "skew"),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated fact-dim join: ``events`` joined to a per-type
    weight dim on the 5-value ``event_type`` key.

    Fact side gets ``salt = pmod(hash(event_id), N_SALTS)``; the dim is
    replicated once per salt value, and the join key becomes
    ``(event_type, salt)`` — key cardinality grows 32x, so each hot key
    spreads over 32 reducers instead of one. The salt cancels out of
    the result: every fact row still matches exactly one dim copy, so
    the oracle is the plain unsalted join.
    """
    fact = load_table(spark, sf_dir, "events").withColumn(
        "salt", F.pmod(F.hash("event_id"), F.lit(N_SALTS))
    )
    dim = spark.createDataFrame(_TYPE_WEIGHTS, "event_type string, weight double")
    dim_salted = dim.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(N_SALTS)]))
    )
    joined = fact.join(dim_salted.hint("shuffle_hash"), ["event_type", "salt"])
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n"),
        round_det(F.sum(F.col("value") * F.col("weight")), 4).alias("weighted_value"),
    )


@register(
    "scd2_customer_history",
    oracle="""
WITH chg AS (
    SELECT o_custkey,
           max(o_orderdate)            AS change_date,
           (floor((sum(o_totalprice)) * 100.0 + 0.5) / 100.0) AS new_balance
    FROM orders
    GROUP BY 1
)
SELECT c.c_custkey                  AS c_custkey,
       c.c_name                     AS c_name,
       c.c_mktsegment               AS c_mktsegment,
       (floor((c.c_acctbal) * 100.0 + 0.5) / 100.0)        AS acctbal,
       '1990-01-01'                 AS valid_from,
       coalesce(strftime(ch.change_date, '%Y-%m-%d'), '9999-12-31') AS valid_to,
       CASE WHEN ch.change_date IS NULL THEN 1 ELSE 0 END           AS is_current
FROM customer c LEFT JOIN chg ch ON c.c_custkey = ch.o_custkey
UNION ALL
SELECT c.c_custkey, c.c_name, c.c_mktsegment, ch.new_balance,
       strftime(ch.change_date, '%Y-%m-%d'), '9999-12-31', 1
FROM customer c JOIN chg ch ON c.c_custkey = ch.o_custkey
""",
    tags=("E3", "E7", "scd2"),
)
def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history build: apply a change-set (latest order date +
    lifetime spend per customer, derived from ``orders``) to the
    ``customer`` snapshot.

    Customers WITH a change get two rows — the closed-out original
    version (``valid_to`` = change date, not current) and the new
    current version carrying the updated balance; customers without
    orders keep their single open-ended original row. One aggregation
    plus two joins on ``c_custkey``; both joins broadcast when the
    change-set is small and sort-merge co-partitioned when it is not —
    no window function, no row-at-a-time logic, so the same plan holds
    at billion-row dimension scale.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"
    )
    chg = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("change_date"),
            round_det(F.sum("o_totalprice"), 2).alias("new_balance"),
        )
    )
    base = cust.join(chg, cust.c_custkey == chg.o_custkey, "left")
    old_versions = base.select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        round_det(F.col("c_acctbal"), 2).alias("acctbal"),
        F.lit("1990-01-01").alias("valid_from"),
        F.coalesce(
            F.date_format("change_date", "yyyy-MM-dd"), F.lit("9999-12-31")
        ).alias("valid_to"),
        F.when(F.col("change_date").isNull(), F.lit(1)).otherwise(F.lit(0)).alias(
            "is_current"
        ),
    )
    new_versions = base.where(F.col("change_date").isNotNull()).select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        F.col("new_balance").alias("acctbal"),
        F.date_format("change_date", "yyyy-MM-dd").alias("valid_from"),
        F.lit("9999-12-31").alias("valid_to"),
        F.lit(1).alias("is_current"),
    )
    return old_versions.unionByName(new_versions)


@register(
    "funnel_conversion",
    oracle="""
WITH s AS (SELECT user_id, min(ts) AS t0 FROM events
           WHERE event_type = 'signup' GROUP BY 1),
c AS (SELECT e.user_id, min(e.ts) AS t1
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'click' AND e.ts > s.t0 GROUP BY 1),
p AS (SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t1 GROUP BY 1)
SELECT (SELECT count(*) FROM s) AS n_signup,
       (SELECT count(*) FROM c) AS n_click_after_signup,
       (SELECT count(*) FROM p) AS n_purchase_after_click,
       (floor(((SELECT count(*) FROM p) * 1.0
             / greatest((SELECT count(*) FROM s), 1)) * 10000.0 + 0.5) / 10000.0) AS conversion
""",
    tags=("E7", "funnel"),
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event-sequence funnel: signup -> first later click ->
    first later purchase, with end-to-end conversion rate.

    Each stage is one aggregation plus one equi-join on ``user_id`` —
    on a cluster all three stages reuse the same hash partitioning, so
    the funnel is effectively one fact shuffle followed by co-located
    joins of ever-shrinking per-user stage tables. The time ordering
    (``ts > prior stage``) rides the join predicate; no window over the
    full event history and no per-user sort."""
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(s, "user_id")
        .where(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    counts = (
        s.agg(F.count("*").alias("n_signup"))
        .join(c.agg(F.count("*").alias("n_click_after_signup")))
        .join(p.agg(F.count("*").alias("n_purchase_after_click")))
    )
    return counts.select(
        "n_signup",
        "n_click_after_signup",
        "n_purchase_after_click",
        round_det(F.col("n_purchase_after_click")
            / F.greatest(F.col("n_signup"), F.lit(1)), 4).alias("conversion"),
    )


@register(
    "cohort_retention",
    oracle="""
WITH firstd AS (
    SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date FROM events GROUP BY 1
),
activity AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
ret AS (
    SELECT f.cohort_date,
           date_diff('day', f.cohort_date, a.d)::BIGINT AS day_offset,
           count(DISTINCT a.user_id)::BIGINT AS n_active
    FROM activity a JOIN firstd f USING (user_id)
    GROUP BY 1, 2
),
sizes AS (SELECT cohort_date, count(*)::BIGINT AS n_cohort FROM firstd GROUP BY 1)
SELECT r.cohort_date AS cohort_date,
       r.day_offset  AS day_offset,
       r.n_active    AS n_active,
       s.n_cohort    AS n_cohort,
       (floor((r.n_active * 1.0 / s.n_cohort) * 10000.0 + 0.5) / 10000.0) AS retention
FROM ret r JOIN sizes s USING (cohort_date)
""",
    tags=("E7", "E15"),
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cohort retention matrix: users grouped by first-activity
    date; for each (cohort, day offset) the count and share of the
    cohort active that day — the standard growth-analytics triangle.

    Scale shape: first-touch and the distinct (user, day) activity set
    are both single aggregations keyed on ``user_id``, so the join
    between them reuses one hash partitioning (co-located, no second
    fact shuffle); the regroup to (cohort_date, day_offset) reduces to
    a DATE-RANGE-bounded relation (days x days rows, independent of
    user count), and cohort sizes join back as a broadcast. No window
    over per-user event history and no per-user sort anywhere."""
    ev = load_table(spark, sf_dir, "events")
    firstd = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_date")
    )
    activity = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    ret = (
        activity.join(firstd, "user_id")
        .groupBy("cohort_date", F.datediff("d", "cohort_date").alias("day_offset"))
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    sizes = firstd.groupBy("cohort_date").agg(F.count("*").alias("n_cohort"))
    return ret.join(F.broadcast(sizes), "cohort_date").select(
        "cohort_date",
        F.col("day_offset").cast("long").alias("day_offset"),
        "n_active",
        "n_cohort",
        round_det(F.col("n_active") / F.col("n_cohort"), 4).alias("retention"),
    )
