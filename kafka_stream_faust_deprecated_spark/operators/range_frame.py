"""Distributed global value-RANGE frame counts (SURVEY.md §2b E10/E11).

``COUNT(*) OVER (ORDER BY v RANGE BETWEEN w PRECEDING AND CURRENT ROW)``
with no PARTITION BY funnels every row through one task — a 100 TB
scale killer. This operator computes the identical result with only
bucket-partitioned windows:

    n(v) = cntLE(v) - cntLT(v - w)

where both terms decompose over width-``w`` value buckets
(``bkt = floor(v / w)``):

* ``cntLE(v)``  = offset(bkt(v))   + #{rows in bkt(v):   v' <= v}
* ``cntLT(v-w)`` = offset(bkt(v)-w') + #{rows in bkt(v-w): v' < v-w}
  (``bkt(v-w) = bkt(v) - 1`` exactly, because the shift equals the
  bucket width)

``offset(b)`` — rows in all buckets below ``b`` — is a running sum over
the BUCKET-level aggregate, whose cardinality is O(value_domain / w),
independent of row count; that tiny relation is the only place a global
ordering appears. The strict ``<`` needed for the lower bound can't be
a RANGE frame over doubles, so probe rows (one per input row, at value
``v - w``) are unioned in and ordered BEFORE equal-valued real rows;
a ROWS-frame running count of real rows at each probe is then exactly
``#{v' < v - w}`` within the bucket.

Cost at scale: two bucket-hash shuffles (window partitioning + the
final probe/real re-join on the row id) and one broadcast of the bucket
offsets. No stage sees more than one bucket's rows per task, and skewed
buckets split under AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_range_count(
    df: DataFrame,
    value_col: str,
    width: float,
    id_cols: tuple[str, ...],
    out_col: str = "n_in_range",
) -> DataFrame:
    """Append ``out_col`` = #{rows: value - width <= value' <= value}.

    ``id_cols`` must uniquely identify a row (used to re-join the probe
    pass). Equivalent to the unpartitioned SQL window
    ``COUNT(*) OVER (ORDER BY value RANGE BETWEEN width PRECEDING AND
    CURRENT ROW)`` but with every per-row window partitioned by bucket.
    """
    v = F.col(value_col).cast("double")
    ids = [F.col(c) for c in id_cols]

    reals = df.select(
        *ids, v.alias("_v"), F.lit(0).alias("_probe")
    ).withColumn("_bkt", F.floor(F.col("_v") / F.lit(float(width))))
    probes = df.select(
        *ids, (v - F.lit(float(width))).alias("_v"), F.lit(1).alias("_probe")
    ).withColumn("_bkt", F.floor(F.col("_v") / F.lit(float(width))))
    both = reals.unionByName(probes)

    # Bucket-level offsets: rows in all strictly-lower buckets. The
    # aggregate has one row per occupied bucket (reals or probes), so
    # the global ordering here is over O(domain/width) rows, not data.
    bucket_counts = both.groupBy("_bkt").agg(
        F.sum(1 - F.col("_probe")).alias("_n_reals")
    )
    w_off = Window.orderBy("_bkt").rangeBetween(Window.unboundedPreceding, -1)
    offsets = bucket_counts.select(
        "_bkt",
        F.coalesce(F.sum("_n_reals").over(w_off), F.lit(0)).alias("_offset"),
    )

    # cntLE for real rows: RANGE frame includes every tie at v' == v.
    w_le = (
        Window.partitionBy("_bkt")
        .orderBy("_v")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    cnt_le = (
        reals.join(F.broadcast(offsets), "_bkt")
        .withColumn("_cnt_le", F.col("_offset") + F.count(F.lit(1)).over(w_le))
        .select(*id_cols, "_cnt_le")
    )

    # cntLT for probe rows: probes order BEFORE equal-valued reals
    # (_probe DESC), so the ROWS-frame running count of reals seen
    # strictly before a probe is exactly #{v' < probe value}.
    w_lt = (
        Window.partitionBy("_bkt")
        .orderBy(F.col("_v").asc(), F.col("_probe").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cnt_lt = (
        both.join(F.broadcast(offsets), "_bkt")
        .withColumn("_running_reals", F.sum(1 - F.col("_probe")).over(w_lt))
        .where(F.col("_probe") == 1)
        .withColumn("_cnt_lt", F.col("_offset") + F.col("_running_reals"))
        .select(*id_cols, "_cnt_lt")
    )

    counts = cnt_le.join(cnt_lt, list(id_cols)).select(
        *id_cols, (F.col("_cnt_le") - F.col("_cnt_lt")).alias(out_col)
    )
    return df.join(counts, list(id_cols))
