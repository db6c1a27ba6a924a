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

Cost at scale: ONE bucket-hash shuffle — both window passes run over
the same unioned (real + probe) relation with the same ``_bkt``
partitioning (Spark reuses the exchange and only re-sorts between
them): the RANGE frame counts reals at ``v' <= v`` (ties included
regardless of sort position, so probes in the frame are harmless —
they sum 0), the ROWS frame with probes ordered before equal reals
counts reals strictly below each probe. Each row keeps the count that
matters for its kind, and one id-keyed aggregate zips the real row's
cntLE with its probe's cntLT — no self-join of the two count passes.
Plus one broadcast of the bucket offsets and the final id-keyed join
back onto the caller's rows. No stage sees more than one bucket's rows
per task, and skewed buckets split under AQE.
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

    # Both passes over ONE relation, same _bkt partitioning (exchange
    # reused, only the sort differs between the windows):
    # cntLE on real rows: the RANGE frame includes every tie at
    # v' == v — probes inside the frame sum 0, so their presence and
    # their tie ordering cannot perturb the real count.
    w_le = (
        Window.partitionBy("_bkt")
        .orderBy("_v")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    # cntLT on probe rows: probes order BEFORE equal-valued reals
    # (_probe DESC), so the ROWS-frame running count of reals seen
    # strictly before a probe is exactly #{v' < probe value}.
    w_lt = (
        Window.partitionBy("_bkt")
        .orderBy(F.col("_v").asc(), F.col("_probe").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ann = (
        both.join(F.broadcast(offsets), "_bkt")
        .withColumn("_le_in_bkt", F.sum(1 - F.col("_probe")).over(w_le))
        .withColumn("_lt_in_bkt", F.sum(1 - F.col("_probe")).over(w_lt))
    )
    # each id contributes exactly one real and one probe row; zip them
    # with one id-keyed aggregate instead of a cnt_le x cnt_lt self-join
    counts = ann.groupBy(*id_cols).agg(
        (
            F.max(F.when(F.col("_probe") == 0, F.col("_offset") + F.col("_le_in_bkt")))
            - F.max(
                F.when(F.col("_probe") == 1, F.col("_offset") + F.col("_lt_in_bkt"))
            )
        ).alias(out_col)
    )
    return df.join(counts, list(id_cols))
