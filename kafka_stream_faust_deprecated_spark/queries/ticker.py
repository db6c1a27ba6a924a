"""Ticker analytics over the event stream (round-7 wave 8).

The reference app is a stock-tick consumer: it receives per-second
VWAP prices per symbol and maintains a 5-observation simple moving
average (``faust_app/ma_agg.py:49-91``). FIXTURES.md designates
``events(user_id, ts, value)`` as the batch surrogate of that
``(symbol, current_time, vwap_price_per_sec)`` stream, with
``props.k`` as the volume analog — this module builds the rest of the
ticker-analytics desk on top of the same surrogate, each as an
oracle-checked query:

* ``ohlc_bars_daily``          — per-symbol daily OHLCV candles: the
  first/last-by-time open/close plus high/low/volume/tick-count, the
  canonical resample every charting and backtest stack starts from.
* ``vwap_daily``               — per-symbol daily volume-weighted
  average price vs the unweighted mean: the execution-quality
  benchmark (exact DECIMAL notional and volume sums).
* ``bollinger_bands``          — 5-day trailing SMA +/- 2 sigma bands
  over daily closes with breakout flags: the reference's 5-row SMA
  extended to its textbook volatility envelope.
* ``rsi_cutler``               — Cutler's 14-day RSI (SMA-based gains
  vs losses over exact DECIMAL close-to-close deltas): the
  momentum-oscillator shape (the SMA variant is chosen over Wilder's
  EMA precisely because it is windowed, not recursive).
* ``max_drawdown_daily``       — per-symbol maximum drawdown from the
  running close peak, with the trough day: the risk metric whose
  running-max window is the prefix-scan idiom.
* ``symbol_return_correlation``— pairwise Pearson correlation of
  daily returns across the top-10 symbols by traded volume: the
  portfolio co-movement matrix, computed from exact DECIMAL moment
  sums so the float combine order can never flip a value.

Reference parity note: the reference (308 lines) computes ONLY the
5-row SMA; these extend the same tick domain for the large-scale
analytics mandate (SURVEY.md §2b/§2c).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kafka_stream_faust_deprecated_spark.functions.rounding import (
    round_det,
    sql_round_det,
)
from kafka_stream_faust_deprecated_spark.io import load_table_parallel
from kafka_stream_faust_deprecated_spark.registry import register

# --------------------------------------------------------------------------
# shared tick / daily-bar shape
# --------------------------------------------------------------------------

#: Tick projection: price as exact DECIMAL(12,2) (the fixture writes
#: 2-decimal values), volume from the props JSON, (ts, event_id) as the
#: total order (ts alone may tie at scale).
_T_SQL = """
t AS (
    SELECT user_id,
           CAST(ts AS DATE) AS day,
           CAST(value AS DECIMAL(12,2)) AS px,
           CAST(json_extract(props, '$.k') AS BIGINT) AS vol,
           ts, event_id
    FROM events
)
"""

#: Daily bars: open/close via first/last over the full (user, day)
#: frame ordered by (ts, event_id) — the one formulation whose frame
#: semantics are identical in Spark and DuckDB (arg_min/arg_max
#: composite-key support differs across engines).
_BARS_SQL = """
marked AS (
    SELECT user_id, day, px, vol,
           first_value(px) OVER (
               PARTITION BY user_id, day ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS open_px,
           last_value(px) OVER (
               PARTITION BY user_id, day ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS close_px
    FROM t
),
bars AS (
    SELECT user_id, day,
           max(open_px)  AS open_px,
           max(px)       AS high_px,
           min(px)       AS low_px,
           max(close_px) AS close_px,
           CAST(sum(vol) AS BIGINT) AS volume,
           count(*)::BIGINT AS n_ticks
    FROM marked GROUP BY user_id, day
)
"""


def _ticks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of ``_T_SQL``."""
    return load_table_parallel(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.col("value").cast("decimal(12,2)").alias("px"),
        F.get_json_object("props", "$.k").cast("long").alias("vol"),
        "ts",
        "event_id",
    )


def _daily_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of ``_BARS_SQL``: per-(symbol, day) OHLCV candles
    with DECIMAL prices. One (user_id, day)-keyed exchange: the
    hash aggregate rides the window's partitioning, so the open/close
    sort and the high/low/volume combine share a single shuffle."""
    t = _ticks(spark, sf_dir)
    frame = (
        Window.partitionBy("user_id", "day")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    marked = t.withColumn("open_px", F.first("px").over(frame)).withColumn(
        "close_px", F.last("px").over(frame)
    )
    return marked.groupBy("user_id", "day").agg(
        F.max("open_px").alias("open_px"),
        F.max("px").alias("high_px"),
        F.min("px").alias("low_px"),
        F.max("close_px").alias("close_px"),
        F.sum("vol").alias("volume"),
        F.count(F.lit(1)).alias("n_ticks"),
    )


# --------------------------------------------------------------------------
# ohlc_bars_daily
# --------------------------------------------------------------------------


@register(
    "ohlc_bars_daily",
    oracle=f"""
WITH {_T_SQL}, {_BARS_SQL}
SELECT user_id,
       strftime(day, '%Y-%m-%d') AS day,
       CAST(open_px  AS DOUBLE) AS open,
       CAST(high_px  AS DOUBLE) AS high,
       CAST(low_px   AS DOUBLE) AS low,
       CAST(close_px AS DOUBLE) AS close,
       volume, n_ticks
FROM bars
""",
    tags=("E7", "E10", "E15", "E18"),
)
def ohlc_bars_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLCV candles per symbol: open = price of the first tick
    of the day, close = the last (total order (ts, event_id), so a
    shared timestamp cannot flip the candle), high/low = min/max,
    volume = exact integer sum of the props.k volume analog. Every
    output price is a SELECTED exact 2-decimal value — no float
    arithmetic exists in this query, so no rounding contract is
    needed.

    Scale shape: one (user_id, day)-keyed exchange; the open/close
    window sort and the high/low/volume hash aggregate share that
    partitioning, and the aggregate's map side combines before any
    network move. Output is calendar-bounded per symbol — the classic
    corpus -> bars collapse every downstream ticker query reuses.
    """
    return _daily_bars(spark, sf_dir).select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("open_px").cast("double").alias("open"),
        F.col("high_px").cast("double").alias("high"),
        F.col("low_px").cast("double").alias("low"),
        F.col("close_px").cast("double").alias("close"),
        "volume",
        "n_ticks",
    )


# --------------------------------------------------------------------------
# vwap_daily
# --------------------------------------------------------------------------


@register(
    "vwap_daily",
    oracle=f"""
WITH {_T_SQL}
SELECT user_id,
       strftime(day, '%Y-%m-%d') AS day,
       CAST(sum(vol) AS BIGINT) AS volume,
       count(*)::BIGINT AS n_ticks,
       {sql_round_det(
           "CAST(sum(px * CAST(vol AS DECIMAL(10,0))) AS DOUBLE)"
           " / nullif(CAST(sum(vol) AS DOUBLE), 0.0)", 4)} AS vwap,
       {sql_round_det(
           "CAST(sum(px) AS DOUBLE) / count(*)", 4)} AS mean_px
FROM t GROUP BY user_id, day
""",
    tags=("E7", "E15", "E16", "E18"),
)
def vwap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-symbol daily volume-weighted average price next to the
    unweighted tick mean — the execution-quality benchmark pair. The
    notional sum(px * vol) and the volume sum are EXACT DECIMAL /
    integer aggregates (order-independent), so the only float step is
    the final division, rounded under the shared 4-dp contract; a
    zero-volume day yields NULL vwap via nullif in both engines.

    Scale shape: a single (user_id, day)-keyed hash aggregate with
    map-side combine — the minimal plan for the query; nothing larger
    than the bar relation ever moves.
    """
    t = _ticks(spark, sf_dir)
    out = t.groupBy("user_id", "day").agg(
        F.sum("vol").alias("volume"),
        F.count(F.lit(1)).alias("n_ticks"),
        F.sum(F.col("px") * F.col("vol").cast("decimal(10,0)")).alias("notional"),
        F.sum("px").alias("px_sum"),
    )
    return out.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "volume",
        "n_ticks",
        round_det(
            F.col("notional").cast("double")
            / F.nullif(F.col("volume").cast("double"), F.lit(0.0)),
            4,
        ).alias("vwap"),
        round_det(
            F.col("px_sum").cast("double") / F.col("n_ticks"), 4
        ).alias("mean_px"),
    )


# --------------------------------------------------------------------------
# bollinger_bands
# --------------------------------------------------------------------------

#: Trailing window length (observations) and the band width in sigmas.
BOLL_N = 5
BOLL_K = 2.0


@register(
    "bollinger_bands",
    oracle=f"""
WITH {_T_SQL}, {_BARS_SQL},
win AS (
    SELECT user_id, day, close_px,
           count(*) OVER w AS cnt,
           sum(close_px) OVER w AS s,
           sum(close_px * close_px) OVER w AS ss
    FROM bars
    WINDOW w AS (
        PARTITION BY user_id ORDER BY day
        ROWS BETWEEN {BOLL_N - 1} PRECEDING AND CURRENT ROW
    )
),
b AS (
    SELECT user_id, day, close_px,
           CAST(s AS DOUBLE) / {BOLL_N} AS mu,
           sqrt(greatest(
               CAST(ss AS DOUBLE) / {BOLL_N}
               - (CAST(s AS DOUBLE) / {BOLL_N}) * (CAST(s AS DOUBLE) / {BOLL_N}),
               0.0)) AS sigma
    FROM win WHERE cnt = {BOLL_N}
)
SELECT user_id,
       strftime(day, '%Y-%m-%d') AS day,
       CAST(close_px AS DOUBLE) AS close,
       {sql_round_det("mu", 4)} AS sma,
       {sql_round_det("sigma", 4)} AS sigma,
       {sql_round_det(f"mu + {BOLL_K} * sigma", 4)} AS upper_band,
       {sql_round_det(f"mu - {BOLL_K} * sigma", 4)} AS lower_band,
       CASE
           WHEN CAST(close_px AS DOUBLE) > {sql_round_det(f"mu + {BOLL_K} * sigma", 4)} THEN 1
           WHEN CAST(close_px AS DOUBLE) < {sql_round_det(f"mu - {BOLL_K} * sigma", 4)} THEN -1
           ELSE 0
       END AS breakout
FROM b
""",
    tags=("E7", "E10", "E11", "E16"),
)
def bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-day trailing Bollinger bands over daily closes: SMA +/- 2
    population sigmas, emitted only for full windows, with a breakout
    flag (+1 above the upper band, -1 below the lower). This is the
    reference's 5-row SMA (``faust_app/ma_agg.py:57-66``) upgraded to
    its volatility envelope. Both window moments (sum, sum of squares)
    are EXACT DECIMAL sums of 2-/4-decimal values, so mu/sigma are
    pure functions of exact inputs; the bands are rounded under the
    shared 4-dp contract and the breakout compares the exact close
    against the ROUNDED band, so the flag cannot flicker on last-ulp
    drift.

    Scale shape: the corpus collapses to calendar-bounded daily bars
    first (one (user, day) exchange), then one user-keyed exchange
    sorts each symbol's bar series; the trailing frame is O(N) per
    row with constant state. No join, no fan-out.
    """
    bars = _daily_bars(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(-(BOLL_N - 1), Window.currentRow)
    )
    win = bars.select(
        "user_id",
        "day",
        "close_px",
        F.count(F.lit(1)).over(w).alias("cnt"),
        F.sum("close_px").over(w).alias("s"),
        F.sum(F.col("close_px") * F.col("close_px")).over(w).alias("ss"),
    ).where(F.col("cnt") == BOLL_N)
    mu = F.col("s").cast("double") / BOLL_N
    sigma = F.sqrt(
        F.greatest(
            F.col("ss").cast("double") / BOLL_N - mu * mu, F.lit(0.0)
        )
    )
    upper = round_det(mu + BOLL_K * sigma, 4)
    lower = round_det(mu - BOLL_K * sigma, 4)
    close_d = F.col("close_px").cast("double")
    return win.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        close_d.alias("close"),
        round_det(mu, 4).alias("sma"),
        round_det(sigma, 4).alias("sigma"),
        upper.alias("upper_band"),
        lower.alias("lower_band"),
        F.when(close_d > upper, F.lit(1))
        .when(close_d < lower, F.lit(-1))
        .otherwise(F.lit(0))
        .alias("breakout"),
    )


# --------------------------------------------------------------------------
# rsi_cutler
# --------------------------------------------------------------------------

#: Cutler's RSI lookback (close-to-close deltas per full window).
RSI_N = 14


@register(
    "rsi_cutler",
    oracle=f"""
WITH {_T_SQL}, {_BARS_SQL},
d AS (
    SELECT user_id, day, close_px,
           close_px - lag(close_px) OVER (
               PARTITION BY user_id ORDER BY day) AS delta
    FROM bars
),
g AS (
    SELECT user_id, day,
           CASE WHEN delta > 0 THEN delta ELSE CAST(0 AS DECIMAL(13,2)) END AS gain,
           CASE WHEN delta < 0 THEN -delta ELSE CAST(0 AS DECIMAL(13,2)) END AS loss
    FROM d WHERE delta IS NOT NULL
),
w AS (
    SELECT user_id, day,
           count(*) OVER win AS cnt,
           sum(gain) OVER win AS sg,
           sum(loss) OVER win AS sl
    FROM g
    WINDOW win AS (
        PARTITION BY user_id ORDER BY day
        ROWS BETWEEN {RSI_N - 1} PRECEDING AND CURRENT ROW
    )
)
SELECT user_id,
       strftime(day, '%Y-%m-%d') AS day,
       {sql_round_det(f"CAST(sg AS DOUBLE) / {RSI_N}", 4)} AS avg_gain,
       {sql_round_det(f"CAST(sl AS DOUBLE) / {RSI_N}", 4)} AS avg_loss,
       CASE WHEN sl = 0 THEN 100.0
            ELSE {sql_round_det(
                "100.0 - 100.0 / (1.0 + CAST(sg AS DOUBLE) / CAST(sl AS DOUBLE))",
                4)}
       END AS rsi
FROM w WHERE cnt = {RSI_N}
""",
    tags=("E7", "E10", "E16"),
)
def rsi_cutler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cutler's 14-day RSI per symbol: close-to-close deltas split
    into gains and losses, averaged over a FULL trailing window of 14
    deltas, RSI = 100 - 100/(1 + avg_gain/avg_loss), with the
    all-losses-zero day pinned to 100 (the textbook convention). The
    deltas, gain/loss splits, and window sums are EXACT DECIMAL
    arithmetic; only the final ratio is float, rounded under the
    shared contract. The SMA (Cutler) variant is deliberately chosen
    over Wilder's smoothing: it is windowed, so the value is a pure
    function of the last 14 deltas rather than the entire history —
    the property that makes it both backfillable and cross-engine
    checkable.

    Scale shape: bars collapse first, then ONE user-keyed exchange
    serves the lag, the gain/loss projection, and the trailing-frame
    sums (Spark stacks the three window passes over a single sort).
    """
    bars = _daily_bars(spark, sf_dir)
    series = Window.partitionBy("user_id").orderBy("day")
    d = bars.select(
        "user_id",
        "day",
        (F.col("close_px") - F.lag("close_px").over(series)).alias("delta"),
    ).where(F.col("delta").isNotNull())
    zero = F.lit(0).cast("decimal(13,2)")
    g = d.select(
        "user_id",
        "day",
        F.when(F.col("delta") > 0, F.col("delta")).otherwise(zero).alias("gain"),
        F.when(F.col("delta") < 0, -F.col("delta")).otherwise(zero).alias("loss"),
    )
    win = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(-(RSI_N - 1), Window.currentRow)
    )
    w = g.select(
        "user_id",
        "day",
        F.count(F.lit(1)).over(win).alias("cnt"),
        F.sum("gain").over(win).alias("sg"),
        F.sum("loss").over(win).alias("sl"),
    ).where(F.col("cnt") == RSI_N)
    sg_d = F.col("sg").cast("double")
    sl_d = F.col("sl").cast("double")
    return w.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        round_det(sg_d / RSI_N, 4).alias("avg_gain"),
        round_det(sl_d / RSI_N, 4).alias("avg_loss"),
        F.when(F.col("sl") == 0, F.lit(100.0))
        .otherwise(round_det(100.0 - 100.0 / (1.0 + sg_d / sl_d), 4))
        .alias("rsi"),
    )


# --------------------------------------------------------------------------
# max_drawdown_daily
# --------------------------------------------------------------------------


@register(
    "max_drawdown_daily",
    oracle=f"""
WITH {_T_SQL}, {_BARS_SQL},
run AS (
    SELECT user_id, day, close_px,
           max(close_px) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS peak_px,
           count(*) OVER (PARTITION BY user_id) AS n_days
    FROM bars
),
dd AS (
    -- nullif: a zero running peak (a symbol whose prices open at
    -- 0.00) yields NULL drawdown instead of an ANSI divide error;
    -- NULLS LAST pins the rank order identically in both engines
    SELECT user_id, day, close_px, peak_px, n_days,
           {sql_round_det(
               "(CAST(peak_px AS DOUBLE) - CAST(close_px AS DOUBLE))"
               " / nullif(CAST(peak_px AS DOUBLE), 0.0)", 6)} AS drawdown,
           row_number() OVER (
               PARTITION BY user_id
               ORDER BY {sql_round_det(
                   "(CAST(peak_px AS DOUBLE) - CAST(close_px AS DOUBLE))"
                   " / nullif(CAST(peak_px AS DOUBLE), 0.0)",
                   6)} DESC NULLS LAST, day
           ) AS rn
    FROM run
)
SELECT user_id,
       CAST(n_days AS BIGINT) AS n_days,
       drawdown AS max_drawdown,
       CAST(peak_px AS DOUBLE) AS peak,
       CAST(close_px AS DOUBLE) AS trough_close,
       strftime(day, '%Y-%m-%d') AS trough_day
FROM dd WHERE rn = 1
""",
    tags=("E7", "E10", "E12", "E16"),
)
def max_drawdown_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-symbol maximum drawdown: the largest fractional drop of the
    daily close from its running peak, with the trough day. The
    running peak is an exact DECIMAL prefix max; the drawdown ratio is
    the only float step and is rounded to 6 dp BEFORE the argmax rank
    (day ascending as the lexicographic tiebreak), so the selected
    trough cannot flicker on last-ulp drift — the cusum_changepoint
    ranked-on-rounded idiom.

    Scale shape: bars collapse first, then one user-keyed exchange
    serves the running-max prefix scan, the per-symbol count, and the
    argmax rank (one sort, three window passes). Output is one row
    per symbol.
    """
    bars = _daily_bars(spark, sf_dir)
    prefix = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = bars.select(
        "user_id",
        "day",
        "close_px",
        F.max("close_px").over(prefix).alias("peak_px"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n_days"),
    )
    drawdown = round_det(
        (F.col("peak_px").cast("double") - F.col("close_px").cast("double"))
        / F.nullif(F.col("peak_px").cast("double"), F.lit(0.0)),
        6,
    )
    dd = run.select(
        "user_id",
        "day",
        "close_px",
        "peak_px",
        "n_days",
        drawdown.alias("drawdown"),
        F.row_number()
        .over(
            Window.partitionBy("user_id").orderBy(
                drawdown.desc_nulls_last(), F.col("day")
            )
        )
        .alias("rn"),
    )
    return dd.where(F.col("rn") == 1).select(
        "user_id",
        F.col("n_days").cast("bigint").alias("n_days"),
        F.col("drawdown").alias("max_drawdown"),
        F.col("peak_px").cast("double").alias("peak"),
        F.col("close_px").cast("double").alias("trough_close"),
        F.date_format("day", "yyyy-MM-dd").alias("trough_day"),
    )


# --------------------------------------------------------------------------
# symbol_return_correlation
# --------------------------------------------------------------------------

#: Correlation universe size (top symbols by traded volume) and the
#: minimum overlapping-return days for a pair to be reported.
CORR_TOP_K = 10
CORR_MIN_DAYS = 10


@register(
    "symbol_return_correlation",
    oracle=f"""
WITH {_T_SQL}, {_BARS_SQL},
topk AS (
    SELECT user_id FROM (
        SELECT user_id, CAST(sum(vol) AS BIGINT) AS tv
        FROM t GROUP BY user_id
        ORDER BY tv DESC, user_id
        LIMIT {CORR_TOP_K}
    )
),
rets AS (
    -- nullif: a zero previous close yields a NULL return (Spark's
    -- ANSI mode errors on the division where DuckDB yields inf)
    SELECT b.user_id, b.day,
           CAST({sql_round_det(
               "CAST(b.close_px AS DOUBLE) / nullif(CAST(lag(b.close_px)"
               " OVER (PARTITION BY b.user_id ORDER BY b.day) AS DOUBLE),"
               " 0.0) - 1.0",
               6)} AS DECIMAL(18,6)) AS r
    FROM bars b JOIN topk USING (user_id)
),
pairs AS (
    -- DECIMAL(19,6) casts force DuckDB's int128 multiply path: a
    -- DECIMAL(<=18) product runs in int64 and overflows its raw
    -- representation once |return| exceeds ~1e3
    SELECT a.user_id AS user_a, b.user_id AS user_b,
           count(*)::BIGINT AS n_days,
           sum(a.r) AS sx, sum(b.r) AS sy,
           sum(CAST(a.r AS DECIMAL(19,6)) * CAST(b.r AS DECIMAL(19,6))) AS sxy,
           sum(CAST(a.r AS DECIMAL(19,6)) * CAST(a.r AS DECIMAL(19,6))) AS sxx,
           sum(CAST(b.r AS DECIMAL(19,6)) * CAST(b.r AS DECIMAL(19,6))) AS syy
    FROM rets a JOIN rets b
      ON a.day = b.day AND a.user_id < b.user_id
    WHERE a.r IS NOT NULL AND b.r IS NOT NULL
    GROUP BY a.user_id, b.user_id
    HAVING count(*) >= {CORR_MIN_DAYS}
)
SELECT user_a, user_b, n_days,
       {sql_round_det(
           "(CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)"
           " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
           " / nullif(sqrt("
           "   greatest(CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)"
           "            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0)"
           " * greatest(CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE)"
           "            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE), 0.0)"
           "), 0.0)", 4)} AS corr
FROM pairs
""",
    tags=("E3", "E7", "E10", "E16"),
)
def symbol_return_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation of daily close-to-close returns
    across the top-{CORR_TOP_K} symbols by total traded volume
    (deterministic exact-integer rank, user_id tiebreak), over their
    overlapping return days (>= {CORR_MIN_DAYS} required). Returns are
    rounded to 6 dp and FIXED as DECIMAL(18,6), so every moment sum
    (sum x, sum y, sum xy, sum x^2, sum y^2) is exact and
    order-independent; the correlation is then a pure double function
    of exact moments, rounded to 4 dp — a distributed float reduction
    can never flip a reported value.

    Scale shape: the corpus collapses to calendar-bounded bars, the
    universe is picked by a TakeOrderedAndProject top-K (never a
    global single-partition rank over all symbols) and broadcast; the
    K-symbol return relation then folds into per-day arrays (one
    day-keyed exchange over a <= K-rows-per-day relation) and the
    pairs expand JVM-side inside each day row, bounded by K^2 x
    calendar — independent of corpus size. The single-lineage array
    form is deliberate: the naive two-branch self-join evaluates the
    corpus-sized bar pipeline TWICE (Spark's exchange reuse does not
    fire across the alias-renamed branches), this one exactly once.
    """
    t = _ticks(spark, sf_dir)
    topk = (
        t.groupBy("user_id")
        .agg(F.sum("vol").alias("tv"))
        .orderBy(F.desc("tv"), "user_id")
        .limit(CORR_TOP_K)
        .select("user_id")
    )
    bars = _daily_bars(spark, sf_dir).join(F.broadcast(topk), "user_id")
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
    day_groups = rets.groupBy("day").agg(
        F.collect_list(F.struct("user_id", "r")).alias("us")
    )
    flat = (
        day_groups.select(F.explode("us").alias("a"), "us")
        .select("a", F.explode("us").alias("b"))
        .where(F.col("a.user_id") < F.col("b.user_id"))
        .select(
            F.col("a.user_id").alias("user_a"),
            F.col("b.user_id").alias("user_b"),
            F.col("a.r").alias("ra"),
            F.col("b.r").alias("rb"),
        )
    )
    pairs = (
        flat.groupBy("user_a", "user_b")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("ra").alias("sx"),
            F.sum("rb").alias("sy"),
            F.sum(F.col("ra") * F.col("rb")).alias("sxy"),
            F.sum(F.col("ra") * F.col("ra")).alias("sxx"),
            F.sum(F.col("rb") * F.col("rb")).alias("syy"),
        )
        .where(F.col("n_days") >= CORR_MIN_DAYS)
    )
    n_d = F.col("n_days").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    den = F.sqrt(
        F.greatest(n_d * sxx - sx * sx, F.lit(0.0))
        * F.greatest(n_d * syy - sy * sy, F.lit(0.0))
    )
    return pairs.select(
        "user_a",
        "user_b",
        "n_days",
        round_det(
            (n_d * sxy - sx * sy) / F.nullif(den, F.lit(0.0)), 4
        ).alias("corr"),
    )
