"""Time-series diagnostics over the order/lineitem history (SURVEY.md
§2.AA, round 9).

The trend-health layer a warehouse runs over its own KPI series: lagged
autocorrelation (is the monthly series momentum-driven or mean-
reverting?), a CUSUM change-point locator (WHEN did the level shift?),
a calendar seasonality index (which months structurally over/under-
index?), maximum drawdown on the returns-signed revenue stream (worst
peak-to-trough slide), and longest month-over-month growth streaks.
§2.I's q_revenue_mom_growth plots the trend; these five judge it.

Exactness discipline (repo-wide contract): every statistic is integer.
Money enters on the exact cent grid (`floor(v*100 + 0.5)`), series
deviations are mean-centered WITHOUT division by n-scaling both sides
(`d_t = n*c_t - S` — an exact integer whose pairwise products are the
textbook ACF numerator x n^2), and effects leave in basis points via
integer division (Spark `div` == DuckDB `//`: both truncate toward zero
on BIGINT, measured in functions/exactmath.py). Overflow bound, stated
loudly: the ACF spelling is exact while 10^4 * n_months * (n_months *
dev_range)^2 < 2^63 — monthly-count deviations up to ~10^3 at a
100-month span, i.e. ~10x this corpus's sf0.1; past that, pre-scale the
series (counts in thousands) — ACF in bp is invariant to uniform
scaling up to the integer grid, and the rescale is a one-line map.

Spark-first shape, sized for 100 TB:
- Every query collapses the fact table FIRST with one partial-aggregated
  groupBy to a calendar-bounded relation (<= |months| or |days| rows —
  thousands at any corpus size). That map-side-combined aggregation is
  the only full-data exchange; it is the cost floor any aggregation
  pays. The collapsed series is pinned with a localCheckpoint, because
  Catalyst does not deduplicate common subplans: every downstream
  branch (totals, deviations, pair joins) would otherwise re-scan and
  re-aggregate the fact — exactly one fact pass per query, asserted in
  tests/test_plans.py.
- All ordered windows (running sums, running max, lag diffs, islands)
  run over the calendar-bounded series — a single in-memory partition by
  construction, NOT a scalability term. The 1-row totals join is a
  broadcast.
- The ACF pair join is |series| x |lags| on an ~100-row input — a
  broadcast nested loop on purpose, bounded by the calendar, never the
  corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query

_CENTS = "CAST(floor({col} * 100 + 0.5) AS BIGINT)"

# ym rendered engine-identically: zero-padded '<yyyy>-<MM>' from integers
_YM_SQL = "concat(lpad(CAST(yr AS VARCHAR), 4, '0'), '-', lpad(CAST(mo AS VARCHAR), 2, '0'))"

# DuckDB monthly order-count series with a dense time index t = 1..n
_MONTHLY_SQL = """
monthly AS (
  SELECT CAST(year(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS yr,
         CAST(month(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS mo,
         CAST(count(*) AS BIGINT) AS c
  FROM orders GROUP BY 1, 2
),
idxd AS (
  SELECT CAST(row_number() OVER (ORDER BY yr, mo) AS BIGINT) AS t, yr, mo, c
  FROM monthly
)
"""


def _monthly_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(t, yr, mo, c): observed monthly order counts, t = 1..n in time
    order. One map-side-combined groupBy over orders; the row_number
    window runs over the |months|-row aggregate, never the fact. The
    result is pinned with a localCheckpoint: Catalyst does NOT reuse
    common subplans, so without it every downstream branch (totals,
    deviations, denominator, pair join) would re-scan and re-aggregate
    the fact table — aa1 planned SIX orders scans. The checkpoint is
    |months| rows and caps every query here at exactly one fact pass
    (plan-asserted in tests/test_plans.py)."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    return monthly.select(
        F.row_number().over(Window.orderBy("yr", "mo")).cast("long").alias("t"),
        "yr",
        "mo",
        "c",
    ).localCheckpoint()


@query(
    "q_ts_autocorr",
    oracle=f"""
    WITH {_MONTHLY_SQL},
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS s FROM idxd),
    dev AS (SELECT t, tot.n * c - tot.s AS d FROM idxd, tot),
    den AS (SELECT CAST(sum(d * d) AS BIGINT) AS den FROM dev),
    lags(lag_m) AS (VALUES (CAST(1 AS BIGINT)), (2), (3), (4), (5), (6)),
    num AS (
      SELECT l.lag_m, CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(a.d * b.d) AS BIGINT) AS acf_num
      FROM lags l
      JOIN dev a ON TRUE
      JOIN dev b ON b.t = a.t + l.lag_m
      GROUP BY 1
    )
    SELECT num.lag_m, num.n_pairs, num.acf_num, den.den AS acf_den,
           (10000 * num.acf_num) // den.den AS acf_bp
    FROM num, den ORDER BY num.lag_m
    """,
)
def q_ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AA aa1 — lag-1..6 autocorrelation of the monthly order-count
    series: for each lag k, the exact integer ACF numerator/denominator
    (deviations n-scaled: d_t = n*c_t - S, so num_k = n^2 * the textbook
    sum) and the ratio in truncated basis points. Positive lag-1 bp =
    momentum; negative = mean reversion; the lag-12 analogue is the
    seasonality probe (kept at 6 here: the corpus spans ~7 years).

    Scale: orders collapse map-side to |months| rows; deviations join a
    broadcast 1-row total; the pair join is |months| x 6 on an ~100-row
    relation. Exact while 10^4*n*(n*dev)^2 < 2^63 (docstring of the
    module states the pre-scaling hatch past that)."""
    idxd = _monthly_indexed(spark, sf_dir)
    tot = idxd.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
    )
    dev = idxd.crossJoin(F.broadcast(tot)).select(
        "t", (F.col("n") * F.col("c") - F.col("s")).alias("d")
    )
    den = dev.agg(F.sum(F.col("d") * F.col("d")).cast("long").alias("den"))
    lags = spark.range(1, 7).select(F.col("id").alias("lag_m"))
    a, b = dev.alias("a"), dev.alias("b")
    num = (
        lags.crossJoin(a)
        .join(b, F.col("b.t") == F.col("a.t") + F.col("lag_m"))
        .groupBy("lag_m")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("a.d") * F.col("b.d")).cast("long").alias("acf_num"),
        )
    )
    return (
        num.crossJoin(F.broadcast(den))
        .select(
            "lag_m",
            "n_pairs",
            "acf_num",
            F.col("den").alias("acf_den"),
            F.expr("(10000 * acf_num) div den").alias("acf_bp"),
        )
        .orderBy("lag_m")
    )


@query(
    "q_ts_cusum_changepoint",
    oracle=f"""
    WITH {_MONTHLY_SQL},
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS s FROM idxd),
    run AS (
      SELECT t, yr, mo,
             CAST(sum(c) OVER (ORDER BY t) AS BIGINT) AS st
      FROM idxd
    ),
    dd AS (
      SELECT run.t, yr, mo, st, tot.n, tot.s,
             abs(tot.n * st - run.t * tot.s) AS cusum_abs
      FROM run, tot
    )
    SELECT {_YM_SQL} AS cp_ym, t AS cp_t, cusum_abs,
           n AS n_months, st AS pre_orders, s - st AS post_orders
    FROM dd ORDER BY cusum_abs DESC, t LIMIT 1
    """,
)
def q_ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AA aa2 — CUSUM change-point: the month t maximizing
    |n*S_t - t*S_n| (the n-scaled gap between the observed running total
    and the no-change straight line), earliest month on ties — the
    standard "when did the level shift" locator, exact because both
    terms are integer products. Reports the split's pre/post volumes.

    Scale: one map-side groupBy to months, one running-sum window over
    the |months|-row series, a broadcast 1-row total, TopK-1 tail."""
    idxd = _monthly_indexed(spark, sf_dir)
    tot = idxd.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
    )
    run = idxd.select(
        "t",
        "yr",
        "mo",
        F.sum("c").over(Window.orderBy("t")).cast("long").alias("st"),
    )
    dd = run.crossJoin(F.broadcast(tot)).select(
        "t",
        "yr",
        "mo",
        "st",
        "n",
        "s",
        F.abs(F.col("n") * F.col("st") - F.col("t") * F.col("s")).alias("cusum_abs"),
    )
    return dd.select(
        F.expr(
            "concat(lpad(CAST(yr AS STRING), 4, '0'), '-', lpad(CAST(mo AS STRING), 2, '0'))"
        ).alias("cp_ym"),
        F.col("t").alias("cp_t"),
        "cusum_abs",
        F.col("n").alias("n_months"),
        F.col("st").alias("pre_orders"),
        (F.col("s") - F.col("st")).alias("post_orders"),
    ).orderBy(F.desc("cusum_abs"), "cp_t").limit(1)


@query(
    "q_ts_seasonality",
    oracle=f"""
    WITH bym AS (
      SELECT CAST(month(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS mo,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum({_CENTS.format(col="o_totalprice")}) AS BIGINT) AS revenue_cents
      FROM orders GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n_orders) AS BIGINT) AS total FROM bym)
    SELECT mo, n_orders, revenue_cents,
           (10000 * n_orders) // tot.total AS share_bp,
           CAST(row_number() OVER (ORDER BY n_orders DESC, mo) AS BIGINT) AS rnk
    FROM bym, tot ORDER BY mo
    """,
)
def q_ts_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AA aa3 — calendar seasonality index: per calendar month (1-12,
    pooled across years), order count, exact revenue cents, volume share
    in truncated bp, and the month's rank (1 = busiest; ties to the
    earlier month). The "is December structurally heavy" table.

    Scale: 12-row output from one partial-aggregated groupBy; the share
    divides by a broadcast 1-row total; window runs over 12 rows."""
    orders = load_table(spark, sf_dir, "orders")
    bym = orders.groupBy(F.month("o_orderdate").cast("long").alias("mo")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.expr(_CENTS.format(col="o_totalprice")))
        .cast("long")
        .alias("revenue_cents"),
    ).localCheckpoint()  # 12 rows; the totals branch must not re-scan orders
    tot = bym.agg(F.sum("n_orders").cast("long").alias("total"))
    return (
        bym.crossJoin(F.broadcast(tot))
        .select(
            "mo",
            "n_orders",
            "revenue_cents",
            F.expr("(10000 * n_orders) div total").alias("share_bp"),
            F.row_number()
            .over(Window.orderBy(F.desc("n_orders"), "mo"))
            .cast("long")
            .alias("rnk"),
        )
        .orderBy("mo")
    )


@query(
    "q_ts_drawdown",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(CAST(date_trunc('day', CAST(l_shipdate AS TIMESTAMP)) AS DATE) AS VARCHAR) AS day,
             CAST(sum(CASE WHEN l_returnflag = 'R' THEN -1 ELSE 1 END
                      * {_CENTS.format(col="l_extendedprice")}) AS BIGINT) AS net_cents
      FROM lineitem GROUP BY 1
    ),
    cum AS (
      SELECT day, net_cents,
             CAST(sum(net_cents) OVER (ORDER BY day) AS BIGINT) AS cum_cents
      FROM daily
    ),
    dd AS (
      SELECT day, cum_cents,
             CAST(max(cum_cents) OVER (ORDER BY day) AS BIGINT) AS peak_cents
      FROM cum
    )
    SELECT day AS trough_day, peak_cents - cum_cents AS drawdown_cents,
           peak_cents, cum_cents,
           (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n_days
    FROM dd ORDER BY drawdown_cents DESC, trough_day LIMIT 1
    """,
)
def q_ts_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AA aa4 — maximum drawdown of cumulative net revenue, where
    returned lineitems (l_returnflag = 'R') book as outflows: the worst
    running-peak-to-trough slide in exact cents, earliest trough on
    ties. The returns-signed stream actually dips, so the drawdown is
    non-trivial (an all-positive daily series would pin it at 0).

    Scale: lineitem collapses map-side to |ship days| rows (~2500 for
    this corpus's 7-year span at ANY scale factor — the calendar, not
    the corpus, bounds it); two ordered windows + TopK-1 over that."""
    li = load_table(spark, sf_dir, "lineitem")
    signed = F.when(F.col("l_returnflag") == "R", F.lit(-1)).otherwise(F.lit(1))
    daily = li.groupBy(
        F.to_date(F.date_trunc("day", "l_shipdate")).cast("string").alias("day")
    ).agg(
        F.sum(signed * F.expr(_CENTS.format(col="l_extendedprice")))
        .cast("long")
        .alias("net_cents")
    ).localCheckpoint()  # |ship days| rows; n_days branch must not re-scan
    w = Window.orderBy("day")
    cum = daily.select(
        "day", F.sum("net_cents").over(w).cast("long").alias("cum_cents")
    )
    dd = cum.select(
        "day",
        "cum_cents",
        F.max("cum_cents").over(w).cast("long").alias("peak_cents"),
    )
    n_days = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    return (
        dd.crossJoin(F.broadcast(n_days))
        .select(
            F.col("day").alias("trough_day"),
            (F.col("peak_cents") - F.col("cum_cents")).alias("drawdown_cents"),
            "peak_cents",
            "cum_cents",
            "n_days",
        )
        .orderBy(F.desc("drawdown_cents"), "trough_day")
        .limit(1)
    )


@query(
    "q_ts_growth_streaks",
    oracle=f"""
    WITH {_MONTHLY_SQL},
    diffs AS (
      SELECT t, yr, mo, c,
             c - lag(c) OVER (ORDER BY t) AS diff
      FROM idxd
    ),
    ups AS (SELECT * FROM diffs WHERE diff > 0),
    isl AS (
      SELECT t, yr, mo, diff,
             t - row_number() OVER (ORDER BY t) AS grp
      FROM ups
    ),
    streaks AS (
      SELECT CAST(count(*) AS BIGINT) AS streak_len,
             CAST(sum(diff) AS BIGINT) AS total_gain,
             min({_YM_SQL}) AS start_ym,
             max({_YM_SQL}) AS end_ym
      FROM isl GROUP BY grp
    )
    SELECT start_ym, end_ym, streak_len, total_gain
    FROM streaks ORDER BY streak_len DESC, start_ym LIMIT 5
    """,
)
def q_ts_growth_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AA aa5 — longest month-over-month growth streaks: runs of
    consecutive months with strictly increasing order counts
    (gaps-and-islands on the diff sign), reporting the top 5 by length
    (ties to the earlier start) with the count gained over each run.
    min/max of the zero-padded ym string within an island equal its
    first/last month because the padding makes lexicographic = temporal.

    Scale: the islands trick runs two ordered windows over the
    |months|-row aggregate; the fact sees one map-side groupBy."""
    idxd = _monthly_indexed(spark, sf_dir)
    wt = Window.orderBy("t")
    ym = F.expr(
        "concat(lpad(CAST(yr AS STRING), 4, '0'), '-', lpad(CAST(mo AS STRING), 2, '0'))"
    )
    diffs = idxd.select(
        "t", "yr", "mo", (F.col("c") - F.lag("c").over(wt)).alias("diff")
    )
    ups = diffs.where(F.col("diff") > 0)
    isl = ups.select(
        "t",
        "yr",
        "mo",
        "diff",
        (F.col("t") - F.row_number().over(Window.orderBy("t"))).alias("grp"),
        ym.alias("ym"),
    )
    return (
        isl.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("streak_len"),
            F.sum("diff").cast("long").alias("total_gain"),
            F.min("ym").alias("start_ym"),
            F.max("ym").alias("end_ym"),
        )
        .select("start_ym", "end_ym", "streak_len", "total_gain")
        .orderBy(F.desc("streak_len"), "start_ym")
        .limit(5)
    )
