"""Workday / calendar analytics (SURVEY.md §2.AG, round 9).

The calendar-aware reporting layer: business-day shipping latency,
weekday demand profile, month-boundary loading, Monday-week rollups
with week-over-week deltas, and the weekend-shipping share. The
engine-independence problem this suite solves is DAY-OF-WEEK AND
WORKDAY ARITHMETIC: Spark's ``dayofweek`` is 1=Sunday, DuckDB's
``dayofweek`` is 0=Sunday, and neither has a business-day difference —
so everything here runs on EPOCH-DAY INTEGERS: ``dow = (epoch_day + 3)
% 7`` (Monday=0; 1970-01-01 was a Thursday) and the closed-form weekday
count over ``[e1, e1+n)``::

    w, r = n // 7, n % 7;  d = (e1 + 3) % 7
    biz = 5·w + r − greatest(0, least(d + r, 7) − greatest(d, 5))

(the tail window [d, d+r) with r < 7 can overlap the weekend {5, 6} at
most once, and never wraps past it — fuzz-proven against a loop
reference in tests/test_calendar_sketch.py). Pure ``+ − * % // min
max`` on non-negative BIGINTs: bit-identical in both engines, no
dayofweek convention, no interval types.

Spark-first shape, sized for 100 TB:
- ag1's order→first-ship latency pre-aggregates lineitem to per-order
  min BEFORE the fact⋈fact join, so the join carries |orders| rows a
  side, and the census collapses to |priorities| rows.
- ag2/ag3/ag5 are single partial-aggregated groupBys to weekday /
  month-band / month cardinality — map-side arithmetic only.
- ag4's week-over-week lag window runs on the ALREADY-AGGREGATED
  weekly relation (~|weeks| rows), never the fact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query

_CENTS = "CAST(floor({col} * 100 + 0.5) AS BIGINT)"

# epoch-day of a timestamp column — same arithmetic, per-engine spelling
_EPOCH_SPARK = "CAST(datediff(CAST({c} AS DATE), DATE '1970-01-01') AS BIGINT)"
_EPOCH_DUCK = "CAST(date_diff('day', DATE '1970-01-01', CAST({c} AS DATE)) AS BIGINT)"

# Monday=0 day-of-week from an epoch-day expression (engine-neutral)
_DOW = "(({e} + 3) % 7)"

# closed-form weekday count over [e1, e1+n) — engine-neutral given
# greatest/least; n must be non-negative (callers clamp)
_BIZ = (
    "(5 * ({n} div 7) + ({n} % 7)"
    " - greatest(0, least((({e1} + 3) % 7) + ({n} % 7), 7)"
    "              - greatest(({e1} + 3) % 7, 5)))"
)
_BIZ_DUCK = (
    "(5 * ({n} // 7) + ({n} % 7)"
    " - greatest(0, least((({e1} + 3) % 7) + ({n} % 7), 7)"
    "              - greatest(({e1} + 3) % 7, 5)))"
)


@query(
    "q_cal_business_latency",
    oracle=f"""
    WITH first_ship AS (
      SELECT l_orderkey AS ok,
             min({_EPOCH_DUCK.format(c="l_shipdate")}) AS ship_e
      FROM lineitem GROUP BY 1
    ),
    lat AS (
      SELECT o.o_orderpriority,
             greatest(0, f.ship_e - {_EPOCH_DUCK.format(c="o.o_orderdate")})
               AS n_days,
             {_EPOCH_DUCK.format(c="o.o_orderdate")} AS e1
      FROM orders o JOIN first_ship f ON o.o_orderkey = f.ok
    ),
    biz AS (
      SELECT o_orderpriority,
             {_BIZ_DUCK.format(n="n_days", e1="e1")} AS biz_days
      FROM lat
    )
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(biz_days) AS BIGINT) AS sum_biz_days,
           CAST(min(biz_days) AS BIGINT) AS min_biz_days,
           CAST(max(biz_days) AS BIGINT) AS max_biz_days,
           CAST(sum(biz_days) AS BIGINT) // CAST(count(*) AS BIGINT)
             AS avg_biz_days
    FROM biz GROUP BY 1 ORDER BY o_orderpriority
    """,
)
def q_cal_business_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AG ag1 — business-day shipping latency: per order priority,
    the count/sum/min/max/avg of BUSINESS days (Mon–Fri) between the
    order date and its FIRST line shipment, via the closed-form weekday
    count (negative gaps clamped to 0). The SLA report a fulfillment
    team actually runs — calendar days overstate weekend-spanning
    orders.

    Scale: lineitem pre-aggregates to per-order min ship epoch (partial
    agg, shuffle on orderkey), joins orders on the same key, and the
    census is |priorities| rows. The workday formula is pure map-side
    integer arithmetic — no UDF, no calendar table."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    first_ship = li.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.min(F.expr(_EPOCH_SPARK.format(c="l_shipdate"))).alias("ship_e")
    )
    lat = orders.join(first_ship, orders.o_orderkey == first_ship.ok).select(
        "o_orderpriority",
        F.greatest(
            F.lit(0),
            F.col("ship_e") - F.expr(_EPOCH_SPARK.format(c="o_orderdate")),
        ).alias("n_days"),
        F.expr(_EPOCH_SPARK.format(c="o_orderdate")).alias("e1"),
    )
    biz = lat.select(
        "o_orderpriority", F.expr(_BIZ.format(n="n_days", e1="e1")).alias("biz_days")
    )
    return (
        biz.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("biz_days").cast("long").alias("sum_biz_days"),
            F.min("biz_days").cast("long").alias("min_biz_days"),
            F.max("biz_days").cast("long").alias("max_biz_days"),
            F.expr("sum(biz_days) div count(*)").cast("long").alias("avg_biz_days"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_cal_weekday_profile",
    oracle=f"""
    WITH d AS (
      SELECT {_DOW.format(e=_EPOCH_DUCK.format(c="o_orderdate"))} AS dow,
             {_CENTS.format(col="o_totalprice")} AS cents
      FROM orders
    ),
    agg AS (
      SELECT dow, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(cents) AS BIGINT) AS total_cents
      FROM d GROUP BY 1
    )
    SELECT dow, n_orders, total_cents,
           (10000 * n_orders) // CAST(sum(n_orders) OVER () AS BIGINT)
             AS share_bp
    FROM agg ORDER BY dow
    """,
)
def q_cal_weekday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AG ag2 — weekday demand profile: orders and exact cents per
    day-of-week (Monday=0, epoch arithmetic — no engine dow convention),
    with each weekday's share of all orders in bp. The staffing/load
    curve.

    Scale: one map-side-combined groupBy to 7 rows; the share window
    runs over those 7."""
    orders = load_table(spark, sf_dir, "orders")
    dow = F.expr(_DOW.format(e=_EPOCH_SPARK.format(c="o_orderdate")))
    agg = orders.groupBy(dow.alias("dow")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.expr(_CENTS.format(col="o_totalprice"))).cast("long").alias(
            "total_cents"
        ),
    )
    tot = F.sum("n_orders").over(Window.partitionBy()).cast("long")
    return (
        agg.withColumn("tot", tot)
        .withColumn("share_bp", F.expr("(10000 * n_orders) div tot"))
        .select("dow", "n_orders", "total_cents", "share_bp")
        .orderBy("dow")
    )


@query(
    "q_cal_eom_effect",
    oracle=f"""
    WITH c AS (
      SELECT CASE
               WHEN day(CAST(o_orderdate AS TIMESTAMP)) <= 5 THEN 'a_first5'
               WHEN day(CAST(o_orderdate AS TIMESTAMP))
                    > day(last_day(CAST(o_orderdate AS DATE))) - 5 THEN 'c_last5'
               ELSE 'b_mid' END AS month_band,
             {_CENTS.format(col="o_totalprice")} AS cents
      FROM orders
    )
    SELECT month_band, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS total_cents,
           CAST(sum(cents) AS BIGINT) // CAST(count(*) AS BIGINT)
             AS avg_cents
    FROM c GROUP BY 1 ORDER BY month_band
    """,
)
def q_cal_eom_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AG ag3 — month-boundary loading: orders classified into the
    first 5 days / last 5 days / middle of their calendar month (short
    months resolve first-5 before last-5, same CASE order both
    engines), with counts, exact cents and truncated-div average. The
    classic "does revenue pile up at month end" audit.

    Scale: map-side day/last_day arithmetic + one groupBy to 3 rows."""
    orders = load_table(spark, sf_dir, "orders")
    dom = F.dayofmonth("o_orderdate")
    last_dom = F.dayofmonth(F.last_day("o_orderdate"))
    band = (
        F.when(dom <= 5, "a_first5")
        .when(dom > last_dom - 5, "c_last5")
        .otherwise("b_mid")
    )
    return (
        orders.groupBy(band.alias("month_band"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.expr(_CENTS.format(col="o_totalprice")))
            .cast("long")
            .alias("total_cents"),
        )
        .withColumn("avg_cents", F.expr("total_cents div n_orders"))
        .orderBy("month_band")
    )


@query(
    "q_cal_week_rollup",
    oracle=f"""
    WITH e AS (
      SELECT {_EPOCH_DUCK.format(c="o_orderdate")} AS ep,
             {_CENTS.format(col="o_totalprice")} AS cents
      FROM orders
    ),
    weekly AS (
      SELECT CAST(DATE '1970-01-01'
                  + CAST(ep - ((ep + 3) % 7) AS INTEGER) AS VARCHAR)
               AS week_start,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(cents) AS BIGINT) AS cents
      FROM e GROUP BY 1
    )
    SELECT week_start, n_orders, cents,
           CAST(coalesce(cents - lag(cents) OVER (ORDER BY week_start), 0)
                AS BIGINT) AS wow_delta_cents
    FROM weekly ORDER BY week_start
    """,
)
def q_cal_week_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AG ag4 — Monday-week rollup with week-over-week delta: orders
    bucketed by the MONDAY that starts their week (epoch arithmetic —
    no WEEK() convention), weekly counts, exact cents and the WoW cents
    delta (0 for the first week). The trend line every revenue dashboard
    draws.

    Scale: fact → weekly partial agg (one shuffle to |weeks| rows); the
    ordered lag window runs on that bounded relation only."""
    orders = load_table(spark, sf_dir, "orders")
    ep = F.expr(_EPOCH_SPARK.format(c="o_orderdate"))
    week_start = F.date_add(
        F.lit("1970-01-01").cast("date"),
        (ep - (ep + 3) % 7).cast("int"),
    ).cast("string")
    weekly = orders.groupBy(week_start.alias("week_start")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.expr(_CENTS.format(col="o_totalprice"))).cast("long").alias("cents"),
    )
    w = Window.orderBy("week_start")
    return weekly.select(
        "week_start",
        "n_orders",
        "cents",
        F.coalesce(F.col("cents") - F.lag("cents").over(w), F.lit(0))
        .cast("long")
        .alias("wow_delta_cents"),
    ).orderBy("week_start")


@query(
    "q_cal_ship_weekend_share",
    oracle=f"""
    WITH s AS (
      SELECT concat(lpad(CAST(CAST(year(CAST(l_shipdate AS TIMESTAMP)) AS BIGINT)
                              AS VARCHAR), 4, '0'), '-',
                    lpad(CAST(CAST(month(CAST(l_shipdate AS TIMESTAMP)) AS BIGINT)
                              AS VARCHAR), 2, '0')) AS month,
             CASE WHEN {_DOW.format(e=_EPOCH_DUCK.format(c="l_shipdate"))} >= 5
                  THEN 1 ELSE 0 END AS wkend
      FROM lineitem
    )
    SELECT month, CAST(count(*) AS BIGINT) AS n_shipments,
           CAST(sum(wkend) AS BIGINT) AS n_weekend,
           (10000 * CAST(sum(wkend) AS BIGINT)) // CAST(count(*) AS BIGINT)
             AS weekend_share_bp
    FROM s GROUP BY 1 ORDER BY month
    """,
)
def q_cal_ship_weekend_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AG ag5 — weekend-shipping share: per ship month, how many line
    shipments left on a Saturday/Sunday (epoch dow ≥ 5) and their share
    in bp. An always-on ops anomaly gauge — a weekend spike means a
    backlog flush or a miscoded feed.

    Scale: map-side dow + month render, one partial-aggregated groupBy
    to |months| rows."""
    li = load_table(spark, sf_dir, "lineitem")
    month = F.concat(
        F.lpad(F.year("l_shipdate").cast("long").cast("string"), 4, "0"),
        F.lit("-"),
        F.lpad(F.month("l_shipdate").cast("long").cast("string"), 2, "0"),
    )
    wkend = F.when(
        F.expr(_DOW.format(e=_EPOCH_SPARK.format(c="l_shipdate"))) >= 5, 1
    ).otherwise(0)
    return (
        li.groupBy(month.alias("month"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shipments"),
            F.sum(wkend).cast("long").alias("n_weekend"),
        )
        .withColumn(
            "weekend_share_bp", F.expr("(10000 * n_weekend) div n_shipments")
        )
        .orderBy("month")
    )
