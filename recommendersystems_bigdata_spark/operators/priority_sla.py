"""Order-priority SLA fairness (SURVEY.md §2.BB, round 9).

"Do URGENT orders actually ship faster, and do they deserve to?" —
the fairness read of the priority flag: fulfillment LATENCY here is
order date → FIRST shipment (the customer-visible promise), distinct
from §2.AJ aj1's first-to-last consolidation span. The suite reports
exact per-priority latency quartiles, SLA attainment curves (≤7/30/90
days), the monthly urgent-mix drift, and whether high-priority orders
carry proportionally more value than count (the premium that justifies
expedite cost).

Data hygiene, applied identically in both engines: the synthetic
corpus ships some lines BEFORE the order date (see §2.AW), so latency
clamps to ``greatest(0, days)`` and the clamped rows are COUNTED
(``n_preship``) rather than hidden; orders with no line items have no
shipment and are excluded from latency statistics by construction
(the left-join NULL is filtered, and §2.AW owns their story).

Exactness: whole-day latencies (midnight timestamps), exact quartiles
at explicit ranks via the §2.AP distinct-value CDF (latency days are
grid-bounded), attainment/mix/premium in truncated bp/milli.

Spark-first shape, sized for 100 TB:
- ONE lineitem pass (partial-aggregated min per orderkey) joined once
  under orders gives the per-order latency relation; bb1/bb2 censuses
  are bounded (5 priorities × ≤|distinct days|).
- bb3/bb4 never touch lineitem: one orders pass to bounded censuses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query

_CENTS = "CAST(floor({col} * 100 + 0.5) AS BIGINT)"

# DuckDB: per-order clamped first-ship latency.
_LAT_SQL = """
lat AS (
  SELECT o.o_orderpriority AS prio,
         greatest(0, date_diff('day', o.o_orderdate, x.fs))
           AS latency_days,
         CASE WHEN x.fs < o.o_orderdate THEN 1 ELSE 0 END AS preship
  FROM orders o JOIN (
    SELECT l_orderkey, min(CAST(l_shipdate AS TIMESTAMP)) AS fs
    FROM lineitem GROUP BY 1
  ) x ON o.o_orderkey = x.l_orderkey
)
"""


def _lat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(prio, latency_days, preship): clamped first-ship latency per
    shipped order."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    fs = li.groupBy("l_orderkey").agg(F.min("l_shipdate").alias("fs"))
    return (
        orders.join(fs, orders.o_orderkey == fs.l_orderkey)
        .select(
            F.col("o_orderpriority").alias("prio"),
            F.greatest(
                F.lit(0), F.datediff(F.col("fs"), F.col("o_orderdate"))
            )
            .cast("long")
            .alias("latency_days"),
            F.when(F.col("fs") < F.col("o_orderdate"), 1)
            .otherwise(0)
            .cast("long")
            .alias("preship"),
        )
    )


@query(
    "q_priority_latency_quartiles",
    oracle=f"""
    WITH {_LAT_SQL}
    , hist AS (
      SELECT prio, latency_days AS d, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(preship) AS BIGINT) AS pre
      FROM lat GROUP BY 1, 2
    ),
    cdf AS (
      SELECT prio, d, cnt, pre,
             CAST(sum(cnt) OVER (PARTITION BY prio ORDER BY d
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS hi,
             CAST(sum(cnt) OVER (PARTITION BY prio) AS BIGINT) AS n,
             CAST(sum(cnt * d) OVER (PARTITION BY prio) AS BIGINT)
               AS sum_days
      FROM hist
    )
    SELECT prio AS o_orderpriority, CAST(max(n) AS BIGINT) AS n_orders,
           CAST(sum(pre) AS BIGINT) AS n_preship,
           min(CASE WHEN hi >= (n + 1) // 4 THEN d END) AS q1_days,
           min(CASE WHEN hi >= (n + 1) // 2 THEN d END) AS median_days,
           min(CASE WHEN hi >= (3 * (n + 1)) // 4 THEN d END) AS q3_days,
           (1000 * max(sum_days)) // max(n) AS mean_days_milli
    FROM cdf GROUP BY 1 ORDER BY o_orderpriority
    """,
)
def q_priority_latency_quartiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """§2.BB bb1 — first-ship latency quartiles per priority class:
    Q1/median/Q3 at explicit CDF ranks plus the exact milli mean, with
    the clamped pre-ship anomaly count reported alongside. THE fairness
    table: if '1-URGENT' and '5-LOW' share a median, the flag is
    decorative.

    Scale: one lineitem pass (partial-aggregated min per orderkey),
    one join under orders, then the bounded (priority, day) CDF — rank
    windows never touch the fact."""
    lat = _lat(spark, sf_dir)
    hist = lat.groupBy("prio", F.col("latency_days").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("preship").cast("long").alias("pre"),
    )
    w_cum = (
        Window.partitionBy("prio")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("prio")
    cdf = hist.select(
        "prio",
        "d",
        "cnt",
        "pre",
        F.sum("cnt").over(w_cum).cast("long").alias("hi"),
        F.sum("cnt").over(w_all).cast("long").alias("n"),
        F.sum(F.col("cnt") * F.col("d")).over(w_all).cast("long").alias(
            "sum_days"
        ),
    )
    return (
        cdf.groupBy(F.col("prio").alias("o_orderpriority"))
        .agg(
            F.max("n").cast("long").alias("n_orders"),
            F.sum("pre").cast("long").alias("n_preship"),
            F.min(F.when(F.expr("hi >= (n + 1) div 4"), F.col("d"))).alias(
                "q1_days"
            ),
            F.min(F.when(F.expr("hi >= (n + 1) div 2"), F.col("d"))).alias(
                "median_days"
            ),
            F.min(
                F.when(F.expr("hi >= (3 * (n + 1)) div 4"), F.col("d"))
            ).alias("q3_days"),
            F.expr("(1000 * max(sum_days)) div max(n)").alias(
                "mean_days_milli"
            ),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_priority_sla_attainment",
    oracle=f"""
    WITH {_LAT_SQL}
    SELECT prio AS o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           (10000 * CAST(sum(CASE WHEN latency_days <= 7 THEN 1 ELSE 0 END)
                         AS BIGINT)) // count(*) AS within_7d_bp,
           (10000 * CAST(sum(CASE WHEN latency_days <= 30 THEN 1 ELSE 0 END)
                         AS BIGINT)) // count(*) AS within_30d_bp,
           (10000 * CAST(sum(CASE WHEN latency_days <= 90 THEN 1 ELSE 0 END)
                         AS BIGINT)) // count(*) AS within_90d_bp
    FROM lat GROUP BY 1 ORDER BY o_orderpriority
    """,
)
def q_priority_sla_attainment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BB bb2 — the SLA attainment curve per priority: share of
    shipped orders whose first shipment lands within 7 / 30 / 90 days,
    in truncated bp. Attainment is monotone across the three windows by
    construction (the test pins it) — the row a contract review reads.

    Scale: the same single fact pass as bb1, then one conditional
    census over 5 priority rows — no CDF, no window."""
    lat = _lat(spark, sf_dir)
    return (
        lat.groupBy(F.col("prio").alias("o_orderpriority"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.when(F.col("latency_days") <= 7, 1).otherwise(0))
            .cast("long")
            .alias("w7"),
            F.sum(F.when(F.col("latency_days") <= 30, 1).otherwise(0))
            .cast("long")
            .alias("w30"),
            F.sum(F.when(F.col("latency_days") <= 90, 1).otherwise(0))
            .cast("long")
            .alias("w90"),
        )
        .select(
            "o_orderpriority",
            "n_orders",
            F.expr("(10000 * w7) div n_orders").alias("within_7d_bp"),
            F.expr("(10000 * w30) div n_orders").alias("within_30d_bp"),
            F.expr("(10000 * w90) div n_orders").alias("within_90d_bp"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_priority_mix_monthly",
    oracle="""
    WITH m AS (
      SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
               AS ym,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_expedite
      FROM orders GROUP BY 1
    )
    SELECT ym, n_orders, n_expedite,
           (10000 * n_expedite) // n_orders AS expedite_share_bp
    FROM m ORDER BY ym
    """,
)
def q_priority_mix_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BB bb3 — expedite-mix drift: per order month, the share of
    URGENT+HIGH orders in bp. A creeping expedite share is the classic
    priority-inflation signal (when everything is urgent, nothing is).

    Scale: one orders pass, map-side conditional census to |months|
    rows; no join, no window."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
            .cast("long")
            .alias("ym")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(
                F.when(
                    F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_expedite"),
        )
        .select(
            "ym",
            "n_orders",
            "n_expedite",
            F.expr("(10000 * n_expedite) div n_orders").alias(
                "expedite_share_bp"
            ),
        )
        .orderBy("ym")
    )


@query(
    "q_priority_value_premium",
    oracle=f"""
    WITH p AS (
      SELECT o_orderpriority AS prio,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum({_CENTS.format(col="o_totalprice")}) AS BIGINT)
               AS value_cents
      FROM orders GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(n_orders) AS BIGINT) AS n,
             CAST(sum(value_cents) AS BIGINT) AS t
      FROM p
    )
    SELECT prio AS o_orderpriority, n_orders, value_cents,
           (10000 * n_orders) // n AS count_share_bp,
           CAST((10000 * CAST(value_cents AS HUGEINT)) // t AS BIGINT)
             AS value_share_bp,
           CAST((1000 * (10000 * CAST(value_cents AS HUGEINT)) // t)
                // nullif((10000 * n_orders) // n, 0) AS BIGINT)
             AS value_premium_milli
    FROM p, tot ORDER BY o_orderpriority
    """,
)
def q_priority_value_premium(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BB bb4 — does priority track value? Per priority class, the
    count share vs the exact-cents value share (128-bit scaled), and
    the premium ratio (1000 = the class's orders are worth exactly
    their headcount). A premium near 1000 for '1-URGENT' says expedite
    status is not being reserved for the orders that pay for it.

    Scale: one orders pass to the 5-row census, 1-row broadcast
    totals; the 128-bit scaling runs on 5 rows."""
    orders = load_table(spark, sf_dir, "orders")
    p = orders.groupBy(F.col("o_orderpriority").alias("prio")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.expr(_CENTS.format(col="o_totalprice")))
        .cast("long")
        .alias("value_cents"),
    )
    tot = p.agg(
        F.sum("n_orders").cast("long").alias("n"),
        F.sum("value_cents").cast("long").alias("t"),
    )
    return (
        p.crossJoin(F.broadcast(tot))
        .select(
            F.col("prio").alias("o_orderpriority"),
            "n_orders",
            "value_cents",
            F.expr("(10000 * n_orders) div n").alias("count_share_bp"),
            F.expr(
                "CAST((CAST(10000 AS DECIMAL(38,0)) * value_cents) div t"
                " AS BIGINT)"
            ).alias("value_share_bp"),
            F.expr(
                "CAST((1000 * (CAST(10000 AS DECIMAL(38,0)) * value_cents)"
                " div t) div nullif((10000 * n_orders) div n, 0) AS BIGINT)"
            ).alias("value_premium_milli"),
        )
        .orderBy("o_orderpriority")
    )
