"""Growth-accounting and audit analytics (SURVEY.md §2.AB, round 9).

The customer-lifecycle layer a subscription/commerce warehouse reports
from: cohort lifetime-value curves (cumulative revenue per acquired
customer by cohort age), the discrete churn-hazard table (the survival
view §2.I's retention matrix doesn't give), a Benford first-digit audit
(the classic books-cooking tripwire), seasonally-adjusted revenue
outliers (which months broke their own calendar pattern), and the
new-vs-returning revenue split (growth accounting's first decomposition).

Exactness discipline (repo-wide contract): money on the exact cent grid
(`floor(v*100 + 0.5)`), calendar months as the integer index
`yr*12 + (mo-1)` so cohort age and tenure are plain subtractions, rates
in truncated basis points (Spark `div` == DuckDB `//`, toward-zero on
BIGINT), and the Benford expectations hardcoded as the SAME floor-bp
literals in both engines (log10 is transcendental; the literal table is
not).

Spark-first shape, sized for 100 TB:
- Cohort month / first-order month is a window `min() OVER (PARTITION BY
  o_custkey)` — ONE shuffle on the customer key and no fact self-join
  (the groupBy-then-join-back spelling scans the fact twice; the window
  spelling scans once).
- Every query then collapses to a calendar-bounded relation
  (|cohorts|x|ages|, |tenures|, 9 digits, |months|) which is pinned with
  a localCheckpoint before branching — Catalyst does not reuse common
  subplans, so unpinned totals/size branches would re-run the fact pass
  (the §2.AA lesson, plan-asserted for this module too).
- Downstream windows/joins run on the checkpointed bounded relation:
  broadcast or single-partition by construction, never corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query

_CENTS = "CAST(floor({col} * 100 + 0.5) AS BIGINT)"

# integer month index: yr*12 + (mo-1); render back with div/% — identical
# arithmetic in both engines
_YIDX = (
    "(CAST(year(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) * 12"
    " + CAST(month(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) - 1)"
)
_IDX2YM = (
    "concat(lpad(CAST({i} // 12 AS VARCHAR), 4, '0'), '-',"
    " lpad(CAST({i} % 12 + 1 AS VARCHAR), 2, '0'))"
)

# DuckDB: orders annotated with the customer's cohort (first-order) month
# via a window min — one shuffle, no self-join
_COHORTED_SQL = f"""
cohorted AS (
  SELECT o_custkey AS ck, {_YIDX} AS yidx,
         min({_YIDX}) OVER (PARTITION BY o_custkey) AS cidx,
         {_CENTS.format(col="o_totalprice")} AS cents
  FROM orders
)
"""


def _cohorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ck, yidx, cidx, cents): each order with its month index and the
    customer's cohort month — `min() OVER (PARTITION BY o_custkey)`, one
    shuffle on the customer key, single fact scan."""
    orders = load_table(spark, sf_dir, "orders")
    yidx = (F.year("o_orderdate").cast("long") * 12 + F.month("o_orderdate").cast("long") - 1)
    return orders.select(
        F.col("o_custkey").alias("ck"),
        yidx.alias("yidx"),
        F.expr(_CENTS.format(col="o_totalprice")).alias("cents"),
    ).withColumn("cidx", F.min("yidx").over(Window.partitionBy("ck")))


_SPARK_IDX2YM = (
    "concat(lpad(CAST({i} div 12 AS STRING), 4, '0'), '-',"
    " lpad(CAST({i} % 12 + 1 AS STRING), 2, '0'))"
)


@query(
    "q_ltv_cohort_curve",
    oracle=f"""
    WITH {_COHORTED_SQL},
    cell AS (
      SELECT cidx, yidx - cidx AS age_months,
             CAST(count(DISTINCT ck) AS BIGINT) AS n_active,
             CAST(sum(cents) AS BIGINT) AS revenue_cents
      FROM cohorted GROUP BY 1, 2
    ),
    sized AS (
      SELECT c.*, s.n_active AS cohort_size,
             CAST(sum(c.revenue_cents) OVER (
               PARTITION BY c.cidx ORDER BY c.age_months) AS BIGINT)
               AS cum_revenue_cents
      FROM cell c JOIN cell s ON s.cidx = c.cidx AND s.age_months = 0
    )
    SELECT {_IDX2YM.format(i="cidx")} AS cohort_ym, age_months, n_active,
           revenue_cents, cum_revenue_cents,
           cum_revenue_cents // cohort_size AS cum_per_acquired_cents
    FROM sized ORDER BY cohort_ym, age_months
    """,
)
def q_ltv_cohort_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AB ab1 — cohort LTV curve: for every acquisition cohort and
    cohort age (months since first order), the active-customer count,
    period revenue, running cumulative revenue, and cumulative revenue
    per acquired customer in exact cents — the payback-period table.
    Cohort size is the age-0 cell (every customer orders in their own
    cohort month by definition).

    Scale: one custkey-window shuffle over orders, then a (cohort, age)
    groupBy to |months|^2/2 cells — checkpointed; the running sum and
    the age-0 size join run on that bounded cell table."""
    cohorted = _cohorted(spark, sf_dir)
    cell = (
        cohorted.groupBy("cidx", (F.col("yidx") - F.col("cidx")).alias("age_months"))
        .agg(
            F.countDistinct("ck").cast("long").alias("n_active"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .localCheckpoint()  # |cohorts|x|ages| cells; branches below reuse it
    )
    sizes = cell.where(F.col("age_months") == 0).select(
        "cidx", F.col("n_active").alias("cohort_size")
    )
    cum = F.sum("revenue_cents").over(
        Window.partitionBy("cidx").orderBy("age_months")
    )
    return (
        cell.withColumn("cum_revenue_cents", cum.cast("long"))
        .join(F.broadcast(sizes), "cidx")
        .select(
            F.expr(_SPARK_IDX2YM.format(i="cidx")).alias("cohort_ym"),
            "age_months",
            "n_active",
            "revenue_cents",
            "cum_revenue_cents",
            F.expr("cum_revenue_cents div cohort_size").alias(
                "cum_per_acquired_cents"
            ),
        )
        .orderBy("cohort_ym", "age_months")
    )


@query(
    "q_churn_hazard",
    oracle=f"""
    WITH {_COHORTED_SQL},
    span AS (
      SELECT ck, max(yidx) - min(yidx) AS tenure_months
      FROM cohorted GROUP BY 1
    ),
    hist AS (
      SELECT tenure_months, CAST(count(*) AS BIGINT) AS n_churned
      FROM span GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n_churned) AS BIGINT) AS total FROM hist),
    curves AS (
      SELECT tenure_months, n_churned,
             CAST(sum(n_churned) OVER (ORDER BY tenure_months DESC) AS BIGINT)
               AS n_at_risk,
             CAST(sum(n_churned) OVER (ORDER BY tenure_months) AS BIGINT)
               AS cum_churned
      FROM hist
    )
    SELECT tenure_months, n_churned, n_at_risk,
           (10000 * n_churned) // n_at_risk AS hazard_bp,
           (10000 * cum_churned) // tot.total AS cum_churned_bp
    FROM curves, tot ORDER BY tenure_months
    """,
)
def q_churn_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AB ab2 — discrete churn-hazard table: per tenure (months
    between a customer's first and last order), how many customers end
    exactly there (churned), how many survive at least that long (at
    risk — the reverse cumulative), the discrete hazard n_churned /
    n_at_risk in bp, and the churn CDF in bp. The corpus has a fixed
    horizon, so "last order" is churn by construction — the censoring
    caveat every survival table carries, stated rather than hidden.

    Scale: one custkey groupBy over orders (map-side combined), a
    |tenures|-row histogram (checkpointed), and two ordered windows over
    that bounded histogram."""
    cohorted = _cohorted(spark, sf_dir)
    span = cohorted.groupBy("ck").agg(
        (F.max("yidx") - F.min("yidx")).alias("tenure_months")
    )
    hist = (
        span.groupBy("tenure_months")
        .agg(F.count(F.lit(1)).cast("long").alias("n_churned"))
        .localCheckpoint()  # <= |months| rows; totals branch reuses it
    )
    tot = hist.agg(F.sum("n_churned").cast("long").alias("total"))
    curves = hist.select(
        "tenure_months",
        "n_churned",
        F.sum("n_churned")
        .over(Window.orderBy(F.desc("tenure_months")))
        .cast("long")
        .alias("n_at_risk"),
        F.sum("n_churned")
        .over(Window.orderBy("tenure_months"))
        .cast("long")
        .alias("cum_churned"),
    )
    return (
        curves.crossJoin(F.broadcast(tot))
        .select(
            "tenure_months",
            "n_churned",
            "n_at_risk",
            F.expr("(10000 * n_churned) div n_at_risk").alias("hazard_bp"),
            F.expr("(10000 * cum_churned) div total").alias("cum_churned_bp"),
        )
        .orderBy("tenure_months")
    )


# floor(10^4 * log10(1 + 1/d)) — identical literals in both engines; the
# transcendental never enters either query
_BENFORD_BP = {1: 3010, 2: 1760, 3: 1249, 4: 969, 5: 791, 6: 669, 7: 579, 8: 511, 9: 457}
_BENFORD_VALUES_SQL = ", ".join(f"({d}, {bp})" for d, bp in _BENFORD_BP.items())


@query(
    "q_benford_audit",
    oracle=f"""
    WITH cents AS (
      SELECT {_CENTS.format(col="o_totalprice")} AS c FROM orders
      WHERE o_totalprice > 0
    ),
    digits AS (
      SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS lead_digit,
             CAST(count(*) AS BIGINT) AS n_values
      FROM cents GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n_values) AS BIGINT) AS total FROM digits),
    expect(lead_digit, expected_bp) AS (VALUES {_BENFORD_VALUES_SQL})
    SELECT d.lead_digit, d.n_values,
           (10000 * d.n_values) // tot.total AS share_bp,
           CAST(e.expected_bp AS BIGINT) AS expected_bp,
           (10000 * d.n_values) // tot.total - e.expected_bp AS dev_bp
    FROM digits d JOIN expect e USING (lead_digit), tot
    ORDER BY d.lead_digit
    """,
)
def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AB ab3 — Benford first-digit audit of order totals: observed
    leading-digit shares (of the exact cent value — Benford is
    scale-invariant, so cents vs dollars is immaterial in expectation)
    against the hardcoded floor-bp Benford expectations, with the signed
    deviation per digit. The classic fabricated-figures tripwire; TPC-H
    prices are uniform-ish, so large deviations here are EXPECTED and the
    audit's value is the exact, engine-identical measurement.

    Scale: the fact collapses map-side to 9 digit rows (the leading
    digit is a string head, no log10); the expectation table is a 9-row
    literal join; the total is a broadcast 1-row aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    digits = (
        orders.where(F.col("o_totalprice") > 0)
        .select(
            F.substring(
                F.expr(_CENTS.format(col="o_totalprice")).cast("string"), 1, 1
            )
            .cast("long")
            .alias("lead_digit")
        )
        .groupBy("lead_digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_values"))
        .localCheckpoint()  # 9 rows; the total branch reuses it
    )
    tot = digits.agg(F.sum("n_values").cast("long").alias("total"))
    expect = spark.createDataFrame(
        sorted(_BENFORD_BP.items()), "lead_digit LONG, expected_bp LONG"
    )
    return (
        digits.crossJoin(F.broadcast(tot))
        .join(F.broadcast(expect), "lead_digit")
        .select(
            "lead_digit",
            "n_values",
            F.expr("(10000 * n_values) div total").alias("share_bp"),
            "expected_bp",
            (
                F.expr("(10000 * n_values) div total") - F.col("expected_bp")
            ).alias("dev_bp"),
        )
        .orderBy("lead_digit")
    )


@query(
    "q_seasonal_residual_outliers",
    oracle=f"""
    WITH monthly AS (
      SELECT CAST(year(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS yr,
             CAST(month(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS mo,
             CAST(sum({_CENTS.format(col="o_totalprice")}) AS BIGINT) AS x
      FROM orders GROUP BY 1, 2
    ),
    dev AS (
      SELECT yr, mo, x,
             CAST(count(*) OVER (PARTITION BY mo) AS BIGINT) AS n_years,
             CAST(sum(x) OVER (PARTITION BY mo) AS BIGINT) AS month_total_cents
      FROM monthly
    )
    SELECT concat(lpad(CAST(yr AS VARCHAR), 4, '0'), '-',
                  lpad(CAST(mo AS VARCHAR), 2, '0')) AS ym,
           x AS revenue_cents, n_years, month_total_cents,
           (10000 * (n_years * x - month_total_cents)) // month_total_cents
             AS rel_dev_bp
    FROM dev
    ORDER BY abs((10000 * (n_years * x - month_total_cents))
                 // month_total_cents) DESC, ym
    LIMIT 5
    """,
)
def q_seasonal_residual_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AB ab4 — seasonally-adjusted revenue outliers: each month's
    revenue against the average of its OWN calendar month across years
    (n-scaled: n_years*x - month_total keeps the mean exact), relative
    deviation in truncated bp, top 5 by |deviation| (ties to the earlier
    month). "December was down 8% for a December" — the question raw
    month-over-month deltas can't answer.

    Scale: one map-side groupBy to |months| rows; the per-calendar-month
    totals are windows PARTITIONed 12 ways over that bounded relation;
    TakeOrdered tail."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
    ).agg(F.sum(F.expr(_CENTS.format(col="o_totalprice"))).cast("long").alias("x"))
    wmo = Window.partitionBy("mo")
    dev = monthly.select(
        "yr",
        "mo",
        "x",
        F.count(F.lit(1)).over(wmo).cast("long").alias("n_years"),
        F.sum("x").over(wmo).cast("long").alias("month_total_cents"),
    )
    rel = F.expr("(10000 * (n_years * x - month_total_cents)) div month_total_cents")
    return (
        dev.select(
            F.expr(
                "concat(lpad(CAST(yr AS STRING), 4, '0'), '-',"
                " lpad(CAST(mo AS STRING), 2, '0'))"
            ).alias("ym"),
            F.col("x").alias("revenue_cents"),
            "n_years",
            "month_total_cents",
            rel.alias("rel_dev_bp"),
        )
        .orderBy(F.abs(F.col("rel_dev_bp")).desc(), "ym")
        .limit(5)
    )


@query(
    "q_new_vs_returning",
    oracle=f"""
    WITH {_COHORTED_SQL},
    split AS (
      SELECT yidx,
             CAST(sum(CASE WHEN yidx = cidx THEN cents ELSE 0 END) AS BIGINT)
               AS new_revenue_cents,
             CAST(sum(CASE WHEN yidx = cidx THEN 0 ELSE cents END) AS BIGINT)
               AS returning_revenue_cents,
             CAST(count(*) FILTER (yidx = cidx) AS BIGINT) AS new_orders,
             CAST(count(*) FILTER (yidx <> cidx) AS BIGINT) AS returning_orders
      FROM cohorted GROUP BY 1
    )
    SELECT {_IDX2YM.format(i="yidx")} AS ym,
           new_revenue_cents, returning_revenue_cents, new_orders,
           returning_orders,
           (10000 * new_revenue_cents)
             // (new_revenue_cents + returning_revenue_cents) AS new_share_bp
    FROM split ORDER BY ym
    """,
)
def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AB ab5 — growth accounting's first split: per month, revenue
    and order counts from customers in their acquisition month ("new")
    vs all later orders ("returning"), plus the new-revenue share in bp.
    A rising top line with a falling new-share is retention-driven
    growth; the reverse is a leaky bucket.

    Scale: the cohort annotation is the one custkey-window shuffle; the
    split is a single conditional groupBy to |months| rows."""
    cohorted = _cohorted(spark, sf_dir)
    is_new = F.col("yidx") == F.col("cidx")
    split = cohorted.groupBy("yidx").agg(
        F.sum(F.when(is_new, F.col("cents")).otherwise(F.lit(0)))
        .cast("long")
        .alias("new_revenue_cents"),
        F.sum(F.when(is_new, F.lit(0)).otherwise(F.col("cents")))
        .cast("long")
        .alias("returning_revenue_cents"),
        F.sum(F.when(is_new, 1).otherwise(0)).cast("long").alias("new_orders"),
        F.sum(F.when(is_new, 0).otherwise(1))
        .cast("long")
        .alias("returning_orders"),
    )
    return split.select(
        F.expr(_SPARK_IDX2YM.format(i="yidx")).alias("ym"),
        "new_revenue_cents",
        "returning_revenue_cents",
        "new_orders",
        "returning_orders",
        F.expr(
            "(10000 * new_revenue_cents)"
            " div (new_revenue_cents + returning_revenue_cents)"
        ).alias("new_share_bp"),
    ).orderBy("ym")
