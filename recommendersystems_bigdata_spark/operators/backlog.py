"""Order-backlog / queueing analytics (SURVEY.md §2.AW, round 9).

The operations-review family over the order pipeline: an order ARRIVES
at ``o_orderdate`` and COMPLETES at its last line-item shipment
(``max(l_shipdate)`` per order). Two data-hygiene rules, applied
identically in both engines and pinned by tests:

- 291 sf0.001 orders ship their last line BEFORE the order date (the
  synthetic corpus does not correlate the two columns), so completion
  is clamped to ``greatest(last_ship, o_orderdate)`` — an order cannot
  complete before it arrives. Clamped orders contribute zero open time
  and complete in their arrival month; the monthly backlog can
  therefore never run negative (conservation test).
- 27 orders have no line items at all — they NEVER complete and sit in
  the backlog forever (reported, not dropped: they are exactly the
  rows an operations audit is after).

Exact-integer discipline: ages/cycles in whole days (midnight
timestamps, so Spark ``datediff`` == DuckDB ``date_diff('day', …)``
exactly), months as ``year·100 + month`` BIGINT, rates in truncated
milli/bp. Little's-law scalars cross-multiply per-corpus sums, so the
final ratio runs in 128-bit (DECIMAL(38,0) / HUGEINT — the ai4
convention); everything row-level stays BIGINT.

Spark-first shape, sized for 100 TB:
- ONE lineitem pass (partial-aggregated max per orderkey) joined once
  under orders gives the per-order (arrival, completion) relation;
  it is localCheckpoint-ed wherever two censuses read it, so the fact
  is never re-scanned.
- Monthly/bucket censuses are bounded (|months| ≈ 84, 4 buckets); the
  only windows run over those censuses, never the fact.
- aw4's month explode is clamped to the 36-month report window, so the
  fan-out is ≤ 36·|open orders in window| — |orders|-proportional,
  JVM-side ``sequence``+``explode``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query

_CENTS = "CAST(floor({col} * 100 + 0.5) AS BIGINT)"

# DuckDB: the per-order pipeline relation. comp is NULL iff the order has
# no line items (never completes); otherwise clamped to >= arrival.
_PIPE_SQL = """
pipe AS (
  SELECT o.o_orderkey AS ok, o.o_orderdate AS od, o.o_totalprice,
         CASE WHEN x.ls IS NULL THEN NULL
              ELSE greatest(x.ls, o.o_orderdate) END AS comp
  FROM orders o LEFT JOIN (
    SELECT l_orderkey, max(CAST(l_shipdate AS TIMESTAMP)) AS ls
    FROM lineitem GROUP BY 1
  ) x ON o.o_orderkey = x.l_orderkey
)
"""


def _pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ok, od, o_totalprice, comp): per-order arrival + clamped
    completion; comp NULL = never completes."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ls = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("ls"))
    return (
        orders.join(ls, orders.o_orderkey == ls.l_orderkey, "left")
        .select(
            F.col("o_orderkey").alias("ok"),
            F.col("o_orderdate").alias("od"),
            "o_totalprice",
            F.when(F.col("ls").isNull(), F.lit(None).cast("timestamp"))
            .otherwise(F.greatest("ls", "o_orderdate"))
            .alias("comp"),
        )
    )


@query(
    "q_backlog_monthly",
    oracle=f"""
    WITH {_PIPE_SQL}
    , arr AS (
      SELECT CAST(year(od) * 100 + month(od) AS BIGINT) AS ym,
             CAST(count(*) AS BIGINT) AS arrivals
      FROM pipe GROUP BY 1
    ),
    done AS (
      SELECT CAST(year(comp) * 100 + month(comp) AS BIGINT) AS ym,
             CAST(count(*) AS BIGINT) AS completions
      FROM pipe WHERE comp IS NOT NULL GROUP BY 1
    ),
    merged AS (
      SELECT COALESCE(a.ym, d.ym) AS ym,
             COALESCE(arrivals, 0) AS arrivals,
             COALESCE(completions, 0) AS completions
      FROM arr a FULL OUTER JOIN done d ON a.ym = d.ym
    )
    SELECT ym, arrivals, completions,
           CAST(sum(arrivals) OVER w - sum(completions) OVER w AS BIGINT)
             AS backlog_end,
           (1000 * arrivals) // nullif(completions, 0)
             AS book_to_bill_milli
    FROM merged
    WINDOW w AS (ORDER BY ym ROWS UNBOUNDED PRECEDING)
    ORDER BY ym
    """,
)
def q_backlog_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AW aw1 — the monthly order-pipeline ledger: arrivals,
    completions, month-end open backlog (cumulative in − cumulative
    out; never negative thanks to the completion clamp), and the
    book-to-bill ratio in truncated milli (NULL, not ∞, on a
    zero-completion month). The last month's backlog equals
    never-completed + still-open orders exactly (conservation test).

    Scale: one fact pass to the per-order relation (checkpoint-pinned,
    read by both censuses), two bounded month censuses, full-outer
    month merge, running sums over |months| ≈ 84 rows — the bounded
    window the ranks.py header carves out as fine."""
    pipe = _pipe(spark, sf_dir).localCheckpoint()  # both censuses read it
    arr = pipe.groupBy(
        (F.year("od") * 100 + F.month("od")).cast("long").alias("ym")
    ).agg(F.count(F.lit(1)).cast("long").alias("arrivals"))
    done = (
        pipe.where(F.col("comp").isNotNull())
        .groupBy(
            (F.year("comp") * 100 + F.month("comp")).cast("long").alias("ym")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("completions"))
    )
    merged = (
        arr.join(done, "ym", "full_outer")
        .select(
            "ym",
            F.coalesce("arrivals", F.lit(0)).alias("arrivals"),
            F.coalesce("completions", F.lit(0)).alias("completions"),
        )
    )
    w = Window.orderBy("ym").rowsBetween(Window.unboundedPreceding, 0)
    return (
        merged.select(
            "ym",
            "arrivals",
            "completions",
            (F.sum("arrivals").over(w) - F.sum("completions").over(w))
            .cast("long")
            .alias("backlog_end"),
            F.expr("(1000 * arrivals) div nullif(completions, 0)").alias(
                "book_to_bill_milli"
            ),
        )
        .orderBy("ym")
    )


_SNAP = "1998-12-31"


@query(
    "q_wip_aging_snapshot",
    oracle=f"""
    WITH {_PIPE_SQL}
    , open_orders AS (
      SELECT date_diff('day', od, TIMESTAMP '{_SNAP}') AS age_days,
             {_CENTS.format(col="o_totalprice")} AS value_cents
      FROM pipe
      WHERE od <= TIMESTAMP '{_SNAP}'
        AND (comp IS NULL OR comp > TIMESTAMP '{_SNAP}')
    )
    SELECT CASE WHEN age_days <= 90 THEN '000-090'
                WHEN age_days <= 365 THEN '091-365'
                WHEN age_days <= 730 THEN '366-730'
                ELSE '731+' END AS age_bucket,
           CAST(CASE WHEN age_days <= 90 THEN 0
                     WHEN age_days <= 365 THEN 91
                     WHEN age_days <= 730 THEN 366
                     ELSE 731 END AS BIGINT) AS bucket_lo_days,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(value_cents) AS BIGINT) AS value_cents,
           CAST(max(age_days) AS BIGINT) AS oldest_age_days
    FROM open_orders GROUP BY 1, 2 ORDER BY bucket_lo_days
    """,
)
def q_wip_aging_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AW aw2 — work-in-progress aging at the 1998-12-31 snapshot:
    orders already placed but not yet fully shipped (never-completed
    orders included — they are the audit's point), bucketed by age in
    days with order counts, open value in exact cents, and the oldest
    age per bucket. Buckets are sized for this corpus's long spans
    (median open ≈ 2 years).

    Scale: one fact pass to the per-order relation, a map-side filter
    + bucket census (4 rows); no window, no join after the pipe."""
    pipe = _pipe(spark, sf_dir)
    snap = F.lit(_SNAP).cast("timestamp")
    open_orders = pipe.where(
        (F.col("od") <= snap) & (F.col("comp").isNull() | (F.col("comp") > snap))
    ).select(
        F.datediff(snap, F.col("od")).cast("long").alias("age_days"),
        F.expr(_CENTS.format(col="o_totalprice")).alias("value_cents"),
    )
    bucket = (
        F.when(F.col("age_days") <= 90, "000-090")
        .when(F.col("age_days") <= 365, "091-365")
        .when(F.col("age_days") <= 730, "366-730")
        .otherwise("731+")
    )
    bucket_lo = (
        F.when(F.col("age_days") <= 90, 0)
        .when(F.col("age_days") <= 365, 91)
        .when(F.col("age_days") <= 730, 366)
        .otherwise(731)
    )
    return (
        open_orders.select(
            bucket.alias("age_bucket"),
            bucket_lo.cast("long").alias("bucket_lo_days"),
            "age_days",
            "value_cents",
        )
        .groupBy("age_bucket", "bucket_lo_days")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("value_cents").cast("long").alias("value_cents"),
            F.max("age_days").cast("long").alias("oldest_age_days"),
        )
        .orderBy("bucket_lo_days")
    )


_LL_START, _LL_END, _LL_DAYS = "1997-01-01", "1998-01-01", 365


@query(
    "q_littles_law_check",
    oracle=f"""
    WITH {_PIPE_SQL}
    , scalars AS (
      SELECT
        CAST(sum(CASE WHEN od >= TIMESTAMP '{_LL_START}'
                       AND od < TIMESTAMP '{_LL_END}' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_arrivals,
        CAST(sum(CASE WHEN od >= TIMESTAMP '{_LL_START}'
                       AND od < TIMESTAMP '{_LL_END}'
                       AND comp IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_completed,
        CAST(sum(CASE WHEN od >= TIMESTAMP '{_LL_START}'
                       AND od < TIMESTAMP '{_LL_END}'
                       AND comp IS NOT NULL
                      THEN date_diff('day', od, comp) ELSE 0 END)
             AS BIGINT) AS sum_cycle_days,
        CAST(sum(greatest(0, date_diff('day',
                greatest(od, TIMESTAMP '{_LL_START}'),
                least(COALESCE(comp, TIMESTAMP '{_LL_END}'),
                      TIMESTAMP '{_LL_END}'))))
             AS BIGINT) AS sum_open_days
      FROM pipe
    )
    SELECT n_arrivals, n_completed, sum_cycle_days, sum_open_days,
           (1000 * n_arrivals) // {_LL_DAYS} AS lambda_milli_per_day,
           (1000 * sum_cycle_days) // nullif(n_completed, 0)
             AS w_cycle_days_milli,
           (1000 * sum_open_days) // {_LL_DAYS} AS l_avg_open_milli,
           CAST((10000 * CAST(sum_open_days AS HUGEINT) * n_completed)
                // nullif(CAST(n_arrivals AS HUGEINT) * sum_cycle_days, 0)
                AS BIGINT) AS littles_ratio_bp
    FROM scalars
    """,
)
def q_littles_law_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AW aw3 — the Little's-law audit over calendar 1997:
    L (average open orders) vs λ·W (arrival rate × mean cycle time),
    all three sides exact. The average-WIP integral needs NO day spine:
    Σ_days open(d) == Σ_orders |[od, comp) ∩ window| — per-order
    overlap days, one map-side expression. The ratio L/(λW) in bp is
    the finite-window agreement score (exactly 10000 only in steady
    state; the long-lived backlog of this corpus keeps it above — the
    point of the audit row). Cross-multiplied corpus sums exceed 2⁶³ at
    scale, so the final ratio runs in DECIMAL(38,0)/HUGEINT (ai4
    convention); per-order terms stay BIGINT.

    Scale: one fact pass to the per-order relation, then a single
    partial-aggregated 1-row census; zero joins after the pipe."""
    pipe = _pipe(spark, sf_dir)
    start = F.lit(_LL_START).cast("timestamp")
    end = F.lit(_LL_END).cast("timestamp")
    in_win = (F.col("od") >= start) & (F.col("od") < end)
    scalars = pipe.agg(
        F.sum(F.when(in_win, 1).otherwise(0)).cast("long").alias("n_arrivals"),
        F.sum(F.when(in_win & F.col("comp").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_completed"),
        F.sum(
            F.when(
                in_win & F.col("comp").isNotNull(),
                F.datediff(F.col("comp"), F.col("od")),
            ).otherwise(0)
        )
        .cast("long")
        .alias("sum_cycle_days"),
        F.sum(
            F.greatest(
                F.lit(0),
                F.datediff(
                    F.least(F.coalesce(F.col("comp"), end), end),
                    F.greatest(F.col("od"), start),
                ),
            )
        )
        .cast("long")
        .alias("sum_open_days"),
    )
    return scalars.select(
        "n_arrivals",
        "n_completed",
        "sum_cycle_days",
        "sum_open_days",
        F.expr(f"(1000 * n_arrivals) div {_LL_DAYS}").alias(
            "lambda_milli_per_day"
        ),
        F.expr("(1000 * sum_cycle_days) div nullif(n_completed, 0)").alias(
            "w_cycle_days_milli"
        ),
        F.expr(f"(1000 * sum_open_days) div {_LL_DAYS}").alias(
            "l_avg_open_milli"
        ),
        F.expr(
            "CAST((CAST(10000 AS DECIMAL(38,0)) * sum_open_days * n_completed)"
            " div nullif(CAST(n_arrivals AS DECIMAL(38,0)) * sum_cycle_days, 0)"
            " AS BIGINT)"
        ).alias("littles_ratio_bp"),
    )


_RPT_START, _RPT_END = "1997-01-01", "1999-12-01"  # 36 month-ends


@query(
    "q_backlog_oldest_open",
    oracle=f"""
    WITH {_PIPE_SQL}
    , spans AS (
      SELECT od,
             greatest(date_trunc('month', od), TIMESTAMP '{_RPT_START}')
               AS m_lo,
             least(
               CASE WHEN comp IS NULL THEN TIMESTAMP '{_RPT_END}'
                    ELSE date_trunc('month', comp) - INTERVAL 1 MONTH END,
               TIMESTAMP '{_RPT_END}') AS m_hi
      FROM pipe
    ),
    open_months AS (
      SELECT CAST(year(m) * 100 + month(m) AS BIGINT) AS ym,
             date_diff('day', od, last_day(CAST(m AS DATE))) AS age_days
      FROM spans, UNNEST(generate_series(m_lo, m_hi, INTERVAL 1 MONTH))
             AS t(m)
      WHERE m_lo <= m_hi
    )
    SELECT ym, CAST(count(*) AS BIGINT) AS n_open,
           CAST(max(age_days) AS BIGINT) AS oldest_age_days,
           CAST(sum(CASE WHEN age_days > 180 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_open_gt180d
    FROM open_months GROUP BY 1 ORDER BY ym
    """,
)
def q_backlog_oldest_open(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AW aw4 — month-end open-order census for 1997–1999: how many
    orders are open at each month-end, the oldest one's age in days,
    and how many have been open more than 180 days. An order is open at
    month-end m iff it arrived by then and completes strictly after —
    with midnight timestamps that is exactly "completion month > m", so
    each order contributes the month range [month(od), month(comp)−1]
    clamped to the 36-month report window.

    Scale: per-order JVM-side ``sequence``+``explode`` over the CLAMPED
    month range — fan-out ≤ 36 per order and |orders|-proportional
    overall (the af2/aw-family adjudication); then one bounded month
    census. No day spine, no range join."""
    pipe = _pipe(spark, sf_dir)
    rpt_start = F.lit(_RPT_START).cast("timestamp")
    rpt_end = F.lit(_RPT_END).cast("timestamp")
    spans = pipe.select(
        "od",
        F.greatest(F.date_trunc("month", F.col("od")), rpt_start).alias("m_lo"),
        F.least(
            F.when(F.col("comp").isNull(), rpt_end).otherwise(
                F.expr("date_trunc('month', comp) - INTERVAL 1 MONTH")
            ),
            rpt_end,
        ).alias("m_hi"),
    ).where(F.col("m_lo") <= F.col("m_hi"))
    open_months = spans.select(
        "od",
        F.explode(
            F.expr("sequence(m_lo, m_hi, INTERVAL 1 MONTH)")
        ).alias("m"),
    ).select(
        (F.year("m") * 100 + F.month("m")).cast("long").alias("ym"),
        F.datediff(F.last_day(F.col("m")), F.col("od")).cast("long").alias(
            "age_days"
        ),
    )
    return (
        open_months.groupBy("ym")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_open"),
            F.max("age_days").cast("long").alias("oldest_age_days"),
            F.sum(F.when(F.col("age_days") > 180, 1).otherwise(0))
            .cast("long")
            .alias("n_open_gt180d"),
        )
        .orderBy("ym")
    )
