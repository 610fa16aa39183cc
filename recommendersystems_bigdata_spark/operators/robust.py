"""Robust / order-statistics aggregation (SURVEY.md §2.AP, round 9).

The outlier-resistant aggregate family a metrics platform publishes when
plain means are whale-dominated: trimmed mean (drop the top/bottom 10%),
winsorized statistics (clamp instead of drop), exact rank-based
quartiles (midhinge / IQR / quartile coefficient of dispersion), tail
dominance (what share of revenue the top 1% / 5% of orders carry), and
per-decile means. Everything is defined on explicit integer ranks over
the exact cent grid — no float percentile interpolation — so both
engines agree bit-for-bit.

The shared lowering is the §2.U percentile_cont lesson, generalized:
build the per-segment CDF OVER DISTINCT VALUES — one partial-aggregated
(segment, cents) census, then cumulative ranks [lo, hi] per distinct
value — and express every statistic as an exact multiplicity overlap
with a rank interval:

    included(v) = max(0, min(hi_v, R_hi) - max(lo_v, R_lo) + 1)

This handles boundary values whose multiplicity straddles a cutoff
EXACTLY (a row-level rank window gets this right too, but pays a full
per-segment fact sort; the CDF pays one groupBy and windows over the
far smaller distinct-value relation — the spelling that survives a
100× fact).

Exactness: cents on the floor(v·100 + 0.5) grid; every mean/share a
truncated BIGINT division (Spark ``div`` == DuckDB ``//``); window sums
CAST to BIGINT on the DuckDB side (HUGEINT would reach pandas as
float64 and break the hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query

_CENTS = "CAST(floor({col} * 100 + 0.5) AS BIGINT)"

# DuckDB: per-segment CDF over distinct order-value cents.
# lo/hi are the 1-based global rank interval each distinct value covers.
_CDF_SQL = f"""
hist AS (
  SELECT c.c_mktsegment AS seg,
         {_CENTS.format(col="o.o_totalprice")} AS cents,
         CAST(count(*) AS BIGINT) AS cnt
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
cdf AS (
  SELECT seg, cents, cnt,
         CAST(sum(cnt) OVER (PARTITION BY seg ORDER BY cents
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS hi,
         CAST(sum(cnt) OVER (PARTITION BY seg) AS BIGINT) AS n
  FROM hist
),
ranked AS (
  SELECT seg, cents, cnt, hi, hi - cnt + 1 AS lo, n FROM cdf
)
"""


def _cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(seg, cents, cnt, lo, hi, n): the per-segment distinct-value CDF.

    One fact shuffle (customer dim broadcast, partial-aggregated groupBy
    to segment × cents); the two windows share ONE segment partitioning
    over the distinct-value relation."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    hist = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.expr(_CENTS.format(col="o_totalprice")).alias("cents"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w_cum = (
        Window.partitionBy("seg")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("seg")
    return (
        hist.withColumn("hi", F.sum("cnt").over(w_cum).cast("long"))
        .withColumn("lo", F.col("hi") - F.col("cnt") + 1)
        .withColumn("n", F.sum("cnt").over(w_all).cast("long"))
    )


# exact multiplicity overlap of a distinct value with rank interval
# [r_lo, r_hi] (all BIGINT; identical text in both engines)
_INCL = "greatest(0, least(hi, {r_hi}) - greatest(lo, {r_lo}) + 1)"


@query(
    "q_trimmed_mean",
    oracle=f"""
    WITH {_CDF_SQL}
    SELECT seg, CAST(max(n) AS BIGINT) AS n_orders,
           CAST(max(n) // 10 AS BIGINT) AS k_trim,
           CAST(sum(cents * cnt) AS BIGINT) // max(n) AS plain_mean_cents,
           CAST(sum(cents * {_INCL.format(r_lo="n // 10 + 1",
                                          r_hi="n - n // 10")}) AS BIGINT)
             // (max(n) - 2 * (max(n) // 10)) AS trimmed_mean_cents,
           (10000 * (CAST(sum(cents * cnt) AS BIGINT) // max(n)
                     - CAST(sum(cents * {_INCL.format(r_lo="n // 10 + 1",
                                                      r_hi="n - n // 10")})
                            AS BIGINT)
                       // (max(n) - 2 * (max(n) // 10))))
             // nullif(CAST(sum(cents * {_INCL.format(r_lo="n // 10 + 1",
                                                      r_hi="n - n // 10")})
                            AS BIGINT)
                       // (max(n) - 2 * (max(n) // 10)), 0) AS outlier_gap_bp
    FROM ranked GROUP BY seg ORDER BY seg
    """,
)
def q_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AP ap1 — 10% two-sided trimmed mean: per segment, the mean of
    order values after dropping the k = n div 10 smallest and largest
    orders (exact partial multiplicities at the cut boundaries via the
    rank-interval overlap), next to the plain mean and the signed gap in
    bp — how much the whales move the headline number.

    Scale: one (seg, cents) census; the trim is arithmetic on the
    distinct-value CDF — no row-level rank window, no per-segment fact
    sort."""
    incl = F.expr(_INCL.format(r_lo="n div 10 + 1", r_hi="n - n div 10"))
    agg = _cdf(spark, sf_dir).groupBy("seg").agg(
        F.max("n").cast("long").alias("n_orders"),
        F.expr("max(n) div 10").alias("k_trim"),
        F.expr("sum(cents * cnt)").cast("long").alias("_tot"),
        F.sum(F.col("cents") * incl).cast("long").alias("_mid"),
    )
    return (
        agg.withColumn(
            "plain_mean_cents", F.expr("_tot div n_orders")
        )
        .withColumn(
            "trimmed_mean_cents",
            F.expr("_mid div (n_orders - 2 * k_trim)"),
        )
        .withColumn(
            "outlier_gap_bp",
            F.expr(
                "(10000 * (plain_mean_cents - trimmed_mean_cents))"
                " div nullif(trimmed_mean_cents, 0)"
            ),
        )
        .select(
            "seg",
            "n_orders",
            "k_trim",
            "plain_mean_cents",
            "trimmed_mean_cents",
            "outlier_gap_bp",
        )
        .orderBy("seg")
    )


@query(
    "q_winsorized_stats",
    oracle=f"""
    WITH {_CDF_SQL}
    SELECT seg, CAST(max(n) AS BIGINT) AS n_orders,
           min(CASE WHEN hi >= n // 20 + 1 THEN cents END) AS p05_cents,
           min(CASE WHEN hi >= n - n // 20 THEN cents END) AS p95_cents,
           (CAST(sum(cents * {_INCL.format(r_lo="n // 20 + 1",
                                           r_hi="n - n // 20")}) AS BIGINT)
            + (max(n) // 20)
              * (min(CASE WHEN hi >= n // 20 + 1 THEN cents END)
                 + min(CASE WHEN hi >= n - n // 20 THEN cents END)))
             AS winsorized_sum_cents,
           (CAST(sum(cents * {_INCL.format(r_lo="n // 20 + 1",
                                           r_hi="n - n // 20")}) AS BIGINT)
            + (max(n) // 20)
              * (min(CASE WHEN hi >= n // 20 + 1 THEN cents END)
                 + min(CASE WHEN hi >= n - n // 20 THEN cents END)))
             // max(n) AS winsorized_mean_cents
    FROM ranked GROUP BY seg ORDER BY seg
    """,
)
def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AP ap2 — 5%/95% winsorization: per segment, the k = n div 20
    lowest orders are clamped UP to the 5th-percentile value (the value
    at rank k+1) and the k highest clamped DOWN to the 95th (rank n−k)
    — outliers lose influence but keep their row, the estimator a
    finance team prefers over trimming when counts must reconcile.
    The clamp values come off the same CDF (`min(CASE WHEN hi ≥ r THEN
    cents END)` = the value whose rank interval covers r).

    Scale: identical single-census shape to ap1 — the clamp is
    conditional aggregation, not a second pass."""
    r_lo = "n div 20 + 1"
    r_hi = "n - n div 20"
    incl = F.expr(_INCL.format(r_lo=r_lo, r_hi=r_hi))
    agg = _cdf(spark, sf_dir).groupBy("seg").agg(
        F.max("n").cast("long").alias("n_orders"),
        F.min(
            F.when(F.expr(f"hi >= {r_lo}"), F.col("cents"))
        ).alias("p05_cents"),
        F.min(
            F.when(F.expr(f"hi >= {r_hi}"), F.col("cents"))
        ).alias("p95_cents"),
        F.sum(F.col("cents") * incl).cast("long").alias("_mid"),
    )
    return (
        agg.withColumn(
            "winsorized_sum_cents",
            F.expr("_mid + (n_orders div 20) * (p05_cents + p95_cents)"),
        )
        .withColumn(
            "winsorized_mean_cents",
            F.expr("winsorized_sum_cents div n_orders"),
        )
        .select(
            "seg",
            "n_orders",
            "p05_cents",
            "p95_cents",
            "winsorized_sum_cents",
            "winsorized_mean_cents",
        )
        .orderBy("seg")
    )


@query(
    "q_quartile_dispersion",
    oracle=f"""
    WITH {_CDF_SQL}
    SELECT seg, CAST(max(n) AS BIGINT) AS n_orders,
           min(CASE WHEN hi >= (n + 3) // 4 THEN cents END) AS q1_cents,
           min(CASE WHEN hi >= (n + 1) // 2 THEN cents END) AS median_cents,
           min(CASE WHEN hi >= (3 * n + 3) // 4 THEN cents END) AS q3_cents,
           (min(CASE WHEN hi >= (n + 3) // 4 THEN cents END)
            + min(CASE WHEN hi >= (3 * n + 3) // 4 THEN cents END)) // 2
             AS midhinge_cents,
           min(CASE WHEN hi >= (3 * n + 3) // 4 THEN cents END)
             - min(CASE WHEN hi >= (n + 3) // 4 THEN cents END) AS iqr_cents,
           (10000 * (min(CASE WHEN hi >= (3 * n + 3) // 4 THEN cents END)
                     - min(CASE WHEN hi >= (n + 3) // 4 THEN cents END)))
             // nullif(min(CASE WHEN hi >= (3 * n + 3) // 4 THEN cents END)
                       + min(CASE WHEN hi >= (n + 3) // 4 THEN cents END), 0)
             AS qcd_bp
    FROM ranked GROUP BY seg ORDER BY seg
    """,
)
def q_quartile_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AP ap3 — exact rank-based quartiles: per segment, Q1/median/Q3
    as the value at rank ceil(q·n) (type-1 quantile — a value the data
    actually contains, no interpolation), the midhinge (the robust
    center (Q1+Q3) div 2), the IQR, and the quartile coefficient of
    dispersion in bp (the scale-free spread measure that compares
    segments with different price levels).

    Scale: pure conditional aggregation over the CDF — all three
    quartiles in ONE pass, no percentile UDAF, no sort."""
    q1_r = "(n + 3) div 4"
    med_r = "(n + 1) div 2"
    q3_r = "(3 * n + 3) div 4"

    def at(r: str):
        return F.min(F.when(F.expr(f"hi >= {r}"), F.col("cents")))

    agg = _cdf(spark, sf_dir).groupBy("seg").agg(
        F.max("n").cast("long").alias("n_orders"),
        at(q1_r).alias("q1_cents"),
        at(med_r).alias("median_cents"),
        at(q3_r).alias("q3_cents"),
    )
    return (
        agg.withColumn(
            "midhinge_cents", F.expr("(q1_cents + q3_cents) div 2")
        )
        .withColumn("iqr_cents", F.expr("q3_cents - q1_cents"))
        .withColumn(
            "qcd_bp",
            F.expr(
                "(10000 * (q3_cents - q1_cents))"
                " div nullif(q3_cents + q1_cents, 0)"
            ),
        )
        .orderBy("seg")
    )


@query(
    "q_tail_dominance",
    oracle=f"""
    WITH {_CDF_SQL}
    SELECT seg, CAST(max(n) AS BIGINT) AS n_orders,
           CAST(sum(cents * cnt) AS BIGINT) AS total_cents,
           (10000 * CAST(sum(cents * {_INCL.format(
                r_lo="n - greatest(1, n // 100) + 1", r_hi="n")})
              AS BIGINT))
             // CAST(sum(cents * cnt) AS BIGINT) AS top1pct_share_bp,
           (10000 * CAST(sum(cents * {_INCL.format(
                r_lo="n - greatest(1, n // 20) + 1", r_hi="n")})
              AS BIGINT))
             // CAST(sum(cents * cnt) AS BIGINT) AS top5pct_share_bp,
           (10000 * CAST(max(cents) AS BIGINT))
             // CAST(sum(cents * cnt) AS BIGINT) AS max_order_share_bp
    FROM ranked GROUP BY seg ORDER BY seg
    """,
)
def q_tail_dominance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AP ap4 — tail dominance: per segment, the revenue share (bp)
    carried by the top 1% and top 5% of orders by value (≥1 order each
    via the greatest(1, ·) floor) plus the single largest order's share
    — the whale-concentration companion to ap1's gap: WHERE the plain
    mean's distortion comes from.

    Scale: top-k-by-value is a rank interval [n−k+1, n] on the same
    CDF — no global sort, no TakeOrdered over raw rows."""
    top1 = F.expr(
        _INCL.format(r_lo="n - greatest(1, n div 100) + 1", r_hi="n")
    )
    top5 = F.expr(
        _INCL.format(r_lo="n - greatest(1, n div 20) + 1", r_hi="n")
    )
    agg = _cdf(spark, sf_dir).groupBy("seg").agg(
        F.max("n").cast("long").alias("n_orders"),
        F.expr("sum(cents * cnt)").cast("long").alias("total_cents"),
        F.sum(F.col("cents") * top1).cast("long").alias("_t1"),
        F.sum(F.col("cents") * top5).cast("long").alias("_t5"),
        F.max("cents").cast("long").alias("_mx"),
    )
    return agg.select(
        "seg",
        "n_orders",
        "total_cents",
        F.expr("(10000 * _t1) div total_cents").alias("top1pct_share_bp"),
        F.expr("(10000 * _t5) div total_cents").alias("top5pct_share_bp"),
        F.expr("(10000 * _mx) div total_cents").alias("max_order_share_bp"),
    ).orderBy("seg")


@query(
    "q_decile_means",
    oracle=f"""
    WITH {_CDF_SQL},
    deciles AS (
      SELECT seg, CAST(d AS BIGINT) AS decile, cents, cnt, lo, hi, n,
             (d - 1) * n // 10 + 1 AS r_lo,
             d * n // 10 AS r_hi
      FROM ranked, unnest(generate_series(1, 10)) AS t(d)
    )
    SELECT seg, decile,
           CAST(max(r_hi - r_lo + 1) AS BIGINT) AS n_orders,
           CAST(sum(cents * greatest(0, least(hi, r_hi)
                                        - greatest(lo, r_lo) + 1))
                AS BIGINT) AS decile_cents,
           CAST(sum(cents * greatest(0, least(hi, r_hi)
                                        - greatest(lo, r_lo) + 1))
                AS BIGINT)
             // nullif(max(r_hi - r_lo + 1), 0) AS mean_cents
    FROM deciles GROUP BY 1, 2 ORDER BY seg, decile
    """,
)
def q_decile_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AP ap5 — per-decile means: each segment's order values split
    into 10 exact rank deciles (decile d = ranks ((d−1)·n div 10,
    d·n div 10], ANSI ntile sizing for n divisible by 10 and within one
    row of it otherwise), with count, revenue and truncated mean per
    decile — the value-distribution profile behind lift charts and
    price-tier design. The ×10 decile fan-out runs over the DISTINCT-
    value CDF, not raw rows.

    Scale: one census + a ×10 explode of the bounded CDF relation —
    the decile assignment is pure arithmetic, no ntile window over the
    fact."""
    cdf = _cdf(spark, sf_dir)
    deciles = cdf.select(
        "seg",
        "cents",
        "cnt",
        "lo",
        "hi",
        "n",
        F.explode(F.sequence(F.lit(1), F.lit(10))).alias("d"),
    ).withColumns(
        {
            "decile": F.col("d").cast("long"),
            "r_lo": F.expr("(d - 1) * n div 10 + 1"),
            "r_hi": F.expr("d * n div 10"),
        }
    )
    incl = F.expr(
        "greatest(0, least(hi, r_hi) - greatest(lo, r_lo) + 1)"
    )
    return (
        deciles.groupBy("seg", "decile")
        .agg(
            F.max(F.expr("r_hi - r_lo + 1")).cast("long").alias("n_orders"),
            F.sum(F.col("cents") * incl).cast("long").alias("decile_cents"),
        )
        .withColumn(
            "mean_cents",
            F.expr("decile_cents div nullif(n_orders, 0)"),
        )
        .orderBy("seg", "decile")
    )
