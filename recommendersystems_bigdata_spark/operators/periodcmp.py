"""Period-over-period calendar comparisons (SURVEY.md §2.BH, round 9).

The BI reporting idiom the month-over-month key (§2.G k11) doesn't
cover: SAME-PERIOD-LAST-YEAR alignment. "Up 4% YoY, tracking 2% behind
on YTD, Q3 softened QoQ, and brand X drove the decline" — each clause
is one key here, all on the bounded ship-month revenue census:

- bh1: the monthly SPLY table — each month's exact revenue cents
  beside the SAME calendar month one year earlier (an equi-join on
  (year−1, month), robust to missing months where a lag(12) would
  misalign) and YoY growth in truncated bp (NULL for the first year —
  no fabricated base).
- bh2: the YTD race — per month, the year-to-date cumulative cents vs
  the prior year's YTD through the same month, and the gap in bp. The
  "are we ahead of last year at this point" curve.
- bh3: the fiscal-quarter census — quarterly cents with QoQ (lag 1)
  and YoY (lag 4) growth bp over the gapless quarter sequence.
- bh4: YoY growth CONTRIBUTION — the 2000-vs-1999 revenue delta
  decomposed per brand: exact delta cents and each brand's share of
  the total delta in truncated bp (signed; shares sum to 10⁴ within
  the 25-truncation envelope, gate-pinned). Answers "WHO moved the
  number", the drill-down every YoY headline demands.

Exactness: revenue in the repo's integer-e4 discount-revenue units
summed in 128-bit, published as truncated cents; every growth/share is
a truncating integer division of exact integers (bp convention). NULL
— never a sentinel — where a base period does not exist.

Spark-first shape, sized for 100 TB: ONE lineitem pass partial-
aggregated to the ≤84-row month census (bh4 adds the part join for the
brand key, collapsing to ≤50 brand×year rows); every self-join, window
and lag runs census-side. The year filters are partition-prunable
under a ship-date-partitioned layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_tables
from recommendersystems_bigdata_spark.registry import query

_PRICE_E2 = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
_DISC_E2 = "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)"
_REV_E4 = f"{_PRICE_E2} * (100 - {_DISC_E2})"

# DuckDB: the monthly revenue census in truncated cents.
_MONTHLY_SQL = f"""
monthly AS (
  SELECT year(l_shipdate) AS yr, month(l_shipdate) AS mo,
         CAST(sum(CAST({_REV_E4} AS HUGEINT)) // 100 AS BIGINT) AS rev_cents
  FROM lineitem GROUP BY 1, 2
)
"""


def _monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = load_tables(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy(
            F.year("l_shipdate").alias("yr"),
            F.month("l_shipdate").alias("mo"),
        )
        .agg(
            F.expr(
                f"CAST(sum(CAST({_REV_E4} AS decimal(38,0))) div 100 AS BIGINT)"
            ).alias("rev_cents")
        )
    )


@query(
    "q_sply_monthly",
    oracle=f"""
    WITH {_MONTHLY_SQL}
    SELECT a.yr, a.mo, a.rev_cents, b.rev_cents AS sply_cents,
           CAST((10000 * (a.rev_cents - b.rev_cents)) // b.rev_cents
             AS BIGINT) AS yoy_bp
    FROM monthly a
    LEFT JOIN monthly b ON b.yr = a.yr - 1 AND b.mo = a.mo
    ORDER BY a.yr, a.mo
    """,
)
def q_sply_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BH bh1 — the same-period-last-year table: each ship month's
    exact revenue cents, the same calendar month one year earlier
    (equi-join on (yr−1, mo) — alignment survives missing months,
    where a lag(12) silently shifts), and YoY growth in truncated bp.
    First-year months carry NULLs, not a fabricated base.

    Scale: one partial-aggregated fact pass to the ≤84-row census; the
    SPLY self-join runs census-side."""
    m = _monthly(spark, sf_dir)
    a, b = m.alias("a"), m.alias("b")
    return (
        a.join(
            b,
            (F.col("b.yr") == F.col("a.yr") - 1)
            & (F.col("b.mo") == F.col("a.mo")),
            "left",
        )
        .select(
            F.col("a.yr").alias("yr"),
            F.col("a.mo").alias("mo"),
            F.col("a.rev_cents").alias("rev_cents"),
            F.col("b.rev_cents").alias("sply_cents"),
            F.expr(
                "CAST((10000 * (a.rev_cents - b.rev_cents)) div b.rev_cents"
                " AS BIGINT)"
            ).alias("yoy_bp"),
        )
        .orderBy("yr", "mo")
    )


@query(
    "q_ytd_comparison",
    oracle=f"""
    WITH {_MONTHLY_SQL},
    ytd AS (
      SELECT yr, mo,
             CAST(sum(rev_cents) OVER (PARTITION BY yr ORDER BY mo
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ytd_cents
      FROM monthly
    )
    SELECT a.yr, a.mo, a.ytd_cents, b.ytd_cents AS prior_ytd_cents,
           CAST((10000 * (a.ytd_cents - b.ytd_cents)) // b.ytd_cents
             AS BIGINT) AS ytd_gap_bp
    FROM ytd a LEFT JOIN ytd b ON b.yr = a.yr - 1 AND b.mo = a.mo
    ORDER BY a.yr, a.mo
    """,
)
def q_ytd_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BH bh2 — the YTD race: per month, the year-to-date cumulative
    revenue vs the PRIOR year's YTD through the same month, gap in
    truncated bp. The within-year running sum is a year-partitioned
    window over the bounded census (≤12 rows per partition — no
    single-partition global sort).

    Scale: same census pass as bh1; the YTD window partitions by
    year."""
    m = _monthly(spark, sf_dir)
    w = (
        Window.partitionBy("yr")
        .orderBy("mo")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ytd = m.select(
        "yr", "mo", F.sum("rev_cents").over(w).cast("long").alias("ytd_cents")
    )
    a, b = ytd.alias("a"), ytd.alias("b")
    return (
        a.join(
            b,
            (F.col("b.yr") == F.col("a.yr") - 1)
            & (F.col("b.mo") == F.col("a.mo")),
            "left",
        )
        .select(
            F.col("a.yr").alias("yr"),
            F.col("a.mo").alias("mo"),
            F.col("a.ytd_cents").alias("ytd_cents"),
            F.col("b.ytd_cents").alias("prior_ytd_cents"),
            F.expr(
                "CAST((10000 * (a.ytd_cents - b.ytd_cents)) div b.ytd_cents"
                " AS BIGINT)"
            ).alias("ytd_gap_bp"),
        )
        .orderBy("yr", "mo")
    )


@query(
    "q_quarter_census",
    oracle=f"""
    WITH {_MONTHLY_SQL},
    q AS (
      SELECT yr, (mo + 2) // 3 AS qtr,
             CAST(sum(rev_cents) AS BIGINT) AS rev_cents
      FROM monthly GROUP BY 1, 2
    ),
    lagged AS (
      SELECT yr, qtr, rev_cents,
             lag(rev_cents, 1) OVER (ORDER BY yr, qtr) AS prev_q,
             lag(rev_cents, 4) OVER (ORDER BY yr, qtr) AS prev_y
      FROM q
    )
    SELECT yr, qtr, rev_cents,
           CAST((10000 * (rev_cents - prev_q)) // prev_q AS BIGINT) AS qoq_bp,
           CAST((10000 * (rev_cents - prev_y)) // prev_y AS BIGINT) AS yoy_bp
    FROM lagged ORDER BY yr, qtr
    """,
)
def q_quarter_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BH bh3 — the quarterly census with QoQ (lag 1) and YoY
    (lag 4) growth bp over the gapless quarter sequence (the corpus
    ships in every month, so positional lags are safe here — unlike
    bh1's join-based alignment, and the contrast is deliberate: the
    docstring of each names when its device is the right one).

    Scale: the quarter rollup and lags run on a ≤28-row census; the
    single ordered window is bounded by the calendar, not the data."""
    m = _monthly(spark, sf_dir)
    q = m.groupBy(
        "yr", F.expr("(mo + 2) div 3").alias("qtr")
    ).agg(F.sum("rev_cents").cast("long").alias("rev_cents"))
    w = Window.orderBy("yr", "qtr")
    lagged = q.select(
        "yr",
        "qtr",
        "rev_cents",
        F.lag("rev_cents", 1).over(w).alias("prev_q"),
        F.lag("rev_cents", 4).over(w).alias("prev_y"),
    )
    return lagged.select(
        "yr",
        "qtr",
        "rev_cents",
        F.expr(
            "CAST((10000 * (rev_cents - prev_q)) div prev_q AS BIGINT)"
        ).alias("qoq_bp"),
        F.expr(
            "CAST((10000 * (rev_cents - prev_y)) div prev_y AS BIGINT)"
        ).alias("yoy_bp"),
    ).orderBy("yr", "qtr")


@query(
    "q_yoy_brand_contribution",
    oracle=f"""
    WITH by_brand AS (
      SELECT p.p_brand AS brand,
             CAST(sum(CASE WHEN year(l.l_shipdate) = 2000
                           THEN CAST({_REV_E4} AS HUGEINT) ELSE 0 END) // 100
               AS BIGINT) AS cur_cents,
             CAST(sum(CASE WHEN year(l.l_shipdate) = 1999
                           THEN CAST({_REV_E4} AS HUGEINT) ELSE 0 END) // 100
               AS BIGINT) AS base_cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE year(l.l_shipdate) IN (1999, 2000)
      GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(cur_cents - base_cents) AS BIGINT) AS delta_total
      FROM by_brand
    )
    SELECT brand, cur_cents, base_cents,
           cur_cents - base_cents AS delta_cents,
           CAST((10000 * (cur_cents - base_cents)) // tot.delta_total
             AS BIGINT) AS delta_share_bp
    FROM by_brand, tot
    ORDER BY delta_cents DESC, brand
    """,
)
def q_yoy_brand_contribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BH bh4 — who moved the YoY number: the 2000-vs-1999 revenue
    delta per brand in exact cents and each brand's SIGNED share of
    the total delta in truncated bp (a brand moving against the trend
    carries a negative share). Shares sum to 10⁴ within one truncation
    per brand row — the gate pins the closure.

    Scale: one year-filtered (partition-prunable) lineitem⋈part pass
    with conditional 128-bit sums to the 25-brand census; the 1-row
    delta total attaches as a broadcast."""
    lineitem, part = load_tables(spark, sf_dir, "lineitem", "part")
    dec = "decimal(38,0)"
    by_brand = (
        lineitem.where(F.year("l_shipdate").isin(1999, 2000))
        .join(part, lineitem.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.expr(
                f"CAST(sum(CASE WHEN year(l_shipdate) = 2000"
                f" THEN CAST({_REV_E4} AS {dec}) ELSE CAST(0 AS {dec}) END)"
                f" div 100 AS BIGINT)"
            ).alias("cur_cents"),
            F.expr(
                f"CAST(sum(CASE WHEN year(l_shipdate) = 1999"
                f" THEN CAST({_REV_E4} AS {dec}) ELSE CAST(0 AS {dec}) END)"
                f" div 100 AS BIGINT)"
            ).alias("base_cents"),
        )
    )
    tot = by_brand.agg(
        F.sum(F.col("cur_cents") - F.col("base_cents"))
        .cast("long")
        .alias("delta_total")
    )
    return (
        by_brand.crossJoin(F.broadcast(tot))
        .select(
            "brand",
            "cur_cents",
            "base_cents",
            (F.col("cur_cents") - F.col("base_cents")).alias("delta_cents"),
            F.expr(
                "CAST((10000 * (cur_cents - base_cents)) div delta_total"
                " AS BIGINT)"
            ).alias("delta_share_bp"),
        )
        .orderBy(F.col("delta_cents").desc(), "brand")
    )
