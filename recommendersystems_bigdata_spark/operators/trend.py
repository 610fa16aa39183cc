"""Robust nonparametric trend — Theil–Sen & Mann–Kendall
(SURVEY.md §2.BT, round 10).

"Is revenue actually trending, robustly" — the outlier-proof trend
family on the monthly revenue series, beside §2.BD's exact OLS (which
a single spiked month can drag) and §2.AA's diagnostics:

- bt1: the monthly revenue census itself — calendar month, a dense
  month index t, exact revenue cents and line counts (the series the
  rest of the suite consumes).
- bt2: the Theil–Sen slope — the median of all pairwise slopes
  (y_j − y_i)/(t_j − t_i), i < j: up to 50% of months can be corrupted
  before the estimate moves.
- bt3: the Mann–Kendall trend test — S = Σ_{i<j} sign(y_j − y_i), its
  tie-corrected variance, and the 95% trend verdict.
- bt4: the seasonal Mann–Kendall — the same test within each calendar
  month across years (Jan-vs-Jan, ...), immune to seasonality that
  fools the plain test.

EXACTNESS SPELLINGS (everything integer, both engines identical):

- Pairwise slopes are published in SIGN-EXPLICIT truncated milli:
  ``slope_milli = sign(dy) · ((1000·|dy|) div dx)`` — |dy| keeps the
  division on non-negatives, where Spark ``div`` ≡ DuckDB ``//``
  (toward-zero vs floor divergence only exists for negative
  dividends). The published Theil–Sen estimate is the LOWER MEDIAN
  (the ⌈n/2⌉-th smallest VALUE — an order statistic of a multiset, so
  tie order inside the sort never matters).
- Mann–Kendall S is pure integer sign-counting. The tie-corrected
  variance ``Var·18 = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)`` is published
  as the INTEGER var18 (never divided by 18), and the z-test with
  continuity correction |z| > 1.96 is the CLEARED compare
  ``180000·(|S|−1)² > 38416·var18``  (z² = (|S|−1)²/Var =
  18·(|S|−1)²/var18 > 1.96² = 38416/10⁴) — no sqrt, no float, no
  division. S = 0 short-circuits to 'no_trend' before the correction.

Spark-first shape, sized for 100 TB: ONE fact pass partial-aggregates
lineitem to the ≤|months|-row census (83 at the test SFs; ~1200 rows
after a century); all pair enumeration is census-side self-join —
≤ |months|²/2 ≈ 3.4k pairs, bounded FOREVER, so the pair join's
nested loop and bt2's single-partition order-statistic window run
over a census that never grows with the fact (adjudicated in
tests/test_plans.py). bt4 keys pairs on the calendar month — an
equi-join, 12 seasonal groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query

_PRICE_E2 = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
_DISC_E2 = "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)"
_REV_E4 = f"{_PRICE_E2} * (100 - {_DISC_E2})"
_DEC = "decimal(38,0)"

_CENSUS_DUCK = f"""
mrev AS (
  SELECT CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT) AS t,
         CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT) AS ym,
         CAST(month(l_shipdate) AS BIGINT) AS mo,
         CAST(sum(CAST({_REV_E4} AS HUGEINT)) // 100 AS BIGINT) AS rev_cents,
         CAST(count(*) AS BIGINT) AS lines
  FROM lineitem GROUP BY 1, 2, 3
)
"""

# sign-explicit truncated milli slope over a pair (dy may be negative;
# dx > 0 by construction)
_SLOPE_DUCK = (
    "CASE WHEN dy >= 0 THEN (1000 * dy) // dx"
    " ELSE -((1000 * (-dy)) // dx) END"
)
_SLOPE_SPARK = (
    "CASE WHEN dy >= 0 THEN (1000 * dy) div dx"
    " ELSE -((1000 * (-dy)) div dx) END"
)

# cleared 95% two-sided Mann–Kendall verdict with continuity correction
_VERDICT_DUCK = """
CASE WHEN s_stat > 0
          AND 180000 * (s_stat - 1) * (s_stat - 1) > 38416 * var18
     THEN 'increasing'
     WHEN s_stat < 0
          AND 180000 * (s_stat + 1) * (s_stat + 1) > 38416 * var18
     THEN 'decreasing'
     ELSE 'no_trend' END
"""
_VERDICT_SPARK = (
    "CASE WHEN s_stat > 0"
    " AND 180000 * (s_stat - 1) * (s_stat - 1) > 38416 * var18"
    " THEN 'increasing'"
    " WHEN s_stat < 0"
    " AND 180000 * (s_stat + 1) * (s_stat + 1) > 38416 * var18"
    " THEN 'decreasing'"
    " ELSE 'no_trend' END"
)


def _census(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        (F.year("l_shipdate") * 12 + F.month("l_shipdate"))
        .cast("long")
        .alias("t"),
        (F.year("l_shipdate") * 100 + F.month("l_shipdate"))
        .cast("long")
        .alias("ym"),
        F.month("l_shipdate").cast("long").alias("mo"),
    ).agg(
        F.expr(
            f"CAST(sum(CAST({_REV_E4} AS {_DEC})) div 100 AS BIGINT)"
        ).alias("rev_cents"),
        F.count(F.lit(1)).cast("long").alias("lines"),
    )


def _pairs(census: DataFrame, same_month: bool = False) -> DataFrame:
    """(dy, dx[, mo]) over census pairs i < j (dx > 0 always)."""
    a = census.select(
        F.col("t").alias("ta"),
        F.col("mo").alias("moa"),
        F.col("rev_cents").alias("ya"),
    )
    b = census.select(
        F.col("t").alias("tb"),
        F.col("mo").alias("mob"),
        F.col("rev_cents").alias("yb"),
    )
    cond = F.col("ta") < F.col("tb")
    if same_month:
        pairs = a.join(b, (F.col("moa") == F.col("mob")) & cond)
    else:
        pairs = a.join(b, cond)
    return pairs.select(
        F.col("moa").alias("mo"),
        (F.col("yb") - F.col("ya")).alias("dy"),
        (F.col("tb") - F.col("ta")).alias("dx"),
    )


@query(
    "q_trend_monthly_revenue",
    oracle=f"""
    WITH {_CENSUS_DUCK}
    SELECT ym, t, rev_cents, lines FROM mrev ORDER BY ym
    """,
)
def q_trend_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BT bt1 — the monthly revenue census: calendar month ym, the
    dense month index t = 12·year + month (pair gaps dx = t_j − t_i
    count real months, including any with no sales), exact revenue
    cents from the per-row _REV_E4 fold, and line counts.

    Scale: one partial-aggregated fact pass to the ≤|months| census."""
    return (
        _census(spark, sf_dir)
        .select("ym", "t", "rev_cents", "lines")
        .orderBy("ym")
    )


@query(
    "q_theil_sen_trend",
    oracle=f"""
    WITH {_CENSUS_DUCK},
    pairs AS (
      SELECT b.rev_cents - a.rev_cents AS dy, b.t - a.t AS dx
      FROM mrev a JOIN mrev b ON a.t < b.t
    ),
    slopes AS (SELECT {_SLOPE_DUCK} AS slope_milli FROM pairs),
    ranked AS (
      SELECT slope_milli,
             row_number() OVER (ORDER BY slope_milli) AS rn,
             count(*) OVER () AS np
      FROM slopes
    )
    SELECT CAST(max(np) AS BIGINT) AS n_pairs,
           CAST(max(CASE WHEN rn = (np + 1) // 2 THEN slope_milli END)
                AS BIGINT) AS theil_sen_milli,
           CAST(min(slope_milli) AS BIGINT) AS slope_min_milli,
           CAST(max(slope_milli) AS BIGINT) AS slope_max_milli
    FROM ranked
    """,
)
def q_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BT bt2 — the Theil–Sen robust slope: the lower median of the
    sign-explicit truncated-milli pairwise slopes (cents per month per
    1000), with the pair count and slope range. Median as the
    ⌈n/2⌉-th smallest value — an order statistic of the multiset, so
    duplicate slopes need no tiebreak.

    Scale: the pair join and the order-statistic window run over the
    ≤|months|²/2 pair census (~3.4k rows), bounded regardless of fact
    size — the single-partition window is census-side by design."""
    slopes = _pairs(_census(spark, sf_dir)).select(
        F.expr(_SLOPE_SPARK).alias("slope_milli")
    )
    w = Window.orderBy("slope_milli")
    ranked = slopes.select(
        "slope_milli",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("np"),
    )
    return ranked.agg(
        F.max("np").cast("long").alias("n_pairs"),
        F.max(
            F.when(F.expr("rn = (np + 1) div 2"), F.col("slope_milli"))
        )
        .cast("long")
        .alias("theil_sen_milli"),
        F.min("slope_milli").cast("long").alias("slope_min_milli"),
        F.max("slope_milli").cast("long").alias("slope_max_milli"),
    )


@query(
    "q_mann_kendall_trend",
    oracle=f"""
    WITH {_CENSUS_DUCK},
    sgn AS (
      SELECT CAST(sum(CASE WHEN b.rev_cents > a.rev_cents THEN 1
                           WHEN b.rev_cents < a.rev_cents THEN -1
                           ELSE 0 END) AS BIGINT) AS s_stat
      FROM mrev a JOIN mrev b ON a.t < b.t
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM mrev),
    ties AS (
      SELECT COALESCE(CAST(sum(tc * (tc - 1) * (2 * tc + 5)) AS BIGINT), 0)
             AS tie_term
      FROM (SELECT CAST(count(*) AS BIGINT) AS tc
            FROM mrev GROUP BY rev_cents HAVING count(*) > 1)
    ),
    d AS (
      SELECT n, s_stat,
             n * (n - 1) * (2 * n + 5) - tie_term AS var18
      FROM sgn, nn, ties
    )
    SELECT n AS n_months, s_stat, CAST(var18 AS BIGINT) AS var18,
           {_VERDICT_DUCK} AS trend
    FROM d
    """,
)
def q_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BT bt3 — the Mann–Kendall trend test on monthly revenue:
    S = Σ_{i<j} sign(y_j − y_i), the tie-corrected 18·Var integer, and
    the two-sided 95% verdict via the cleared continuity-corrected
    compare in the module doc — a trend decision with zero float
    operations.

    Scale: the sign sum is one aggregate over the bounded pair census;
    ties and n are census-side 1-row aggregates."""
    census = _census(spark, sf_dir).localCheckpoint()
    sgn = _pairs(census).agg(
        F.sum(
            F.when(F.col("dy") > 0, 1).when(F.col("dy") < 0, -1).otherwise(0)
        )
        .cast("long")
        .alias("s_stat")
    )
    nn = census.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ties = (
        census.groupBy("rev_cents")
        .agg(F.count(F.lit(1)).cast("long").alias("tc"))
        .filter(F.col("tc") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.expr("tc * (tc - 1) * (2 * tc + 5)")
                ).cast("long"),
                F.lit(0).cast("long"),
            ).alias("tie_term")
        )
    )
    d = (
        sgn.crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(ties))
        .select(
            "n",
            "s_stat",
            F.expr("n * (n - 1) * (2 * n + 5) - tie_term").alias("var18"),
        )
    )
    return d.select(
        F.col("n").alias("n_months"),
        "s_stat",
        F.col("var18").cast("long").alias("var18"),
        F.expr(_VERDICT_SPARK).alias("trend"),
    )


@query(
    "q_seasonal_mann_kendall",
    oracle=f"""
    WITH {_CENSUS_DUCK},
    sgn AS (
      SELECT a.mo,
             CAST(sum(CASE WHEN b.rev_cents > a.rev_cents THEN 1
                           WHEN b.rev_cents < a.rev_cents THEN -1
                           ELSE 0 END) AS BIGINT) AS s_stat
      FROM mrev a JOIN mrev b ON a.mo = b.mo AND a.t < b.t
      GROUP BY a.mo
    ),
    nn AS (SELECT mo, CAST(count(*) AS BIGINT) AS n FROM mrev GROUP BY mo),
    ties AS (
      SELECT mo,
             CAST(sum(tc * (tc - 1) * (2 * tc + 5)) AS BIGINT) AS tie_term
      FROM (SELECT mo, CAST(count(*) AS BIGINT) AS tc
            FROM mrev GROUP BY mo, rev_cents HAVING count(*) > 1)
      GROUP BY mo
    ),
    d AS (
      SELECT n.mo, n.n, s.s_stat,
             n.n * (n.n - 1) * (2 * n.n + 5) - COALESCE(t.tie_term, 0)
               AS var18
      FROM nn n JOIN sgn s ON n.mo = s.mo
      LEFT JOIN ties t ON n.mo = t.mo
    )
    SELECT mo, n AS n_years, s_stat, CAST(var18 AS BIGINT) AS var18,
           {_VERDICT_DUCK} AS trend
    FROM d ORDER BY mo
    """,
)
def q_seasonal_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BT bt4 — the seasonal Mann–Kendall test: the bt3 machinery
    applied WITHIN each calendar month across years (January compared
    only to other Januaries), so a strong seasonal cycle cannot fake or
    mask a trend; one row per season with its own S, var18, and
    verdict.

    Scale: pairs are keyed on the calendar month (equi-join over the
    bounded census); per-season reductions are 12-row relations."""
    census = _census(spark, sf_dir).localCheckpoint()
    sgn = (
        _pairs(census, same_month=True)
        .groupBy("mo")
        .agg(
            F.sum(
                F.when(F.col("dy") > 0, 1)
                .when(F.col("dy") < 0, -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    nn = census.groupBy("mo").agg(F.count(F.lit(1)).cast("long").alias("n"))
    ties = (
        census.groupBy("mo", "rev_cents")
        .agg(F.count(F.lit(1)).cast("long").alias("tc"))
        .filter(F.col("tc") > 1)
        .groupBy("mo")
        .agg(
            F.sum(F.expr("tc * (tc - 1) * (2 * tc + 5)"))
            .cast("long")
            .alias("tie_term")
        )
    )
    d = (
        nn.join(sgn, "mo")
        .join(ties, "mo", "left")
        .select(
            "mo",
            "n",
            "s_stat",
            F.expr(
                "n * (n - 1) * (2 * n + 5) - COALESCE(tie_term, 0)"
            ).alias("var18"),
        )
    )
    return d.select(
        "mo",
        F.col("n").alias("n_years"),
        "s_stat",
        F.col("var18").cast("long").alias("var18"),
        F.expr(_VERDICT_SPARK).alias("trend"),
    ).orderBy("mo")
