"""Aggregation-bias audits — Simpson's paradox screens
(SURVEY.md §2.BP, round 9).

"Does the overall trend survive disaggregation" — the audit every
dashboard needs before a pooled KPI trend drives a decision, beside
§2.BO's variance ladder (is the grouping informative) and §2.BA's mix
standardization (remove the mix): here the question is whether the
POOLED year trend of order value and the WITHIN-SEGMENT trends even
agree, and how much of the pooled movement is mix artifact.

- bp1: per-segment year trend — the sign of the (year, order-value)
  covariance within each segment, via the CLEARED integer form
  ``sign(n·Σxy − Σx·Σy)`` (the §2.BD device: no float slope, the sign
  is exact 128-bit arithmetic), with the covariance numerator
  published.
- bp2: the reversal audit, one row — the pooled trend sign beside the
  per-segment sign census, flagging the Simpson shape: a pooled trend
  that NO segment exhibits.
- bp3: the weighted-vs-unweighted gap by year — the order-weighted
  mean (what a pooled KPI shows) against the plain mean of segment
  means (what "average segment" does); their divergence IS the
  aggregation bias, in exact truncated cents.
- bp4: the segment trend table — first-year and last-year means per
  segment plus the pooled 'ALL' row, the readable companion that
  shows the reversal when bp2 flags one.

Exactness: cents exact; covariance numerators in decimal(38,0)/
HUGEINT (n·Σxy ~ 10²¹ at sf1 — 38 digits clear through ~sf10¹²);
means are truncating divisions of non-negative integers; signs are
integer compares.

Spark-first shape, sized for 100 TB: ONE orders pass per query,
partial-aggregated to the (segment, year) census (the segment
attaches UNHINTED — AQE broadcasts while the customer dim fits,
shuffle-joins beyond, per the §2.BO probe adjudication); every
statistic above is census-side; pooled rows ride 1-row broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from recommendersystems_bigdata_spark.catalog import load_tables
from recommendersystems_bigdata_spark.registry import query

_CENTS = "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
_DEC = "decimal(38,0)"

# DuckDB: the (segment, year) census of (n, Σy, Σxy, Σx) with x = year.
_CENSUS_DUCK = f"""
sy AS (
  SELECT c.c_mktsegment AS segment, year(o_orderdate) AS yr,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum({_CENTS}) AS BIGINT) AS s
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
seg AS (
  SELECT segment,
         CAST(sum(n) AS HUGEINT) AS n,
         CAST(sum(CAST(yr AS HUGEINT) * n) AS HUGEINT) AS sx,
         CAST(sum(s) AS HUGEINT) AS sy_,
         CAST(sum(CAST(yr AS HUGEINT) * s) AS HUGEINT) AS sxy
  FROM sy GROUP BY segment
),
pooled AS (
  SELECT CAST(sum(n) AS HUGEINT) AS n,
         CAST(sum(sx) AS HUGEINT) AS sx,
         CAST(sum(sy_) AS HUGEINT) AS sy_,
         CAST(sum(sxy) AS HUGEINT) AS sxy
  FROM seg
)
"""
_SIGN_DUCK = (
    "CASE WHEN n * sxy > sx * sy_ THEN 1"
    " WHEN n * sxy < sx * sy_ THEN -1 ELSE 0 END"
)


def _sy_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(segment, yr, n, s): the bounded (segment, year) census."""
    orders, customer = load_tables(spark, sf_dir, "orders", "customer")
    return (
        orders.join(
            customer.select("c_custkey", "c_mktsegment"),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.year("o_orderdate").alias("yr"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.expr(f"CAST(sum({_CENTS}) AS BIGINT)").alias("s"),
        )
    )


def _seg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(segment, n, sx, sy_, sxy) in decimal(38,0) from the census."""
    return _sy_census(spark, sf_dir).groupBy("segment").agg(
        F.expr(f"CAST(sum(n) AS {_DEC})").alias("n"),
        F.expr(f"CAST(sum(CAST(yr AS {_DEC}) * n) AS {_DEC})").alias("sx"),
        F.expr(f"CAST(sum(s) AS {_DEC})").alias("sy_"),
        F.expr(f"CAST(sum(CAST(yr AS {_DEC}) * s) AS {_DEC})").alias("sxy"),
    )


_SIGN_SPARK = (
    "CASE WHEN n * sxy > sx * sy_ THEN 1"
    " WHEN n * sxy < sx * sy_ THEN -1 ELSE 0 END"
)


@query(
    "q_trend_sign_by_segment",
    oracle=f"""
    WITH {_CENSUS_DUCK}
    SELECT segment, CAST(n AS BIGINT) AS n,
           CAST(n * sxy - sx * sy_ AS BIGINT) AS cov_num,
           CAST({_SIGN_DUCK} AS BIGINT) AS trend_sign
    FROM seg ORDER BY segment
    """,
)
def q_trend_sign_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BP bp1 — each segment's year-vs-order-value trend: the exact
    covariance numerator ``n·Σxy − Σx·Σy`` (x = order year, y = cents)
    and its sign — the slope's sign without the slope's float. A
    negative sign with a positive pooled sign is the Simpson
    ingredient bp2 flags.

    Scale: one orders pass to the (segment, year) census, reduced
    census-side; the dim attach is AQE-decided (§2.BO adjudication)."""
    return (
        _seg_moments(spark, sf_dir)
        .select(
            "segment",
            F.expr("CAST(n AS BIGINT)").alias("n"),
            F.expr("CAST(n * sxy - sx * sy_ AS BIGINT)").alias("cov_num"),
            F.expr(f"CAST({_SIGN_SPARK} AS BIGINT)").alias("trend_sign"),
        )
        .orderBy("segment")
    )


@query(
    "q_simpson_reversal_audit",
    oracle=f"""
    WITH {_CENSUS_DUCK},
    signs AS (
      SELECT CAST({_SIGN_DUCK} AS BIGINT) AS sgn FROM seg
    ),
    sc AS (
      SELECT CAST(count(*) FILTER (WHERE sgn = 1) AS BIGINT) AS segs_up,
             CAST(count(*) FILTER (WHERE sgn = -1) AS BIGINT) AS segs_down,
             CAST(count(*) FILTER (WHERE sgn = 0) AS BIGINT) AS segs_flat
      FROM signs
    ),
    ps AS (
      SELECT CAST({_SIGN_DUCK} AS BIGINT) AS pooled_sign FROM pooled
    )
    SELECT pooled_sign, segs_up, segs_down, segs_flat,
           (pooled_sign = 1 AND segs_up = 0)
             OR (pooled_sign = -1 AND segs_down = 0) AS reversal
    FROM ps, sc
    """,
)
def q_simpson_reversal_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BP bp2 — the Simpson reversal audit, one row: the POOLED
    trend sign beside the per-segment sign census, with the reversal
    flag — a pooled trend that not one segment exhibits is a mix
    artifact, not a behavior change. Both signs use the same cleared
    covariance form, so the flag is exact.

    Scale: bp1's census reduced twice (per-segment signs → 3-count
    census; pooled moments → 1 row); both legs bounded."""
    seg = _seg_moments(spark, sf_dir)
    signs = seg.select(F.expr(f"CAST({_SIGN_SPARK} AS BIGINT)").alias("sgn"))
    sc = signs.agg(
        F.count_if(F.col("sgn") == 1).cast("long").alias("segs_up"),
        F.count_if(F.col("sgn") == -1).cast("long").alias("segs_down"),
        F.count_if(F.col("sgn") == 0).cast("long").alias("segs_flat"),
    )
    pooled = seg.agg(
        F.expr("CAST(sum(n) AS decimal(38,0))").alias("n"),
        F.expr("CAST(sum(sx) AS decimal(38,0))").alias("sx"),
        F.expr("CAST(sum(sy_) AS decimal(38,0))").alias("sy_"),
        F.expr("CAST(sum(sxy) AS decimal(38,0))").alias("sxy"),
    ).select(F.expr(f"CAST({_SIGN_SPARK} AS BIGINT)").alias("pooled_sign"))
    return pooled.crossJoin(F.broadcast(sc)).select(
        "pooled_sign",
        "segs_up",
        "segs_down",
        "segs_flat",
        F.expr(
            "(pooled_sign = 1 AND segs_up = 0)"
            " OR (pooled_sign = -1 AND segs_down = 0)"
        ).alias("reversal"),
    )


@query(
    "q_weighted_unweighted_gap",
    oracle=f"""
    WITH {_CENSUS_DUCK}
    SELECT yr, CAST(sum(n) AS BIGINT) AS orders,
           CAST(sum(CAST(s AS HUGEINT)) // sum(n) AS BIGINT)
             AS weighted_mean_cents,
           CAST(sum(CAST(s AS HUGEINT) // n) // count(*) AS BIGINT)
             AS unweighted_mean_cents,
           CAST(sum(CAST(s AS HUGEINT)) // sum(n)
                - sum(CAST(s AS HUGEINT) // n) // count(*) AS BIGINT)
             AS gap_cents
    FROM sy GROUP BY yr ORDER BY yr
    """,
)
def q_weighted_unweighted_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BP bp3 — the aggregation-bias gap by year: the order-weighted
    mean (the pooled KPI) against the unweighted mean of the segment
    means (each a PUBLISHED truncation, then the integer mean of those
    — so the column recomposes from bp4's per-segment means exactly).
    A gap that trends is mix shift masquerading as behavior.

    Scale: census-side only — both means aggregate the bounded
    (segment, year) census."""
    sy = _sy_census(spark, sf_dir)
    return (
        sy.groupBy("yr")
        .agg(
            F.sum("n").cast("long").alias("orders"),
            F.expr(
                f"CAST(sum(CAST(s AS {_DEC})) div sum(n) AS BIGINT)"
            ).alias("weighted_mean_cents"),
            F.expr(
                f"CAST(sum(CAST(s AS {_DEC}) div n) div count(*) AS BIGINT)"
            ).alias("unweighted_mean_cents"),
        )
        .select(
            "yr",
            "orders",
            "weighted_mean_cents",
            "unweighted_mean_cents",
            (
                F.col("weighted_mean_cents")
                - F.col("unweighted_mean_cents")
            ).alias("gap_cents"),
        )
        .orderBy("yr")
    )


@query(
    "q_segment_trend_table",
    oracle=f"""
    WITH {_CENSUS_DUCK},
    span AS (
      SELECT CAST(min(yr) AS BIGINT) AS first_yr,
             CAST(max(yr) AS BIGINT) AS last_yr
      FROM sy
    ),
    per_seg AS (
      SELECT segment,
             CAST(sum(s) FILTER (WHERE yr = first_yr)
                  // sum(n) FILTER (WHERE yr = first_yr) AS BIGINT)
               AS first_mean_cents,
             CAST(sum(s) FILTER (WHERE yr = last_yr)
                  // sum(n) FILTER (WHERE yr = last_yr) AS BIGINT)
               AS last_mean_cents
      FROM sy, span GROUP BY segment
    ),
    pooled_row AS (
      SELECT 'ALL' AS segment,
             CAST(sum(s) FILTER (WHERE yr = first_yr)
                  // sum(n) FILTER (WHERE yr = first_yr) AS BIGINT)
               AS first_mean_cents,
             CAST(sum(s) FILTER (WHERE yr = last_yr)
                  // sum(n) FILTER (WHERE yr = last_yr) AS BIGINT)
               AS last_mean_cents
      FROM sy, span
    ),
    u AS (
      SELECT * FROM per_seg UNION ALL SELECT * FROM pooled_row
    )
    SELECT segment, first_mean_cents, last_mean_cents,
           last_mean_cents - first_mean_cents AS delta_cents
    FROM u ORDER BY segment
    """,
)
def q_segment_trend_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BP bp4 — the segment trend table: each segment's truncated
    mean order value in the corpus's first and last year plus the
    pooled 'ALL' row — the table where a bp2 reversal becomes visible
    to a human (every segment down, ALL up). Endpoint years come from
    the census itself, so the table needs no date parameters.

    Scale: conditional sums over the bounded census; the 1-row year
    span attaches as a broadcast."""
    sy = _sy_census(spark, sf_dir)
    span = sy.agg(
        F.min("yr").cast("long").alias("first_yr"),
        F.max("yr").cast("long").alias("last_yr"),
    )
    based = sy.crossJoin(F.broadcast(span))

    def _means(df: DataFrame, seg_col) -> DataFrame:
        return df.groupBy(seg_col.alias("segment")).agg(
            F.expr(
                "CAST(sum(CASE WHEN yr = first_yr THEN s END)"
                " div sum(CASE WHEN yr = first_yr THEN n END) AS BIGINT)"
            ).alias("first_mean_cents"),
            F.expr(
                "CAST(sum(CASE WHEN yr = last_yr THEN s END)"
                " div sum(CASE WHEN yr = last_yr THEN n END) AS BIGINT)"
            ).alias("last_mean_cents"),
        )

    per_seg = _means(based, F.col("segment"))
    pooled = _means(based, F.lit("ALL"))
    return (
        per_seg.unionAll(pooled)
        .select(
            "segment",
            "first_mean_cents",
            "last_mean_cents",
            (
                F.col("last_mean_cents") - F.col("first_mean_cents")
            ).alias("delta_cents"),
        )
        .orderBy("segment")
    )
