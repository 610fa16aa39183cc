"""Statistical process control charts (SURVEY.md §2.BI, round 9).

The Shewhart-chart family over the warehouse's own monthly series —
the "is this variation noise or signal" machinery that complements
§2.AA's CUSUM change-point and §2.AM's tracking signal:

- bi1: the p-chart on the monthly RETURN RATE (binomial proportion,
  lineitem ``l_returnflag = 'R'``): per-month exact counts, rate and
  centerline in truncated bp, and the 3σ breach flag evaluated as a
  CROSS-MULTIPLIED INTEGER comparison — ``|p_m − p̄| > 3·√(p̄(1−p̄)/n)``
  squared and cleared of denominators to ``(r·N − R·n)² > 9·R·(N−R)·n``
  — so the sqrt never materializes and both engines compare the same
  128-bit integers (the same device as §2.Y's variance-free rank
  tests).
- bi2: the X-MR individuals chart on monthly revenue: exact moving
  ranges, the ±2.66·MR̄ natural-process limits in truncated
  milli-cents (the standard d₂-derived constant, in exact milli), and
  high/low breach flags against those PUBLISHED truncated limits.
- bi3: the runs-rule audit (Western Electric rule 4): maximal
  same-side-of-center runs of the revenue series via gaps-islands
  over the month census, each run with its span, length, side, and
  the ≥8-in-a-row breach flag.
- bi4: the chart summary — one row per series (returns p-chart,
  revenue X-chart) with point counts, breach counts, and the longest
  same-side run.

Exactness: counts and cents are exact integers; rates/centers/limits
are truncating divisions; 3σ tests are denominator-cleared integer
compares (no sqrt, no float σ). Headroom: bi1's ``(rN−Rn)²`` clears
128-bit through ~sf30 for monthly groups — past that, pre-divide r, n,
R, N by a common 10³ (the inequality is scale-invariant up to the
documented boundary wobble), same hatch policy as §2.AA/§2.BD.

Spark-first shape, sized for 100 TB: ONE lineitem pass partial-
aggregated to the ≤84-row month census per chart; centers/limits are
1-row broadcasts; every window (MR lag, runs islands) is census-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_tables
from recommendersystems_bigdata_spark.registry import query

_PRICE_E2 = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
_DISC_E2 = "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)"
_REV_E4 = f"{_PRICE_E2} * (100 - {_DISC_E2})"

# DuckDB: monthly (n, returns) and (rev_cents) censuses.
_P_SQL = """
pm AS (
  SELECT year(l_shipdate) AS yr, month(l_shipdate) AS mo,
         CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT) AS r
  FROM lineitem GROUP BY 1, 2
),
ptot AS (
  SELECT CAST(sum(n) AS BIGINT) AS big_n, CAST(sum(r) AS BIGINT) AS big_r
  FROM pm
)
"""
_X_SQL = f"""
xm AS (
  SELECT year(l_shipdate) AS yr, month(l_shipdate) AS mo,
         CAST(sum(CAST({_REV_E4} AS HUGEINT)) // 100 AS BIGINT) AS x_cents
  FROM lineitem GROUP BY 1, 2
),
xstat AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         CAST((1000 * sum(CAST(x_cents AS HUGEINT))) // count(*) AS BIGINT)
           AS xbar_milli
  FROM xm
),
mr AS (
  SELECT yr, mo, x_cents,
         abs(x_cents - lag(x_cents) OVER (ORDER BY yr, mo)) AS mr_cents
  FROM xm
),
mrstat AS (
  SELECT CAST((1000 * sum(CAST(mr_cents AS HUGEINT))) // count(mr_cents)
           AS BIGINT) AS mrbar_milli
  FROM mr
),
limits AS (
  SELECT xbar_milli,
         xbar_milli + (2660 * mrbar_milli) // 1000 AS ucl_milli,
         xbar_milli - (2660 * mrbar_milli) // 1000 AS lcl_milli
  FROM xstat, mrstat
)
"""


def _pm(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = load_tables(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy(
            F.year("l_shipdate").alias("yr"),
            F.month("l_shipdate").alias("mo"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count_if(F.col("l_returnflag") == "R").cast("long").alias("r"),
        )
    )


def _xm(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = load_tables(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy(
            F.year("l_shipdate").alias("yr"),
            F.month("l_shipdate").alias("mo"),
        )
        .agg(
            F.expr(
                f"CAST(sum(CAST({_REV_E4} AS decimal(38,0))) div 100"
                f" AS BIGINT)"
            ).alias("x_cents")
        )
    )


def _xm_limits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(yr, mo, x_cents, mr_cents, xbar_milli, ucl_milli, lcl_milli)."""
    xm = _xm(spark, sf_dir)
    w = Window.orderBy("yr", "mo")
    mr = xm.select(
        "yr",
        "mo",
        "x_cents",
        F.abs(F.col("x_cents") - F.lag("x_cents").over(w)).alias("mr_cents"),
    )
    dec = "decimal(38,0)"
    xstat = xm.agg(
        F.expr(
            f"CAST((CAST(1000 AS {dec}) * sum(CAST(x_cents AS {dec})))"
            f" div count(*) AS BIGINT)"
        ).alias("xbar_milli")
    )
    mrstat = mr.agg(
        F.expr(
            f"CAST((CAST(1000 AS {dec}) * sum(CAST(mr_cents AS {dec})))"
            f" div count(mr_cents) AS BIGINT)"
        ).alias("mrbar_milli")
    )
    limits = xstat.crossJoin(mrstat).select(
        "xbar_milli",
        (
            F.col("xbar_milli")
            + F.expr("(2660 * mrbar_milli) div 1000")
        ).alias("ucl_milli"),
        (
            F.col("xbar_milli")
            - F.expr("(2660 * mrbar_milli) div 1000")
        ).alias("lcl_milli"),
    )
    return mr.crossJoin(F.broadcast(limits))


@query(
    "q_spc_pchart_returns",
    oracle=f"""
    WITH {_P_SQL}
    SELECT yr, mo, n, r,
           CAST((10000 * r) // n AS BIGINT) AS rate_bp,
           CAST((10000 * big_r) // big_n AS BIGINT) AS center_bp,
           CAST(CAST(r AS HUGEINT) * big_n - CAST(big_r AS HUGEINT) * n
                AS HUGEINT)
             * (CAST(r AS HUGEINT) * big_n - CAST(big_r AS HUGEINT) * n)
             > 9 * CAST(big_r AS HUGEINT) * (big_n - big_r) * n AS breach,
           CASE WHEN CAST(r AS HUGEINT) * big_n > CAST(big_r AS HUGEINT) * n
                THEN 1 WHEN CAST(r AS HUGEINT) * big_n
                            < CAST(big_r AS HUGEINT) * n
                THEN -1 ELSE 0 END AS side
    FROM pm, ptot ORDER BY yr, mo
    """,
)
def q_spc_pchart_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BI bi1 — the p-chart on the monthly return rate: exact
    counts, rate and centerline in truncated bp, and the 3σ breach as
    the denominator-cleared integer compare ``(r·N − R·n)² >
    9·R·(N−R)·n`` (derivation in the module doc) with the side of the
    centerline. No sqrt, no float σ — the flag is bit-identical across
    engines by construction.

    Scale: one partial-aggregated fact pass to the ≤84-row census; the
    1-row (N, R) totals attach as a broadcast."""
    dec = "decimal(38,0)"
    pm = _pm(spark, sf_dir)
    ptot = pm.agg(
        F.sum("n").cast("long").alias("big_n"),
        F.sum("r").cast("long").alias("big_r"),
    )
    dev = f"(CAST(r AS {dec}) * big_n - CAST(big_r AS {dec}) * n)"
    return (
        pm.crossJoin(F.broadcast(ptot))
        .select(
            "yr",
            "mo",
            "n",
            "r",
            F.expr("CAST((10000 * r) div n AS BIGINT)").alias("rate_bp"),
            F.expr("CAST((10000 * big_r) div big_n AS BIGINT)").alias(
                "center_bp"
            ),
            F.expr(
                f"{dev} * {dev}"
                f" > CAST(9 AS {dec}) * big_r * (big_n - big_r) * n"
            ).alias("breach"),
            F.expr(
                f"CASE WHEN {dev} > 0 THEN 1 WHEN {dev} < 0 THEN -1"
                f" ELSE 0 END"
            ).alias("side"),
        )
        .orderBy("yr", "mo")
    )


@query(
    "q_spc_xmr_revenue",
    oracle=f"""
    WITH {_X_SQL}
    SELECT yr, mo, x_cents, mr_cents, xbar_milli, ucl_milli, lcl_milli,
           1000 * x_cents > ucl_milli AS breach_high,
           1000 * x_cents < lcl_milli AS breach_low
    FROM mr, limits ORDER BY yr, mo
    """,
)
def q_spc_xmr_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BI bi2 — the X-MR individuals chart on monthly revenue:
    exact cents, the moving range (NULL on the first point — no
    fabricated range), the ±2.66·MR̄ natural-process limits in
    truncated milli-cents, and breach flags tested against those
    PUBLISHED truncated limits — so the flags reproduce from the
    table's own columns, the same self-consistency rule as §2.BD's
    intercept.

    Scale: one fact pass to the month census; the MR lag is the
    census-ordered window; limits ride a 1-row broadcast."""
    return (
        _xm_limits(spark, sf_dir)
        .select(
            "yr",
            "mo",
            "x_cents",
            "mr_cents",
            "xbar_milli",
            "ucl_milli",
            "lcl_milli",
            (F.lit(1000) * F.col("x_cents") > F.col("ucl_milli")).alias(
                "breach_high"
            ),
            (F.lit(1000) * F.col("x_cents") < F.col("lcl_milli")).alias(
                "breach_low"
            ),
        )
        .orderBy("yr", "mo")
    )


@query(
    "q_spc_runs_rules",
    oracle=f"""
    WITH {_X_SQL},
    signed AS (
      SELECT yr, mo,
             CASE WHEN 1000 * x_cents > xbar_milli THEN 1
                  WHEN 1000 * x_cents < xbar_milli THEN -1 ELSE 0 END AS side,
             row_number() OVER (ORDER BY yr, mo) AS i
      FROM xm, limits
    ),
    isl AS (
      SELECT side, i - row_number() OVER (PARTITION BY side ORDER BY i)
               AS grp, i, yr, mo
      FROM signed
    )
    SELECT min_by(yr, i) AS start_yr, min_by(mo, i) AS start_mo,
           CAST(count(*) AS BIGINT) AS run_len, side,
           count(*) >= 8 AS rule8_breach
    FROM isl GROUP BY side, grp
    ORDER BY start_yr, start_mo
    """,
)
def q_spc_runs_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BI bi3 — Western Electric rule 4: maximal same-side-of-center
    runs of the monthly revenue series via gaps-islands (row_number
    difference) over the bounded census, each with its starting month,
    length, side, and the ≥8-in-a-row breach flag. A long one-sided
    run flags a sustained shift the ±3σ test misses. The start month
    is ``min_by(·, i)`` — the calendar month OF the run's first point
    (a plain ``min(mo)`` would mislabel a run that spans a year
    boundary).

    Scale: windows over the ≤84-row census only."""
    xm = _xm(spark, sf_dir)
    xstat_lim = _xm_limits(spark, sf_dir).select("xbar_milli").limit(1)
    signed = xm.crossJoin(F.broadcast(xstat_lim)).select(
        "yr",
        "mo",
        F.expr(
            "CASE WHEN 1000 * x_cents > xbar_milli THEN 1"
            " WHEN 1000 * x_cents < xbar_milli THEN -1 ELSE 0 END"
        ).alias("side"),
        F.row_number().over(Window.orderBy("yr", "mo")).alias("i"),
    )
    isl = signed.select(
        "side",
        "yr",
        "mo",
        "i",
        (
            F.col("i")
            - F.row_number().over(Window.partitionBy("side").orderBy("i"))
        ).alias("grp"),
    )
    return (
        isl.groupBy("side", "grp")
        .agg(
            F.min_by("yr", "i").alias("start_yr"),
            F.min_by("mo", "i").alias("start_mo"),
            F.count(F.lit(1)).cast("long").alias("run_len"),
        )
        .select(
            "start_yr",
            "start_mo",
            "run_len",
            "side",
            (F.col("run_len") >= 8).alias("rule8_breach"),
        )
        .orderBy("start_yr", "start_mo")
    )


@query(
    "q_spc_summary",
    oracle=f"""
    WITH {_P_SQL},
    pbr AS (
      SELECT CAST(count(*) AS BIGINT) AS n_points,
             CAST(count(*) FILTER (WHERE
               CAST(CAST(r AS HUGEINT) * big_n - CAST(big_r AS HUGEINT) * n
                    AS HUGEINT)
               * (CAST(r AS HUGEINT) * big_n - CAST(big_r AS HUGEINT) * n)
               > 9 * CAST(big_r AS HUGEINT) * (big_n - big_r) * n)
               AS BIGINT) AS n_breaches
      FROM pm, ptot
    ),
    {_X_SQL.strip().lstrip()},
    xbr AS (
      SELECT CAST(count(*) AS BIGINT) AS n_points,
             CAST(count(*) FILTER (WHERE 1000 * x_cents > ucl_milli
                                      OR 1000 * x_cents < lcl_milli)
               AS BIGINT) AS n_breaches
      FROM mr, limits
    ),
    signed AS (
      SELECT CASE WHEN 1000 * x_cents > xbar_milli THEN 1
                  WHEN 1000 * x_cents < xbar_milli THEN -1 ELSE 0 END AS side,
             row_number() OVER (ORDER BY yr, mo) AS i
      FROM xm, limits
    ),
    runs AS (
      SELECT CAST(max(cnt) AS BIGINT) AS longest FROM (
        SELECT count(*) AS cnt FROM (
          SELECT side, i - row_number() OVER (PARTITION BY side ORDER BY i)
                   AS grp
          FROM signed
        ) GROUP BY side, grp
      )
    ),
    psigned AS (
      SELECT CASE WHEN CAST(r AS HUGEINT) * big_n
                       > CAST(big_r AS HUGEINT) * n THEN 1
                  WHEN CAST(r AS HUGEINT) * big_n
                       < CAST(big_r AS HUGEINT) * n THEN -1 ELSE 0 END AS side,
             row_number() OVER (ORDER BY yr, mo) AS i
      FROM pm, ptot
    ),
    pruns AS (
      SELECT CAST(max(cnt) AS BIGINT) AS longest FROM (
        SELECT count(*) AS cnt FROM (
          SELECT side, i - row_number() OVER (PARTITION BY side ORDER BY i)
                   AS grp
          FROM psigned
        ) GROUP BY side, grp
      )
    )
    SELECT 'returns_p' AS series, pbr.n_points, pbr.n_breaches,
           pruns.longest AS longest_run
    FROM pbr, pruns
    UNION ALL
    SELECT 'revenue_x', xbr.n_points, xbr.n_breaches, runs.longest
    FROM xbr, runs
    ORDER BY series
    """,
)
def q_spc_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BI bi4 — the two-row chart scorecard: per series (the
    returns p-chart, the revenue X-chart), point count, 3σ/limit
    breach count, and the longest same-side-of-center run. The
    at-a-glance "which monitors are alarming" table.

    Scale: both censuses are single fact passes; all summary
    arithmetic is census-side."""
    dec = "decimal(38,0)"
    # p-chart side
    pch = q_spc_pchart_returns(spark, sf_dir)
    pbr = pch.agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.count_if(F.col("breach")).cast("long").alias("n_breaches"),
    )
    psign = pch.select(
        "side", F.row_number().over(Window.orderBy("yr", "mo")).alias("i")
    )
    pruns = (
        psign.select(
            "side",
            (
                F.col("i")
                - F.row_number().over(
                    Window.partitionBy("side").orderBy("i")
                )
            ).alias("grp"),
        )
        .groupBy("side", "grp")
        .count()
        .agg(F.max("count").cast("long").alias("longest_run"))
    )
    prow = pbr.crossJoin(pruns).select(
        F.lit("returns_p").alias("series"),
        "n_points",
        "n_breaches",
        "longest_run",
    )
    # X-chart side
    xch = q_spc_xmr_revenue(spark, sf_dir)
    xbr = xch.agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.count_if(F.col("breach_high") | F.col("breach_low"))
        .cast("long")
        .alias("n_breaches"),
    )
    xsign = xch.select(
        F.expr(
            "CASE WHEN 1000 * x_cents > xbar_milli THEN 1"
            " WHEN 1000 * x_cents < xbar_milli THEN -1 ELSE 0 END"
        ).alias("side"),
        F.row_number().over(Window.orderBy("yr", "mo")).alias("i"),
    )
    xruns = (
        xsign.select(
            "side",
            (
                F.col("i")
                - F.row_number().over(
                    Window.partitionBy("side").orderBy("i")
                )
            ).alias("grp"),
        )
        .groupBy("side", "grp")
        .count()
        .agg(F.max("count").cast("long").alias("longest_run"))
    )
    xrow = xbr.crossJoin(xruns).select(
        F.lit("revenue_x").alias("series"),
        "n_points",
        "n_breaches",
        "longest_run",
    )
    return prow.unionAll(xrow).orderBy("series")
