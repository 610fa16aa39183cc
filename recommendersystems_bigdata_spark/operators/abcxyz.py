"""Demand variability classification — ABC-XYZ (SURVEY.md §2.BK, round 9).

The inventory-planning classification family over per-part monthly
demand, beside §2.E's ABC/Pareto and §2.AE's stock flows:

- bk1: XYZ classes by the coefficient of variation of monthly demand
  (zero months INCLUDED — a part that ships 3 months out of 84 is
  highly variable even if those 3 months match). With M = the global
  month-census size, s = Σq, ssq = Σq²: ``CV² = Var/Mean² =
  (M·ssq − s²)/s²`` — exact integers throughout; the X/Y/Z cutoffs
  (CV ≤ 0.5 / ≤ 1.0) are the CLEARED compares ``4·(M·ssq − s²) ≤ s²``
  and ``(M·ssq − s²) ≤ s²`` — no sqrt, no float variance (the same
  denominator-clearing device as §2.BI's p-chart).
- bk2: the Syntetos–Boylan demand-pattern quadrants (smooth /
  intermittent / erratic / lumpy) from ADI (average inter-demand
  interval = M / months_active) and CV², with the published cutoffs
  ADI 1.32 and CV² 0.49 as the cleared compares ``100·M < 132·active``
  and ``100·(M·ssq − s²) < 49·s²`` (Syntetos & Boylan, IJF 2005).
- bk3: the ABC×XYZ planning matrix — ABC revenue classes via the
  distributed cumulative share (functions/ranks.py, thresholds 50%/80%
  as integer compares, the §2.E device) crossed with bk1's XYZ
  classes; ≤9 cells with part counts and revenue share bp.
- bk4: the demand-pattern scorecard — per Syntetos–Boylan class, part
  count, exact total quantity, quantity share bp, and the integer
  means of the published adi_milli/cv2_milli columns (recomposable
  from bk2 by construction).

Exactness: quantities are whole (cast via floor(q+0.5)); bk3's
revenue "micros" are e4 units from the per-row integer fold
cents·(100 − disc_e2) — the suite-wide _REV_E4 device, never a
rounded cross-row float sum; every ratio
is a truncating division of non-negative integers (Spark ``div`` ≡
DuckDB ``//`` there); every class boundary is an integer compare.
``M·ssq − s² ≥ 0`` by Cauchy–Schwarz over the M month slots, so no
signed-division hazard exists. Headroom: per-part s is bounded by
50·(lines per part) — lines per part is scale-free in TPC-H-shaped
data (~30), and the cleared products are evaluated in decimal(38,0)/
HUGEINT anyway, clearing ~10¹⁷ lines per part.

Spark-first shape, sized for 100 TB: ONE fact pass partial-aggregates
to the (part, month) census, a second census-side aggregation reduces
to one row per part (shuffle bounded by the part catalog, not the
fact); the global month count M rides a 1-row broadcast; bk3's
cumulative rank is the two-pass distributed ranks.py plan (no
single-partition exchange over the part catalog) and its ABC⋈XYZ join
is keyed part-vs-part.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query

_QTY = "CAST(floor(l_quantity + 0.5) AS BIGINT)"
# bk3's revenue in e4 units ("micros" column) is the exact per-row
# integer fold cents·(100 − disc_e2) — the §2.BD/§2.BH _REV_E4 device —
# never a rounded float aggregate (cross-row float sums are
# partition-order-dependent at the .5 boundary).
_PRICE_E2 = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
_DISC_E2 = "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)"

# DuckDB: the shared (part, month) demand census, per-part moments and
# the global month count.
_CENSUS_SQL = f"""
pmc AS (
  SELECT l_partkey, year(l_shipdate) AS yr, month(l_shipdate) AS mo,
         CAST(sum({_QTY}) AS BIGINT) AS q
  FROM lineitem GROUP BY 1, 2, 3
),
mtot AS (
  SELECT CAST(count(*) AS BIGINT) AS m
  FROM (SELECT DISTINCT yr, mo FROM pmc)
),
moments AS (
  SELECT l_partkey,
         CAST(count(*) AS BIGINT) AS active,
         CAST(sum(q) AS BIGINT) AS s,
         CAST(sum(q * q) AS BIGINT) AS ssq
  FROM pmc GROUP BY l_partkey
)
"""

_VAR_NUM_DUCK = "(m * CAST(ssq AS HUGEINT) - CAST(s AS HUGEINT) * s)"
_XYZ_DUCK = f"""
CASE WHEN 4 * {_VAR_NUM_DUCK} <= CAST(s AS HUGEINT) * s THEN 'X'
     WHEN {_VAR_NUM_DUCK} <= CAST(s AS HUGEINT) * s THEN 'Y'
     ELSE 'Z' END
"""
_SB_DUCK = f"""
CASE WHEN 100 * m < 132 * active
          AND 100 * {_VAR_NUM_DUCK} < 49 * CAST(s AS HUGEINT) * s
     THEN 'smooth'
     WHEN 100 * m >= 132 * active
          AND 100 * {_VAR_NUM_DUCK} < 49 * CAST(s AS HUGEINT) * s
     THEN 'intermittent'
     WHEN 100 * m < 132 * active THEN 'erratic'
     ELSE 'lumpy' END
"""

_DEC = "decimal(38,0)"
_VAR_NUM_SPARK = (
    f"(CAST(m AS {_DEC}) * ssq - CAST(s AS {_DEC}) * s)"
)
_XYZ_SPARK = (
    f"CASE WHEN 4 * {_VAR_NUM_SPARK} <= CAST(s AS {_DEC}) * s THEN 'X'"
    f" WHEN {_VAR_NUM_SPARK} <= CAST(s AS {_DEC}) * s THEN 'Y'"
    f" ELSE 'Z' END"
)
_SB_SPARK = (
    f"CASE WHEN 100 * m < 132 * active"
    f" AND 100 * {_VAR_NUM_SPARK} < CAST(49 AS {_DEC}) * s * s"
    f" THEN 'smooth'"
    f" WHEN 100 * m >= 132 * active"
    f" AND 100 * {_VAR_NUM_SPARK} < CAST(49 AS {_DEC}) * s * s"
    f" THEN 'intermittent'"
    f" WHEN 100 * m < 132 * active THEN 'erratic'"
    f" ELSE 'lumpy' END"
)


def _moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(l_partkey, active, s, ssq, m): per-part monthly-demand moments
    with the global month count attached as a 1-row broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    # Pinned (round 11): the part-month census feeds both the per-part
    # moments and the global month count — unpinned, Catalyst re-ran the
    # whole fact scan+aggregate for each consumer.
    pmc = li.groupBy(
        "l_partkey",
        F.year("l_shipdate").alias("yr"),
        F.month("l_shipdate").alias("mo"),
    ).agg(F.expr(f"CAST(sum({_QTY}) AS BIGINT)").alias("q")).localCheckpoint()
    moments = pmc.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("active"),
        F.sum("q").cast("long").alias("s"),
        F.expr("CAST(sum(q * q) AS BIGINT)").alias("ssq"),
    )
    mtot = (
        pmc.select("yr", "mo")
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("m"))
    )
    return moments.crossJoin(F.broadcast(mtot))


@query(
    "q_xyz_cv_classes",
    oracle=f"""
    WITH {_CENSUS_SQL}
    SELECT l_partkey, active, s AS qty_total,
           CAST((1000 * {_VAR_NUM_DUCK}) // (CAST(s AS HUGEINT) * s)
                AS BIGINT) AS cv2_milli,
           {_XYZ_DUCK} AS xyz_class
    FROM moments, mtot ORDER BY l_partkey
    """,
)
def q_xyz_cv_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BK bk1 — XYZ demand-variability classes: per part, active
    months, exact total quantity, CV² in truncated milli (``(1000·
    (M·ssq − s²)) div s²``), and the X/Y/Z class via the cleared
    integer compares in the module doc. Zero-demand months count
    against the part (M in the numerator), so the classification
    needs no month spine join.

    Scale: one fact pass to the (part, month) census, one census-side
    reduction to the part catalog; M rides a 1-row broadcast."""
    return (
        _moments(spark, sf_dir)
        .select(
            "l_partkey",
            "active",
            F.col("s").alias("qty_total"),
            F.expr(
                f"CAST((1000 * {_VAR_NUM_SPARK})"
                f" div (CAST(s AS {_DEC}) * s) AS BIGINT)"
            ).alias("cv2_milli"),
            F.expr(_XYZ_SPARK).alias("xyz_class"),
        )
        .orderBy("l_partkey")
    )


@query(
    "q_demand_intermittency",
    oracle=f"""
    WITH {_CENSUS_SQL}
    SELECT l_partkey,
           CAST((1000 * m) // active AS BIGINT) AS adi_milli,
           CAST((1000 * {_VAR_NUM_DUCK}) // (CAST(s AS HUGEINT) * s)
                AS BIGINT) AS cv2_milli,
           {_SB_DUCK} AS demand_class
    FROM moments, mtot ORDER BY l_partkey
    """,
)
def q_demand_intermittency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BK bk2 — the Syntetos–Boylan demand-pattern quadrants: per
    part, the average inter-demand interval ADI = M/active in truncated
    milli, CV² in milli, and the smooth/intermittent/erratic/lumpy
    class from the published cutoffs (ADI 1.32, CV² 0.49) as cleared
    integer compares — the classification that decides Croston-style
    forecasting eligibility.

    Scale: identical single-pass census shape as bk1."""
    return (
        _moments(spark, sf_dir)
        .select(
            "l_partkey",
            F.expr("CAST((1000 * m) div active AS BIGINT)").alias(
                "adi_milli"
            ),
            F.expr(
                f"CAST((1000 * {_VAR_NUM_SPARK})"
                f" div (CAST(s AS {_DEC}) * s) AS BIGINT)"
            ).alias("cv2_milli"),
            F.expr(_SB_SPARK).alias("demand_class"),
        )
        .orderBy("l_partkey")
    )


@query(
    "q_abc_xyz_matrix",
    oracle=f"""
    WITH {_CENSUS_SQL},
    rev AS (
      SELECT l_partkey,
             CAST(sum(CAST({_PRICE_E2} AS HUGEINT) * (100 - {_DISC_E2}))
                  AS BIGINT) AS micros
      FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
      SELECT l_partkey, micros,
             sum(micros) OVER (ORDER BY micros DESC, l_partkey
                               ROWS UNBOUNDED PRECEDING) AS cum_m,
             sum(micros) OVER () AS total_m
      FROM rev
    ),
    abc AS (
      SELECT l_partkey, micros,
             CASE WHEN cum_m * 2 <= total_m THEN 'A'
                  WHEN cum_m * 5 <= total_m * 4 THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM ranked
    ),
    xyz AS (
      SELECT l_partkey, {_XYZ_DUCK} AS xyz_class
      FROM moments, mtot
    )
    SELECT abc_class, xyz_class, CAST(count(*) AS BIGINT) AS parts,
           CAST(sum(micros) AS BIGINT) AS rev_micros,
           CAST((10000 * sum(CAST(micros AS HUGEINT)))
                // (SELECT sum(CAST(micros AS HUGEINT)) FROM rev)
                AS BIGINT) AS rev_share_bp
    FROM abc JOIN xyz USING (l_partkey)
    GROUP BY abc_class, xyz_class
    ORDER BY abc_class, xyz_class
    """,
)
def q_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BK bk3 — the ABC×XYZ planning matrix: ABC revenue classes
    (cumulative-share thresholds 50%/80% as the integer compares
    ``cum·2 ≤ total`` / ``cum·5 ≤ 4·total``, ranked by the DISTRIBUTED
    two-pass cumulative sum — functions/ranks.py, no single-partition
    exchange over the part catalog) crossed with bk1's XYZ variability
    classes; per cell, part count, exact revenue micros, and revenue
    share bp. The "automate AX, hand-plan CZ" grid.

    Scale: two part-sized relations (ABC from one fact aggregation +
    ranks.py; XYZ from the census reduction) joined on the part key —
    a keyed dim⋈dim join that AQE plans hash- or merge-side as the
    catalog grows; never fact-sized."""
    from recommendersystems_bigdata_spark.functions.ranks import (
        global_running_sum,
    )

    li = load_table(spark, sf_dir, "lineitem")
    m = (
        li.groupBy("l_partkey")
        .agg(
            F.expr(
                f"CAST(sum(CAST({_PRICE_E2} AS {_DEC})"
                f" * (100 - {_DISC_E2})) AS BIGINT)"
            ).alias("micros")
        )
        .localCheckpoint()
    )
    cum = global_running_sum(
        m, [F.col("micros").desc(), F.col("l_partkey").asc()], "micros",
        "cum_m",
    )
    total = m.agg(F.sum("micros").cast("long").alias("total_m"))
    abc = cum.crossJoin(F.broadcast(total)).select(
        "l_partkey",
        "micros",
        F.when(F.col("cum_m") * 2 <= F.col("total_m"), "A")
        .when(F.col("cum_m") * 5 <= F.col("total_m") * 4, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    xyz = _moments(spark, sf_dir).select(
        "l_partkey", F.expr(_XYZ_SPARK).alias("xyz_class")
    )
    rtot = m.agg(
        F.expr(f"CAST(sum(CAST(micros AS {_DEC})) AS {_DEC})").alias(
            "tot_micros"
        )
    )
    return (
        abc.join(xyz, "l_partkey")
        .groupBy("abc_class", "xyz_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("parts"),
            F.sum("micros").cast("long").alias("rev_micros"),
        )
        .crossJoin(F.broadcast(rtot))
        .select(
            "abc_class",
            "xyz_class",
            "parts",
            "rev_micros",
            F.expr(
                f"CAST((CAST(10000 AS {_DEC}) * rev_micros)"
                f" div tot_micros AS BIGINT)"
            ).alias("rev_share_bp"),
        )
        .orderBy("abc_class", "xyz_class")
    )


@query(
    "q_demand_class_summary",
    oracle=f"""
    WITH {_CENSUS_SQL},
    classified AS (
      SELECT l_partkey, s,
             CAST((1000 * m) // active AS BIGINT) AS adi_milli,
             CAST((1000 * {_VAR_NUM_DUCK}) // (CAST(s AS HUGEINT) * s)
                  AS BIGINT) AS cv2_milli,
             {_SB_DUCK} AS demand_class
      FROM moments, mtot
    ),
    tot AS (SELECT CAST(sum(s) AS BIGINT) AS tot_qty FROM classified)
    SELECT demand_class, CAST(count(*) AS BIGINT) AS parts,
           CAST(sum(s) AS BIGINT) AS qty_total,
           CAST((10000 * sum(CAST(s AS HUGEINT))) // tot_qty AS BIGINT)
             AS qty_share_bp,
           CAST(sum(adi_milli) // count(*) AS BIGINT) AS avg_adi_milli,
           CAST(sum(cv2_milli) // count(*) AS BIGINT) AS avg_cv2_milli
    FROM classified, tot
    GROUP BY demand_class, tot_qty ORDER BY demand_class
    """,
)
def q_demand_class_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BK bk4 — the demand-pattern scorecard: per Syntetos–Boylan
    class, part count, exact total quantity, quantity share bp, and
    the integer means of bk2's PUBLISHED adi_milli/cv2_milli columns
    (so the scorecard recomposes from bk2 exactly — the §2.BI bi4
    self-consistency rule).

    Scale: bk2's census shape reduced once more to ≤4 rows; the
    quantity total rides a 1-row broadcast."""
    classified = _moments(spark, sf_dir).select(
        "l_partkey",
        "s",
        F.expr("CAST((1000 * m) div active AS BIGINT)").alias("adi_milli"),
        F.expr(
            f"CAST((1000 * {_VAR_NUM_SPARK})"
            f" div (CAST(s AS {_DEC}) * s) AS BIGINT)"
        ).alias("cv2_milli"),
        F.expr(_SB_SPARK).alias("demand_class"),
    )
    tot = classified.agg(F.sum("s").cast("long").alias("tot_qty"))
    return (
        classified.groupBy("demand_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("parts"),
            F.sum("s").cast("long").alias("qty_total"),
            F.expr("CAST(sum(adi_milli) div count(*) AS BIGINT)").alias(
                "avg_adi_milli"
            ),
            F.expr("CAST(sum(cv2_milli) div count(*) AS BIGINT)").alias(
                "avg_cv2_milli"
            ),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "demand_class",
            "parts",
            "qty_total",
            F.expr(
                "CAST((10000 * qty_total) div tot_qty AS BIGINT)"
            ).alias("qty_share_bp"),
            "avg_adi_milli",
            "avg_cv2_milli",
        )
        .orderBy("demand_class")
    )
