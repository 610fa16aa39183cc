"""Demand-pooling / risk-pooling benefit — variance of the sum vs the
sum of variances (SURVEY.md §2.BZ, round 11).

"Would one pooled warehouse smooth demand better than 25 national
ones" — the classic risk-pooling audit over per-(brand, nation)
monthly demand, beside §2.BK's per-series CV² classification (one
series at a time, no cross-series structure) and §2.BX's rank
dependence (customers, not demand series):

- bz1: the demand-series census — per (brand, nation): months, total
  quantity, exact scaled variance of the monthly series.
- bz2: the pooling benefit per brand — Σ of national variances vs the
  variance of the pooled national total; the signed benefit and its
  bp ratio; the verdict (Var(Σ) < ΣVar ⇔ net-negative covariance).
- bz3: the CV² ladder — pooled squared coefficient of variation vs
  the average national one (the "smoothness gained" readout, no
  sqrt: CV² = var_scaled/S² exactly).
- bz4: the most complementary nation pair per brand — the minimum-
  covariance pair (negative covariance = offsetting demand, the pair
  you'd co-locate inventory for).

THE SERIES MODEL (engine-free): demand x_{b,n,t} = Σ round(l_quantity)
over lines of brand b shipped in calendar month t to customers of
nation n; the month axis is the GLOBAL ship-month calendar T =
|distinct months in the fact| — a (brand, nation) absent from month t
holds a ZERO there. Zero months contribute nothing to S = Σx, Q = Σx²
or Σxy, so every statistic reduces to SPARSE sums plus the global T —
no dense grid is ever materialized (the §2.BX densify device is
provably unnecessary here):

    var_scaled(b,n)   = T·Q − S²            (= T²·Var, exact ≥ 0)
    pooled_scaled(b)  = T·Σ_t y_t² − (Σy)²  over y_t = Σ_n x_{n,t}
    cov_scaled(a,b)   = T·Σ_t x_a·x_b − S_a·S_b   (signed)
    benefit(b)        = Σ_n var_scaled − pooled_scaled
                       (= −2·T²·ΣCov; > 0 ⇔ pooling smooths)

PUBLISHED UNITS: scaled quantities are T-REDUCED to month² units via
truncating division — ``var_m2 = var_scaled div T²`` (the population
variance of the monthly series, floored), likewise benefit_m2 /
cov_m2 (sign-explicit: ``sign(v)·(|v| div T²)``, the §2.BT spelling —
Spark ``div`` ≡ DuckDB ``//`` on the non-negative operand). Verdicts
and the bp ratio are decided on the FULL un-reduced decimals
(``benefit_bp = sign(d)·((10⁴·|d|) div Σvar)``, NULL when Σvar = 0),
so truncation can never flip a published comparison.

Headroom: at sf1000 (~100 TB) a brand's pooled monthly total is
~7·10⁷ units ⇒ pooled_scaled ≈ 3·10¹⁷ — intermediates accumulate in
decimal(38,0)/HUGEINT (adversarial single-month concentration reaches
~10²¹, still 10¹⁷× inside range); every PUBLISHED value is T-reduced
(≤ max monthly total², ~5·10¹⁵) or bp-bounded (≤ |nations|·10⁴), so
BIGINT casts cannot overflow at any SF.

Spark-first shape, sized for 100 TB: ONE fact pass builds the
(brand, nation, month) census — lineitem⋈orders is the standard
fact⋈fact shuffle on the order key, the customer/part attaches are
UNHINTED (AQE broadcasts under the threshold, shuffle-joins at scale
— the anova._census adjudication), the 25-row nation dim broadcasts
explicitly; the census (≤ |brands|·|nations|·|months| ≈ 52k rows at
ANY SF) is checkpointed once and every statistic — including bz4's
within-(brand, month) pair self-join, ≤ 25 nations a side — is
census-side arithmetic that never grows with the fact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_tables
from recommendersystems_bigdata_spark.registry import query

_QTY = "CAST(floor(l_quantity + 0.5) AS BIGINT)"
_DEC = "decimal(38,0)"

# DuckDB: the sparse (brand, nation, month) demand census + global T.
_CEN_DUCK = f"""
base AS (
  SELECT p.p_brand AS brand, nt.n_name AS nation,
         CAST(year(l.l_shipdate) * 12 + month(l.l_shipdate) AS BIGINT)
           AS t,
         CAST(sum({_QTY.replace('l_quantity', 'l.l_quantity')})
              AS BIGINT) AS qty
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation nt ON c.c_nationkey = nt.n_nationkey
  JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2, 3
),
cal AS (SELECT CAST(count(DISTINCT t) AS HUGEINT) AS months FROM base),
series AS (
  SELECT brand, nation,
         CAST(sum(qty) AS HUGEINT) AS s,
         CAST(sum(CAST(qty AS HUGEINT) * qty) AS HUGEINT) AS q
  FROM base GROUP BY 1, 2
),
nat AS (
  SELECT brand, nation, s, q,
         months * q - s * s AS var_scaled
  FROM series CROSS JOIN cal
)
"""


def _base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The checkpointed sparse demand census (brand, nation, t, qty)."""
    li, orders, customer, nation, part = load_tables(
        spark, sf_dir, "lineitem", "orders", "customer", "nation", "part"
    )
    # customer/part attaches UNHINTED (AQE decides — see module doc);
    # the 25-row nation dim broadcasts explicitly.
    cen = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(
            F.broadcast(nation),
            customer.c_nationkey == nation.n_nationkey,
        )
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("n_name").alias("nation"),
            (F.year("l_shipdate") * 12 + F.month("l_shipdate"))
            .cast("long")
            .alias("t"),
        )
        .agg(F.expr(f"CAST(sum({_QTY}) AS BIGINT)").alias("qty"))
    )
    return cen.localCheckpoint()


def _nat(base: DataFrame) -> DataFrame:
    """Per-(brand, nation) sparse sums with the global month count."""
    cal = base.agg(
        F.expr(f"CAST(count(DISTINCT t) AS {_DEC})").alias("months")
    )
    series = base.groupBy("brand", "nation").agg(
        F.expr(f"CAST(sum(qty) AS {_DEC})").alias("s"),
        F.expr(f"CAST(sum(CAST(qty AS {_DEC}) * qty) AS {_DEC})").alias(
            "q"
        ),
    )
    return series.crossJoin(F.broadcast(cal)).withColumn(
        "var_scaled", F.expr("months * q - s * s")
    )


@query(
    "q_pool_demand_census",
    oracle=f"""
    WITH {_CEN_DUCK}
    SELECT brand, nation, CAST(months AS BIGINT) AS months,
           CAST(s AS BIGINT) AS qty_total,
           CAST(var_scaled // (months * months) AS BIGINT) AS var_m2
    FROM nat CROSS JOIN cal ORDER BY brand, nation
    """,
)
def q_pool_demand_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BZ bz1 — the demand-series census: per (brand, nation), the
    global month count, the exact total quantity, and the T-reduced
    population variance of the monthly series (zero months included
    via the sparse-sum identity — see the module doc).

    Scale: one fact pass to the bounded census; everything after is
    arithmetic on ≤ |brands|·|nations| rows."""
    return (
        _nat(_base(spark, sf_dir))
        .select(
            "brand",
            "nation",
            F.expr("CAST(months AS BIGINT)").alias("months"),
            F.expr("CAST(s AS BIGINT)").alias("qty_total"),
            F.expr(
                "CAST(var_scaled div (months * months) AS BIGINT)"
            ).alias("var_m2"),
        )
        .orderBy("brand", "nation")
    )


@query(
    "q_pool_benefit_by_brand",
    oracle=f"""
    WITH {_CEN_DUCK},
    pooled AS (
      SELECT brand, t, CAST(sum(qty) AS HUGEINT) AS y
      FROM base GROUP BY 1, 2
    ),
    pvar AS (
      SELECT brand,
             months * sum(y * y) - sum(y) * sum(y) AS pooled_scaled
      FROM pooled CROSS JOIN cal GROUP BY brand, months
    ),
    svar AS (
      SELECT brand, CAST(count(*) AS BIGINT) AS n_nations,
             sum(var_scaled) AS sum_scaled
      FROM nat GROUP BY 1
    )
    SELECT s.brand, s.n_nations,
           CAST(s.sum_scaled // (c.months * c.months) AS BIGINT)
             AS sum_var_m2,
           CAST(p.pooled_scaled // (c.months * c.months) AS BIGINT)
             AS pooled_var_m2,
           CAST(CASE WHEN s.sum_scaled >= p.pooled_scaled
                THEN (s.sum_scaled - p.pooled_scaled)
                     // (c.months * c.months)
                ELSE -((p.pooled_scaled - s.sum_scaled)
                       // (c.months * c.months)) END AS BIGINT)
             AS benefit_m2,
           CAST(CASE WHEN s.sum_scaled = 0 THEN NULL
                WHEN s.sum_scaled >= p.pooled_scaled
                THEN (10000 * (s.sum_scaled - p.pooled_scaled))
                     // s.sum_scaled
                ELSE -((10000 * (p.pooled_scaled - s.sum_scaled))
                       // s.sum_scaled) END AS BIGINT) AS benefit_bp,
           CASE WHEN p.pooled_scaled < s.sum_scaled THEN 'pooling_helps'
                WHEN p.pooled_scaled = s.sum_scaled THEN 'neutral'
                ELSE 'pooling_hurts' END AS verdict
    FROM svar s JOIN pvar p ON s.brand = p.brand CROSS JOIN cal c
    ORDER BY s.brand
    """,
)
def q_pool_benefit_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BZ bz2 — the pooling benefit: per brand, the sum of national
    demand variances vs the variance of the pooled total (both
    T-reduced), the sign-explicit benefit in month² units and bp, and
    the verdict — decided on the FULL un-reduced decimals so
    truncation never flips it.

    Scale: two census-side reductions of the checkpointed base +
    a 1-row calendar broadcast."""
    base = _base(spark, sf_dir)
    nat = _nat(base)
    cal = base.agg(
        F.expr(f"CAST(count(DISTINCT t) AS {_DEC})").alias("months")
    )
    pooled = base.groupBy("brand", "t").agg(
        F.expr(f"CAST(sum(qty) AS {_DEC})").alias("y")
    )
    pvar = (
        pooled.crossJoin(F.broadcast(cal))
        .groupBy("brand", "months")
        .agg(
            F.expr(
                "max(months) * sum(y * y) - sum(y) * sum(y)"
            ).alias("pooled_scaled")
        )
        .select("brand", "pooled_scaled")
    )
    svar = nat.groupBy("brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_nations"),
        F.sum("var_scaled").alias("sum_scaled"),
    )
    return (
        svar.join(pvar, "brand")
        .crossJoin(F.broadcast(cal))
        .select(
            "brand",
            "n_nations",
            F.expr(
                "CAST(sum_scaled div (months * months) AS BIGINT)"
            ).alias("sum_var_m2"),
            F.expr(
                "CAST(pooled_scaled div (months * months) AS BIGINT)"
            ).alias("pooled_var_m2"),
            F.expr(
                "CAST(CASE WHEN sum_scaled >= pooled_scaled"
                " THEN (sum_scaled - pooled_scaled)"
                " div (months * months)"
                " ELSE -((pooled_scaled - sum_scaled)"
                " div (months * months)) END AS BIGINT)"
            ).alias("benefit_m2"),
            F.expr(
                "CAST(CASE WHEN sum_scaled = 0 THEN NULL"
                " WHEN sum_scaled >= pooled_scaled"
                " THEN (10000 * (sum_scaled - pooled_scaled))"
                " div sum_scaled"
                " ELSE -((10000 * (pooled_scaled - sum_scaled))"
                " div sum_scaled) END AS BIGINT)"
            ).alias("benefit_bp"),
            F.expr(
                "CASE WHEN pooled_scaled < sum_scaled"
                " THEN 'pooling_helps'"
                " WHEN pooled_scaled = sum_scaled THEN 'neutral'"
                " ELSE 'pooling_hurts' END"
            ).alias("verdict"),
        )
        .orderBy("brand")
    )


@query(
    "q_pool_cv2_ladder",
    oracle=f"""
    WITH {_CEN_DUCK},
    pooled AS (
      SELECT brand, t, CAST(sum(qty) AS HUGEINT) AS y
      FROM base GROUP BY 1, 2
    ),
    pcv AS (
      SELECT brand,
             CAST(sum(y) AS HUGEINT) AS s_tot,
             months * sum(y * y) - sum(y) * sum(y) AS pooled_scaled
      FROM pooled CROSS JOIN cal GROUP BY brand, months
    ),
    ncv AS (
      SELECT brand, CAST(count(*) AS BIGINT) AS n_nations,
             CAST(sum((1000 * var_scaled) // (s * s)) AS HUGEINT)
               AS cv2_sum
      FROM nat GROUP BY 1
    )
    SELECT p.brand, n.n_nations,
           CAST((1000 * p.pooled_scaled) // (p.s_tot * p.s_tot)
                AS BIGINT) AS cv2_pooled_milli,
           CAST(n.cv2_sum // n.n_nations AS BIGINT)
             AS cv2_nation_avg_milli,
           CAST(n.cv2_sum // n.n_nations
                - (1000 * p.pooled_scaled) // (p.s_tot * p.s_tot)
                AS BIGINT) AS reduction_milli
    FROM pcv p JOIN ncv n ON p.brand = n.brand
    ORDER BY p.brand
    """,
)
def q_pool_cv2_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BZ bz3 — the CV² ladder: per brand, the pooled series'
    squared coefficient of variation vs the average national one
    (``cv2_milli = (1000·var_scaled) div S²`` — T cancels, no sqrt,
    no float; every observed series has S ≥ 1) and the signed
    reduction — how much smoothness pooling buys.

    Scale: census-side; the per-nation CV² average is a ≤25-term
    census sum."""
    base = _base(spark, sf_dir)
    nat = _nat(base)
    cal = base.agg(
        F.expr(f"CAST(count(DISTINCT t) AS {_DEC})").alias("months")
    )
    pooled = base.groupBy("brand", "t").agg(
        F.expr(f"CAST(sum(qty) AS {_DEC})").alias("y")
    )
    pcv = (
        pooled.crossJoin(F.broadcast(cal))
        .groupBy("brand", "months")
        .agg(
            F.expr(f"CAST(sum(y) AS {_DEC})").alias("s_tot"),
            F.expr(
                "max(months) * sum(y * y) - sum(y) * sum(y)"
            ).alias("pooled_scaled"),
        )
    )
    ncv = nat.groupBy("brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_nations"),
        F.expr(
            f"CAST(sum((CAST(1000 AS {_DEC}) * var_scaled)"
            f" div (s * s)) AS {_DEC})"
        ).alias("cv2_sum"),
    )
    return (
        pcv.join(ncv, "brand")
        .select(
            "brand",
            "n_nations",
            F.expr(
                f"CAST((CAST(1000 AS {_DEC}) * pooled_scaled)"
                f" div (s_tot * s_tot) AS BIGINT)"
            ).alias("cv2_pooled_milli"),
            F.expr("CAST(cv2_sum div n_nations AS BIGINT)").alias(
                "cv2_nation_avg_milli"
            ),
            F.expr(
                f"CAST(cv2_sum div n_nations"
                f" - (CAST(1000 AS {_DEC}) * pooled_scaled)"
                f" div (s_tot * s_tot) AS BIGINT)"
            ).alias("reduction_milli"),
        )
        .orderBy("brand")
    )


@query(
    "q_pool_complementary_pairs",
    oracle=f"""
    WITH {_CEN_DUCK},
    xprod AS (
      SELECT a.brand, a.nation AS nation_a, b.nation AS nation_b,
             CAST(count(*) AS BIGINT) AS months_both,
             CAST(sum(CAST(a.qty AS HUGEINT) * b.qty) AS HUGEINT)
               AS sxy
      FROM base a JOIN base b
        ON a.brand = b.brand AND a.t = b.t AND a.nation < b.nation
      GROUP BY 1, 2, 3
    ),
    -- every nation pair, even with ZERO overlapping months (its
    -- covariance −S_a·S_b can be the true minimum — the sparse
    -- cross-sum is 0, not absent)
    cov AS (
      SELECT sa.brand, sa.nation AS nation_a, sb.nation AS nation_b,
             COALESCE(x.months_both, 0) AS months_both,
             c.months * COALESCE(x.sxy, 0) - sa.s * sb.s AS cov_scaled
      FROM series sa
      JOIN series sb
        ON sa.brand = sb.brand AND sa.nation < sb.nation
      LEFT JOIN xprod x
        ON x.brand = sa.brand AND x.nation_a = sa.nation
       AND x.nation_b = sb.nation
      CROSS JOIN cal c
    ),
    best AS (
      SELECT *, row_number() OVER (
               PARTITION BY brand
               ORDER BY cov_scaled, nation_a, nation_b) AS rn
      FROM cov
    )
    SELECT b.brand, b.nation_a, b.nation_b, b.months_both,
           CAST(CASE WHEN b.cov_scaled >= 0
                THEN b.cov_scaled // (c.months * c.months)
                ELSE -((-b.cov_scaled) // (c.months * c.months))
                END AS BIGINT) AS cov_m2,
           CASE WHEN b.cov_scaled < 0 THEN 'complementary'
                ELSE 'aligned' END AS verdict
    FROM best b CROSS JOIN cal c WHERE b.rn = 1 ORDER BY b.brand
    """,
)
def q_pool_complementary_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """§2.BZ bz4 — the most complementary nation pair per brand: the
    minimum-covariance pair over the monthly series (sparse cross-sum
    + the global calendar — a zero month contributes nothing to Σxy,
    and a pair with NO overlapping months still competes with
    cov = −S_a·S_b via the series-census pair enumeration + left
    join), the T-reduced sign-explicit covariance, months both
    active, and the complementary/aligned verdict. Ties break
    (cov, nation_a, nation_b).

    Scale: the cross-sum join keys on (brand, month) — ≤ |nations|
    rows a side per key; the pair enumeration is a ≤25×25 self-join
    of the series census — census-side forever; the per-brand top-1
    is a partitioned window over ≤ 300 pairs."""
    base = _base(spark, sf_dir)
    cal = base.agg(
        F.expr(f"CAST(count(DISTINCT t) AS {_DEC})").alias("months")
    )
    series = base.groupBy("brand", "nation").agg(
        F.expr(f"CAST(sum(qty) AS {_DEC})").alias("s")
    )
    a = base.select(
        "brand", "t", F.col("nation").alias("nation_a"),
        F.col("qty").alias("qty_a"),
    )
    b = base.select(
        "brand", "t", F.col("nation").alias("nation_b"),
        F.col("qty").alias("qty_b"),
    )
    xprod = (
        a.join(b, ["brand", "t"])
        .filter(F.col("nation_a") < F.col("nation_b"))
        .groupBy("brand", "nation_a", "nation_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("months_both"),
            F.expr(
                f"CAST(sum(CAST(qty_a AS {_DEC}) * qty_b) AS {_DEC})"
            ).alias("sxy"),
        )
    )
    sa = series.select(
        "brand", F.col("nation").alias("nation_a"), F.col("s").alias("s_a")
    )
    sb = series.select(
        "brand", F.col("nation").alias("nation_b"), F.col("s").alias("s_b")
    )
    # every nation pair, even with ZERO overlapping months — a
    # disjoint pair's covariance −S_a·S_b can be the true minimum
    pairs = sa.join(sb, "brand").filter(
        F.col("nation_a") < F.col("nation_b")
    )
    cov = (
        pairs.join(xprod, ["brand", "nation_a", "nation_b"], "left")
        .crossJoin(F.broadcast(cal))
        .withColumn("months_both", F.expr("COALESCE(months_both, 0)"))
        .withColumn(
            "cov_scaled",
            F.expr(f"months * COALESCE(sxy, CAST(0 AS {_DEC})) - s_a * s_b"),
        )
    )
    w = Window.partitionBy("brand").orderBy(
        "cov_scaled", "nation_a", "nation_b"
    )
    return (
        cov.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select(
            "brand",
            "nation_a",
            "nation_b",
            "months_both",
            F.expr(
                "CAST(CASE WHEN cov_scaled >= 0"
                " THEN cov_scaled div (months * months)"
                " ELSE -((-cov_scaled) div (months * months))"
                " END AS BIGINT)"
            ).alias("cov_m2"),
            F.expr(
                "CASE WHEN cov_scaled < 0 THEN 'complementary'"
                " ELSE 'aligned' END"
            ).alias("verdict"),
        )
        .orderBy("brand")
    )
