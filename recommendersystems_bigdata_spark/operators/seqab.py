"""Sequential A/B monitoring — peeking-safe interim analysis with
Haybittle–Peto boundaries (SURVEY.md §2.CD, round 11).

"Can we stop the experiment early, and was the split even fair" —
the group-sequential testing family over a deterministic hash-split
experiment, beside §2.D's `q_ab_test_proportions` (ONE look at the
end — the design that inflates α the moment anyone peeks monthly)
and §2.BY's calibration audits:

- cd1: the variant census — per arm, exposures, conversions and the
  rate in bp.
- cd2: the 12-look table — cumulative counts per calendar month,
  the signed cross-product deviation D, the reduced z² in milli, the
  boundary in force, and the cleared crossing verdict.
- cd3: the stop summary — first crossing look (if any), direction,
  plus the sample-ratio-mismatch health check.
- cd4: the final effect — absolute and relative lift, sign-explicit.

THE EXPERIMENT MODEL (engine-free, deterministic): arm =
``o_custkey % 2`` (0 = control A, 1 = treatment B); conversion =
order value ≥ $150 000 (exact cents compare); the monitoring plan is
K = 12 CUMULATIVE monthly looks from the first order month. The
interim boundary is Haybittle–Peto (Haybittle 1971, Peto 1976 —
public literature): reject at looks 1..11 only if |z| > 3, at the
final look if |z| > 1.96 — the rule chosen precisely because its
constants are exact rationals (3 and 1.96), so every crossing
decision clears to integer arithmetic with NO numerical integration
tables.

EXACTNESS SPELLINGS: with cumulative nA,kA,nB,kB; N = nA+nB,
K_t = kA+kB, R = nA·nB·K_t·(N−K_t) and D = kA·nB − kB·nA (signed):

    z² (textbook)   = D²·N / R
    interim cross   : D² > (9·R) div N          (⇔ D²·N > 9·R exactly:
                      for non-negative integers a·c > b ⇔ a > b div c)
    final cross     : 10⁴·D² > (38416·R) div N  (1.96² = 38416/10⁴)
    z2_milli        = (1000·(|D| div nA)·(|D| div nB)·N)
                        div (K_t·(N−K_t))       (the REDUCED display
                      value — D²/(nA·nB) via two truncating quotients,
                      each loses < 1; the full 1000·D²·N ≈ 10⁴¹ at
                      sf1000 would overflow decimal(38,0))
    SRM             : 10⁴·(nA−nB)² > 38416·N    (z² = (nA−nB)²/N under
                      the fair-split null — the classic health check)
    degenerate look : an arm with no exposures, or K_t ∈ {0, N}
                      (zero variance) publishes NULL z2_milli and
                      'continue' — never a division by zero.

CRUCIALLY the crossing VERDICTS use the exact division-free compare
(the `a·c > b ⇔ a > b div c` device keeps every operand ≤ ~10³³ in
decimal(38,0)/HUGEINT at sf1000); the truncated z2_milli is display
only and can never flip a decision.

Spark-first shape, sized for 100 TB: ONE orders pass
partial-aggregates to the (month-index, arm) census (24 rows for the
12-look window — map-side combine, the % 2 split is skew-free by
construction); the cumulative looks are a census-side running sum
over ≤ 12 rows and every boundary compare is census-side 128-bit
arithmetic. The experiment-start month is a 1-row broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query

_CENTS = "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
_CONV = f"CASE WHEN {_CENTS} >= 15000000 THEN 1 ELSE 0 END"
_DEC = "decimal(38,0)"

# DuckDB: the (look, cumulative nA/kA/nB/kB) relation for looks 1..12
_LOOKS_DUCK = f"""
m0 AS (
  SELECT CAST(min(year(o_orderdate) * 12 + month(o_orderdate))
              AS BIGINT) AS t0
  FROM orders
),
mcen AS (
  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
           - (SELECT t0 FROM m0) AS mi,
         o_custkey % 2 AS arm,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum({_CONV}) AS BIGINT) AS k
  FROM orders GROUP BY 1, 2
),
looks AS (
  SELECT lk.look,
         CAST(sum(CASE WHEN c.arm = 0 THEN c.n ELSE 0 END) AS BIGINT)
           AS n_a,
         CAST(sum(CASE WHEN c.arm = 0 THEN c.k ELSE 0 END) AS BIGINT)
           AS k_a,
         CAST(sum(CASE WHEN c.arm = 1 THEN c.n ELSE 0 END) AS BIGINT)
           AS n_b,
         CAST(sum(CASE WHEN c.arm = 1 THEN c.k ELSE 0 END) AS BIGINT)
           AS k_b
  FROM (SELECT CAST(unnest(range(1, 13)) AS BIGINT) AS look) lk
  JOIN mcen c ON c.mi < lk.look AND c.mi >= 0
  GROUP BY 1
)
"""

# cleared verdict + reduced z² columns over a `looks`-shaped relation
_VERDICT_DUCK = """
SELECT look, n_a, k_a, n_b, k_b,
       CAST(k_a * n_b - k_b * n_a AS BIGINT) AS d,
       CASE WHEN look < 12 THEN 'peto_interim_z3'
            ELSE 'final_z196' END AS boundary,
       CAST(CASE WHEN n_a = 0 OR n_b = 0 OR k_a + k_b = 0
                 OR k_a + k_b = n_a + n_b THEN NULL
            ELSE (1000 * (abs(CAST(k_a AS HUGEINT) * n_b
                              - CAST(k_b AS HUGEINT) * n_a) // n_a)
                       * (abs(CAST(k_a AS HUGEINT) * n_b
                              - CAST(k_b AS HUGEINT) * n_a) // n_b)
                       * (n_a + n_b))
                 // (CAST(k_a + k_b AS HUGEINT)
                     * (n_a + n_b - k_a - k_b)) END AS BIGINT)
         AS z2_milli,
       CASE WHEN n_a = 0 OR n_b = 0 OR k_a + k_b = 0
                 OR k_a + k_b = n_a + n_b THEN 'continue'
            WHEN look < 12 AND
                 (CAST(k_a AS HUGEINT) * n_b
                  - CAST(k_b AS HUGEINT) * n_a)
                 * (CAST(k_a AS HUGEINT) * n_b
                    - CAST(k_b AS HUGEINT) * n_a)
                 > (9 * CAST(n_a AS HUGEINT) * n_b * (k_a + k_b)
                    * (n_a + n_b - k_a - k_b)) // (n_a + n_b)
            THEN 'cross'
            WHEN look = 12 AND
                 10000 * (CAST(k_a AS HUGEINT) * n_b
                          - CAST(k_b AS HUGEINT) * n_a)
                 * (CAST(k_a AS HUGEINT) * n_b
                    - CAST(k_b AS HUGEINT) * n_a)
                 > (38416 * CAST(n_a AS HUGEINT) * n_b * (k_a + k_b)
                    * (n_a + n_b - k_a - k_b)) // (n_a + n_b)
            THEN 'cross'
            ELSE 'continue' END AS verdict
FROM looks
"""


def _looks(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    mcen = orders.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("long")
        .alias("t"),
        F.expr("o_custkey % 2").alias("arm"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(f"CAST(sum({_CONV}) AS BIGINT)").alias("k"),
    )
    t0 = mcen.agg(F.expr("CAST(min(t) AS BIGINT)").alias("t0"))
    cen = mcen.crossJoin(F.broadcast(t0)).select(
        F.expr("t - t0").alias("mi"), "arm", "n", "k"
    )
    looks = spark.range(1, 13).select(F.col("id").alias("look"))
    return (
        looks.join(
            cen, (cen.mi < F.col("look")) & (cen.mi >= 0), "inner"
        )
        .groupBy("look")
        .agg(
            F.expr(
                "CAST(sum(CASE WHEN arm = 0 THEN n ELSE 0 END)"
                " AS BIGINT)"
            ).alias("n_a"),
            F.expr(
                "CAST(sum(CASE WHEN arm = 0 THEN k ELSE 0 END)"
                " AS BIGINT)"
            ).alias("k_a"),
            F.expr(
                "CAST(sum(CASE WHEN arm = 1 THEN n ELSE 0 END)"
                " AS BIGINT)"
            ).alias("n_b"),
            F.expr(
                "CAST(sum(CASE WHEN arm = 1 THEN k ELSE 0 END)"
                " AS BIGINT)"
            ).alias("k_b"),
        )
    )


def _verdicts(looks: DataFrame) -> DataFrame:
    deg = "n_a = 0 OR n_b = 0 OR k_a + k_b = 0 OR k_a + k_b = n_a + n_b"
    bigd = f"(CAST(k_a AS {_DEC}) * n_b - CAST(k_b AS {_DEC}) * n_a)"
    r_over_n = (
        f"(CAST(n_a AS {_DEC}) * n_b * (k_a + k_b)"
        f" * (n_a + n_b - k_a - k_b))"
    )
    return looks.select(
        "look",
        "n_a",
        "k_a",
        "n_b",
        "k_b",
        F.expr("CAST(k_a * n_b - k_b * n_a AS BIGINT)").alias("d"),
        F.expr(
            "CASE WHEN look < 12 THEN 'peto_interim_z3'"
            " ELSE 'final_z196' END"
        ).alias("boundary"),
        F.expr(
            f"CAST(CASE WHEN {deg} THEN NULL"
            f" ELSE (1000 * (abs({bigd}) div n_a)"
            f" * (abs({bigd}) div n_b) * (n_a + n_b))"
            f" div (CAST(k_a + k_b AS {_DEC})"
            f" * (n_a + n_b - k_a - k_b)) END AS BIGINT)"
        ).alias("z2_milli"),
        F.expr(
            f"CASE WHEN {deg} THEN 'continue'"
            f" WHEN look < 12 AND {bigd} * {bigd}"
            f" > (9 * {r_over_n}) div (n_a + n_b) THEN 'cross'"
            f" WHEN look = 12 AND 10000 * {bigd} * {bigd}"
            f" > (38416 * {r_over_n}) div (n_a + n_b) THEN 'cross'"
            f" ELSE 'continue' END"
        ).alias("verdict"),
    )


@query(
    "q_seqab_variant_census",
    oracle=f"""
    SELECT o_custkey % 2 AS arm, CAST(count(*) AS BIGINT) AS n,
           CAST(sum({_CONV}) AS BIGINT) AS conversions,
           CAST((10000 * sum({_CONV})) // count(*) AS BIGINT)
             AS rate_bp
    FROM orders GROUP BY 1 ORDER BY arm
    """,
)
def q_seqab_variant_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.CD cd1 — the variant census: per hash-split arm, exposures,
    conversions (order ≥ $150k, exact cents compare) and the rate in
    truncated bp — the experiment's topline, full period.

    Scale: one partial-aggregated orders pass to 2 rows."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.expr("o_custkey % 2").alias("arm"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.expr(f"CAST(sum({_CONV}) AS BIGINT)").alias(
                "conversions"
            ),
            F.expr(
                f"CAST((10000 * sum({_CONV})) div count(*) AS BIGINT)"
            ).alias("rate_bp"),
        )
        .orderBy("arm")
    )


@query(
    "q_seqab_look_table",
    oracle=f"""
    WITH {_LOOKS_DUCK}
    {_VERDICT_DUCK}
    ORDER BY look
    """,
)
def q_seqab_look_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.CD cd2 — the 12-look monitoring table: cumulative per-arm
    counts by calendar month, the signed deviation D, the reduced
    display z² in milli, the boundary in force and the cleared
    crossing verdict (decided division-free — see the module doc's
    ``a·c > b ⇔ a > b div c`` device).

    Scale: one orders pass to the 24-row (month, arm) census; looks
    are census-side cumulative sums."""
    return _verdicts(_looks(spark, sf_dir)).orderBy("look")


@query(
    "q_seqab_stop_summary",
    oracle=f"""
    WITH {_LOOKS_DUCK},
    tab AS ({_VERDICT_DUCK}),
    crossed AS (
      SELECT look, d FROM tab WHERE verdict = 'cross'
      ORDER BY look LIMIT 1
    ),
    fin AS (SELECT n_a, n_b FROM looks WHERE look = 12)
    SELECT CAST(12 AS BIGINT) AS planned_looks,
           (SELECT CAST(look AS BIGINT) FROM crossed) AS stop_look,
           (SELECT CASE WHEN d > 0 THEN 'control_higher'
                        ELSE 'treatment_higher' END FROM crossed)
             AS direction,
           CASE WHEN EXISTS (SELECT 1 FROM crossed)
                THEN 'stopped_early_or_final_reject'
                ELSE 'no_rejection' END AS outcome,
           CASE WHEN 10000 * (f.n_a - f.n_b) * (f.n_a - f.n_b)
                     > 38416 * (f.n_a + f.n_b)
                THEN 'mismatch' ELSE 'ok' END AS srm_check
    FROM fin f
    """,
)
def q_seqab_stop_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.CD cd3 — the stop summary: the first look whose boundary is
    crossed (NULL if the experiment runs out its plan without a
    rejection), the direction at that stop, and the sample-ratio-
    mismatch health check (cleared binomial z² on the 12-look
    exposures vs 1.96² — a broken splitter invalidates everything
    else, so it ships with the verdict).

    Scale: top-1 over the 12-row table + the final-look row."""
    tab = _verdicts(_looks(spark, sf_dir))
    crossed = (
        tab.filter("verdict = 'cross'")
        .orderBy("look")
        .limit(1)
        .select(
            F.col("look").alias("stop_look"),
            F.expr(
                "CASE WHEN d > 0 THEN 'control_higher'"
                " ELSE 'treatment_higher' END"
            ).alias("direction"),
            F.lit(1).alias("hit"),
        )
    )
    fin = tab.filter("look = 12").select("n_a", "n_b")
    return (
        fin.join(crossed, F.lit(True), "left")
        .select(
            F.lit(12).cast("long").alias("planned_looks"),
            F.col("stop_look").cast("long"),
            "direction",
            F.expr(
                "CASE WHEN hit IS NOT NULL"
                " THEN 'stopped_early_or_final_reject'"
                " ELSE 'no_rejection' END"
            ).alias("outcome"),
            F.expr(
                "CASE WHEN 10000 * (n_a - n_b) * (n_a - n_b)"
                " > 38416 * (n_a + n_b)"
                " THEN 'mismatch' ELSE 'ok' END"
            ).alias("srm_check"),
        )
    )


@query(
    "q_seqab_final_effect",
    oracle=f"""
    WITH arms AS (
      SELECT o_custkey % 2 AS arm, CAST(count(*) AS BIGINT) AS n,
             CAST(sum({_CONV}) AS BIGINT) AS k
      FROM orders GROUP BY 1
    ),
    wide AS (
      SELECT max(CASE WHEN arm = 0 THEN n END) AS n_a,
             max(CASE WHEN arm = 0 THEN k END) AS k_a,
             max(CASE WHEN arm = 1 THEN n END) AS n_b,
             max(CASE WHEN arm = 1 THEN k END) AS k_b
      FROM arms
    )
    SELECT CAST((10000 * k_a) // n_a AS BIGINT) AS rate_a_bp,
           CAST((10000 * k_b) // n_b AS BIGINT) AS rate_b_bp,
           CAST((10000 * k_b) // n_b - (10000 * k_a) // n_a
                AS BIGINT) AS diff_bp,
           CAST(CASE WHEN k_a * n_b = 0 THEN NULL
                WHEN CAST(k_b AS HUGEINT) * n_a >= CAST(k_a AS HUGEINT) * n_b
                THEN (10000 * (CAST(k_b AS HUGEINT) * n_a
                               - CAST(k_a AS HUGEINT) * n_b))
                     // (CAST(k_a AS HUGEINT) * n_b)
                ELSE -((10000 * (CAST(k_a AS HUGEINT) * n_b
                                 - CAST(k_b AS HUGEINT) * n_a))
                       // (CAST(k_a AS HUGEINT) * n_b)) END AS BIGINT)
             AS rel_lift_bp
    FROM wide
    """,
)
def q_seqab_final_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.CD cd4 — the final effect, full period: per-arm rates in
    bp, the absolute difference (plain subtraction of two published
    truncations — recomposes exactly), and the relative lift of
    treatment over control in sign-explicit truncated bp (NULL when
    the control converts nobody).

    Scale: the 2-row arm census pivoted wide, all census-side."""
    orders = load_table(spark, sf_dir, "orders")
    arms = orders.groupBy(F.expr("o_custkey % 2").alias("arm")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(f"CAST(sum({_CONV}) AS BIGINT)").alias("k"),
    )
    wide = arms.agg(
        F.expr("max(CASE WHEN arm = 0 THEN n END)").alias("n_a"),
        F.expr("max(CASE WHEN arm = 0 THEN k END)").alias("k_a"),
        F.expr("max(CASE WHEN arm = 1 THEN n END)").alias("n_b"),
        F.expr("max(CASE WHEN arm = 1 THEN k END)").alias("k_b"),
    )
    big = f"CAST(k_b AS {_DEC}) * n_a"
    big2 = f"CAST(k_a AS {_DEC}) * n_b"
    return wide.select(
        F.expr("CAST((10000 * k_a) div n_a AS BIGINT)").alias(
            "rate_a_bp"
        ),
        F.expr("CAST((10000 * k_b) div n_b AS BIGINT)").alias(
            "rate_b_bp"
        ),
        F.expr(
            "CAST((10000 * k_b) div n_b - (10000 * k_a) div n_a"
            " AS BIGINT)"
        ).alias("diff_bp"),
        F.expr(
            f"CAST(CASE WHEN k_a * n_b = 0 THEN NULL"
            f" WHEN {big} >= {big2}"
            f" THEN (10000 * ({big} - {big2})) div ({big2})"
            f" ELSE -((10000 * ({big2} - {big})) div ({big2}))"
            f" END AS BIGINT)"
        ).alias("rel_lift_bp"),
    )
