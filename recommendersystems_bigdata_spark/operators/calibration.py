"""Probability-calibration audits — reliability tables & the exact
Brier–Murphy decomposition (SURVEY.md §2.BY, round 11).

"Is the model's 33% actually a 33%" — the forecaster-verification
family over a deterministic train/score split, beside §2.AM's point-
forecast backtests (MAPE-style accuracy, no probabilities) and §2.E's
decile lift (ranking power, not calibration):

- by1: the reliability table — per predicted-probability bin, the
  model's predicted rate vs the realized rate on held-out data, with
  the signed gap.
- by2: the Murphy decomposition of the Brier score — reliability,
  resolution, uncertainty and the raw Brier sum, all in exact cleared
  integers, plus the published identity gap.
- by3: the Brier skill score against climatology — is the binned
  model worth anything over the base rate.
- by4: calibration drift — predicted-vs-observed gap per scoring
  year, the "is the model going stale" readout.

THE MODEL UNDER AUDIT (deterministic, engine-free): outcome
``y = (l_returnflag = 'R')``; feature bins are quantity quintiles
``qbin = (round(l_quantity) − 1) div 10`` (0..4); TRAIN =
``year(l_shipdate) ≤ 1997``, SCORE = ``year ≥ 1998`` (out-of-time
holdout). The model predicts each bin's train-period return rate in
truncated bp: ``p_bp(b) = (10⁴·k_train) div n_train``; climatology is
the pooled train rate ``p0_bp``. Bins absent from TRAIN never score
(inner join — the corpus realizes all 5 bins at every SF).

EXACTNESS SPELLINGS (everything integer, both engines identical; rates
in truncated bp, Brier-family sums in "e8" units = 10⁸ × the
sum-over-rows form, i.e. 10⁸·N × the textbook averages):

    o_bp(b)   = (10⁴·k_score) div n_score        (realized bin rate)
    ō_bp      = (10⁴·K_score) div N_score        (base rate)
    brier_e8  = Σ_b [k_b·(p_bp−10⁴)² + (n_b−k_b)·p_bp²]   (EXACT —
                the row-level Σ(p−y)² reduced census-side)
    rel_e8    = Σ_b n_b·(p_bp − o_bp)²           (reliability)
    res_e8    = Σ_b n_b·(o_bp − ō_bp)²           (resolution)
    unc_e8    = N·ō_bp·(10⁴ − ō_bp)              (uncertainty)
    gap_e8    = brier_e8 − (rel_e8 − res_e8 + unc_e8)

Murphy's identity brier = rel − res + unc holds EXACTLY over rational
rates; the published spelling truncates o_bp/ō_bp to bp, so gap_e8 is
nonzero but bounded: each bin rate loses < 1 bp, perturbing rel and
res by < (2·10⁴+1)·N each and unc by ≤ 10⁴·N, so
|gap_e8| ≤ (5·10⁴+2)·N — pinned by the suite's Hypothesis fuzz;
brier_e8 itself is exact (the model's p_bp IS its published value). The skill score is
the SIGN-EXPLICIT truncated division of §2.BT:
``bss_bp = sign(d)·((10⁴·|d|) div brier_ref_e8)``, d = ref − model
(|d| keeps Spark ``div`` ≡ DuckDB ``//``), NULL when the reference
Brier is 0 (a degenerate all-one-class score period).

Headroom: every e8 quantity is ≤ 10⁸·N — ~6·10¹⁷ at sf1000 (N ≈ 6e9
lines ≈ 100 TB), inside BIGINT with ~15× to spare; sums accumulate in
decimal(38,0)/HUGEINT and publish as BIGINT.

Spark-first shape, sized for 100 TB: ONE lineitem pass
partial-aggregates to the (year, qbin) census (≤ |years|·5 rows —
map-side combine, no skew: bins are uniform by construction);
train/score splits, the bin join (5×5) and every decomposition are
census-side arithmetic on ≤ 35 rows. No row-level scoring join ever
happens — the Brier sum is re-expressed from the joint
(bin, outcome) counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query

_DEC = "decimal(38,0)"

# (year, quantity-quintile) outcome census — the one fact pass.
_CEN_DUCK = """
cen AS (
  SELECT CAST(year(l_shipdate) AS BIGINT) AS yr,
         (CAST(floor(l_quantity + 0.5) AS BIGINT) - 1) // 10 AS qbin,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS k
  FROM lineitem GROUP BY 1, 2
),
tr AS (
  SELECT qbin, CAST(sum(n) AS BIGINT) AS n_train,
         CAST(sum(k) AS BIGINT) AS k_train,
         CAST((10000 * sum(k)) // sum(n) AS BIGINT) AS p_bp
  FROM cen WHERE yr <= 1997 GROUP BY 1
),
sc AS (
  SELECT qbin, CAST(sum(n) AS BIGINT) AS n_score,
         CAST(sum(k) AS BIGINT) AS k_score
  FROM cen WHERE yr >= 1998 GROUP BY 1
),
joined AS (
  SELECT t.qbin, t.n_train, t.k_train, t.p_bp, s.n_score, s.k_score,
         (10000 * s.k_score) // s.n_score AS o_bp
  FROM tr t JOIN sc s ON t.qbin = s.qbin
),
tot AS (
  SELECT CAST(sum(n_score) AS HUGEINT) AS big_n,
         CAST(sum(k_score) AS HUGEINT) AS big_k,
         (10000 * CAST(sum(k_score) AS HUGEINT)) // sum(n_score) AS obar_bp
  FROM joined
)
"""


def _census(spark: SparkSession, sf_dir: str) -> DataFrame:
    # localCheckpoint pins the ≤|years|·5-row census so the fact scans
    # ONCE — the train/score splits and every rejoin below otherwise
    # each re-run the lineitem aggregation (same device as
    # dependence._margins' per-customer relation).
    li = load_table(spark, sf_dir, "lineitem")
    return _census_agg(li).localCheckpoint()


def _census_agg(li: DataFrame) -> DataFrame:
    return li.groupBy(
        F.year("l_shipdate").cast("long").alias("yr"),
        F.expr(
            "(CAST(floor(l_quantity + 0.5) AS BIGINT) - 1) div 10"
        ).alias("qbin"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(
            "CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)"
            " AS BIGINT)"
        ).alias("k"),
    )


def _joined(
    spark: SparkSession, sf_dir: str, cen: DataFrame | None = None
) -> DataFrame:
    """The 5-row train↔score bin join with published bp rates."""
    if cen is None:
        cen = _census(spark, sf_dir)
    tr = cen.filter("yr <= 1997").groupBy("qbin").agg(
        F.expr("CAST(sum(n) AS BIGINT)").alias("n_train"),
        F.expr("CAST(sum(k) AS BIGINT)").alias("k_train"),
        F.expr("CAST((10000 * sum(k)) div sum(n) AS BIGINT)").alias("p_bp"),
    )
    sc = cen.filter("yr >= 1998").groupBy("qbin").agg(
        F.expr("CAST(sum(n) AS BIGINT)").alias("n_score"),
        F.expr("CAST(sum(k) AS BIGINT)").alias("k_score"),
    )
    return tr.join(sc, "qbin").select(
        "qbin",
        "n_train",
        "k_train",
        "p_bp",
        "n_score",
        "k_score",
        F.expr("(10000 * k_score) div n_score").alias("o_bp"),
    )


@query(
    "q_calib_reliability",
    oracle=f"""
    WITH {_CEN_DUCK}
    SELECT qbin, n_train, p_bp AS predicted_bp, n_score,
           CAST(o_bp AS BIGINT) AS observed_bp,
           CAST(p_bp - o_bp AS BIGINT) AS gap_bp
    FROM joined ORDER BY qbin
    """,
)
def q_calib_reliability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BY by1 — the reliability table: per quantity-quintile bin,
    the train-period predicted return rate vs the score-period
    realized rate (both truncated bp) and the signed gap — the diagram
    a forecast audit reads before trusting any probability.

    Scale: one fact pass to the (year, bin) census; the 5×5 bin join
    and every rate are census-side."""
    return (
        _joined(spark, sf_dir)
        .select(
            "qbin",
            "n_train",
            F.col("p_bp").alias("predicted_bp"),
            "n_score",
            F.col("o_bp").cast("long").alias("observed_bp"),
            F.expr("CAST(p_bp - o_bp AS BIGINT)").alias("gap_bp"),
        )
        .orderBy("qbin")
    )


@query(
    "q_calib_brier_decomp",
    oracle=f"""
    WITH {_CEN_DUCK}
    SELECT CAST(t.big_n AS BIGINT) AS n_score,
           CAST(t.obar_bp AS BIGINT) AS base_bp,
           CAST(b.brier_e8 AS BIGINT) AS brier_e8,
           CAST(b.rel_e8 AS BIGINT) AS rel_e8,
           CAST(b.res_e8 AS BIGINT) AS res_e8,
           CAST(t.big_n * t.obar_bp * (10000 - t.obar_bp) AS BIGINT)
             AS unc_e8,
           CAST(b.brier_e8 - (b.rel_e8 - b.res_e8
                + t.big_n * t.obar_bp * (10000 - t.obar_bp)) AS BIGINT)
             AS identity_gap_e8
    FROM tot t CROSS JOIN (
      SELECT
        sum(CAST(k_score AS HUGEINT) * (p_bp - 10000) * (p_bp - 10000)
            + CAST(n_score - k_score AS HUGEINT) * p_bp * p_bp)
          AS brier_e8,
        sum(CAST(n_score AS HUGEINT) * (p_bp - o_bp) * (p_bp - o_bp))
          AS rel_e8,
        sum(CAST(n_score AS HUGEINT)
            * (o_bp - (SELECT obar_bp FROM tot))
            * (o_bp - (SELECT obar_bp FROM tot))) AS res_e8
      FROM joined
    ) b
    """,
)
def q_calib_brier_decomp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BY by2 — the Murphy decomposition of the Brier score in e8
    units (10⁸ × the sum-over-rows form): the EXACT Brier sum
    (re-expressed from joint bin×outcome counts — no row-level
    scoring), reliability, resolution, uncertainty, and the published
    identity gap (nonzero only through the documented bp truncations;
    Hypothesis pins its bound).

    Scale: everything census-side over 5 bins + a 1-row total."""
    j = _joined(spark, sf_dir)
    tot = j.agg(
        F.expr(f"CAST(sum(n_score) AS {_DEC})").alias("big_n"),
        F.expr(
            f"(CAST(10000 AS {_DEC}) * sum(k_score)) div sum(n_score)"
        ).alias("obar_bp"),
    )
    wide = j.crossJoin(F.broadcast(tot))
    return wide.agg(
        F.expr("CAST(max(big_n) AS BIGINT)").alias("n_score"),
        F.expr("CAST(max(obar_bp) AS BIGINT)").alias("base_bp"),
        F.expr(
            f"CAST(sum(CAST(k_score AS {_DEC}) * (p_bp - 10000)"
            f" * (p_bp - 10000)"
            f" + CAST(n_score - k_score AS {_DEC}) * p_bp * p_bp)"
            f" AS BIGINT)"
        ).alias("brier_e8"),
        F.expr(
            f"CAST(sum(CAST(n_score AS {_DEC}) * (p_bp - o_bp)"
            f" * (p_bp - o_bp)) AS BIGINT)"
        ).alias("rel_e8"),
        F.expr(
            f"CAST(sum(CAST(n_score AS {_DEC}) * (o_bp - obar_bp)"
            f" * (o_bp - obar_bp)) AS BIGINT)"
        ).alias("res_e8"),
        F.expr(
            "CAST(max(big_n * obar_bp * (10000 - obar_bp)) AS BIGINT)"
        ).alias("unc_e8"),
        F.expr(
            f"CAST(sum(CAST(k_score AS {_DEC}) * (p_bp - 10000)"
            f" * (p_bp - 10000)"
            f" + CAST(n_score - k_score AS {_DEC}) * p_bp * p_bp)"
            f" - (sum(CAST(n_score AS {_DEC}) * (p_bp - o_bp)"
            f" * (p_bp - o_bp))"
            f" - sum(CAST(n_score AS {_DEC}) * (o_bp - obar_bp)"
            f" * (o_bp - obar_bp))"
            f" + max(big_n * obar_bp * (10000 - obar_bp)))"
            f" AS BIGINT)"
        ).alias("identity_gap_e8"),
    )


@query(
    "q_calib_skill_score",
    oracle=f"""
    WITH {_CEN_DUCK},
    p0 AS (
      SELECT CAST((10000 * sum(k)) // sum(n) AS BIGINT) AS p0_bp
      FROM cen WHERE yr <= 1997
    ),
    briers AS (
      SELECT
        CAST(sum(CAST(k_score AS HUGEINT) * (p_bp - 10000)
                 * (p_bp - 10000)
                 + CAST(n_score - k_score AS HUGEINT) * p_bp * p_bp)
             AS BIGINT) AS brier_model_e8,
        CAST(sum(CAST(k_score AS HUGEINT) * (p0_bp - 10000)
                 * (p0_bp - 10000)
                 + CAST(n_score - k_score AS HUGEINT) * p0_bp * p0_bp)
             AS BIGINT) AS brier_ref_e8
      FROM joined CROSS JOIN p0
    )
    SELECT brier_model_e8, brier_ref_e8,
           CAST(CASE WHEN brier_ref_e8 = 0 THEN NULL
                WHEN brier_ref_e8 >= brier_model_e8
                THEN (10000 * (brier_ref_e8 - brier_model_e8))
                     // brier_ref_e8
                ELSE -((10000 * (brier_model_e8 - brier_ref_e8))
                       // brier_ref_e8) END AS BIGINT) AS bss_bp,
           CASE WHEN brier_model_e8 < brier_ref_e8 THEN 'model_better'
                WHEN brier_model_e8 = brier_ref_e8 THEN 'tie'
                ELSE 'reference_better' END AS verdict
    FROM briers
    """,
)
def q_calib_skill_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BY by3 — the Brier skill score vs climatology: the binned
    model's exact Brier sum against the pooled-train-rate reference,
    the sign-explicit truncated ``bss_bp`` (NULL on a zero reference
    Brier — a degenerate one-class score period), and the verdict.

    Scale: census-side over the same 5-bin join + a 1-row broadcast
    climatology."""
    cen = _census(spark, sf_dir)
    p0 = cen.filter("yr <= 1997").agg(
        F.expr("CAST((10000 * sum(k)) div sum(n) AS BIGINT)").alias(
            "p0_bp"
        )
    )
    briers = (
        _joined(spark, sf_dir, cen)
        .crossJoin(F.broadcast(p0))
        .agg(
            F.expr(
                f"CAST(sum(CAST(k_score AS {_DEC}) * (p_bp - 10000)"
                f" * (p_bp - 10000)"
                f" + CAST(n_score - k_score AS {_DEC}) * p_bp * p_bp)"
                f" AS BIGINT)"
            ).alias("brier_model_e8"),
            F.expr(
                f"CAST(sum(CAST(k_score AS {_DEC}) * (p0_bp - 10000)"
                f" * (p0_bp - 10000)"
                f" + CAST(n_score - k_score AS {_DEC})"
                f" * p0_bp * p0_bp) AS BIGINT)"
            ).alias("brier_ref_e8"),
        )
    )
    return briers.select(
        "brier_model_e8",
        "brier_ref_e8",
        F.expr(
            "CAST(CASE WHEN brier_ref_e8 = 0 THEN NULL"
            " WHEN brier_ref_e8 >= brier_model_e8"
            " THEN (10000 * (brier_ref_e8 - brier_model_e8))"
            " div brier_ref_e8"
            " ELSE -((10000 * (brier_model_e8 - brier_ref_e8))"
            " div brier_ref_e8) END AS BIGINT)"
        ).alias("bss_bp"),
        F.expr(
            "CASE WHEN brier_model_e8 < brier_ref_e8 THEN 'model_better'"
            " WHEN brier_model_e8 = brier_ref_e8 THEN 'tie'"
            " ELSE 'reference_better' END"
        ).alias("verdict"),
    )


@query(
    "q_calib_drift_by_year",
    oracle=f"""
    WITH {_CEN_DUCK},
    yearly AS (
      SELECT c.yr,
             CAST(sum(c.n) AS BIGINT) AS n,
             CAST(sum(c.k) AS BIGINT) AS k,
             CAST(sum(CAST(t.p_bp AS HUGEINT) * c.n) AS HUGEINT)
               AS pred_sum
      FROM cen c JOIN tr t ON c.qbin = t.qbin
      WHERE c.yr >= 1998 GROUP BY 1
    )
    SELECT yr, n,
           CAST(pred_sum // n AS BIGINT) AS avg_predicted_bp,
           CAST((10000 * k) // n AS BIGINT) AS observed_bp,
           CAST(pred_sum // n - (10000 * k) // n AS BIGINT) AS gap_bp
    FROM yearly ORDER BY yr
    """,
)
def q_calib_drift_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BY by4 — calibration drift: per scoring year, the model's
    exposure-weighted average prediction vs the realized rate (both
    truncated bp) and the signed gap — a widening gap is the "retrain
    the model" tripwire.

    Scale: the (year, bin) census joins the 5-row train model
    census-side; ≤ |years| output rows."""
    cen = _census(spark, sf_dir)
    tr = cen.filter("yr <= 1997").groupBy("qbin").agg(
        F.expr("CAST((10000 * sum(k)) div sum(n) AS BIGINT)").alias(
            "p_bp"
        )
    )
    yearly = (
        cen.filter("yr >= 1998")
        .join(F.broadcast(tr), "qbin")
        .groupBy("yr")
        .agg(
            F.expr("CAST(sum(n) AS BIGINT)").alias("n"),
            F.expr("CAST(sum(k) AS BIGINT)").alias("k"),
            F.expr(
                f"CAST(sum(CAST(p_bp AS {_DEC}) * n) AS {_DEC})"
            ).alias("pred_sum"),
        )
    )
    return (
        yearly.select(
            "yr",
            "n",
            F.expr("CAST(pred_sum div n AS BIGINT)").alias(
                "avg_predicted_bp"
            ),
            F.expr("CAST((10000 * k) div n AS BIGINT)").alias(
                "observed_bp"
            ),
            F.expr(
                "CAST(pred_sum div n - (10000 * k) div n AS BIGINT)"
            ).alias("gap_bp"),
        )
        .orderBy("yr")
    )
