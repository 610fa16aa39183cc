"""Customer-concentration / inequality analytics (SURVEY.md §2.AX, round 9).

The "how concentrated is our revenue" family, exact-integer throughout:
the Lorenz decile table, the Hoover index (half relative mean absolute
deviation — "what share of revenue would have to move to equalize"),
the top-percentile concentration curve, and the Palma-style share
ratios. Complements §2.D's ``q_gini_concentration`` (a different
functional of the same distribution) and §2.AP's distinct-value CDF
quantiles (customer spend is near-unique, so the CDF trick does not
apply here — percentile tiling does).

Population convention: the FULL customer base, zero-spend customers
included at spend 0 (concentration read against everyone you could
sell to, not just buyers — the choice that makes the bottom-decile
rows honest). Spend is exact cents of ``o_totalprice``.

Exactness rules:
- Percentile tiles use ANSI ntile sizing over the total order
  (spend, custkey) — bit-identical in both engines.
- Shares in truncated bp, scaled in 128-bit (DECIMAL(38,0) Spark /
  HUGEINT DuckDB, toward-zero quotients): ``10⁴ · Σcents`` exceeds
  2⁶³ once corpus revenue passes ~$9.2 quadrillion-cents/10⁴, so the
  bounded-census scaling never trusts BIGINT.
- Hoover's per-row term ``|n·x − T|`` also cross-multiplies corpus
  scalars, so THAT one map-side product runs in DECIMAL(38,0) too —
  the single fact-sized 128-bit expression in the suite, loud here and
  in the docstring. The above-mean test is the integer cross-multiply
  ``n·x > T`` (no division, no floats).

Spark-first shape, sized for 100 TB:
- ONE orders pass (partial-aggregated per-custkey sum) left-joined
  under the customer dim; the per-customer relation is
  localCheckpoint-pinned before ranking (the rfm precedent — range
  partitioning would otherwise recompute the join).
- Percentile assignment is ``ranks.global_ntile`` — the two-pass
  distributed rank, NO Exchange SinglePartition over customers; the
  oracle's plain ``ntile() OVER (ORDER BY …)`` is what it replaces.
- Every report is arithmetic on a bounded census (10 / 100 / 1 rows);
  the only windows run over those censuses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.functions.ranks import global_ntile
from recommendersystems_bigdata_spark.registry import query

_CENTS = "CAST(floor({col} * 100 + 0.5) AS BIGINT)"

# DuckDB: the per-customer spend relation (full base, zeros included).
_SPEND_SQL = f"""
spend AS (
  SELECT c.c_custkey AS ck, COALESCE(s.cents, 0) AS spend_cents
  FROM customer c LEFT JOIN (
    SELECT o_custkey,
           CAST(sum({_CENTS.format(col="o_totalprice")}) AS BIGINT) AS cents
    FROM orders GROUP BY 1
  ) s ON c.c_custkey = s.o_custkey
)
"""

_BP128 = "CAST((CAST(10000 AS DECIMAL(38,0)) * {num}) div {den} AS BIGINT)"


def _spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ck, spend_cents) over the full customer base, zeros included."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.expr(_CENTS.format(col="o_totalprice")))
        .cast("long")
        .alias("cents")
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(
            F.col("c_custkey").alias("ck"),
            F.coalesce("cents", F.lit(0)).alias("spend_cents"),
        )
    )


@query(
    "q_lorenz_deciles",
    oracle=f"""
    WITH {_SPEND_SQL}
    , tiled AS (
      SELECT spend_cents,
             CAST(ntile(10) OVER (ORDER BY spend_cents, ck) AS BIGINT)
               AS decile
      FROM spend
    ),
    census AS (
      SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
             CAST(sum(spend_cents) AS BIGINT) AS spend_cents
      FROM tiled GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(spend_cents) AS BIGINT) AS t FROM census)
    SELECT decile, n_customers, spend_cents,
           CAST((10000 * CAST(spend_cents AS HUGEINT)) // t AS BIGINT)
             AS spend_share_bp,
           CAST((10000 * CAST(sum(spend_cents) OVER
                  (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS HUGEINT))
                // t AS BIGINT) AS cum_spend_share_bp
    FROM census, tot ORDER BY decile
    """,
)
def q_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AX ax1 — the Lorenz table: customers tiled into spend deciles
    (ascending — decile 1 is the poorest tenth), each decile's exact
    spend, its share of total in truncated bp, and the cumulative
    (Lorenz-curve) share. Convexity and the 10000-bp terminal are the
    test pins; the gap between cum share and ``decile·1000`` is the
    visual Gini that §2.D's d-key summarizes.

    Scale: one orders shuffle to per-customer spend (checkpoint-pinned),
    distributed ntile(10) — no single-partition exchange — then a
    10-row census; the window and 128-bit share scaling run on those
    10 rows."""
    spend = _spend(spark, sf_dir).localCheckpoint()  # pin before ranking
    tiled = global_ntile(
        spend, [F.col("spend_cents"), F.col("ck")], 10, name="decile"
    )
    census = (
        tiled.groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("spend_cents").cast("long").alias("spend_cents"),
        )
        .localCheckpoint()  # 10 rows; totals + report branch from it
    )
    tot = census.agg(F.sum("spend_cents").cast("long").alias("t"))
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        census.crossJoin(F.broadcast(tot))
        .withColumn("cum_cents", F.sum("spend_cents").over(w).cast("long"))
        .select(
            "decile",
            "n_customers",
            "spend_cents",
            F.expr(_BP128.format(num="spend_cents", den="t")).alias(
                "spend_share_bp"
            ),
            F.expr(_BP128.format(num="cum_cents", den="t")).alias(
                "cum_spend_share_bp"
            ),
        )
        .orderBy("decile")
    )


@query(
    "q_hoover_index",
    oracle=f"""
    WITH {_SPEND_SQL}
    , tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(spend_cents) AS BIGINT) AS t
      FROM spend
    ),
    devs AS (
      SELECT sum(abs(CAST(n AS HUGEINT) * spend_cents - t)) AS sum_abs,
             CAST(sum(CASE WHEN CAST(n AS HUGEINT) * spend_cents > t
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_above_mean
      FROM spend, tot
    )
    SELECT n AS n_customers, t AS total_spend_cents,
           t // n AS mean_spend_cents,
           CAST((10000 * sum_abs)
                // (2 * CAST(n AS HUGEINT) * t) AS BIGINT) AS hoover_bp,
           (10000 * n_above_mean) // n AS above_mean_bp
    FROM devs, tot
    """,
)
def q_hoover_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AX ax2 — the Hoover (Robin Hood) index in truncated bp: the
    share of total spend that would have to be redistributed for
    perfect equality, ``Σ|n·xᵢ − T| / (2·n·T)`` — zero division until
    the final scaling, so it is exact on the cent grid. The companion
    column is the share of customers above the mean (the integer
    cross-multiply ``n·x > T``, no float mean). This is the suite's
    one fact-sided 128-bit expression: ``n·x`` exceeds 2⁶³ once
    ``|customers| · max-spend-cents`` does, so the term runs in
    DECIMAL(38,0)/HUGEINT per row — bounded censuses everywhere else.

    Scale: one orders shuffle to per-customer spend (checkpoint-pinned
    — the totals and deviation passes both read it), a 1-row broadcast
    totals cross join, then a single partial-aggregated 1-row census —
    no ranking, no window."""
    spend = _spend(spark, sf_dir).localCheckpoint()
    tot = spend.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("spend_cents").cast("long").alias("t"),
    )
    devs = (
        spend.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.expr(
                    "abs(CAST(n AS DECIMAL(38,0)) * spend_cents - t)"
                )
            ).alias("sum_abs"),
            F.sum(
                F.when(
                    F.expr("CAST(n AS DECIMAL(38,0)) * spend_cents > t"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_above_mean"),
            F.max("n").cast("long").alias("n"),
            F.max("t").cast("long").alias("t"),
        )
    )
    return devs.select(
        F.col("n").alias("n_customers"),
        F.col("t").alias("total_spend_cents"),
        F.expr("t div n").alias("mean_spend_cents"),
        F.expr(
            "CAST((CAST(10000 AS DECIMAL(38,0)) * sum_abs)"
            " div (CAST(2 AS DECIMAL(38,0)) * n * t) AS BIGINT)"
        ).alias("hoover_bp"),
        F.expr("(10000 * n_above_mean) div n").alias("above_mean_bp"),
    )


def _top_pct_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(top_pct 1..100, n_customers, spend_cents): percentile census of
    the DESC spend order — bucket 1 is the top 1% of customers."""
    spend = _spend(spark, sf_dir).localCheckpoint()  # pin before ranking
    tiled = global_ntile(
        spend,
        [F.col("spend_cents").desc(), F.col("ck")],
        100,
        name="top_pct",
    )
    return (
        tiled.groupBy("top_pct")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("spend_cents").cast("long").alias("spend_cents"),
        )
        .localCheckpoint()  # 100 rows; consumers branch from it
    )


_TOP_SQL = f"""
tiled AS (
  SELECT spend_cents,
         CAST(ntile(100) OVER (ORDER BY spend_cents DESC, ck) AS BIGINT)
           AS top_pct
  FROM spend
),
census AS (
  SELECT top_pct, CAST(count(*) AS BIGINT) AS n_customers,
         CAST(sum(spend_cents) AS BIGINT) AS spend_cents
  FROM tiled GROUP BY 1
),
tot AS (SELECT CAST(sum(spend_cents) AS BIGINT) AS t FROM census)
"""


@query(
    "q_concentration_curve",
    oracle=f"""
    WITH {_SPEND_SQL}, {_TOP_SQL}
    SELECT top_pct, n_customers, spend_cents,
           CAST((10000 * CAST(sum(spend_cents) OVER
                  (ORDER BY top_pct ROWS UNBOUNDED PRECEDING) AS HUGEINT))
                // t AS BIGINT) AS cum_spend_share_bp
    FROM census, tot ORDER BY top_pct
    """,
)
def q_concentration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AX ax3 — the concentration curve at 1% resolution: customers
    ranked by spend DESCENDING and tiled into 100 percentile buckets;
    each row reports the cumulative spend share of the top p% in bp.
    Reading it answers "the top p% of customers carry s% of revenue"
    for every p — the curve is non-decreasing and ends at exactly
    10000 bp (test pins). ax4's ratios are lookups into this census.

    Scale: one orders shuffle, distributed ntile(100), 100-row census;
    the cumulative window and 128-bit scaling run on 100 rows."""
    census = _top_pct_census(spark, sf_dir)
    tot = census.agg(F.sum("spend_cents").cast("long").alias("t"))
    w = Window.orderBy("top_pct").rowsBetween(Window.unboundedPreceding, 0)
    return (
        census.crossJoin(F.broadcast(tot))
        .withColumn("cum_cents", F.sum("spend_cents").over(w).cast("long"))
        .select(
            "top_pct",
            "n_customers",
            "spend_cents",
            F.expr(_BP128.format(num="cum_cents", den="t")).alias(
                "cum_spend_share_bp"
            ),
        )
        .orderBy("top_pct")
    )


@query(
    "q_palma_ratios",
    oracle=f"""
    WITH {_SPEND_SQL}, {_TOP_SQL}
    , legs AS (
      SELECT
        CAST(sum(CASE WHEN top_pct = 1 THEN spend_cents ELSE 0 END)
             AS BIGINT) AS top1_cents,
        CAST(sum(CASE WHEN top_pct <= 10 THEN spend_cents ELSE 0 END)
             AS BIGINT) AS top10_cents,
        CAST(sum(CASE WHEN top_pct > 50 THEN spend_cents ELSE 0 END)
             AS BIGINT) AS bottom50_cents,
        CAST(sum(CASE WHEN top_pct > 60 THEN spend_cents ELSE 0 END)
             AS BIGINT) AS bottom40_cents
      FROM census
    )
    SELECT
      CAST((10000 * CAST(top1_cents AS HUGEINT)) // t AS BIGINT)
        AS top1_share_bp,
      CAST((10000 * CAST(top10_cents AS HUGEINT)) // t AS BIGINT)
        AS top10_share_bp,
      CAST((10000 * CAST(bottom50_cents AS HUGEINT)) // t AS BIGINT)
        AS bottom50_share_bp,
      CAST((1000 * CAST(top10_cents AS HUGEINT))
           // nullif(bottom40_cents, 0) AS BIGINT) AS palma_milli
    FROM legs, tot
    """,
)
def q_palma_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AX ax4 — the headline share ratios off ax3's percentile
    census: top-1% and top-10% spend shares, the bottom-50% share, and
    the Palma ratio (top-10% spend over bottom-40% spend, truncated
    milli; NULL when the bottom 40% spent nothing — reported, since a
    zero-spend bottom 40% IS extreme concentration). One audit row.

    Scale: identical plan to ax3 up to the census, then conditional
    sums over 100 rows — no additional pass."""
    census = _top_pct_census(spark, sf_dir)
    legs = census.agg(
        F.sum(F.when(F.col("top_pct") == 1, F.col("spend_cents")).otherwise(0))
        .cast("long")
        .alias("top1_cents"),
        F.sum(
            F.when(F.col("top_pct") <= 10, F.col("spend_cents")).otherwise(0)
        )
        .cast("long")
        .alias("top10_cents"),
        F.sum(
            F.when(F.col("top_pct") > 50, F.col("spend_cents")).otherwise(0)
        )
        .cast("long")
        .alias("bottom50_cents"),
        F.sum(
            F.when(F.col("top_pct") > 60, F.col("spend_cents")).otherwise(0)
        )
        .cast("long")
        .alias("bottom40_cents"),
        F.sum("spend_cents").cast("long").alias("t"),
    )
    return legs.select(
        F.expr(_BP128.format(num="top1_cents", den="t")).alias(
            "top1_share_bp"
        ),
        F.expr(_BP128.format(num="top10_cents", den="t")).alias(
            "top10_share_bp"
        ),
        F.expr(_BP128.format(num="bottom50_cents", den="t")).alias(
            "bottom50_share_bp"
        ),
        F.expr(
            "CAST((CAST(1000 AS DECIMAL(38,0)) * top10_cents)"
            " div nullif(bottom40_cents, 0) AS BIGINT)"
        ).alias("palma_milli"),
    )
