"""Segment-migration analytics (SURVEY.md §2.AR, round 9).

The tier-migration view a retention team reads quarterly: customers are
tiered into value quintiles in two adjacent eras (period A = 1995–1997,
period B = 1998–2000 — 2001 is a partial year and deliberately
excluded), and the suite reports how they MOVED: the full migration
matrix (including 'none' pseudo-tiers for customers absent in a
period), per-tier stickiness (stay / upgrade / downgrade / churn shares
in bp), the revenue flow each migration cell carries, and the tier
definition table (bounds + totals per period × tier).

Tiering is quintile-by-revenue with the (revenue DESC, custkey) total
order — tier 1 is the top quintile — assigned ONLY among customers
active in the period (zero-revenue customers take the 'none' label,
never dilute the quintiles).

Exactness: revenue on the exact cent grid, every share in truncated bp.
ANSI ntile sizing in both engines (first n mod k buckets get one extra
row), so the tiers are bit-identical.

Spark-first shape, sized for 100 TB:
- The fact pays ONE partial-aggregated shuffle to o_custkey with BOTH
  periods' revenue as conditional sums (never two fact passes); the
  per-customer relation is localCheckpoint-pinned because both period
  tilings and the final rollups branch from it.
- Per-period quintiles use ``ranks.global_ntile`` — the two-pass
  distributed rank (range-partition + local index + bounded offset
  table), NOT a global ORDER BY window, so there is no
  Exchange SinglePartition over the customer table (the oracle's plain
  ``ntile() OVER (ORDER BY ...)`` spelling is exactly what this
  replaces; ANSI sizing makes them equal).
- Every report is then a bounded rollup: ≤ 36 matrix cells, 5 tiers,
  10 period×tier rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.functions.ranks import global_ntile
from recommendersystems_bigdata_spark.registry import query

_CENTS = "CAST(floor({col} * 100 + 0.5) AS BIGINT)"

_TIERED_SQL = f"""
percust AS (
  SELECT o_custkey AS ck,
         CAST(sum(CASE WHEN year(CAST(o_orderdate AS TIMESTAMP))
                       BETWEEN 1995 AND 1997
                  THEN {_CENTS.format(col="o_totalprice")} ELSE 0 END)
              AS BIGINT) AS rev_a,
         CAST(sum(CASE WHEN year(CAST(o_orderdate AS TIMESTAMP))
                       BETWEEN 1998 AND 2000
                  THEN {_CENTS.format(col="o_totalprice")} ELSE 0 END)
              AS BIGINT) AS rev_b
  FROM orders GROUP BY 1
),
tiered AS (
  SELECT ck, rev_a, rev_b,
         CASE WHEN rev_a > 0 THEN ntile(5) OVER
              (PARTITION BY rev_a > 0 ORDER BY rev_a DESC, ck) END AS tier_a,
         CASE WHEN rev_b > 0 THEN ntile(5) OVER
              (PARTITION BY rev_b > 0 ORDER BY rev_b DESC, ck) END AS tier_b
  FROM percust
),
labeled AS (
  SELECT ck, rev_a, rev_b,
         COALESCE('t' || CAST(tier_a AS VARCHAR), 'none') AS from_tier,
         COALESCE('t' || CAST(tier_b AS VARCHAR), 'none') AS to_tier,
         tier_a, tier_b
  FROM tiered
)
"""


def _labeled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ck, rev_a, rev_b, tier_a, tier_b, from_tier, to_tier): both-period
    revenue and quintile labels per customer — one fact shuffle, then two
    distributed ntiles over the era-active subsets."""
    orders = load_table(spark, sf_dir, "orders")
    yr = F.expr("year(CAST(o_orderdate AS TIMESTAMP))")
    cents = F.expr(_CENTS.format(col="o_totalprice"))
    percust = (
        orders.groupBy(F.col("o_custkey").alias("ck"))
        .agg(
            F.sum(F.when(yr.between(1995, 1997), cents).otherwise(0))
            .cast("long")
            .alias("rev_a"),
            F.sum(F.when(yr.between(1998, 2000), cents).otherwise(0))
            .cast("long")
            .alias("rev_b"),
        )
        .localCheckpoint()  # tilings + rollups all branch from here
    )

    def tiles(rev_col: str, name: str) -> DataFrame:
        present = percust.filter(F.col(rev_col) > 0).select("ck", rev_col)
        return global_ntile(
            present, [F.desc(rev_col), F.asc("ck")], 5, name
        ).select("ck", name)

    out = (
        percust.join(tiles("rev_a", "tier_a"), "ck", "left")
        .join(tiles("rev_b", "tier_b"), "ck", "left")
    )
    return out.withColumns(
        {
            "from_tier": F.coalesce(
                F.concat(F.lit("t"), F.col("tier_a").cast("string")),
                F.lit("none"),
            ),
            "to_tier": F.coalesce(
                F.concat(F.lit("t"), F.col("tier_b").cast("string")),
                F.lit("none"),
            ),
        }
    )


@query(
    "q_tier_migration_matrix",
    oracle=f"""
    WITH {_TIERED_SQL}
    SELECT from_tier, to_tier,
           CAST(count(*) AS BIGINT) AS n_customers,
           (10000 * CAST(count(*) AS BIGINT))
             // CAST(sum(count(*)) OVER (PARTITION BY from_tier) AS BIGINT)
             AS row_share_bp
    FROM labeled
    WHERE from_tier <> 'none' OR to_tier <> 'none'
    GROUP BY 1, 2 ORDER BY from_tier, to_tier
    """,
)
def q_tier_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AR ar1 — tier-migration matrix: customer counts per (period-A
    tier → period-B tier) cell, including 'none' rows for era-B joiners
    and era-A leavers (the never-active corner is excluded — it is not
    a migration), with each cell's share of its from-tier row in bp.

    Scale: one fact shuffle + two distributed ntiles; the matrix is a
    ≤ 35-cell rollup and the row-share window runs on it."""
    from pyspark.sql import Window

    labeled = _labeled(spark, sf_dir).filter(
        (F.col("from_tier") != "none") | (F.col("to_tier") != "none")
    )
    cells = labeled.groupBy("from_tier", "to_tier").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )
    w = Window.partitionBy("from_tier")
    return (
        cells.withColumn(
            "row_total", F.sum("n_customers").over(w).cast("long")
        )
        .select(
            "from_tier",
            "to_tier",
            "n_customers",
            F.expr("(10000 * n_customers) div row_total").alias(
                "row_share_bp"
            ),
        )
        .orderBy("from_tier", "to_tier")
    )


@query(
    "q_tier_stickiness",
    oracle=f"""
    WITH {_TIERED_SQL}
    SELECT 't' || CAST(tier_a AS VARCHAR) AS from_tier,
           CAST(count(*) AS BIGINT) AS n_customers,
           (10000 * CAST(sum(CASE WHEN tier_b = tier_a
                                  THEN 1 ELSE 0 END) AS BIGINT))
             // count(*) AS stay_bp,
           (10000 * CAST(sum(CASE WHEN tier_b < tier_a
                                  THEN 1 ELSE 0 END) AS BIGINT))
             // count(*) AS upgrade_bp,
           (10000 * CAST(sum(CASE WHEN tier_b > tier_a
                                  THEN 1 ELSE 0 END) AS BIGINT))
             // count(*) AS downgrade_bp,
           (10000 * CAST(sum(CASE WHEN tier_b IS NULL
                                  THEN 1 ELSE 0 END) AS BIGINT))
             // count(*) AS churn_bp
    FROM tiered WHERE tier_a IS NOT NULL
    GROUP BY 1 ORDER BY from_tier
    """,
)
def q_tier_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AR ar2 — tier stickiness: for each period-A tier, the shares
    (bp) of its customers that stayed, upgraded (lower tier number =
    more valuable), downgraded, or churned out of period B entirely —
    the four disjoint outcomes sum to ≤ 10000 with < 4 bp truncation
    loss (pinned in tests).

    Scale: a 5-row conditional rollup over the tiered relation."""
    tiered = _labeled(spark, sf_dir).filter(F.col("tier_a").isNotNull())

    def share(cond) -> F.Column:
        return F.expr(f"(10000 * {cond}) div n_customers")

    agg = tiered.groupBy("from_tier").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum(F.when(F.col("tier_b") == F.col("tier_a"), 1).otherwise(0))
        .cast("long")
        .alias("_stay"),
        F.sum(F.when(F.col("tier_b") < F.col("tier_a"), 1).otherwise(0))
        .cast("long")
        .alias("_up"),
        F.sum(F.when(F.col("tier_b") > F.col("tier_a"), 1).otherwise(0))
        .cast("long")
        .alias("_down"),
        F.sum(F.when(F.col("tier_b").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("_churn"),
    )
    return agg.select(
        "from_tier",
        "n_customers",
        share("_stay").alias("stay_bp"),
        share("_up").alias("upgrade_bp"),
        share("_down").alias("downgrade_bp"),
        share("_churn").alias("churn_bp"),
    ).orderBy("from_tier")


@query(
    "q_value_migration",
    oracle=f"""
    WITH {_TIERED_SQL}
    SELECT from_tier, to_tier,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(rev_b) AS BIGINT) AS rev_b_cents,
           (10000 * CAST(sum(rev_b) AS BIGINT))
             // CAST((SELECT sum(rev_b) FROM labeled) AS BIGINT)
             AS rev_b_share_bp
    FROM labeled
    WHERE to_tier <> 'none'
    GROUP BY 1, 2 ORDER BY from_tier, to_tier
    """,
)
def q_value_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AR ar3 — value migration: the period-B revenue carried by
    each migration cell — which of today's dollars come from retained
    top-tier customers vs upgraded mid-tiers vs brand-new ones. Cells
    with to_tier = 'none' carry zero period-B revenue by construction
    and are excluded; shares are of TOTAL period-B revenue (broadcast
    1-row total), so the cells sum to ≤ 10000 bp.

    Scale: same bounded matrix rollup as ar1 plus a broadcast total."""
    labeled = _labeled(spark, sf_dir)
    cells = (
        labeled.filter(F.col("to_tier") != "none")
        .groupBy("from_tier", "to_tier")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("rev_b").cast("long").alias("rev_b_cents"),
        )
    )
    total = labeled.agg(F.sum("rev_b").cast("long").alias("_tot"))
    return (
        cells.join(F.broadcast(total))
        .select(
            "from_tier",
            "to_tier",
            "n_customers",
            "rev_b_cents",
            F.expr("(10000 * rev_b_cents) div _tot").alias(
                "rev_b_share_bp"
            ),
        )
        .orderBy("from_tier", "to_tier")
    )


@query(
    "q_tier_bounds",
    oracle=f"""
    WITH {_TIERED_SQL},
    eras AS (
      SELECT 'a' AS period, tier_a AS tier, rev_a AS rev
      FROM tiered WHERE tier_a IS NOT NULL
      UNION ALL
      SELECT 'b' AS period, tier_b AS tier, rev_b AS rev
      FROM tiered WHERE tier_b IS NOT NULL
    )
    SELECT period, CAST(tier AS BIGINT) AS tier,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(min(rev) AS BIGINT) AS floor_cents,
           CAST(max(rev) AS BIGINT) AS ceil_cents,
           CAST(sum(rev) AS BIGINT) AS total_cents
    FROM eras GROUP BY 1, 2 ORDER BY period, tier
    """,
)
def q_tier_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AR ar4 — tier definition table: per period × quintile, the
    customer count, revenue floor/ceiling (the cutoffs a campaign
    targets against) and total revenue — the lookup that makes ar1–ar3
    actionable. Floors are weakly decreasing with tier number within a
    period (tier 1 = top), asserted in tests.

    Scale: a ×2 unpivot of the tiered relation → 10-row rollup."""
    tiered = _labeled(spark, sf_dir)
    a = (
        tiered.filter(F.col("tier_a").isNotNull())
        .select(F.lit("a").alias("period"), F.col("tier_a").alias("tier"),
                F.col("rev_a").alias("rev"))
    )
    b = (
        tiered.filter(F.col("tier_b").isNotNull())
        .select(F.lit("b").alias("period"), F.col("tier_b").alias("tier"),
                F.col("rev_b").alias("rev"))
    )
    return (
        a.unionByName(b)
        .groupBy("period", F.col("tier").cast("long").alias("tier"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.min("rev").cast("long").alias("floor_cents"),
            F.max("rev").cast("long").alias("ceil_cents"),
            F.sum("rev").cast("long").alias("total_cents"),
        )
        .orderBy("period", "tier")
    )
