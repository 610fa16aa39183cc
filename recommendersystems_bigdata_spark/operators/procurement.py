"""Procurement / supply-risk analytics (SURVEY.md §2.AL, round 9).

The supply-side risk dashboard over the supplier dimension and the
lineitem fact: national supply concentration (HHI), single-source
exposure, Pareto depth ("how many suppliers cover 80%?"), the
supplier⋈part bipartite degree profile, and financial-stress tiers.
Exactness: revenue in BIGINT cents, shares in truncated-div bp, HHI in
bp² (Σ share_bp² ≤ 10⁸ per nation — fits BIGINT at any supplier
count), negative account balances take the same ``floor(x·100 + 0.5)``
cent grid (floor, not trunc, so both engines agree on negatives).

Spark-first shape, sized for 100 TB:
- The supplier dim broadcasts everywhere (it is thousands of rows when
  the fact is 100 TB); the fact pays ONE partial-aggregated shuffle per
  query — to (nation, supplier), (part, supplier) or (supplier) — and
  every ranking/share window runs on that bounded relation.
- al4 materializes the distinct supplier⋈part edge set once
  (localCheckpoint) and derives both degree censuses from it — the
  two-sided profile costs one fact pass, not two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query

_CENTS = "CAST(floor({col} * 100 + 0.5) AS BIGINT)"


@query(
    "q_supply_hhi_by_nation",
    oracle=f"""
    WITH ns AS (
      SELECT s.s_nationkey AS nk, l.l_suppkey AS sk,
             CAST(sum({_CENTS.format(col="l.l_extendedprice")}) AS BIGINT)
               AS cents
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ),
    shared AS (
      SELECT nk, cents,
             CAST(sum(cents) OVER (PARTITION BY nk) AS BIGINT) AS nation_cents
      FROM ns
    )
    SELECT nk AS s_nationkey,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(max(nation_cents) AS BIGINT) AS nation_cents,
           CAST(sum(((10000 * cents) // nation_cents)
                    * ((10000 * cents) // nation_cents)) AS BIGINT) AS hhi_bp2
    FROM shared GROUP BY 1 ORDER BY hhi_bp2 DESC, s_nationkey
    """,
)
def q_supply_hhi_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AL al1 — national supply concentration: per supplier nation,
    the Herfindahl–Hirschman index over supplier revenue shares
    (Σ share_bp², share truncated to bp) — the antitrust-style
    concentration measure a procurement office tracks per sourcing
    region; 10⁸ bp² = monopoly.

    Scale: supplier dim broadcast onto the fact, one (nation, supplier)
    partial agg; the share window and HHI census run on that bounded
    relation (|suppliers| rows)."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    ns = (
        li.join(
            F.broadcast(sup.select("s_suppkey", "s_nationkey")),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy(F.col("s_nationkey").alias("nk"), F.col("l_suppkey").alias("sk"))
        .agg(
            F.sum(F.expr(_CENTS.format(col="l_extendedprice")))
            .cast("long")
            .alias("cents")
        )
    )
    shared = ns.withColumn(
        "nation_cents",
        F.sum("cents").over(Window.partitionBy("nk")).cast("long"),
    ).withColumn("share_bp", F.expr("(10000 * cents) div nation_cents"))
    return (
        shared.groupBy(F.col("nk").alias("s_nationkey"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.max("nation_cents").cast("long").alias("nation_cents"),
            F.sum(F.col("share_bp") * F.col("share_bp"))
            .cast("long")
            .alias("hhi_bp2"),
        )
        .orderBy(F.desc("hhi_bp2"), "s_nationkey")
    )


@query(
    "q_single_source_exposure",
    oracle=f"""
    WITH ps AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
             CAST(sum({_CENTS.format(col="l_extendedprice")}) AS BIGINT)
               AS cents
      FROM lineitem GROUP BY 1, 2
    ),
    per_part AS (
      SELECT pk, CAST(count(*) AS BIGINT) AS n_supp,
             CAST(sum(cents) AS BIGINT) AS cents
      FROM ps GROUP BY 1
    ),
    banded AS (
      SELECT CASE WHEN n_supp = 1 THEN 'a_single'
                  WHEN n_supp = 2 THEN 'b_dual'
                  ELSE 'c_multi' END AS sourcing, cents
      FROM per_part
    )
    SELECT sourcing, CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(cents) AS BIGINT) AS revenue_cents,
           (10000 * CAST(sum(cents) AS BIGINT))
             // CAST((SELECT sum(cents) FROM banded) AS BIGINT)
             AS revenue_share_bp
    FROM banded GROUP BY 1 ORDER BY sourcing
    """,
)
def q_single_source_exposure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AL al2 — single-source exposure: parts banded by how many
    suppliers have EVER fulfilled them (1 / 2 / 3+), with the revenue
    riding on each band and its share of total — the "what breaks if
    one supplier fails" headline number. Distinct-supplier count is the
    explicit two-level (part, supplier) → part aggregation (the
    Expand-free discipline the 10× probes established).

    Scale: one (part, supplier) partial agg (the only fact shuffle),
    part rollup on the bounded relation, broadcast 1-row total."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(
        F.sum(F.expr(_CENTS.format(col="l_extendedprice")))
        .cast("long")
        .alias("cents")
    )
    per_part = ps.groupBy("pk").agg(
        F.count(F.lit(1)).cast("long").alias("n_supp"),
        F.sum("cents").cast("long").alias("cents"),
    )
    banded = per_part.select(
        F.when(F.col("n_supp") == 1, "a_single")
        .when(F.col("n_supp") == 2, "b_dual")
        .otherwise("c_multi")
        .alias("sourcing"),
        "cents",
    )
    census = banded.groupBy("sourcing").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )
    total = census.agg(F.sum("revenue_cents").alias("total_cents"))
    return (
        census.join(F.broadcast(total))
        .select(
            "sourcing",
            "n_parts",
            "revenue_cents",
            F.expr("(10000 * revenue_cents) div total_cents").alias(
                "revenue_share_bp"
            ),
        )
        .orderBy("sourcing")
    )


@query(
    "q_supplier_pareto_depth",
    oracle=f"""
    WITH ns AS (
      SELECT s.s_nationkey AS nk, l.l_suppkey AS sk,
             CAST(sum({_CENTS.format(col="l.l_extendedprice")}) AS BIGINT)
               AS cents
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT nk, cents,
             CAST(sum(cents) OVER (PARTITION BY nk) AS BIGINT) AS total,
             CAST(sum(cents) OVER (PARTITION BY nk ORDER BY cents DESC, sk
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum,
             row_number() OVER (PARTITION BY nk ORDER BY cents DESC, sk)
               AS rnk
      FROM ns
    )
    SELECT nk AS s_nationkey,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(min(CASE WHEN 10 * cum >= 8 * total THEN rnk END) AS BIGINT)
             AS suppliers_to_80,
           CAST(max(CASE WHEN rnk = 1
                         THEN (10000 * cents) // total END) AS BIGINT)
             AS top_share_bp
    FROM ranked GROUP BY 1 ORDER BY s_nationkey
    """,
)
def q_supplier_pareto_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AL al3 — Pareto depth: per nation, how many suppliers (ranked
    by revenue) it takes to cover 80% of national volume (``10·cum ≥
    8·total`` — integer, no 0.8 float), plus the top supplier's share
    in bp (the key-man risk number). Deterministic ties: revenue DESC,
    supplier key.

    Scale: same bounded (nation, supplier) relation as al1; all three
    windows share ONE partition key (nation), so Catalyst plans a
    single exchange + sort over |suppliers| rows."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    ns = (
        li.join(
            F.broadcast(sup.select("s_suppkey", "s_nationkey")),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy(F.col("s_nationkey").alias("nk"), F.col("l_suppkey").alias("sk"))
        .agg(
            F.sum(F.expr(_CENTS.format(col="l_extendedprice")))
            .cast("long")
            .alias("cents")
        )
    )
    w_all = Window.partitionBy("nk")
    w_ord = Window.partitionBy("nk").orderBy(F.desc("cents"), "sk")
    ranked = (
        ns.withColumn("total", F.sum("cents").over(w_all).cast("long"))
        .withColumn(
            "cum",
            F.sum("cents")
            .over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        )
        .withColumn("rnk", F.row_number().over(w_ord))
    )
    return (
        ranked.groupBy(F.col("nk").alias("s_nationkey"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.min(
                F.when(
                    F.expr("10 * cum >= 8 * total"), F.col("rnk")
                )
            )
            .cast("long")
            .alias("suppliers_to_80"),
            F.max(
                F.when(F.col("rnk") == 1, F.expr("(10000 * cents) div total"))
            )
            .cast("long")
            .alias("top_share_bp"),
        )
        .orderBy("s_nationkey")
    )


@query(
    "q_supplier_part_degree",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT l_suppkey AS sk, l_partkey AS pk FROM lineitem
    ),
    supp_deg AS (
      SELECT sk, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1
    ),
    part_deg AS (
      SELECT pk, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1
    ),
    bands AS (
      SELECT 'parts_per_supplier' AS side,
             CASE WHEN deg <= 10 THEN 'a_le10'
                  WHEN deg <= 100 THEN 'b_le100'
                  ELSE 'c_gt100' END AS band,
             deg
      FROM supp_deg
      UNION ALL
      SELECT 'suppliers_per_part' AS side,
             CASE WHEN deg <= 2 THEN 'a_le2'
                  WHEN deg <= 4 THEN 'b_le4'
                  ELSE 'c_gt4' END AS band,
             deg
      FROM part_deg
    )
    SELECT side, band, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(deg) AS BIGINT) AS total_edges,
           CAST(max(deg) AS BIGINT) AS max_degree
    FROM bands GROUP BY 1, 2 ORDER BY side, band
    """,
)
def q_supplier_part_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AL al4 — bipartite degree profile: the distinct supplier⋈part
    edge set, banded from BOTH sides — parts-per-supplier (catalog
    breadth) and suppliers-per-part (al2's redundancy, as a
    distribution). Each side's Σdeg equals the edge count — the
    built-in reconciliation check.

    Scale: the edge set is materialized ONCE (distinct = one shuffle,
    then localCheckpoint — Catalyst would otherwise re-scan the fact
    for each side) and both degree censuses run on the bounded
    |edges| relation."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        li.select(F.col("l_suppkey").alias("sk"), F.col("l_partkey").alias("pk"))
        .distinct()
        .localCheckpoint()  # |edges| rows; both sides below reuse it
    )
    supp_deg = edges.groupBy("sk").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    part_deg = edges.groupBy("pk").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    supp_side = supp_deg.select(
        F.lit("parts_per_supplier").alias("side"),
        F.when(F.col("deg") <= 10, "a_le10")
        .when(F.col("deg") <= 100, "b_le100")
        .otherwise("c_gt100")
        .alias("band"),
        "deg",
    )
    part_side = part_deg.select(
        F.lit("suppliers_per_part").alias("side"),
        F.when(F.col("deg") <= 2, "a_le2")
        .when(F.col("deg") <= 4, "b_le4")
        .otherwise("c_gt4")
        .alias("band"),
        "deg",
    )
    return (
        supp_side.unionByName(part_side)
        .groupBy("side", "band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("deg").cast("long").alias("total_edges"),
            F.max("deg").cast("long").alias("max_degree"),
        )
        .orderBy("side", "band")
    )


@query(
    "q_acctbal_risk_tiers",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey AS sk,
             CAST(sum({_CENTS.format(col="l_extendedprice")}) AS BIGINT)
               AS cents
      FROM lineitem GROUP BY 1
    ),
    tiered AS (
      SELECT CASE WHEN {_CENTS.format(col="s.s_acctbal")} < 0 THEN 'a_negative'
                  WHEN {_CENTS.format(col="s.s_acctbal")} < 500000
                    THEN 'b_under_5k'
                  ELSE 'c_healthy' END AS tier,
             COALESCE(r.cents, 0) AS cents
      FROM supplier s LEFT JOIN rev r ON s.s_suppkey = r.sk
    )
    SELECT tier, CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(sum(cents) AS BIGINT) AS revenue_cents,
           (10000 * CAST(sum(cents) AS BIGINT))
             // CAST((SELECT sum(cents) FROM tiered) AS BIGINT)
             AS revenue_share_bp
    FROM tiered GROUP BY 1 ORDER BY tier
    """,
)
def q_acctbal_risk_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AL al5 — financial-stress tiers: suppliers tiered by account
    balance (negative / under $5k / healthy — negative cents use the
    same floor(x·100 + 0.5) grid, where floor ≠ trunc matters and both
    engines agree), with the revenue share flowing through each tier.
    A LEFT join from the dim keeps zero-revenue suppliers visible.

    Scale: one suppkey partial agg over the fact (bounded output),
    LEFT-joined UNDER the dim (|suppliers| rows), 3-row census +
    broadcast total."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("sk")).agg(
        F.sum(F.expr(_CENTS.format(col="l_extendedprice")))
        .cast("long")
        .alias("cents")
    )
    bal = F.expr(_CENTS.format(col="s_acctbal"))
    tiered = (
        sup.select("s_suppkey", bal.alias("bal_cents"))
        .join(rev, F.col("s_suppkey") == rev.sk, "left")
        .select(
            F.when(F.col("bal_cents") < 0, "a_negative")
            .when(F.col("bal_cents") < 500000, "b_under_5k")
            .otherwise("c_healthy")
            .alias("tier"),
            F.coalesce(F.col("cents"), F.lit(0)).alias("cents"),
        )
    )
    census = tiered.groupBy("tier").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )
    total = census.agg(F.sum("revenue_cents").alias("total_cents"))
    return (
        census.join(F.broadcast(total))
        .select(
            "tier",
            "n_suppliers",
            "revenue_cents",
            F.expr("(10000 * revenue_cents) div total_cents").alias(
                "revenue_share_bp"
            ),
        )
        .orderBy("tier")
    )
