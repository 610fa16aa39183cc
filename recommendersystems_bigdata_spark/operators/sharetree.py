"""Share-of-parent rollup trees (SURVEY.md §2.BV, round 10).

The drill-down report every BI layer renders from a revenue cube —
each node's share OF ITS PARENT, not just of the grand total — which
§2.D's plain ROLLUP/CUBE aggregates and §2.Z's recursive hierarchies
never publish:

- bv1: the full 3-level tree (region → customer nation → market
  segment) with revenue, share-of-parent bp and share-of-total bp at
  every node.
- bv2: the dominant-child report — per parent node, its largest child
  and whether it holds more than half the parent (the cleared compare
  ``2·child > parent``).
- bv3: the level profile — per level, node count, the EXACT total
  (identical at every level: the conservation the tree must obey, and
  publishes so drift is visible), and min/max/truncated-mean
  share-of-parent bp.
- bv4: the top-10 leaf paths — 'region>nation>segment' strings with
  chained shares at all three denominators.

Exactness: revenue is the exact order-cents sum (floor(o_totalprice·
100 + 0.5)); every share is ``(10⁴·child) div parent`` on positive
cents; level totals recompose exactly because every level REAGGREGATES
THE SAME LEAF CENSUS — no second fact pass, no float drift between
levels. Deterministic tiebreaks: (revenue desc, name asc) for
dominant children and leaf top-10.

Spark-first shape, sized for 100 TB: ONE fact pass partial-aggregates
orders to the ≤|regions|·|nations|·|segments| leaf census (125 cells
here, bounded by dim cardinalities at any SF — the customer attach is
UNHINTED so AQE broadcasts under the threshold and shuffle-joins
beyond, the nation/region dims broadcast explicitly); every level,
share join, and top-k is census-side arithmetic on ≤625 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from recommendersystems_bigdata_spark.catalog import load_tables
from recommendersystems_bigdata_spark.registry import query

_CENTS = "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
_DEC = "decimal(38,0)"

# DuckDB: the leaf census and the three level aggregates.
_TREE_DUCK = f"""
leaf AS (
  SELECT r.r_name, n.n_name, c.c_mktsegment AS segment,
         CAST(sum({_CENTS}) AS BIGINT) AS rev_cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2, 3
),
nat AS (
  SELECT r_name, n_name, CAST(sum(rev_cents) AS BIGINT) AS rev_cents
  FROM leaf GROUP BY 1, 2
),
reg AS (
  SELECT r_name, CAST(sum(rev_cents) AS BIGINT) AS rev_cents
  FROM leaf GROUP BY 1
),
tot AS (SELECT CAST(sum(rev_cents) AS BIGINT) AS rev_cents FROM leaf)
"""


def _levels(spark: SparkSession, sf_dir: str):
    """(leaf, nat, reg, tot) census DataFrames from one fact pass."""
    orders, customer, nation, region = load_tables(
        spark, sf_dir, "orders", "customer", "nation", "region"
    )
    dim = (
        customer.select("c_custkey", "c_nationkey", "c_mktsegment")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey", "r_name", "n_name", "c_mktsegment")
    )
    leaf = (
        orders.join(dim, orders.o_custkey == F.col("c_custkey"))
        .groupBy("r_name", "n_name", F.col("c_mktsegment").alias("segment"))
        .agg(F.expr(f"CAST(sum({_CENTS}) AS BIGINT)").alias("rev_cents"))
        .localCheckpoint()
    )
    nat = leaf.groupBy("r_name", "n_name").agg(
        F.sum("rev_cents").cast("long").alias("rev_cents")
    )
    reg = leaf.groupBy("r_name").agg(
        F.sum("rev_cents").cast("long").alias("rev_cents")
    )
    tot = leaf.agg(F.sum("rev_cents").cast("long").alias("rev_cents"))
    return leaf, nat, reg, tot


_BP = "CAST((10000 * {c}) div {p} AS BIGINT)"
_BP_DUCK = "CAST((10000 * {c}) // {p} AS BIGINT)"


@query(
    "q_share_tree",
    oracle=f"""
    WITH {_TREE_DUCK}
    SELECT CAST(1 AS BIGINT) AS level, r.r_name,
           CAST(NULL AS VARCHAR) AS n_name, CAST(NULL AS VARCHAR) AS segment,
           r.rev_cents,
           {_BP_DUCK.format(c="r.rev_cents", p="t.rev_cents")} AS share_parent_bp,
           {_BP_DUCK.format(c="r.rev_cents", p="t.rev_cents")} AS share_total_bp
    FROM reg r, tot t
    UNION ALL
    SELECT 2, n.r_name, n.n_name, NULL, n.rev_cents,
           {_BP_DUCK.format(c="n.rev_cents", p="r.rev_cents")},
           {_BP_DUCK.format(c="n.rev_cents", p="t.rev_cents")}
    FROM nat n JOIN reg r ON n.r_name = r.r_name, tot t
    UNION ALL
    SELECT 3, l.r_name, l.n_name, l.segment, l.rev_cents,
           {_BP_DUCK.format(c="l.rev_cents", p="n.rev_cents")},
           {_BP_DUCK.format(c="l.rev_cents", p="t.rev_cents")}
    FROM leaf l JOIN nat n ON l.r_name = n.r_name AND l.n_name = n.n_name,
         tot t
    ORDER BY level, r_name, n_name NULLS FIRST, segment NULLS FIRST
    """,
)
def q_share_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BV bv1 — the 3-level share tree: every region, nation, and
    (nation, segment) node with exact revenue cents, share of its
    parent in bp, and share of the grand total in bp. All three levels
    reaggregate ONE leaf census, so levels recompose exactly.

    Scale: one fact pass to the ≤125-cell leaf census; every join here
    is census-vs-census with 1-row/25-row broadcasts."""
    leaf, nat, reg, tot = _levels(spark, sf_dir)
    l1 = reg.crossJoin(F.broadcast(tot.select(F.col("rev_cents").alias("t")))).select(
        F.lit(1).cast("long").alias("level"),
        "r_name",
        F.lit(None).cast("string").alias("n_name"),
        F.lit(None).cast("string").alias("segment"),
        "rev_cents",
        F.expr(_BP.format(c="rev_cents", p="t")).alias("share_parent_bp"),
        F.expr(_BP.format(c="rev_cents", p="t")).alias("share_total_bp"),
    )
    l2 = (
        nat.join(
            F.broadcast(reg.select("r_name", F.col("rev_cents").alias("p"))),
            "r_name",
        )
        .crossJoin(F.broadcast(tot.select(F.col("rev_cents").alias("t"))))
        .select(
            F.lit(2).cast("long").alias("level"),
            "r_name",
            "n_name",
            F.lit(None).cast("string").alias("segment"),
            "rev_cents",
            F.expr(_BP.format(c="rev_cents", p="p")).alias("share_parent_bp"),
            F.expr(_BP.format(c="rev_cents", p="t")).alias("share_total_bp"),
        )
    )
    l3 = (
        leaf.join(
            F.broadcast(
                nat.select("r_name", "n_name", F.col("rev_cents").alias("p"))
            ),
            ["r_name", "n_name"],
        )
        .crossJoin(F.broadcast(tot.select(F.col("rev_cents").alias("t"))))
        .select(
            F.lit(3).cast("long").alias("level"),
            "r_name",
            "n_name",
            "segment",
            "rev_cents",
            F.expr(_BP.format(c="rev_cents", p="p")).alias("share_parent_bp"),
            F.expr(_BP.format(c="rev_cents", p="t")).alias("share_total_bp"),
        )
    )
    return l1.unionAll(l2).unionAll(l3).orderBy(
        "level",
        "r_name",
        F.col("n_name").asc_nulls_first(),
        F.col("segment").asc_nulls_first(),
    )


@query(
    "q_tree_dominant_child",
    oracle=f"""
    WITH {_TREE_DUCK},
    kids AS (
      SELECT 'ALL' AS parent, r_name AS child, rev_cents,
             (SELECT rev_cents FROM tot) AS parent_cents
      FROM reg
      UNION ALL
      SELECT n.r_name, n.n_name, n.rev_cents, r.rev_cents
      FROM nat n JOIN reg r ON n.r_name = r.r_name
      UNION ALL
      SELECT l.n_name, l.segment, l.rev_cents, n.rev_cents
      FROM leaf l JOIN nat n
        ON l.r_name = n.r_name AND l.n_name = n.n_name
    ),
    best AS (
      SELECT parent, child, rev_cents, parent_cents,
             row_number() OVER (PARTITION BY parent
                                ORDER BY rev_cents DESC, child) AS rn
      FROM kids
    )
    SELECT parent, child AS top_child, rev_cents AS child_cents,
           parent_cents,
           {_BP_DUCK.format(c="rev_cents", p="parent_cents")} AS share_bp,
           2 * rev_cents > parent_cents AS concentrated
    FROM best WHERE rn = 1 ORDER BY parent
    """,
)
def q_tree_dominant_child(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BV bv2 — the dominant-child report: for every parent node
    (the root 'ALL', each region, each nation), its largest child by
    (revenue desc, name asc), the child's share bp, and the cleared
    majority flag ``2·child > parent``. Parents here are keyed by name
    — nation names are globally unique in this schema, so the flat key
    is unambiguous.

    Scale: the child relation is the 155-row union of the three
    bounded levels; one partitioned window picks the top child."""
    leaf, nat, reg, tot = _levels(spark, sf_dir)
    kids = (
        reg.crossJoin(
            F.broadcast(tot.select(F.col("rev_cents").alias("parent_cents")))
        )
        .select(
            F.lit("ALL").alias("parent"),
            F.col("r_name").alias("child"),
            "rev_cents",
            "parent_cents",
        )
        .unionAll(
            nat.join(
                F.broadcast(
                    reg.select("r_name", F.col("rev_cents").alias("parent_cents"))
                ),
                "r_name",
            ).select(
                F.col("r_name").alias("parent"),
                F.col("n_name").alias("child"),
                "rev_cents",
                "parent_cents",
            )
        )
        .unionAll(
            leaf.join(
                F.broadcast(
                    nat.select(
                        "r_name", "n_name", F.col("rev_cents").alias("parent_cents")
                    )
                ),
                ["r_name", "n_name"],
            ).select(
                F.col("n_name").alias("parent"),
                F.col("segment").alias("child"),
                "rev_cents",
                "parent_cents",
            )
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("parent").orderBy(
        F.col("rev_cents").desc(), F.col("child").asc()
    )
    return (
        kids.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "parent",
            F.col("child").alias("top_child"),
            F.col("rev_cents").alias("child_cents"),
            "parent_cents",
            F.expr(_BP.format(c="rev_cents", p="parent_cents")).alias(
                "share_bp"
            ),
            (2 * F.col("rev_cents") > F.col("parent_cents")).alias(
                "concentrated"
            ),
        )
        .orderBy("parent")
    )


@query(
    "q_tree_level_profile",
    oracle=f"""
    WITH {_TREE_DUCK},
    shares AS (
      SELECT 1 AS level, r.rev_cents,
             {_BP_DUCK.format(c="r.rev_cents", p="t.rev_cents")} AS sp
      FROM reg r, tot t
      UNION ALL
      SELECT 2, n.rev_cents,
             {_BP_DUCK.format(c="n.rev_cents", p="r.rev_cents")}
      FROM nat n JOIN reg r ON n.r_name = r.r_name
      UNION ALL
      SELECT 3, l.rev_cents,
             {_BP_DUCK.format(c="l.rev_cents", p="n.rev_cents")}
      FROM leaf l JOIN nat n ON l.r_name = n.r_name AND l.n_name = n.n_name
    )
    SELECT CAST(level AS BIGINT) AS level,
           CAST(count(*) AS BIGINT) AS nodes,
           CAST(sum(rev_cents) AS BIGINT) AS level_total_cents,
           CAST(min(sp) AS BIGINT) AS min_share_bp,
           CAST(max(sp) AS BIGINT) AS max_share_bp,
           CAST(sum(sp) // count(*) AS BIGINT) AS mean_share_bp
    FROM shares GROUP BY level ORDER BY level
    """,
)
def q_tree_level_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BV bv3 — the level profile: per tree level, node count, the
    EXACT level total (identical across all three rows — the
    conservation the single-leaf-census design guarantees and this
    query publishes), and min/max/truncated-mean share-of-parent bp.

    Scale: arithmetic over the 155-row share union."""
    leaf, nat, reg, tot = _levels(spark, sf_dir)
    s1 = reg.crossJoin(
        F.broadcast(tot.select(F.col("rev_cents").alias("p")))
    ).select(
        F.lit(1).cast("long").alias("level"),
        "rev_cents",
        F.expr(_BP.format(c="rev_cents", p="p")).alias("sp"),
    )
    s2 = nat.join(
        F.broadcast(reg.select("r_name", F.col("rev_cents").alias("p"))),
        "r_name",
    ).select(
        F.lit(2).cast("long").alias("level"),
        "rev_cents",
        F.expr(_BP.format(c="rev_cents", p="p")).alias("sp"),
    )
    s3 = leaf.join(
        F.broadcast(
            nat.select("r_name", "n_name", F.col("rev_cents").alias("p"))
        ),
        ["r_name", "n_name"],
    ).select(
        F.lit(3).cast("long").alias("level"),
        "rev_cents",
        F.expr(_BP.format(c="rev_cents", p="p")).alias("sp"),
    )
    return (
        s1.unionAll(s2)
        .unionAll(s3)
        .groupBy("level")
        .agg(
            F.count(F.lit(1)).cast("long").alias("nodes"),
            F.sum("rev_cents").cast("long").alias("level_total_cents"),
            F.min("sp").cast("long").alias("min_share_bp"),
            F.max("sp").cast("long").alias("max_share_bp"),
            F.expr("CAST(sum(sp) div count(*) AS BIGINT)").alias(
                "mean_share_bp"
            ),
        )
        .orderBy("level")
    )


@query(
    "q_tree_leaf_paths",
    oracle=f"""
    WITH {_TREE_DUCK}
    SELECT l.r_name || '>' || l.n_name || '>' || l.segment AS path,
           l.rev_cents,
           {_BP_DUCK.format(c="l.rev_cents", p="n.rev_cents")}
             AS share_nation_bp,
           {_BP_DUCK.format(c="l.rev_cents", p="r.rev_cents")}
             AS share_region_bp,
           {_BP_DUCK.format(c="l.rev_cents", p="t.rev_cents")}
             AS share_total_bp
    FROM leaf l
    JOIN nat n ON l.r_name = n.r_name AND l.n_name = n.n_name
    JOIN reg r ON l.r_name = r.r_name, tot t
    ORDER BY l.rev_cents DESC, path LIMIT 10
    """,
)
def q_tree_leaf_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BV bv4 — the top-10 leaf paths: 'region>nation>segment'
    strings ranked by (revenue desc, path asc) with the leaf's share
    at all three denominators (nation, region, total) — the drill-path
    hotlist a dashboard pins.

    Scale: census-side; the top-10 lowers to TakeOrderedAndProject."""
    leaf, nat, reg, tot = _levels(spark, sf_dir)
    return (
        leaf.join(
            F.broadcast(
                nat.select("r_name", "n_name", F.col("rev_cents").alias("pn"))
            ),
            ["r_name", "n_name"],
        )
        .join(
            F.broadcast(reg.select("r_name", F.col("rev_cents").alias("pr"))),
            "r_name",
        )
        .crossJoin(F.broadcast(tot.select(F.col("rev_cents").alias("t"))))
        .select(
            F.concat_ws(">", "r_name", "n_name", "segment").alias("path"),
            "rev_cents",
            F.expr(_BP.format(c="rev_cents", p="pn")).alias(
                "share_nation_bp"
            ),
            F.expr(_BP.format(c="rev_cents", p="pr")).alias(
                "share_region_bp"
            ),
            F.expr(_BP.format(c="rev_cents", p="t")).alias("share_total_bp"),
        )
        .orderBy(F.col("rev_cents").desc(), "path")
        .limit(10)
    )
