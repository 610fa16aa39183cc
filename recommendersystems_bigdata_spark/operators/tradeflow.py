"""Trade-flow matrix analytics (SURVEY.md §2.AY, round 9).

The bilateral-flow family over the classic TPC-H star: every line item
is a FLOW from the supplier's nation to the ordering customer's nation.
The suite reports the full nation×nation matrix, per-nation trade
balances (exports − imports on the same ledger, so the global balance
is zero by construction — the conservation test), region-block rollups
with intra-region shares, and the top corridors. The join shape is the
canonical TPC-H Q5/Q10 star and is deliberately spelled that way:
customer and supplier are SF-scaled relations (1.5 B / 100 M rows at
100 TB), so they join by SHUFFLE on their keys — never broadcast —
while the true dims (nation, region) broadcast.

Exactness: flows in exact revenue cents (``floor(price·100 + 0.5)``),
shares in truncated bp scaled 128-bit (DECIMAL(38,0)/HUGEINT) on the
bounded censuses (corpus-revenue × 10⁴ exceeds 2⁶³ — the repo-wide
convention), balances as plain BIGINT differences.

Spark-first shape, sized for 100 TB:
- ONE flow census build: lineitem⋈orders (orderkey, sort-merge) ⋈
  customer (custkey, shuffle) ⋈ supplier (suppkey, shuffle) with nation
  dims broadcast — then partial-aggregated to the ≤|nations|² census.
  Catalyst prunes every relation to its join key + 1-2 columns.
- The census is localCheckpoint-pinned in every query that reads it
  twice (matrix + totals); all reports are arithmetic on ≤625 rows.
- ay4's top-k lowers to TakeOrderedAndProject over the census.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query

_CENTS = "CAST(floor({col} * 100 + 0.5) AS BIGINT)"

# DuckDB: the (customer nation, supplier nation) flow census.
_FLOW_SQL = f"""
flows AS (
  SELECT nc.n_name AS cust_nation, ns.n_name AS supp_nation,
         nc.n_regionkey AS cust_rk, ns.n_regionkey AS supp_rk,
         CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum({_CENTS.format(col="l.l_extendedprice")}) AS BIGINT)
           AS flow_cents
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation nc ON c.c_nationkey = nc.n_nationkey
  JOIN nation ns ON s.s_nationkey = ns.n_nationkey
  GROUP BY 1, 2, 3, 4
)
"""


def _flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cust_nation, supp_nation, cust_rk, supp_rk, n_lines, flow_cents):
    the bilateral flow census — the suite's single multi-join fact pass."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    nc = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("nc_key"),
            F.col("n_name").alias("cust_nation"),
            F.col("n_regionkey").alias("cust_rk"),
        )
    )
    ns = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("ns_key"),
            F.col("n_name").alias("supp_nation"),
            F.col("n_regionkey").alias("supp_rk"),
        )
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nc, F.col("c_nationkey") == F.col("nc_key"))
        .join(ns, F.col("s_nationkey") == F.col("ns_key"))
        .groupBy("cust_nation", "supp_nation", "cust_rk", "supp_rk")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.expr(_CENTS.format(col="l_extendedprice")))
            .cast("long")
            .alias("flow_cents"),
        )
    )


@query(
    "q_trade_matrix",
    oracle=f"""
    WITH {_FLOW_SQL}
    , tot AS (SELECT CAST(sum(flow_cents) AS BIGINT) AS t FROM flows)
    SELECT cust_nation, supp_nation, n_lines, flow_cents,
           CAST((10000 * CAST(flow_cents AS HUGEINT)) // t AS BIGINT)
             AS flow_share_bp,
           CASE WHEN cust_nation = supp_nation THEN 'domestic'
                ELSE 'cross_border' END AS flow_kind
    FROM flows, tot ORDER BY cust_nation, supp_nation
    """,
)
def q_trade_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AY ay1 — the bilateral trade matrix: revenue flow from each
    supplier nation to each customer nation in exact cents, with line
    counts, the flow's share of total trade in bp, and a
    domestic/cross-border label. The full matrix is the ledger ay2–ay4
    are views of (the balance conservation test re-derives them from
    this output).

    Scale: the canonical Q5-star — lineitem⋈orders SMJ, shuffle joins
    under the SF-scaled customer/supplier relations (never broadcast),
    nation dims broadcast, partial-aggregated to ≤|nations|² rows; the
    census is checkpoint-pinned so the totals pass reads 625 rows, not
    the fact."""
    flows = _flows(spark, sf_dir).localCheckpoint()
    tot = flows.agg(F.sum("flow_cents").cast("long").alias("t"))
    return (
        flows.crossJoin(F.broadcast(tot))
        .select(
            "cust_nation",
            "supp_nation",
            "n_lines",
            "flow_cents",
            F.expr(
                "CAST((CAST(10000 AS DECIMAL(38,0)) * flow_cents) div t"
                " AS BIGINT)"
            ).alias("flow_share_bp"),
            F.when(
                F.col("cust_nation") == F.col("supp_nation"), "domestic"
            )
            .otherwise("cross_border")
            .alias("flow_kind"),
        )
        .orderBy("cust_nation", "supp_nation")
    )


@query(
    "q_trade_balance",
    oracle=f"""
    WITH {_FLOW_SQL}
    , exports AS (
      SELECT supp_nation AS nation,
             CAST(sum(flow_cents) AS BIGINT) AS export_cents
      FROM flows WHERE cust_nation <> supp_nation GROUP BY 1
    ),
    imports AS (
      SELECT cust_nation AS nation,
             CAST(sum(flow_cents) AS BIGINT) AS import_cents
      FROM flows WHERE cust_nation <> supp_nation GROUP BY 1
    )
    SELECT COALESCE(e.nation, i.nation) AS nation,
           COALESCE(export_cents, 0) AS export_cents,
           COALESCE(import_cents, 0) AS import_cents,
           COALESCE(export_cents, 0) - COALESCE(import_cents, 0)
             AS balance_cents,
           (10000 * (COALESCE(export_cents, 0) - COALESCE(import_cents, 0)))
             // nullif(COALESCE(export_cents, 0)
                       + COALESCE(import_cents, 0), 0) AS balance_bp
    FROM exports e FULL OUTER JOIN imports i ON e.nation = i.nation
    ORDER BY nation
    """,
)
def q_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AY ay2 — per-nation trade balance over CROSS-BORDER flows:
    exports (the nation supplies a foreign customer), imports (its
    customers buy foreign), the balance in cents and as bp of the
    nation's cross-border turnover (signed÷positive truncation — the
    div/`//` toward-zero contract). Balances sum to zero across
    nations by ledger construction (the conservation test).

    Scale: two conditional rollups of the pinned 625-row census,
    full-outer merged on nation — nothing fact-sized after the census
    build."""
    flows = _flows(spark, sf_dir).localCheckpoint()
    xb = flows.where(F.col("cust_nation") != F.col("supp_nation"))
    exports = xb.groupBy(F.col("supp_nation").alias("nation")).agg(
        F.sum("flow_cents").cast("long").alias("export_cents")
    )
    imports = xb.groupBy(F.col("cust_nation").alias("nation")).agg(
        F.sum("flow_cents").cast("long").alias("import_cents")
    )
    return (
        exports.join(imports, "nation", "full_outer")
        .select(
            "nation",
            F.coalesce("export_cents", F.lit(0)).alias("export_cents"),
            F.coalesce("import_cents", F.lit(0)).alias("import_cents"),
        )
        .select(
            "nation",
            "export_cents",
            "import_cents",
            (F.col("export_cents") - F.col("import_cents")).alias(
                "balance_cents"
            ),
            F.expr(
                "(10000 * (export_cents - import_cents))"
                " div nullif(export_cents + import_cents, 0)"
            ).alias("balance_bp"),
        )
        .orderBy("nation")
    )


@query(
    "q_trade_region_blocks",
    oracle=f"""
    WITH {_FLOW_SQL}
    , blocks AS (
      SELECT rc.r_name AS cust_region, rs.r_name AS supp_region,
             CAST(sum(n_lines) AS BIGINT) AS n_lines,
             CAST(sum(flow_cents) AS BIGINT) AS flow_cents
      FROM flows
      JOIN region rc ON flows.cust_rk = rc.r_regionkey
      JOIN region rs ON flows.supp_rk = rs.r_regionkey
      GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(sum(flow_cents) AS BIGINT) AS t FROM blocks)
    SELECT cust_region, supp_region, n_lines, flow_cents,
           CAST((10000 * CAST(flow_cents AS HUGEINT)) // t AS BIGINT)
             AS flow_share_bp,
           CASE WHEN cust_region = supp_region THEN 'intra_region'
                ELSE 'inter_region' END AS block_kind
    FROM blocks, tot ORDER BY cust_region, supp_region
    """,
)
def q_trade_region_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AY ay3 — the region-block rollup: the 5×5 region matrix with
    flow cents, share of world trade in bp, and intra/inter-region
    labels — the "trade bloc" read of ay1's ledger (region shares sum
    to the matrix total by construction).

    Scale: the pinned nation census rolls up under two broadcast
    region lookups to ≤25 rows; the 1-row total is the adjudicated
    broadcast cross join."""
    flows = _flows(spark, sf_dir).localCheckpoint()
    region = load_table(spark, sf_dir, "region")
    rc = F.broadcast(
        region.select(
            F.col("r_regionkey").alias("rc_key"),
            F.col("r_name").alias("cust_region"),
        )
    )
    rs = F.broadcast(
        region.select(
            F.col("r_regionkey").alias("rs_key"),
            F.col("r_name").alias("supp_region"),
        )
    )
    blocks = (
        flows.join(rc, flows.cust_rk == F.col("rc_key"))
        .join(rs, flows.supp_rk == F.col("rs_key"))
        .groupBy("cust_region", "supp_region")
        .agg(
            F.sum("n_lines").cast("long").alias("n_lines"),
            F.sum("flow_cents").cast("long").alias("flow_cents"),
        )
    )
    tot = blocks.agg(F.sum("flow_cents").cast("long").alias("t"))
    return (
        blocks.crossJoin(F.broadcast(tot))
        .select(
            "cust_region",
            "supp_region",
            "n_lines",
            "flow_cents",
            F.expr(
                "CAST((CAST(10000 AS DECIMAL(38,0)) * flow_cents) div t"
                " AS BIGINT)"
            ).alias("flow_share_bp"),
            F.when(
                F.col("cust_region") == F.col("supp_region"), "intra_region"
            )
            .otherwise("inter_region")
            .alias("block_kind"),
        )
        .orderBy("cust_region", "supp_region")
    )


@query(
    "q_trade_top_corridors",
    oracle=f"""
    WITH {_FLOW_SQL}
    SELECT cust_nation, supp_nation, n_lines, flow_cents
    FROM flows WHERE cust_nation <> supp_nation
    ORDER BY flow_cents DESC, cust_nation, supp_nation LIMIT 10
    """,
)
def q_trade_top_corridors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AY ay4 — the 10 busiest cross-border corridors by flow cents
    (ties broken on the nation pair for a total order). The "where do
    we actually ship" one-pager.

    Scale: orderBy+limit over the ≤625-row census lowers to
    TakeOrderedAndProject (plan-asserted) — no global sort."""
    return (
        _flows(spark, sf_dir)
        .where(F.col("cust_nation") != F.col("supp_nation"))
        .select("cust_nation", "supp_nation", "n_lines", "flow_cents")
        .orderBy(
            F.col("flow_cents").desc(), "cust_nation", "supp_nation"
        )
        .limit(10)
    )
