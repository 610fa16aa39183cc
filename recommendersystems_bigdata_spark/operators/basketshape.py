"""Basket-shape censuses (SURVEY.md §2.BR, round 9).

The structural profile of orders — how many lines, how broad, how the
value distributes across sizes and line positions — the table the
recommender (§2.K) and fulfillment (§2.AJ) suites implicitly assume
and nothing yet publishes:

- br1: the order-size census — orders, share, exact revenue and
  truncated average order value per lines-per-order count.
- br2: the basket-breadth profile — per size, the exact mean distinct
  brands per order in milli and the multi-brand share: breadth is the
  cross-sell surface.
- br3: the size-value mix — order share vs revenue share per size
  BAND (1 / 2–3 / 4–5 / 6–7), the "big baskets carry the revenue"
  quantification.
- br4: the line-position profile — per line number, exact quantity
  and price means and the return rate: do later lines in an order
  behave differently (position effects the packer should know about).

Exactness: counts/cents exact; every mean/share is a truncating
division of non-negative integers; per-order distinct-brand counts
are exact two-level aggregations, never approximations.

Spark-first shape, sized for 100 TB: ONE lineitem pass per query,
partial-aggregated first to the per-order relation (shuffle keyed on
the order — the natural key, skew-free) and reduced to a bounded
census (≤7 sizes, 4 bands, ≤7 line numbers); br2's brand lookup
attaches the part dim UNHINTED before the per-order reduction; grand
totals ride 1-row broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from recommendersystems_bigdata_spark.catalog import load_table, load_tables
from recommendersystems_bigdata_spark.registry import query

_PRICE_E2 = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
_DISC_E2 = "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)"
_REV_E4 = f"{_PRICE_E2} * (100 - {_DISC_E2})"
_QTY = "CAST(floor(l_quantity + 0.5) AS BIGINT)"
_DEC = "decimal(38,0)"

_ORDER_SQL = f"""
per_order AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(CAST({_REV_E4} AS HUGEINT)) // 100 AS BIGINT) AS rev_cents
  FROM lineitem GROUP BY l_orderkey
)
"""

_BAND = (
    "CASE WHEN n_lines = 1 THEN '1' WHEN n_lines <= 3 THEN '2-3'"
    " WHEN n_lines <= 5 THEN '4-5' ELSE '6-7' END"
)


@query(
    "q_order_size_census",
    oracle=f"""
    WITH {_ORDER_SQL},
    census AS (
      SELECT n_lines, CAST(count(*) AS BIGINT) AS orders,
             CAST(sum(CAST(rev_cents AS HUGEINT)) AS HUGEINT) AS rev
      FROM per_order GROUP BY n_lines
    ),
    tot AS (SELECT CAST(sum(orders) AS BIGINT) AS n FROM census)
    SELECT n_lines, orders,
           CAST((10000 * orders) // n AS BIGINT) AS order_share_bp,
           CAST(rev AS BIGINT) AS rev_cents,
           CAST(rev // orders AS BIGINT) AS aov_cents
    FROM census, tot ORDER BY n_lines
    """,
)
def q_order_size_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BR br1 — the order-size census: per lines-per-order count,
    order count and share, exact revenue cents, and the truncated
    average order value — the base table for the size-value mix br3
    prices.

    Scale: one fact pass keyed on the order, reduced to the ≤7-row
    size census; the total rides a 1-row broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.expr(
            f"CAST(sum(CAST({_REV_E4} AS {_DEC})) div 100 AS BIGINT)"
        ).alias("rev_cents"),
    )
    census = per_order.groupBy("n_lines").agg(
        F.count(F.lit(1)).cast("long").alias("orders"),
        F.expr(f"CAST(sum(CAST(rev_cents AS {_DEC})) AS {_DEC})").alias(
            "rev"
        ),
    )
    tot = census.agg(F.sum("orders").cast("long").alias("n"))
    return (
        census.crossJoin(F.broadcast(tot))
        .select(
            "n_lines",
            "orders",
            F.expr("CAST((10000 * orders) div n AS BIGINT)").alias(
                "order_share_bp"
            ),
            F.expr("CAST(rev AS BIGINT)").alias("rev_cents"),
            F.expr("CAST(rev div orders AS BIGINT)").alias("aov_cents"),
        )
        .orderBy("n_lines")
    )


@query(
    "q_basket_breadth_profile",
    oracle="""
    WITH per_order AS (
      SELECT l.l_orderkey, CAST(count(*) AS BIGINT) AS n_lines,
             CAST(count(DISTINCT p.p_brand) AS BIGINT) AS n_brands
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY l.l_orderkey
    )
    SELECT n_lines, CAST(count(*) AS BIGINT) AS orders,
           CAST(sum(n_brands) AS BIGINT) AS brands_total,
           CAST((1000 * sum(n_brands)) // count(*) AS BIGINT)
             AS avg_brands_milli,
           CAST(count(*) FILTER (WHERE n_brands > 1) AS BIGINT)
             AS multi_brand_orders,
           CAST((10000 * count(*) FILTER (WHERE n_brands > 1)) // count(*)
                AS BIGINT) AS multi_brand_share_bp
    FROM per_order GROUP BY n_lines ORDER BY n_lines
    """,
)
def q_basket_breadth_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BR br2 — the basket-breadth profile: per order size, the
    exact mean distinct brands per order (milli) and the multi-brand
    order share — the cross-sell surface by basket size. The brand
    lookup attaches the part dim UNHINTED (§2.BO adjudication); the
    distinct count is an exact two-level aggregation under the order
    key.

    Scale: one fact pass; brand attach, per-order reduction, and the
    size census share the pipeline — output ≤7 rows."""
    lineitem, part = load_tables(spark, sf_dir, "lineitem", "part")
    per_order = (
        lineitem.join(
            part.select("p_partkey", "p_brand"),
            lineitem.l_partkey == F.col("p_partkey"),
        )
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.countDistinct("p_brand").cast("long").alias("n_brands"),
        )
    )
    return (
        per_order.groupBy("n_lines")
        .agg(
            F.count(F.lit(1)).cast("long").alias("orders"),
            F.sum("n_brands").cast("long").alias("brands_total"),
            F.count_if(F.col("n_brands") > 1)
            .cast("long")
            .alias("multi_brand_orders"),
        )
        .select(
            "n_lines",
            "orders",
            "brands_total",
            F.expr(
                "CAST((1000 * brands_total) div orders AS BIGINT)"
            ).alias("avg_brands_milli"),
            "multi_brand_orders",
            F.expr(
                "CAST((10000 * multi_brand_orders) div orders AS BIGINT)"
            ).alias("multi_brand_share_bp"),
        )
        .orderBy("n_lines")
    )


@query(
    "q_size_value_mix",
    oracle=f"""
    WITH {_ORDER_SQL},
    banded AS (
      SELECT {_BAND} AS size_band, rev_cents FROM per_order
    ),
    census AS (
      SELECT size_band, CAST(count(*) AS BIGINT) AS orders,
             CAST(sum(CAST(rev_cents AS HUGEINT)) AS HUGEINT) AS rev
      FROM banded GROUP BY size_band
    ),
    tot AS (
      SELECT CAST(sum(orders) AS BIGINT) AS n,
             CAST(sum(rev) AS HUGEINT) AS r
      FROM census
    )
    SELECT size_band, orders,
           CAST((10000 * orders) // n AS BIGINT) AS order_share_bp,
           CAST(rev AS BIGINT) AS rev_cents,
           CAST((10000 * rev) // r AS BIGINT) AS rev_share_bp
    FROM census, tot ORDER BY size_band
    """,
)
def q_size_value_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BR br3 — the size-value mix: per size band, the order share
    against the revenue share in bp — the exact quantification of
    "big baskets carry the revenue" (a band whose revenue share
    exceeds its order share is over-contributing).

    Scale: br1's per-order relation banded map-side into a 4-row
    census; totals ride a 1-row broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.expr(
            f"CAST(sum(CAST({_REV_E4} AS {_DEC})) div 100 AS BIGINT)"
        ).alias("rev_cents"),
    )
    census = (
        per_order.select(
            F.expr(_BAND).alias("size_band"), "rev_cents"
        )
        .groupBy("size_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("orders"),
            F.expr(
                f"CAST(sum(CAST(rev_cents AS {_DEC})) AS {_DEC})"
            ).alias("rev"),
        )
    )
    tot = census.agg(
        F.sum("orders").cast("long").alias("n"),
        F.expr(f"CAST(sum(rev) AS {_DEC})").alias("r"),
    )
    return (
        census.crossJoin(F.broadcast(tot))
        .select(
            "size_band",
            "orders",
            F.expr("CAST((10000 * orders) div n AS BIGINT)").alias(
                "order_share_bp"
            ),
            F.expr("CAST(rev AS BIGINT)").alias("rev_cents"),
            F.expr(
                f"CAST((CAST(10000 AS {_DEC}) * rev) div r AS BIGINT)"
            ).alias("rev_share_bp"),
        )
        .orderBy("size_band")
    )


@query(
    "q_line_position_profile",
    oracle=f"""
    SELECT l_linenumber,
           CAST(count(*) AS BIGINT) AS lines,
           CAST(sum({_QTY}) AS BIGINT) AS qty_total,
           CAST((1000 * sum({_QTY})) // count(*) AS BIGINT) AS avg_qty_milli,
           CAST(sum({_PRICE_E2}) // count(*) AS BIGINT) AS avg_price_cents,
           CAST((10000 * count(*) FILTER (WHERE l_returnflag = 'R'))
                // count(*) AS BIGINT) AS return_rate_bp
    FROM lineitem GROUP BY l_linenumber ORDER BY l_linenumber
    """,
)
def q_line_position_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BR br4 — the line-position profile: per line number within
    an order, the exact quantity/price means and the return rate —
    position effects (is the 7th line of a big order an afterthought
    that comes back more often). A pure map-side census: the line
    number is already a column, no window derives it.

    Scale: one partial-aggregated fact pass to the ≤7-row census; no
    joins, no windows."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linenumber")
        .agg(
            F.count(F.lit(1)).cast("long").alias("lines"),
            F.expr(f"CAST(sum({_QTY}) AS BIGINT)").alias("qty_total"),
            F.count_if(F.col("l_returnflag") == "R")
            .cast("long")
            .alias("_returns"),
            F.expr(f"CAST(sum({_PRICE_E2}) AS BIGINT)").alias("_price_sum"),
        )
        .select(
            "l_linenumber",
            "lines",
            "qty_total",
            F.expr("CAST((1000 * qty_total) div lines AS BIGINT)").alias(
                "avg_qty_milli"
            ),
            F.expr("CAST(_price_sum div lines AS BIGINT)").alias(
                "avg_price_cents"
            ),
            F.expr("CAST((10000 * _returns) div lines AS BIGINT)").alias(
                "return_rate_bp"
            ),
        )
        .orderBy("l_linenumber")
    )
