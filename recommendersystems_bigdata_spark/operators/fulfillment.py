"""Order-fulfillment lifecycle analytics (SURVEY.md §2.AJ, round 9).

How orders actually ship: per-order fill spans and split shipments,
multi-supplier sourcing, brand-level return rates, the order-value
waterfall, and a line-number contiguity audit. Everything derives from
ONE per-order aggregation of the lineitem fact (plus a broadcast dim
where a cut needs it) — the suite's design rule is that "order shape"
questions collapse the fact to |orders| rows FIRST and run analysis on
that bounded relation.

Exactness: cents/bp discipline as everywhere; the contiguity audit
(aj5) uses the arithmetic identity that line numbers 1..n are
contiguous iff ``count = max`` AND ``sum = max·(max+1)/2`` — two
partial-aggregable integers, no sorting, no windows.

Spark-first shape, sized for 100 TB:
- aj1/aj2/aj4/aj5 are fact → per-order partial agg (one shuffle on the
  order key) → bounded census. No windows over the fact, no fact⋈fact
  joins.
- aj3 broadcasts the part dim and pays one groupBy to |brands|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query

_CENTS = "CAST(floor({col} * 100 + 0.5) AS BIGINT)"
_BP = "CAST(floor({col} * 10000 + 0.5) AS BIGINT)"
_EPOCH_SPARK = "CAST(datediff(CAST({c} AS DATE), DATE '1970-01-01') AS BIGINT)"
_EPOCH_DUCK = "CAST(date_diff('day', DATE '1970-01-01', CAST({c} AS DATE)) AS BIGINT)"


@query(
    "q_order_fill_span",
    oracle=f"""
    WITH per_order AS (
      SELECT l_orderkey AS ok, CAST(count(*) AS BIGINT) AS n_lines,
             CAST(count(DISTINCT CAST(l_shipdate AS DATE)) AS BIGINT)
               AS ship_days,
             max({_EPOCH_DUCK.format(c="l_shipdate")})
               - min({_EPOCH_DUCK.format(c="l_shipdate")}) AS span_days
      FROM lineitem GROUP BY 1
    ),
    tagged AS (
      SELECT o.o_orderpriority, p.n_lines, p.span_days,
             CASE WHEN p.ship_days > 1 THEN 1 ELSE 0 END AS split_flag
      FROM per_order p JOIN orders o ON p.ok = o.o_orderkey
    )
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(n_lines) AS BIGINT) AS n_lines,
           CAST(sum(split_flag) AS BIGINT) AS n_split,
           (10000 * CAST(sum(split_flag) AS BIGINT))
             // CAST(count(*) AS BIGINT) AS split_share_bp,
           CAST(max(span_days) AS BIGINT) AS max_span_days,
           CAST(sum(span_days) AS BIGINT) // CAST(count(*) AS BIGINT)
             AS avg_span_days
    FROM tagged GROUP BY 1 ORDER BY o_orderpriority
    """,
)
def q_order_fill_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AJ aj1 — order fill span: per priority, how many orders ship
    in more than one batch (distinct ship days > 1), the split share in
    bp, and the max/avg calendar span between an order's first and last
    shipment. The consolidation-vs-speed tradeoff dashboard.

    Scale: spelled as TWO explicit aggregation levels — (order, ship
    epoch-day) with a line count, then order — because the
    ``countDistinct(date)`` + min/max single-level form Catalyst
    rewrites into an Expand that doubles the fact before the first
    exchange (the 10× probe measured it 10.7× super-linear, 24 s; the
    two-level form is 1.2×). Level 1's partial agg collapses same-day
    lines map-side; level 2 sees only the deduped (order, day) pairs.
    Then one equi-join to orders and a |priorities|-row census."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    ep = F.expr(_EPOCH_SPARK.format(c="l_shipdate"))
    per_day = (
        li.select(F.col("l_orderkey").alias("ok"), ep.alias("d"))
        .groupBy("ok", "d")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    per_order = per_day.groupBy("ok").agg(
        F.sum("cnt").cast("long").alias("n_lines"),
        F.count(F.lit(1)).cast("long").alias("ship_days"),
        (F.max("d") - F.min("d")).cast("long").alias("span_days"),
    )
    tagged = per_order.join(
        orders.select("o_orderkey", "o_orderpriority"),
        per_order.ok == F.col("o_orderkey"),
    ).select(
        "o_orderpriority",
        "n_lines",
        "span_days",
        F.when(F.col("ship_days") > 1, 1).otherwise(0).alias("split_flag"),
    )
    return (
        tagged.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("n_lines").cast("long").alias("n_lines"),
            F.sum("split_flag").cast("long").alias("n_split"),
            F.max("span_days").cast("long").alias("max_span_days"),
            F.sum("span_days").alias("_span_sum"),
        )
        .select(
            "o_orderpriority",
            "n_orders",
            "n_lines",
            "n_split",
            F.expr("(10000 * n_split) div n_orders").alias("split_share_bp"),
            "max_span_days",
            F.expr("_span_sum div n_orders").cast("long").alias("avg_span_days"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_multi_supplier_orders",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey AS ok,
             CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
             CAST(count(*) AS BIGINT) AS n_lines
      FROM lineitem GROUP BY 1
    )
    SELECT CASE WHEN n_supp = 1 THEN 'a_single'
                WHEN n_supp = 2 THEN 'b_two'
                WHEN n_supp <= 4 THEN 'c_three_four'
                ELSE 'd_five_plus' END AS sourcing_band,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(n_lines) AS BIGINT) AS n_lines,
           CAST(min(n_supp) AS BIGINT) AS min_suppliers,
           CAST(max(n_supp) AS BIGINT) AS max_suppliers
    FROM per_order GROUP BY 1 ORDER BY sourcing_band
    """,
)
def q_multi_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AJ aj2 — sourcing-fragmentation census: orders banded by how
    many distinct suppliers fulfilled them (1 / 2 / 3–4 / 5+), with
    order and line counts per band. Every extra supplier on an order is
    a coordination cost; the band histogram is the consolidation KPI.

    Scale: per-order distinct-supplier partial agg (one orderkey
    shuffle), then a 4-row census."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.countDistinct("l_suppkey").cast("long").alias("n_supp"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )
    band = (
        F.when(F.col("n_supp") == 1, "a_single")
        .when(F.col("n_supp") == 2, "b_two")
        .when(F.col("n_supp") <= 4, "c_three_four")
        .otherwise("d_five_plus")
    )
    return (
        per_order.groupBy(band.alias("sourcing_band"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("n_lines").cast("long").alias("n_lines"),
            F.min("n_supp").cast("long").alias("min_suppliers"),
            F.max("n_supp").cast("long").alias("max_suppliers"),
        )
        .orderBy("sourcing_band")
    )


@query(
    "q_return_rate_by_brand",
    oracle=f"""
    WITH m AS (
      SELECT p.p_brand,
             CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ret,
             {_CENTS.format(col="l.l_extendedprice")} AS cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    )
    SELECT p_brand, CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(ret) AS BIGINT) AS n_returned,
           (10000 * CAST(sum(ret) AS BIGINT)) // CAST(count(*) AS BIGINT)
             AS return_rate_bp,
           CAST(sum(CASE WHEN ret = 1 THEN cents ELSE 0 END) AS BIGINT)
             AS returned_cents
    FROM m GROUP BY 1 ORDER BY return_rate_bp DESC, p_brand
    """,
)
def q_return_rate_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AJ aj3 — return rate by brand: per brand, returned-line share
    in bp and the exact returned value — the quality/expectation-gap
    ranking merchandising reviews weekly (worst first).

    Scale: broadcast part dim, one conditional-sum groupBy to |brands|
    rows; 3 fact columns read."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    m = li.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        li.l_partkey == F.col("p_partkey"),
    ).select(
        "p_brand",
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ret"),
        F.expr(_CENTS.format(col="l_extendedprice")).alias("cents"),
    )
    return (
        m.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum("ret").cast("long").alias("n_returned"),
            F.sum(F.when(F.col("ret") == 1, F.col("cents")).otherwise(0))
            .cast("long")
            .alias("returned_cents"),
        )
        .select(
            "p_brand",
            "n_lines",
            "n_returned",
            F.expr("(10000 * n_returned) div n_lines").alias("return_rate_bp"),
            "returned_cents",
        )
        .orderBy(F.desc("return_rate_bp"), "p_brand")
    )


@query(
    "q_order_value_waterfall",
    oracle=f"""
    WITH x AS (
      SELECT l_orderkey AS ok,
             {_CENTS.format(col="l_extendedprice")} AS gross,
             ({_CENTS.format(col="l_extendedprice")}
                * {_BP.format(col="l_discount")}) // 10000 AS disc,
             (({_CENTS.format(col="l_extendedprice")}
                - ({_CENTS.format(col="l_extendedprice")}
                   * {_BP.format(col="l_discount")}) // 10000)
                * {_BP.format(col="l_tax")}) // 10000 AS tax
      FROM lineitem
    ),
    per_order AS (
      SELECT ok, CAST(sum(gross) AS BIGINT) AS gross,
             CAST(sum(disc) AS BIGINT) AS disc,
             CAST(sum(tax) AS BIGINT) AS tax
      FROM x GROUP BY 1
    )
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(p.gross) AS BIGINT) AS gross_cents,
           CAST(sum(p.disc) AS BIGINT) AS discount_cents,
           CAST(sum(p.tax) AS BIGINT) AS tax_cents,
           CAST(sum(p.gross) - sum(p.disc) + sum(p.tax) AS BIGINT)
             AS billed_cents
    FROM per_order p JOIN orders o ON p.ok = o.o_orderkey
    GROUP BY 1 ORDER BY o_orderpriority
    """,
)
def q_order_value_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AJ aj4 — order-value waterfall: per priority, the exact
    gross → −discount → +tax → billed decomposition, rounded per line at
    the cent grid in billing order (discount on gross, tax on net) and
    summed bottom-up through per-order subtotals — the reconciliation
    view that must tie out against d1's flag/status cut on the same
    rounding rules.

    Scale: line-level cent arithmetic map-side, per-order partial agg,
    orderkey equi-join to the dim columns, |priorities| census."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    gross = F.expr(_CENTS.format(col="l_extendedprice"))
    disc = F.expr(
        f"({_CENTS.format(col='l_extendedprice')}"
        f" * {_BP.format(col='l_discount')}) div 10000"
    )
    tax = F.expr(
        f"(({_CENTS.format(col='l_extendedprice')}"
        f" - ({_CENTS.format(col='l_extendedprice')}"
        f" * {_BP.format(col='l_discount')}) div 10000)"
        f" * {_BP.format(col='l_tax')}) div 10000"
    )
    per_order = (
        li.select(
            F.col("l_orderkey").alias("ok"),
            gross.alias("gross"),
            disc.alias("disc"),
            tax.alias("tax"),
        )
        .groupBy("ok")
        .agg(
            F.sum("gross").cast("long").alias("gross"),
            F.sum("disc").cast("long").alias("disc"),
            F.sum("tax").cast("long").alias("tax"),
        )
    )
    return (
        per_order.join(
            orders.select("o_orderkey", "o_orderpriority"),
            per_order.ok == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("gross").cast("long").alias("gross_cents"),
            F.sum("disc").cast("long").alias("discount_cents"),
            F.sum("tax").cast("long").alias("tax_cents"),
        )
        .withColumn(
            "billed_cents",
            F.expr("gross_cents - discount_cents + tax_cents").cast("long"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_linenumber_contiguity_audit",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey AS ok, CAST(count(*) AS BIGINT) AS n,
             CAST(max(l_linenumber) AS BIGINT) AS mx,
             CAST(sum(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS s,
             CAST(count(DISTINCT l_linenumber) AS BIGINT) AS nd
      FROM lineitem GROUP BY 1
    ),
    flagged AS (
      SELECT ok, n,
             CASE WHEN nd < n THEN 'c_duplicate'
                  WHEN n = mx AND s = mx * (mx + 1) // 2 THEN 'a_contiguous'
                  ELSE 'b_gapped' END AS contiguity
      FROM per_order
    )
    SELECT contiguity, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(n) AS BIGINT) AS n_lines,
           CAST(max(n) AS BIGINT) AS max_lines
    FROM flagged GROUP BY 1 ORDER BY contiguity
    """,
)
def q_linenumber_contiguity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AJ aj5 — line-number contiguity audit: every order's line
    numbers should be exactly 1..n; classify orders as contiguous /
    gapped / duplicate-bearing using the arithmetic identity
    (``count = max`` AND ``sum = max(max+1)/2`` ⟺ contiguous, given no
    duplicates — checked first via distinct count). Gaps mean dropped
    detail rows (ad3 finds missing ORDERS; this finds missing LINES
    inside surviving orders), duplicates mean double-ingestion.

    Scale: four partial-aggregable integers per order — no sort, no
    window, no join; then a 3-row census."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.max("l_linenumber").cast("long").alias("mx"),
        F.sum(F.col("l_linenumber").cast("long")).cast("long").alias("s"),
        F.countDistinct("l_linenumber").cast("long").alias("nd"),
    )
    contiguity = (
        F.when(F.col("nd") < F.col("n"), "c_duplicate")
        .when(
            (F.col("n") == F.col("mx"))
            & (F.col("s") == F.expr("mx * (mx + 1) div 2")),
            "a_contiguous",
        )
        .otherwise("b_gapped")
    )
    return (
        per_order.select("ok", "n", contiguity.alias("contiguity"))
        .groupBy("contiguity")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("n").cast("long").alias("n_lines"),
            F.max("n").cast("long").alias("max_lines"),
        )
        .orderBy("contiguity")
    )
