"""TPC-H extension suite (SURVEY.md §2.C c19–c26, round 8 tail).

The corpus ships the classic 8-table TPC-H subset minus ``partsupp`` and
minus the comment/shipmode/commitdate columns, so of the 22 canonical
queries the four already registered (Q3/Q5/Q10/Q18) left eight more that
are expressible verbatim-or-near-verbatim on the available columns:
Q6, Q7, Q8, Q9 (lite — no supplycost), Q13, Q14, Q15, Q17. The nine
that NEED the missing columns (Q2/Q4/Q11/Q12/Q16/Q19/Q20/Q21/Q22) are
not faked here — their canonical query SHAPES live in ``tpch_adapt.py``
(§2.C c27–c35) with every column substitution stated explicitly.

Numeric discipline (see ``functions/exactmath.py`` and SCALE.md "Deep
randomized fuzz sweeps"): every revenue is the exact integer-e4
discount-revenue sum rounded half-up to 2 dp in integer space; every
share/ratio (Q8 market share, Q14 promo share) is integer BASIS POINTS
via truncating integer division — ``div`` on Spark, ``//`` on DuckDB,
which agree for all signs — never a rounded float quotient (a rounded
tie-capable quotient diverges between engines; measured, see memory of
the round-4 adjudication in SCALE.md). Sum headroom: e4 units keep the
bps numerator ``sum*10000`` below 2^63 through ~sf300 for the per-year
groups here; past that, pre-divide both operands by 100 (the share is
unchanged) — documented rather than needed at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from recommendersystems_bigdata_spark.catalog import load_table, load_tables
from recommendersystems_bigdata_spark.functions.exactmath import (
    revenue_sum_col,
    revenue_sum_sql,
)
from recommendersystems_bigdata_spark.registry import query

# Exact integer building blocks, shared Spark/DuckDB spelling (floor(x*100
# + 0.5) is exact for non-negative 2-dp doubles and identical in both
# engines on the identical stored double — exactmath.py's adjudication).
_PRICE_E2 = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
_DISC_E2 = "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)"
_QTY_E2 = "CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)"
_REV_E4 = f"{_PRICE_E2} * (100 - {_DISC_E2})"

# Two three-nation "trade blocs" for Q7: chosen to intersect the supplier
# nations present even at sf0.001 (10 suppliers) so the result is
# non-empty at every test scale.
_BLOC_A = ("NATION_3", "NATION_8", "NATION_12")
_BLOC_B = ("NATION_13", "NATION_15", "NATION_18")


def _sql_in(names: tuple[str, ...]) -> str:
    return "(" + ", ".join(f"'{n}'" for n in names) + ")"


@query(
    "q_tpch_q6_forecast",
    oracle=f"""
    SELECT count(*) AS n_lines,
           ((sum({_PRICE_E2} * {_DISC_E2}) + 50) // 100) / 100.0 AS disc_revenue
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
      AND {_DISC_E2} IN (5, 6, 7)
      AND l_quantity < 24
    """,
)
def q_tpch_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c19 — TPC-H Q6 (forecasting revenue change): total discount give-back
    ``sum(price · discount)`` for one shipping year, a discount band and a
    quantity cap. The discount band compares the INTEGER e2 discount
    (``floor(d*100+0.5) IN (5,6,7)``), not the raw double, so band
    membership is exact and engine-identical; the give-back sum runs in
    integer e4 units (2-dp price × 2-dp discount) with half-up 2-dp
    rounding in integer space.

    Scale: a pure scan-side filter + single global aggregate — all three
    predicates push to the parquet scan, the sum partial-aggregates
    map-side, and exactly 1 row per task moves. The canonical "is the
    scan path fast" probe at any corpus size."""
    li = load_table(spark, sf_dir, "lineitem")
    ship = F.col("l_shipdate").cast("date")
    return (
        li.filter(
            (ship >= F.lit("1996-01-01").cast("date"))
            & (ship < F.lit("1997-01-01").cast("date"))
            & F.expr(_DISC_E2).isin(5, 6, 7)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.expr(
                f"((sum({_PRICE_E2} * {_DISC_E2}) + 50) div 100) / CAST(100 AS DOUBLE)"
            ).alias("disc_revenue"),
        )
    )


@query(
    "q_tpch_q7_nation_volume",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS l_year,
           {revenue_sum_sql()} AS revenue
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    WHERE (sn.n_name IN {_sql_in(_BLOC_A)} AND cn.n_name IN {_sql_in(_BLOC_B)})
       OR (sn.n_name IN {_sql_in(_BLOC_B)} AND cn.n_name IN {_sql_in(_BLOC_A)})
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def q_tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c20 — TPC-H Q7 (volume shipping): bilateral trade volume between two
    three-nation blocs, by (supplier nation, customer nation, ship year).
    Generalizes the canonical two-nation pair to blocs so the result is
    non-empty even on the 10-supplier sf0.001 corpus; semantics otherwise
    verbatim (both directions, disjoint blocs, revenue per year).

    Scale: supplier/nation/customer are broadcast dims; the only fact-side
    work is lineitem⋈orders on the order key (the co-location key a
    bucketed layout would pin), then a partial-aggregated groupBy whose
    output is ≤ |blocA|·|blocB|·2·years rows — shuffle volume is trivially
    bounded regardless of corpus size. The bloc membership filters reduce
    the fact early: a lineitem whose supplier is in neither bloc drops
    before the orders join."""
    li, supplier, nation, orders, customer = load_tables(
        spark, sf_dir, "lineitem", "supplier", "nation", "orders", "customer"
    )
    sn = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    both = tuple(_BLOC_A) + tuple(_BLOC_B)
    joined = (
        li.join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("s_nk") == F.col("s_nationkey"))
        .filter(F.col("supp_nation").isin(*both))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(customer), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cn), F.col("c_nk") == F.col("c_nationkey"))
        .filter(
            (F.col("supp_nation").isin(*_BLOC_A) & F.col("cust_nation").isin(*_BLOC_B))
            | (F.col("supp_nation").isin(*_BLOC_B) & F.col("cust_nation").isin(*_BLOC_A))
        )
    )
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.col("l_shipdate").cast("date")).cast("int").alias("l_year"),
        )
        .agg(revenue_sum_col().alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q_tpch_q8_market_share",
    oracle=f"""
    WITH base AS (
        SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS o_year,
               {_REV_E4} AS rev_e4,
               sn.n_name AS supp_nation
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation cn ON cn.n_nationkey = c_nationkey
        JOIN region ON r_regionkey = cn.n_regionkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation sn ON sn.n_nationkey = s_nationkey
        WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    )
    SELECT o_year,
           CAST((sum(CASE WHEN supp_nation = 'NATION_3' THEN rev_e4 ELSE 0 END)
                 * 10000) // sum(rev_e4) AS BIGINT) AS share_bps,
           ((sum(rev_e4) + 50) // 100) / 100.0 AS total_revenue
    FROM base
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c21 — TPC-H Q8 (national market share): NATION_3's share of the
    revenue ASIA-region customers spent on ECONOMY-type parts, per order
    year. The share is integer basis points — numerator and denominator
    are exact integer-e4 sums, divided with truncating integer division
    (``div``/``//`` agree cross-engine) — never a rounded float quotient.
    NATION_3 is a supplier nation present even at sf0.001 so the share is
    exercised non-zero at every test scale.

    Scale: all six dims broadcast (region→nation→customer chain folds to
    one in-memory map each; part filters to one type BEFORE broadcast);
    the fact shuffles once, on the order key, for the orders join — the
    conditional numerator and the denominator ride the SAME aggregate, so
    market share costs exactly one pass and one ≤years-row result."""
    li, part, orders, customer, nation, region, supplier = load_tables(
        spark, sf_dir, "lineitem", "part", "orders", "customer", "nation", "region", "supplier"
    )
    cn = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    asia = region.filter(F.col("r_name") == "ASIA")
    econ = part.filter(F.col("p_type") == "ECONOMY")
    base = (
        li.join(F.broadcast(econ), F.col("p_partkey") == F.col("l_partkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(customer), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cn), F.col("c_nk") == F.col("c_nationkey"))
        .join(F.broadcast(asia), F.col("r_regionkey") == F.col("c_rk"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("s_nk") == F.col("s_nationkey"))
        .select(
            F.year(F.col("o_orderdate").cast("date")).cast("int").alias("o_year"),
            F.expr(_REV_E4).alias("rev_e4"),
            "supp_nation",
        )
    )
    return (
        base.groupBy("o_year")
        .agg(
            F.expr(
                "CAST((sum(CASE WHEN supp_nation = 'NATION_3' THEN rev_e4 ELSE 0 END)"
                " * 10000) div sum(rev_e4) AS BIGINT)"
            ).alias("share_bps"),
            F.expr("((sum(rev_e4) + 50) div 100) / CAST(100 AS DOUBLE)").alias(
                "total_revenue"
            ),
        )
        .orderBy("o_year")
    )


@query(
    "q_tpch_q9_profit_lite",
    oracle=f"""
    SELECT sn.n_name AS nation,
           CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS o_year,
           {revenue_sum_sql()} AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey AND p_name LIKE '%red%'
    JOIN orders ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q_tpch_q9_profit_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c22 — TPC-H Q9 lite (product-type profit): revenue by supplier
    nation × order year over parts whose name contains "red". "Lite"
    because the corpus has no ``partsupp.ps_supplycost``, so the measure
    is discount revenue rather than revenue − cost — the join/group shape
    (substring part filter fanned across every nation-year cell) is the
    point of Q9 and is preserved verbatim.

    Scale: the LIKE filter halves/quarters part BEFORE broadcast; the
    fact shuffles once on the order key; output is nations × years.
    The part filter cannot push to the parquet scan as a range — it stays
    a post-scan predicate on the broadcast side, which is the right place
    (part is the small table)."""
    li, part, orders, supplier, nation = load_tables(
        spark, sf_dir, "lineitem", "part", "orders", "supplier", "nation"
    )
    red = part.filter(F.col("p_name").like("%red%"))
    sn = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    joined = (
        li.join(F.broadcast(red), F.col("p_partkey") == F.col("l_partkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("s_nk") == F.col("s_nationkey"))
    )
    return (
        joined.groupBy(
            "nation",
            F.year(F.col("o_orderdate").cast("date")).cast("int").alias("o_year"),
        )
        .agg(revenue_sum_col().alias("revenue"))
        .orderBy("nation", "o_year")
    )


@query(
    "q_tpch_q13_custdist",
    oracle="""
    WITH c_orders AS (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    )
    SELECT CAST(c_count AS INT) AS c_count, count(*) AS custdist
    FROM c_orders
    GROUP BY 1
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q_tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c23 — TPC-H Q13 (customer distribution): how many customers placed
    exactly N orders, INCLUDING the zero-order customers the left outer
    join preserves (``count(o_orderkey)`` counts non-null keys, so a
    match-less customer contributes c_count = 0 — the subtlety Q13
    exists to test).

    Scale: both sides of this join grow with the corpus, so unlike the
    star queries there is no permanently-small build side — at test
    scale the planner still broadcasts customer (it fits), but at 100 TB
    this degrades to a sort-merge join on the customer key whose
    partitioning the per-customer groupBy then reuses (one fact
    exchange total). The second aggregate's input is one row per
    customer and its output ≤ max-order-count rows."""
    customer, orders = load_tables(spark, sf_dir, "customer", "orders")
    per_cust = (
        customer.join(
            orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("int").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q_tpch_q14_promo_share",
    oracle=f"""
    SELECT CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS l_year,
           CAST((sum(CASE WHEN p_type = 'PROMO' THEN {_REV_E4} ELSE 0 END)
                 * 10000) // sum({_REV_E4}) AS BIGINT) AS promo_bps,
           ((sum({_REV_E4}) + 50) // 100) / 100.0 AS total_revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c24 — TPC-H Q14 (promotion effect): the share of each ship year's
    revenue carried by PROMO-type parts, in integer basis points (the
    canonical ``100 * promo / total`` percentage, exactified: both sums
    are integer e4, the quotient is truncating integer division — see the
    module docstring for why a rounded float quotient is banned).

    Scale: part broadcasts whole (the CASE needs every part's type, so
    no pre-filter — the broadcast map is the per-partkey type lookup);
    the fact never shuffles at all: the join is broadcast-hash and both
    aggregates partial-aggregate map-side into ≤ years × 3 columns."""
    li, part = load_tables(spark, sf_dir, "lineitem", "part")
    joined = li.join(
        F.broadcast(part.select("p_partkey", "p_type")),
        F.col("p_partkey") == F.col("l_partkey"),
    )
    return (
        joined.groupBy(
            F.year(F.col("l_shipdate").cast("date")).cast("int").alias("l_year")
        )
        .agg(
            F.expr(
                f"CAST((sum(CASE WHEN p_type = 'PROMO' THEN {_REV_E4} ELSE 0 END)"
                f" * 10000) div sum({_REV_E4}) AS BIGINT)"
            ).alias("promo_bps"),
            F.expr(f"((sum({_REV_E4}) + 50) div 100) / CAST(100 AS DOUBLE)").alias(
                "total_revenue"
            ),
        )
        .orderBy("l_year")
    )


@query(
    "q_tpch_q15_top_supplier",
    oracle=f"""
    WITH srev AS (
        SELECT l_suppkey, sum({_REV_E4}) AS rev_e4
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
          AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, ((rev_e4 + 50) // 100) / 100.0 AS total_revenue
    FROM srev JOIN supplier ON s_suppkey = l_suppkey
    WHERE rev_e4 = (SELECT max(rev_e4) FROM srev)
    ORDER BY s_suppkey
    """,
)
def q_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c25 — TPC-H Q15 (top supplier): the supplier(s) whose one-quarter
    revenue equals the maximum — the ties-must-all-surface variant of
    top-1, which is why it is NOT a LIMIT 1. The tie compare happens on
    the exact INTEGER e4 revenue, so "equals the max" is bit-exact on
    both engines (a float-revenue equality would be a layout lottery);
    rounding to 2 dp happens only on the output column.

    Scale: the quarter filter pushes to the scan; per-supplier revenue is
    one partial-aggregated shuffle keyed by supplier; the scalar max is a
    1-row aggregate broadcast back over the (|suppliers|-row) result —
    never a sort, never a single-partition window. supplier is a
    broadcast dim for the name lookup."""
    li, supplier = load_tables(spark, sf_dir, "lineitem", "supplier")
    ship = F.col("l_shipdate").cast("date")
    srev = (
        li.filter(
            (ship >= F.lit("1996-01-01").cast("date"))
            & (ship < F.lit("1996-04-01").cast("date"))
        )
        .groupBy("l_suppkey")
        .agg(F.expr(f"sum({_REV_E4})").alias("rev_e4"))
    )
    max_rev = srev.agg(F.max("rev_e4").alias("max_rev_e4"))
    return (
        srev.join(F.broadcast(max_rev), F.col("rev_e4") == F.col("max_rev_e4"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.expr("((rev_e4 + 50) div 100) / CAST(100 AS DOUBLE)").alias(
                "total_revenue"
            ),
        )
        .orderBy("s_suppkey")
    )


@query(
    "q_tpch_q17_small_qty",
    oracle=f"""
    WITH pq AS (
        SELECT l_partkey AS pk, sum({_QTY_E2}) AS sum_q_e2, count(*) AS cnt
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#11'
        GROUP BY 1
    )
    SELECT count(*) AS n_small_lines,
           CAST(coalesce(sum({_PRICE_E2}), 0) AS BIGINT) AS total_cents
    FROM lineitem JOIN pq ON l_partkey = pk
    WHERE 5 * {_QTY_E2} * cnt < sum_q_e2
    """,
)
def q_tpch_q17_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c26 — TPC-H Q17 (small-quantity-order revenue): lineitems of one
    brand whose quantity is below 20% of that part's average quantity —
    the correlated-average-subquery classic. The fractional compare
    ``qty < 0.2 · avg`` is cross-multiplied into pure integers:
    ``5 · qty_e2 · cnt < sum_q_e2`` (exact, no division anywhere, agrees
    for every engine and layout). Output is the line count + exact cents
    sum (the canonical ``/7.0`` yearly scaling is a presentation divide,
    deliberately left out of the hash-checked result).

    Scale: the brand filter broadcasts a small part subset; the per-part
    (sum, count) table is ≤ |parts-of-brand| rows → broadcast back onto
    the brand's lineitems, so the fact is scanned twice but never
    shuffled (both joins are broadcast-hash; the pq aggregate's shuffle
    carries only the filtered brand subset)."""
    li, part = load_tables(spark, sf_dir, "lineitem", "part")
    brand_parts = part.filter(F.col("p_brand") == "Brand#11").select("p_partkey")
    brand_lines = li.join(
        F.broadcast(brand_parts), F.col("p_partkey") == F.col("l_partkey")
    )
    pq = (
        brand_lines.groupBy(F.col("l_partkey").alias("pk"))
        .agg(
            F.expr(f"sum({_QTY_E2})").alias("sum_q_e2"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    small = li.join(F.broadcast(pq), F.col("l_partkey") == F.col("pk")).filter(
        F.expr(f"5 * {_QTY_E2} * cnt < sum_q_e2")
    )
    return small.agg(
        F.count(F.lit(1)).alias("n_small_lines"),
        F.expr(f"CAST(coalesce(sum({_PRICE_E2}), 0) AS BIGINT)").alias("total_cents"),
    )
