"""TPC-H structural-adaptation suite (SURVEY.md §2.C c27–c35, round 8).

Completes the 22-query TPC-H surface. The corpus lacks ``partsupp`` and
the comment/shipmode/commitdate/receiptdate/container/phone columns, so
the nine queries that NEED them (Q2/Q4/Q11/Q12/Q16/Q19/Q20/Q21/Q22)
cannot run verbatim (``tpch_extra.py`` covers the eight that can, plus
the four legacy ones in ``joins.py``). Faking the missing columns would
test nothing, and omitting the queries forfeits their STRUCTURES — so
each query here keeps the canonical query SHAPE (the thing an engine
must execute) and substitutes the closest real column, with the
substitution stated in the docstring:

- partsupp        → the (l_partkey, l_suppkey) pairs observed in
  lineitem, with min/sum price or quantity standing in for
  ps_supplycost / ps_availqty (Q2, Q11, Q16, Q20);
- commit/receipt lateness → shipped more than a year after the order
  date, ``datediff(l_shipdate, o_orderdate) > 365`` (Q4, Q12, Q21);
- l_shipmode      → l_returnflag as the lineitem class axis (Q12);
- p_container / l_shipinstruct → dropped from Q19's disjunction (its
  point — OR-of-conjunctions across both join sides — survives intact
  on brand/size/quantity);
- c_phone country code → c_nationkey (Q22).

The DuckDB oracles deliberately keep the CANONICAL subquery spellings —
correlated scalar min (Q2), correlated EXISTS (Q4), HAVING vs a global
scalar subquery (Q11), NOT IN (Q16), correlated aggregate threshold
(Q17-style, Q20), EXISTS + NOT EXISTS composition (Q21), scalar-average
threshold + NOT EXISTS (Q22) — while the Spark side lowers each to the
distributed shape a 100 TB plan needs (broadcast dim joins, aggregate +
window or 1-row-broadcast rewrites, semi/anti joins). The hash match
therefore certifies lowering ≡ textbook subquery on real data, the same
certification pattern §2.P p1 uses.

Numeric discipline (``functions/exactmath.py``, SCALE.md "Deep
randomized fuzz sweeps"): money and quantity run as exact e2/e4
integers; every threshold is a cross-multiplied strict integer
inequality (``sq·nsupp > 2·tq``, ``bal·n > total``, ``value·1000 >
total``) — never a rounded or divided float, so a tie excludes/includes
identically on both engines. Date lateness compares integer day counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table, load_tables
from recommendersystems_bigdata_spark.functions.exactmath import (
    revenue_sum_col,
    revenue_sum_sql,
)
from recommendersystems_bigdata_spark.registry import query

_PRICE_E2 = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
_QTY_E2 = "CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)"
_SBAL_E2 = "CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT)"
# c_acctbal can be NEGATIVE (befriended by ~8% of customers): floor(x+0.5)
# is half-UP there too (-3.455 → -345, toward +inf on the .5 tie), and both
# engines floor the identical stored double identically — still exact.
_CBAL_E2 = "CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)"

# Q11's nation bloc: reuses tpch_extra's bloc A so the supplier subset is
# non-empty even on the 10-supplier sf0.001 corpus.
_Q11_NATIONS = ("NATION_3", "NATION_8", "NATION_12")


def _sql_in(names: tuple[str, ...]) -> str:
    return "(" + ", ".join(f"'{n}'" for n in names) + ")"


@query(
    "q_tpch_q2_min_cost_supplier",
    oracle=f"""
    WITH cost AS (
        SELECT l_partkey AS pk, l_suppkey AS sk, min({_PRICE_E2}) AS minp_e2
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY 1, 2
    )
    SELECT p_partkey, p_name, s_name, minp_e2 AS min_price_e2,
           {_SBAL_E2} AS s_acctbal_e2
    FROM cost
    JOIN part ON p_partkey = pk
    JOIN supplier ON s_suppkey = sk
    WHERE p_size BETWEEN 10 AND 20
      AND minp_e2 = (SELECT min(minp_e2) FROM cost c2 WHERE c2.pk = cost.pk)
    ORDER BY p_partkey, s_name
    """,
)
def q_tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c27 — TPC-H Q2 (minimum-cost supplier), adapted: for each mid-size
    part, the ASIA-region supplier(s) whose cheapest observed line price
    equals the part's regional minimum. Substitution: ps_supplycost →
    ``min(l_extendedprice_e2)`` per observed (part, supplier) pair; the
    correlated-min-subquery STRUCTURE — Q2's whole point — is verbatim
    (oracle keeps it as a correlated scalar subquery; ties all surface,
    exactly like q_tpch_q15's max). The compare is on exact e2 integers,
    so "equals the regional min" is bit-exact on every engine and layout.

    Scale: region/nation/supplier fold to one broadcast dim; the only
    fact shuffle is the (partkey, suppkey) partial aggregate. The
    per-part min is a window over the ALREADY-REDUCED |parts×regional
    suppliers| pair frame (second exchange carries pairs, not lines; no
    join-back, one fact scan); part broadcasts for the size filter+name."""
    li, supplier, nation, region, part = load_tables(
        spark, sf_dir, "lineitem", "supplier", "nation", "region", "part"
    )
    asia_supp = (
        supplier.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name") == "ASIA")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    cost = (
        li.join(F.broadcast(asia_supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .agg(F.expr(f"min({_PRICE_E2})").alias("minp_e2"))
    )
    # Per-part min as a WINDOW over the already-reduced pair frame, not an
    # aggregate + join-back: the self-join spelling makes Catalyst scan
    # lineitem twice (the shared `cost` subtree is duplicated, not reused)
    # and re-hash on a (pk, min) two-key join neither aggregate satisfies
    # — measured 5 exchanges / 2 fact scans vs the window's 2 exchanges /
    # 1 fact scan, identical hashes.
    w_part = Window.partitionBy("pk")
    return (
        cost.withColumn("part_min_e2", F.min("minp_e2").over(w_part))
        .filter(F.col("minp_e2") == F.col("part_min_e2"))
        .join(
            F.broadcast(part.filter(F.col("p_size").between(10, 20))),
            F.col("p_partkey") == F.col("pk"),
        )
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("sk"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.col("minp_e2").alias("min_price_e2"),
            F.expr(_SBAL_E2).alias("s_acctbal_e2"),
        )
        .orderBy("p_partkey", "s_name")
    )


@query(
    "q_tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE CAST(o_orderdate AS DATE) >= DATE '1996-07-01'
      AND CAST(o_orderdate AS DATE) < DATE '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND date_diff('day', CAST(o_orderdate AS DATE),
                        CAST(l_shipdate AS DATE)) > 365
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c28 — TPC-H Q4 (order-priority checking), adapted: orders placed in
    1996Q3 with at least one SLOW lineitem, counted per priority.
    Substitution: ``l_commitdate < l_receiptdate`` (columns absent) →
    shipped more than a year after the order date,
    ``datediff(l_shipdate, o_orderdate) > 365`` — an exact integer-day
    compare. The STRUCTURE is verbatim Q4: a correlated EXISTS whose
    predicate references BOTH tables' columns (not just the key), i.e.
    a semi-join with a mixed equi + non-equi condition.

    Scale: the quarter filter pushes to the orders scan (≈ 1/26 of the
    table survives); Spark lowers the EXISTS to a LEFT SEMI hash/sort
    join on o_orderkey with the date predicate evaluated inside the
    join — each order emits at most once, no count-then-dedup. The
    5-row aggregate partial-aggregates map-side."""
    orders, li = load_tables(spark, sf_dir, "orders", "lineitem")
    odate = F.col("o_orderdate").cast("date")
    quarter = orders.filter(
        (odate >= F.lit("1996-07-01").cast("date"))
        & (odate < F.lit("1996-10-01").cast("date"))
    )
    slow = quarter.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (
            F.datediff(F.col("l_shipdate").cast("date"), odate) > 365
        ),
        "left_semi",
    )
    return (
        slow.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q_tpch_q11_important_value",
    oracle=f"""
    SELECT l_partkey AS p_key, CAST(sum({_PRICE_E2}) AS BIGINT) AS value_e2
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name IN {_sql_in(_Q11_NATIONS)}
    GROUP BY 1
    HAVING sum({_PRICE_E2}) * 1000 > (
        SELECT sum({_PRICE_E2})
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        WHERE n_name IN {_sql_in(_Q11_NATIONS)}
    )
    ORDER BY value_e2 DESC, p_key
    """,
)
def q_tpch_q11_important_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c29 — TPC-H Q11 (important stock identification), adapted: parts
    whose line-value sum from a three-nation supplier bloc exceeds 0.1%
    of the bloc's total. Substitution: ps_supplycost·ps_availqty →
    ``sum(l_extendedprice_e2)`` over the bloc's observed lines; the
    STRUCTURE — GROUP BY ... HAVING sum(x) > fraction · (global scalar
    subquery of the same sum) — is verbatim Q11. The fraction compare is
    the cross-multiplied integer inequality ``value_e2·1000 > total_e2``
    (exact; a tie excludes identically on both engines — never a float
    division).

    Scale: supplier⋈nation folds to one broadcast bloc dim that prunes
    the fact BEFORE its only shuffle (the per-part partial aggregate).
    The global total re-aggregates the per-part frame to ONE row —
    consistent by associativity with the oracle's second scan — and
    broadcasts back over it; no second pass over the fact, no
    single-partition window."""
    li, supplier, nation = load_tables(spark, sf_dir, "lineitem", "supplier", "nation")
    bloc_supp = (
        supplier.join(
            F.broadcast(nation.filter(F.col("n_name").isin(*_Q11_NATIONS))),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .select("s_suppkey")
    )
    per_part = (
        li.join(F.broadcast(bloc_supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(F.col("l_partkey").alias("p_key"))
        .agg(F.expr(f"sum({_PRICE_E2})").alias("value_e2"))
    )
    total = per_part.agg(F.sum("value_e2").alias("total_e2"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_e2") * 1000 > F.col("total_e2"))
        .select("p_key", "value_e2")
        .orderBy(F.col("value_e2").desc(), "p_key")
    )


@query(
    "q_tpch_q12_late_priority",
    oracle="""
    SELECT l_returnflag AS ship_class,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    WHERE date_diff('day', CAST(o_orderdate AS DATE),
                    CAST(l_shipdate AS DATE)) > 365
      AND CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_tpch_q12_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c30 — TPC-H Q12 (shipping modes and order priority), adapted: among
    1997-shipped lineitems that arrived more than a year after their
    order, how many belong to high- vs low-priority orders, per lineitem
    class. Substitutions: l_shipmode (absent) → l_returnflag as the
    class axis; the receipt-vs-commit lateness chain → the same
    integer-day lateness c28 uses. The STRUCTURE is verbatim Q12: a
    fact⋈fact join whose filter mixes both sides' columns, feeding a
    priority-bucketed conditional count.

    Scale: the shipdate-year filter pushes to the lineitem scan; the
    join is the canonical l_orderkey sort-merge (the bucketing key l9
    pins); the lateness predicate evaluates inside the join, and the
    3-row aggregate partial-aggregates map-side."""
    li, orders = load_tables(spark, sf_dir, "lineitem", "orders")
    ship = F.col("l_shipdate").cast("date")
    joined = li.filter(
        (ship >= F.lit("1997-01-01").cast("date"))
        & (ship < F.lit("1998-01-01").cast("date"))
    ).join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
    late = joined.filter(
        F.datediff(ship, F.col("o_orderdate").cast("date")) > 365
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        late.groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


@query(
    "q_tpch_q16_supplier_cnt",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#13'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
      )
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q_tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c31 — TPC-H Q16 (parts/supplier relationship), adapted: how many
    distinct suppliers ship each surviving (brand, type, size) part
    class, excluding suppliers from a blacklist subquery. Substitutions:
    partsupp → the (part, supplier) pairs observed in lineitem;
    "complaints in s_comment" (column absent) → ``s_acctbal < 0`` as the
    blacklist predicate (empty at sf0.001 — a NOT IN over an empty set
    keeps everything, which both engines agree on; non-empty from
    sf0.01). The STRUCTURE is verbatim Q16: negated-membership subquery +
    multi-attribute GROUP BY + COUNT(DISTINCT). s_suppkey is non-null by
    schema, so NOT IN's null-poisoning hazard (the reason q_join_anti
    documents NOT IN ≠ anti-join in general) cannot bite; the Spark side
    lowers to the anti-join it is then equivalent to.

    Scale: part's three predicates broadcast a pruned dim; the blacklist
    is a broadcast anti-join (never a shuffle); the only wide op is the
    COUNT(DISTINCT suppkey) expand-aggregate, keyed by the class tuple —
    bounded by |brand×type×size|, not corpus rows."""
    li, part, supplier = load_tables(spark, sf_dir, "lineitem", "part", "supplier")
    sizes = (1, 4, 9, 16, 25, 36, 49)
    classes = part.filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(*sizes)
    )
    blacklist = supplier.filter(F.col("s_acctbal") < 0.0).select("s_suppkey")
    return (
        li.join(F.broadcast(classes), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            F.broadcast(blacklist),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "q_tpch_q19_disjunctive_rev",
    oracle=f"""
    SELECT count(*) AS n_lines, {revenue_sum_sql()} AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q_tpch_q19_disjunctive_rev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c32 — TPC-H Q19 (discounted revenue), adapted: revenue from three
    OR'd brand/size/quantity bands — the benchmark's stress test for
    DISJUNCTIVE predicates spanning both join sides. Substitution: the
    p_container and l_shipinstruct/l_shipmode conjuncts are dropped
    (columns absent); the structural point — an OR of conjunctions
    where each branch constrains BOTH the dim (brand, size) and the
    fact (quantity) — survives intact.

    Scale: Catalyst keeps the p_partkey equi-join and pushes the
    per-side residuals: the brand/size union prunes the broadcast part
    dim at its scan, the quantity-range union (1..11 ∪ 10..20 ∪ 20..30
    → 1..30) prunes the fact scan, and the full disjunction evaluates
    as the join residual. One broadcast join + a 1-row aggregate; the
    revenue is the exact integer-e4 sum with half-up 2-dp rounding in
    integer space (``exactmath.revenue_sum_col``)."""
    li, part = load_tables(spark, sf_dir, "lineitem", "part")
    j = li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(branch).agg(
        F.count(F.lit(1)).alias("n_lines"),
        revenue_sum_col().alias("revenue"),
    )


@query(
    "q_tpch_q20_concentrated_suppliers",
    oracle="""
    WITH ps AS (
        SELECT l_partkey AS pk, l_suppkey AS sk,
               sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS sq
        FROM lineitem
        GROUP BY 1, 2
    )
    SELECT s_suppkey, s_name, count(*) AS n_parts
    FROM ps
    JOIN supplier ON s_suppkey = sk
    WHERE 2 <= (SELECT count(*) FROM ps p2 WHERE p2.pk = ps.pk)
      AND sq * (SELECT count(*) FROM ps p2 WHERE p2.pk = ps.pk)
           > 2 * (SELECT sum(sq) FROM ps p3 WHERE p3.pk = ps.pk)
    GROUP BY 1, 2
    ORDER BY n_parts DESC, s_suppkey
    """,
)
def q_tpch_q20_concentrated_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c33 — TPC-H Q20 (potential part promotion), adapted: suppliers who
    ship an OUTSIZED share of a part's total quantity — more than twice
    the part's fair per-supplier share (``sq·nsupp > 2·tq``, suppliers
    with at least 2 sources so "share" is defined), counted per supplier.
    Substitutions: ps_availqty → the supplier's shipped e2 quantity per
    part; the original's fixed "> 50% of demand" threshold → the
    fair-share multiple, which keeps the predicate SCALE-INVARIANT (a
    fixed fraction empties as parts gain suppliers with sf — measured:
    >25% already selects zero pairs at sf0.01). The STRUCTURE is
    verbatim Q20: membership via a correlated aggregate threshold
    (oracle spells it as two correlated scalar subqueries).

    Scale: one (partkey, suppkey) partial aggregate is the only fact
    shuffle; the per-part (total, count) is a window over the reduced
    pair frame (one more exchange of pairs, no join-back, one fact
    scan); supplier broadcasts for the name; the integer cross-multiply
    needs no division and ties exclude identically."""
    li, supplier = load_tables(spark, sf_dir, "lineitem", "supplier")
    ps = (
        li.groupBy(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .agg(F.expr(f"sum({_QTY_E2})").alias("sq"))
    )
    # Per-part totals as a WINDOW over the reduced pair frame, not an
    # aggregate + join-back (which duplicates the fact scan — the c27
    # lesson; pinned by tests/test_plans.py).
    w_part = Window.partitionBy("pk")
    return (
        ps.withColumn("tq", F.sum("sq").over(w_part))
        .withColumn("nsupp", F.count(F.lit(1)).over(w_part))
        .filter((F.col("nsupp") >= 2) & (F.col("sq") * F.col("nsupp") > 2 * F.col("tq")))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("sk"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .orderBy(F.col("n_parts").desc(), "s_suppkey")
    )


@query(
    "q_tpch_q21_sole_late_supplier",
    oracle="""
    WITH li AS (
        SELECT l_orderkey, l_suppkey,
               date_diff('day', CAST(o_orderdate AS DATE),
                         CAST(l_shipdate AS DATE)) > 365 AS late
        FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
    )
    SELECT s_name, count(*) AS numwait
    FROM (
        SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
        FROM li l1
        WHERE l1.late
          AND EXISTS (SELECT 1 FROM li l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM li l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.late)
    )
    JOIN supplier ON s_suppkey = l_suppkey
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q_tpch_q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c34 — TPC-H Q21 (suppliers who kept orders waiting), adapted: the
    top-20 suppliers by number of multi-supplier orders where they were
    the ONLY late supplier. Substitution: the commit/receipt lateness →
    the shared integer-day lateness (c28/c30). The STRUCTURE is
    verbatim Q21 — the benchmark's hardest shape, a correlated EXISTS
    (some other supplier in the order) conjoined with a correlated NOT
    EXISTS (no other LATE supplier) — and the oracle keeps that double
    subquery spelling. The Spark side lowers it to ONE aggregate pass:
    per (order, supplier) collapse lines to a late flag, then per-order
    window counts ``n_supp`` and ``n_late``; "sole late in a shared
    order" ≡ ``late ∧ n_supp > 1 ∧ n_late = 1``. The hash match
    certifies the aggregate lowering ≡ the EXISTS composition on real
    data — the suite's certification pattern. LIMIT 20 is deterministic:
    the sort is fully tie-broken (numwait DESC, then unique s_name).

    Scale: the exists/not-exists self-joins a naive plan would run
    THREE fact-sized inputs through collapse here into the l_orderkey
    sort-merge (already the l9 bucketing key) plus one (order, supplier)
    partial aggregate; the window then re-partitions the already-reduced
    pair frame by order key. No self-join of the fact against itself,
    no row explosion, supplier broadcasts for names."""
    li, orders, supplier = load_tables(spark, sf_dir, "lineitem", "orders", "supplier")
    lines = li.join(orders, F.col("o_orderkey") == F.col("l_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.datediff(
                F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
            )
            > 365
        ).alias("late"),
    )
    pair = lines.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(F.col("late"), 1).otherwise(0)).alias("late_i")
    )
    w = Window.partitionBy("l_orderkey")
    flagged = pair.select(
        "l_orderkey",
        "l_suppkey",
        "late_i",
        F.count(F.lit(1)).over(w).alias("n_supp"),
        F.sum("late_i").over(w).alias("n_late"),
    )
    sole = flagged.filter(
        (F.col("late_i") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1)
    )
    return (
        sole.join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@query(
    "q_tpch_q22_idle_customers",
    oracle=f"""
    SELECT c_nationkey AS nation_code, count(*) AS numcust,
           CAST(sum({_CBAL_E2}) AS BIGINT) AS totacctbal_e2
    FROM customer
    WHERE {_CBAL_E2} * (SELECT count(*) FROM customer WHERE c_acctbal > 0.0)
          > (SELECT sum({_CBAL_E2}) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND CAST(o_orderdate AS DATE) >= DATE '2000-01-01'
      )
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c35 — TPC-H Q22 (global sales opportunity), adapted: customers with
    an above-average balance who have gone IDLE, grouped by country.
    Substitutions: the c_phone country code (column absent) →
    c_nationkey; "never ordered" (every corpus customer has orders) →
    no order since 2000-01-01. The STRUCTURE is verbatim Q22: a scalar
    AVG-threshold subquery over the positive-balance population plus a
    NOT EXISTS against orders. The average compare is cross-multiplied
    into the exact integer inequality ``bal_e2 · n_pos > sum_pos_e2`` —
    no division, no float average, ties exclude identically (and
    negative balances, ~8% of customers, floor half-up exactly like
    positive ones on both engines).

    Scale: the threshold is a 1-row broadcast aggregate over the
    customer dim; the NOT EXISTS lowers to an anti-join against the
    date-pruned orders keyed by custkey (the pruned side shrinks with
    the cutoff, and the anti-join shuffles custkeys, not order rows —
    Spark dedupes build-side keys); the output is one row per nation."""
    customer, orders = load_tables(spark, sf_dir, "customer", "orders")
    pos = customer.filter(F.col("c_acctbal") > 0.0).agg(
        F.count(F.lit(1)).alias("n_pos"),
        F.expr(f"sum({_CBAL_E2})").alias("sum_pos_e2"),
    )
    recent = orders.filter(
        F.col("o_orderdate").cast("date") >= F.lit("2000-01-01").cast("date")
    ).select("o_custkey")
    rich_idle = (
        customer.join(F.broadcast(pos))
        .filter(F.expr(_CBAL_E2) * F.col("n_pos") > F.col("sum_pos_e2"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    )
    return (
        rich_idle.groupBy(F.col("c_nationkey").alias("nation_code"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.expr(f"CAST(sum({_CBAL_E2}) AS BIGINT)").alias("totacctbal_e2"),
        )
        .orderBy("nation_code")
    )
