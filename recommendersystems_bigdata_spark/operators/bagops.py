"""Multiset / bag-semantics relational algebra (SURVEY.md §2.AN, round 9).

The §2.G set operators are DISTINCT-semantics (`intersect`, `except`,
`union_distinct`); this suite completes the relational surface with the
BAG variants every ANSI engine ships and every reconciliation job needs:
``EXCEPT ALL`` / ``INTERSECT ALL`` (multiplicity-aware difference and
intersection), ``UNION ALL BY NAME`` over heterogeneous schemas (missing
columns null-filled), ``DISTINCT ON``-style first-row-per-key, and the
two-sided multiset reconciliation census that a data platform runs when
comparing a pipeline's output across two periods or engines.

The working example compares the 1996 vs 1997 order mix as bags of
(o_orderpriority, o_orderstatus) tuples — 15 possible values, each with
multiplicity in the hundreds at sf0.01, so duplicate preservation is
actually exercised (the driver's order-insensitive hash counts
multiplicity).

Spark-first shape, sized for 100 TB:
- `exceptAll`/`intersectAll` are Catalyst logical rewrites (generate
  +1/-1 replication counts, aggregate, re-replicate) — ONE shuffle on
  the row value, never a join; the projected tuple is low-cardinality
  so the aggregate is map-side combined.
- The DISTINCT ON lowering is deliberately NOT a row_number window (a
  full per-key sort of the fact): a commutative `min(struct(...))`
  partial aggregation gives the same first-row-per-key with map-side
  combine — the spelling that survives a 100× fact.
- The reconciliation census full-outer-joins two |domain|-row group
  counts — bounded by the value domain, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query


def _mix(spark: SparkSession, sf_dir: str, year: int) -> DataFrame:
    """The year's order mix as a bag of (priority, status) tuples."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.year("o_orderdate") == year).select(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderstatus").alias("status"),
    )


_MIX_SQL = """
  SELECT o_orderpriority AS priority, o_orderstatus AS status
  FROM orders WHERE year(CAST(o_orderdate AS TIMESTAMP)) = {yr}
"""


@query(
    "q_bag_except_all",
    oracle=f"""
    ({_MIX_SQL.format(yr=1996)})
    EXCEPT ALL
    ({_MIX_SQL.format(yr=1997)})
    """,
)
def q_bag_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AN an1 — EXCEPT ALL: the 1996 order mix minus the 1997 mix
    with multiplicities (a tuple appearing 310× in 1996 and 295× in
    1997 survives exactly 15×) — the bag difference `except` (§2.G g4,
    distinct semantics) cannot express. The driver's order-insensitive
    hash verifies the surviving multiplicity of every tuple.

    Scale: Catalyst rewrites exceptAll to a +1/-1 count aggregate on
    the row value + re-replication — one map-side-combined shuffle on a
    15-value domain, no join, no sort."""
    return _mix(spark, sf_dir, 1996).exceptAll(_mix(spark, sf_dir, 1997))


@query(
    "q_bag_intersect_all",
    oracle=f"""
    ({_MIX_SQL.format(yr=1996)})
    INTERSECT ALL
    ({_MIX_SQL.format(yr=1997)})
    """,
)
def q_bag_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AN an2 — INTERSECT ALL: the common part of the 1996 and 1997
    order mixes with min(multiplicity) semantics — together with an1
    this decomposes each year's bag exactly:
    |A| = |A ∩all B| + |A ∖all B| (the identity
    tests/test_bagops.py pins).

    Scale: same single-shuffle count-aggregate rewrite as an1."""
    return _mix(spark, sf_dir, 1996).intersectAll(_mix(spark, sf_dir, 1997))


@query(
    "q_union_byname_missing",
    oracle="""
    SELECT 'customer' AS entity, c_custkey AS entity_key,
           c_mktsegment AS mktsegment, CAST(NULL AS INTEGER) AS nationkey
    FROM customer
    UNION ALL BY NAME
    SELECT 'supplier' AS entity, s_suppkey AS entity_key,
           CAST(NULL AS VARCHAR) AS mktsegment, s_nationkey AS nationkey
    FROM supplier
    """,
)
def q_union_byname_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AN an3 — UNION ALL BY NAME over heterogeneous schemas: the
    customer and supplier entity feeds carry different attribute sets
    (mktsegment vs nationkey); the by-name union aligns shared columns
    and null-fills each side's missing ones —
    ``unionByName(allowMissingColumns=True)``, the schema-evolution
    union a multi-source ingest layer relies on (positional UNION ALL
    would silently misalign).

    Scale: pure map-side concatenation — zero shuffles; each side's
    scan prunes to its own 2 columns."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("entity"),
        F.col("c_custkey").alias("entity_key"),
        F.col("c_mktsegment").alias("mktsegment"),
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("entity"),
        F.col("s_suppkey").alias("entity_key"),
        F.col("s_nationkey").alias("nationkey"),
    )
    return cust.unionByName(sup, allowMissingColumns=True)


@query(
    "q_distinct_on_first_ship",
    oracle="""
    SELECT DISTINCT ON (l_orderkey)
           l_orderkey,
           l_linenumber AS first_linenumber,
           strftime(CAST(l_shipdate AS TIMESTAMP), '%Y-%m-%d')
             AS first_ship_day,
           CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
             AS first_price_cents
    FROM lineitem
    ORDER BY l_orderkey, CAST(l_shipdate AS TIMESTAMP), l_linenumber
    """,
)
def q_distinct_on_first_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AN an4 — DISTINCT ON surface: each order's FIRST shipment
    (earliest ship date, line number breaking ties — unique within an
    order, so fully deterministic). The oracle is DuckDB's literal
    ``DISTINCT ON``; the Spark lowering is deliberately NOT a
    row_number window (a full per-key sort of the fact) but a
    commutative ``min(struct(shipdate, linenumber, ...))`` partial
    aggregation — lexicographic struct-min gives the same first row
    with map-side combine, the spelling that survives a 100× fact.

    Scale: one partial-aggregated shuffle on l_orderkey; no sort, no
    window."""
    li = load_table(spark, sf_dir, "lineitem")
    first = li.groupBy("l_orderkey").agg(
        F.min(
            F.struct(
                F.col("l_shipdate"),
                F.col("l_linenumber"),
                F.expr(
                    "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
                ).alias("price_cents"),
            )
        ).alias("f")
    )
    return first.select(
        "l_orderkey",
        F.col("f.l_linenumber").alias("first_linenumber"),
        F.date_format("f.l_shipdate", "yyyy-MM-dd").alias("first_ship_day"),
        F.col("f.price_cents").alias("first_price_cents"),
    )


@query(
    "q_multiset_reconcile",
    oracle=f"""
    WITH a AS (
      SELECT priority, status, CAST(count(*) AS BIGINT) AS n
      FROM ({_MIX_SQL.format(yr=1996)}) GROUP BY 1, 2
    ),
    b AS (
      SELECT priority, status, CAST(count(*) AS BIGINT) AS n
      FROM ({_MIX_SQL.format(yr=1997)}) GROUP BY 1, 2
    )
    SELECT COALESCE(a.priority, b.priority) AS priority,
           COALESCE(a.status, b.status) AS status,
           COALESCE(a.n, 0) AS n_1996,
           COALESCE(b.n, 0) AS n_1997,
           abs(COALESCE(a.n, 0) - COALESCE(b.n, 0)) AS abs_diff,
           CASE WHEN COALESCE(a.n, 0) > COALESCE(b.n, 0) THEN 'a_surplus'
                WHEN COALESCE(a.n, 0) < COALESCE(b.n, 0) THEN 'b_surplus'
                ELSE 'equal' END AS side
    FROM a FULL OUTER JOIN b
      ON a.priority = b.priority AND a.status = b.status
    ORDER BY priority, status
    """,
)
def q_multiset_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AN an5 — multiset reconciliation census: per (priority,
    status) tuple, its multiplicity in each year's bag, the absolute
    drift, and which side carries the surplus — the report a platform
    produces when an1/an2's row-level bags are too big to eyeball.
    Σabs_diff equals |A∖B| + |B∖A| (pinned against an1 in tests).

    Scale: two map-side-combined group counts (15-row outputs) +
    one bounded full-outer join — corpus pays two pruned scans, the
    join pays nothing."""
    a = (
        _mix(spark, sf_dir, 1996)
        .groupBy("priority", "status")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    b = (
        _mix(spark, sf_dir, 1997)
        .groupBy("priority", "status")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    joined = a.alias("a").join(
        b.alias("b"),
        (F.col("a.priority") == F.col("b.priority"))
        & (F.col("a.status") == F.col("b.status")),
        "full_outer",
    )
    na = F.coalesce(F.col("a.n"), F.lit(0))
    nb = F.coalesce(F.col("b.n"), F.lit(0))
    return joined.select(
        F.coalesce(F.col("a.priority"), F.col("b.priority")).alias("priority"),
        F.coalesce(F.col("a.status"), F.col("b.status")).alias("status"),
        na.alias("n_1996"),
        nb.alias("n_1997"),
        F.abs(na - nb).alias("abs_diff"),
        F.when(na > nb, "a_surplus")
        .when(na < nb, "b_surplus")
        .otherwise("equal")
        .alias("side"),
    ).orderBy("priority", "status")
