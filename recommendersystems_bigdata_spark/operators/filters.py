"""Projection / filter / predicate operators (SURVEY.md §2.B).

Filters are expressed as column predicates so Catalyst pushes them into the
parquet scan (PushedFilters) and prunes row groups via footer min/max stats —
at 100 TB this is the difference between reading terabytes and gigabytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from recommendersystems_bigdata_spark.catalog import load_table, load_tables
from recommendersystems_bigdata_spark.registry import query


@query(
    "q_project_compute",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged
    FROM lineitem
    """,
)
def q_project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b1 — projection with computed columns (pure codegen, no shuffle).

    Deliberately unrounded: identical per-row IEEE expressions are
    bit-reproducible across engines, whereas round() at the .xx5 boundary
    is not (Spark HALF_UP on decimal repr vs DuckDB's binary round).
    """
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        rev.alias("revenue"),
        (rev * (1 + F.col("l_tax"))).alias("charged"),
    )


@query(
    "q_filter_compound",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag, l_linestatus
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00' AND TIMESTAMP '1998-12-31 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 24
      AND l_returnflag IN ('A', 'R')
      AND NOT (l_linestatus = 'O')
    """,
)
def q_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b2 — compound predicate: AND/NOT, BETWEEN, IN, comparison.

    Every conjunct is pushdown-eligible; the scan skips row groups whose
    min/max stats exclude the shipdate range.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_shipdate").between(
            F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"),
            F.lit("1998-12-31 00:00:00").cast("timestamp_ntz"),
        )
        & F.col("l_discount").between(0.02, 0.06)
        & (F.col("l_quantity") < 24)
        & F.col("l_returnflag").isin("A", "R")
        & ~(F.col("l_linestatus") == "O")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag", "l_linestatus")


@query(
    "q_filter_null_semantics",
    oracle="""
    SELECT count(*) AS n_total,
           CAST(sum(CASE WHEN f IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           CAST(sum(CASE WHEN f IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_not_null,
           CAST(sum(CASE WHEN f IS NOT DISTINCT FROM 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_a,
           CAST(sum(CASE WHEN f IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_null
    FROM (SELECT nullif(l_returnflag, 'N') AS f FROM lineitem)
    """,
)
def q_filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b3 — three-valued logic: IS [NOT] NULL and null-safe equality (<=>)."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "f", F.nullif(F.col("l_returnflag"), F.lit("N"))
    )
    one_if = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")
    return li.agg(
        F.count(F.lit(1)).alias("n_total"),
        one_if(F.col("f").isNull()).alias("n_null"),
        one_if(F.col("f").isNotNull()).alias("n_not_null"),
        one_if(F.col("f").eqNullSafe(F.lit("A"))).alias("n_nullsafe_a"),
        one_if(F.col("f").eqNullSafe(F.lit(None).cast("string"))).alias("n_nullsafe_null"),
    )


@query(
    "q_distinct",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b4 — duplicate elimination (planned as a hash aggregate on all cols)."""
    return load_table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@query("q_sample")
def q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b5 — seeded Bernoulli sampling (rows-only: samplers differ per engine)."""
    return load_table(spark, sf_dir, "customer").sample(fraction=0.1, seed=42)


@query("q_sample_stratified")
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b5b — seeded stratified sampling: per-segment fractions via sampleBy
    (rows-only: sampler RNG is engine-specific). The 100 TB use is class
    rebalancing — e.g. downsample the dominant language/label before
    training-data export — executed as a map-only filter, no shuffle."""
    fractions = {
        "AUTOMOBILE": 0.05,
        "BUILDING": 0.1,
        "FURNITURE": 0.2,
        "HOUSEHOLD": 0.4,
        "MACHINERY": 0.8,
    }
    return (
        load_table(spark, sf_dir, "customer")
        .sampleBy("c_mktsegment", fractions, seed=42)
        .select("c_custkey", "c_mktsegment", "c_acctbal")
    )


@query(
    "q_fk_integrity",
    oracle="""
    SELECT 'lineitem.l_orderkey->orders' AS fk, count(*) AS n_orphans
    FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'orders.o_custkey->customer', count(*)
    FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'customer.c_nationkey->nation', count(*)
    FROM customer c WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
    UNION ALL
    SELECT 'supplier.s_nationkey->nation', count(*)
    FROM supplier s WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey)
    """,
)
def q_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts along every FK edge of
    the star schema, via left-anti joins — the data-quality gate a 100 TB
    ingest runs before publishing a snapshot. Anti joins broadcast the
    key side when small; counts are integer-exact."""
    li, orders, customer, nation, supplier = load_tables(
        spark, sf_dir, "lineitem", "orders", "customer", "nation", "supplier"
    )

    def orphans(child, parent, ckey, pkey, name):
        return (
            child.join(parent, child[ckey] == parent[pkey], "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(name).alias("fk"), "n_orphans")
        )

    return (
        orphans(li, orders, "l_orderkey", "o_orderkey", "lineitem.l_orderkey->orders")
        .unionByName(orphans(orders, customer, "o_custkey", "c_custkey", "orders.o_custkey->customer"))
        .unionByName(orphans(customer, nation, "c_nationkey", "n_nationkey", "customer.c_nationkey->nation"))
        .unionByName(orphans(supplier, nation, "s_nationkey", "n_nationkey", "supplier.s_nationkey->nation"))
    )


@query(
    "q_profile_columns",
    oracle="""
    SELECT 'c_acctbal' AS col, count(*) AS n_rows,
           CAST(count(c_acctbal) AS BIGINT) AS n_nonnull,
           CAST(count(DISTINCT c_acctbal) AS BIGINT) AS n_distinct,
           round(min(c_acctbal), 2) AS min_d, round(max(c_acctbal), 2) AS max_d
    FROM customer
    UNION ALL
    SELECT 'c_nationkey', count(*), CAST(count(c_nationkey) AS BIGINT),
           CAST(count(DISTINCT c_nationkey) AS BIGINT),
           round(min(c_nationkey), 2), round(max(c_nationkey), 2)
    FROM customer
    UNION ALL
    SELECT 'o_totalprice', count(*), CAST(count(o_totalprice) AS BIGINT),
           CAST(count(DISTINCT o_totalprice) AS BIGINT),
           round(min(o_totalprice), 2), round(max(o_totalprice), 2)
    FROM orders
    """,
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (Deequ-style): row/non-null/distinct counts and
    min/max per profiled column — one aggregate pass per table, unioned.
    At 100 TB each profile row is a single partial-agg'd scan; distinct
    counts would switch to the HLL path (d3/d16) beyond memory bounds."""
    customer, orders = load_tables(spark, sf_dir, "customer", "orders")

    def profile(df, col):
        return df.agg(
            F.lit(col).alias("col"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count(col).cast("long").alias("n_nonnull"),
            F.countDistinct(col).cast("long").alias("n_distinct"),
            F.round(F.min(col), 2).alias("min_d"),
            F.round(F.max(col), 2).alias("max_d"),
        ).select("col", "n_rows", "n_nonnull", "n_distinct", "min_d", "max_d")

    return (
        profile(customer, "c_acctbal")
        .unionByName(profile(customer, "c_nationkey"))
        .unionByName(profile(orders, "o_totalprice"))
    )
