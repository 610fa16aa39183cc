"""Projection / filter / predicate operators (SURVEY.md §2.B).

Filters are expressed as column predicates so Catalyst pushes them into the
parquet scan (PushedFilters) and prunes row groups via footer min/max stats —
at 100 TB this is the difference between reading terabytes and gigabytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
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
