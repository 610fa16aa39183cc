"""Set operators (SURVEY.md §2.G).

UNION ALL is a zero-shuffle concatenation; the distinct variants plan as a
hash aggregate over the union — same scaling behavior as any groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from recommendersystems_bigdata_spark.catalog import load_tables
from recommendersystems_bigdata_spark.registry import query


@query(
    "q_union_all",
    oracle="""
    SELECT c_custkey AS entity_key, 'customer' AS kind, c_acctbal AS bal
    FROM customer WHERE c_acctbal > 5000
    UNION ALL
    SELECT s_suppkey AS entity_key, 'supplier' AS kind, s_acctbal AS bal
    FROM supplier WHERE s_acctbal > 5000
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g1 — bag union of high-balance customers and suppliers, tagged."""
    customer, supplier = load_tables(spark, sf_dir, "customer", "supplier")
    c = customer.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("entity_key"),
        F.lit("customer").alias("kind"),
        F.col("c_acctbal").alias("bal"),
    )
    s = supplier.filter(F.col("s_acctbal") > 5000).select(
        F.col("s_suppkey").alias("entity_key"),
        F.lit("supplier").alias("kind"),
        F.col("s_acctbal").alias("bal"),
    )
    return c.unionByName(s)


@query(
    "q_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g2 — set union of nation keys referenced by customers or suppliers."""
    customer, supplier = load_tables(spark, sf_dir, "customer", "supplier")
    return (
        customer.select(F.col("c_nationkey").alias("nationkey"))
        .union(supplier.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


@query(
    "q_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g3 — nations having both customers and suppliers."""
    customer, supplier = load_tables(spark, sf_dir, "customer", "supplier")
    return customer.select(F.col("c_nationkey").alias("nationkey")).intersect(
        supplier.select(F.col("s_nationkey").alias("nationkey"))
    )


@query(
    "q_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g4 — nations with customers but no suppliers (set difference)."""
    customer, supplier = load_tables(spark, sf_dir, "customer", "supplier")
    return customer.select(F.col("c_nationkey").alias("nationkey")).subtract(
        supplier.select(F.col("s_nationkey").alias("nationkey"))
    )
