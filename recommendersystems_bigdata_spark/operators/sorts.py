"""Sort / limit / top-k operators (SURVEY.md §2.F).

Global top-k never total-sorts: `orderBy().limit(k)` plans as
TakeOrderedAndProject — each partition keeps its local k, the driver merges.
That is the only sort shape that survives 100 TB; full total sorts exist
here solely where the semantics demand them (pagination), and even those
are range-partitioned, not single-node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query


@query(
    "q_sort_multikey",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_orderdate DESC, o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def q_sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """f1 — multi-key descending sort with limit (TakeOrderedAndProject).

    o_orderkey as the last key makes the ordering total → stable limit.
    """
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderdate", "o_totalprice", "o_orderpriority")
        .orderBy(F.col("o_orderdate").desc(), F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


@query(
    "q_sort_nulls",
    oracle="""
    SELECT l_orderkey, l_linenumber, nullif(l_returnflag, 'N') AS flag_or_null
    FROM lineitem
    ORDER BY flag_or_null ASC NULLS LAST, l_orderkey ASC, l_linenumber ASC
    LIMIT 50
    """,
)
def q_sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """f2 — explicit null ordering (NULLS LAST) with a total tie-break."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.nullif(F.col("l_returnflag"), F.lit("N")).alias("flag_or_null"),
    )
    return li.orderBy(
        F.col("flag_or_null").asc_nulls_last(),
        F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
    ).limit(50)


@query(
    "q_topk_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """f3 — global top-k (k=10) by price, per-partition heaps + driver merge."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@query(
    "q_limit_offset",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    ORDER BY p_retailprice DESC, p_partkey ASC
    LIMIT 10 OFFSET 10
    """,
)
def q_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """f4 — pagination: rows 11–20 of a totally-ordered part listing."""
    return (
        load_table(spark, sf_dir, "part")
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy(F.col("p_retailprice").desc(), F.col("p_partkey").asc())
        .offset(10)
        .limit(10)
    )
