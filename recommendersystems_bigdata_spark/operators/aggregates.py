"""Aggregation operators (SURVEY.md §2.D).

All queries here are single-pass hash aggregations: Catalyst plans them as
partial HashAggregate → shuffle on the grouping keys → final HashAggregate,
so the shuffle carries only one row per (partition × group) — the plan that
survives a 100× scale-up as long as group cardinality stays bounded.
Doubles are rounded on both the Spark and oracle side (hash hygiene).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query


@query(
    "q_agg_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                          AS sum_qty,
           round(sum(l_extendedprice), 2)                                     AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                  AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)    AS sum_charge,
           round(avg(l_quantity), 2)                                          AS avg_qty,
           round(avg(l_extendedprice), 2)                                     AS avg_price,
           round(avg(l_discount), 4)                                          AS avg_disc,
           count(*)                                                           AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d1 — TPC-H-Q1-shaped pricing summary (flagship).

    Scan → pushed filter → 2-key hash agg with 6 measures. The filter and
    the 7-column projection both reach the parquet scan (PushedFilters /
    ReadSchema); everything up to the partial aggregate runs in one
    whole-stage-codegen span.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
