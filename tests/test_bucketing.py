"""Bucketed co-located join (SURVEY.md §4 / 100 TB shuffle doctrine).

The scale story for repeated fact⋈fact joins: persist both sides bucketed
on the join key with the same bucket count, and the join needs NO shuffle
exchange — each task reads matching bucket files from both sides. This is
the Spark-native equivalent of co-partitioned storage; at 100 TB it turns
the nightly orders⋈lineitem join from a full-cluster shuffle into a
bucket-local merge.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from recommendersystems_bigdata_spark.catalog import load_tables
from recommendersystems_bigdata_spark.plans import count_join_side_exchanges, final_plan


@pytest.fixture()
def bucketed_tables(spark, sf_dir):
    tmp = tempfile.mkdtemp(prefix="rsbd_buckets_")
    orders, li = load_tables(spark, sf_dir, "orders", "lineitem")
    (
        orders.write.bucketBy(4, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", f"{tmp}/orders_b")
        .mode("overwrite")
        .saveAsTable("orders_bucketed")
    )
    (
        li.write.bucketBy(4, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", f"{tmp}/lineitem_b")
        .mode("overwrite")
        .saveAsTable("lineitem_bucketed")
    )
    yield "orders_bucketed", "lineitem_bucketed"
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")
    shutil.rmtree(tmp, ignore_errors=True)


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    orders_t, li_t = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(li_t)
            .join(spark.table(orders_t), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        joined.collect()
        plan = final_plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Bucketed: true" in plan, plan
        # exactly one shuffle — the aggregation above the join; an
        # unbucketed join would add one exchange per side (3 total)
        assert count_join_side_exchanges(plan) <= 1, plan

        # and the result matches the plain (shuffled) join
        orders, li = load_tables(spark, sf_dir, "orders", "lineitem")
        expect = {
            (r["o_orderpriority"], r["n"])
            for r in li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        got = {(r["o_orderpriority"], r["n"]) for r in joined.collect()}
        assert got == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
