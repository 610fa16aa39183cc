"""functions/ranks.py vs the single-partition window ground truth.

The distributed two-pass ranking must be EXACTLY the unpartitioned
window's answer on every input — including heavy ties (broken by the
unique key), n smaller than k, descending orders, and multi-batch
partitions — because production queries swap one for the other with
hash-matched oracles on the line.
"""

from __future__ import annotations

from pyspark.sql import Row, Window, functions as F

from recommendersystems_bigdata_spark.functions.ranks import (
    global_ntile,
    global_row_number,
    global_running_sum,
)


def _df(spark, n=997, dup_every=7):
    # deterministic, tie-heavy: val collides every `dup_every` ids
    rows = [Row(id=i, val=(i * 31) % dup_every, amt=(i * 13) % 101) for i in range(n)]
    return spark.createDataFrame(rows).repartition(13)


def test_global_row_number_matches_window(spark):
    df = _df(spark)
    order = [F.col("val").desc(), F.col("id").asc()]
    got = global_row_number(df, order, "rn")
    want = df.withColumn("rn", F.row_number().over(Window.orderBy(*order)))
    assert got.select("id", "rn").subtract(want.select("id", "rn")).count() == 0
    assert want.select("id", "rn").subtract(got.select("id", "rn")).count() == 0


def test_global_ntile_matches_window_all_k(spark):
    df = _df(spark)
    order = [F.col("val").asc(), F.col("id").asc()]
    for k in (3, 4, 10, 32):
        got = global_ntile(df, order, k, "b")
        want = df.withColumn("b", F.ntile(k).over(Window.orderBy(*order)).cast("long"))
        assert got.select("id", "b").subtract(want.select("id", "b")).count() == 0, k
        assert want.select("id", "b").subtract(got.select("id", "b")).count() == 0, k


def test_global_ntile_n_smaller_than_k(spark):
    df = _df(spark, n=3)
    order = [F.col("id").asc()]
    got = global_ntile(df, order, 10, "b")
    want = df.withColumn("b", F.ntile(10).over(Window.orderBy(*order)).cast("long"))
    assert got.select("id", "b").subtract(want.select("id", "b")).count() == 0
    assert want.select("id", "b").subtract(got.select("id", "b")).count() == 0


def test_global_running_sum_matches_window(spark):
    df = _df(spark)
    order = [F.col("val").desc(), F.col("id").asc()]
    got = global_running_sum(df, order, "amt", "cum")
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    want = df.withColumn("cum", F.sum("amt").over(w).cast("long"))
    assert got.select("id", "cum").subtract(want.select("id", "cum")).count() == 0
    assert want.select("id", "cum").subtract(got.select("id", "cum")).count() == 0
