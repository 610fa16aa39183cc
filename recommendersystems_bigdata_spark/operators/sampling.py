"""Deterministic, engine-portable sampling (SURVEY.md §2.B additions,
round 7): hash-bottom-k sampling and hash-bucket dataset splits.

The registry's RNG samplers (b7 ``q_sample`` / b8 ``q_sample_stratified``,
k7b ``q_split_random``) are rows-only by design — Spark's sample RNG is
not reproducible in another engine. These operators are the
HASH-CHECKED complement: the selection rule is ``md5`` of the primary
key, which Spark and DuckDB spell identically (lowercase hex of the
UTF-8 key string), so the sampled set itself is bit-identical across
engines, reruns, partition layouts, and cluster sizes. That stability
is the property a 100 TB pipeline actually needs from a sample: the
eval split must not drift when the corpus is re-partitioned, the debug
sample must be re-derivable months later, and two teams hashing the
same keys must draw the same rows. md5 on a numeric id is uniform
enough for sampling (and deliberately NOT a salted/keyed hash: the
point is public reproducibility, not unlinkability).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query

_BOTTOM_K = 200


@query(
    "q_sample_bottomk",
    oracle=f"""
    SELECT o_orderkey, o_orderstatus,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
    FROM orders
    ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
    LIMIT {_BOTTOM_K}
    """,
)
def q_sample_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b9 — deterministic bottom-k sample: the 200 orders whose
    ``md5(orderkey)`` sorts lowest (key as tiebreak, though md5 of
    distinct keys never collides in practice). Because md5 is uniform on
    distinct keys, this IS a uniform 200-row sample — but unlike b7's
    RNG it is a pure function of the key set: stable under re-partition,
    re-run, engine swap, and corpus append (an appended row only enters
    the sample by hashing below the current k-th hash, the classic
    bottom-k sketch property, which also makes bottom-k sets mergeable
    across shards).

    Scale design: Spark lowers sort+limit to ``TakeOrderedAndProject`` —
    each partition keeps its local top-200 and only those k·partitions
    candidate rows move to the driver-side merge, so there is NO global
    sort and no full shuffle at any corpus size. The md5 evaluates
    map-side in the same projection."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias("cents"),
        F.md5(F.col("o_orderkey").cast("string")).alias("h"),
    )
    return (
        orders.orderBy("h", "o_orderkey")
        .limit(_BOTTOM_K)
        .select("o_orderkey", "o_orderstatus", "cents")
    )


@query(
    "q_sample_hash_split",
    oracle="""
    SELECT CASE WHEN substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)
                     IN ('c', 'd') THEN 'val'
                WHEN substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)
                     IN ('e', 'f') THEN 'test'
                ELSE 'train' END AS split,
           count(*) AS n_rows,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM orders
    GROUP BY 1
    """,
)
def q_sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b10 — deterministic train/val/test split by hash bucket: the first
    hex nibble of ``md5(orderkey)`` routes each row to train (nibbles
    0–b, 12/16), val (c–d, 2/16) or test (e–f, 2/16). The split census
    (count + exact cents mass per split) is hash-checked, so the
    assignment function itself is pinned cross-engine — the property
    that prevents eval-set leakage when a 100 TB corpus is re-sharded or
    re-ingested: a row's split NEVER changes, because it depends on
    nothing but the row's key (k7a's leave-latest split is
    time-defined; k7b's RNG split is run-scoped; this one is
    INFRASTRUCTURE-defined). The same nibble rule in any engine or
    language reproduces the exact membership.

    Scale design: entirely map-side (hash + CASE in the scan projection)
    followed by a 3-key partial-aggregated groupBy — shuffle volume is
    3 rows per task. Writing the actual splits is the same expression
    feeding ``partitionBy("split")``; the census here is the cheap audit
    of that write."""
    nib = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1)
    orders = load_table(spark, sf_dir, "orders").select(
        F.when(nib.isin("c", "d"), "val")
        .when(nib.isin("e", "f"), "test")
        .otherwise("train")
        .alias("split"),
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    return orders.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("cents").cast("long").alias("total_cents"),
    )
