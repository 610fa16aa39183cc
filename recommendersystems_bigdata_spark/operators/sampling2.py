"""Deterministic sampling completeness (SURVEY.md §2.AT, round 9).

Extends §2.B's hash-deterministic samplers (b9 bottom-k, b10 hash
split) with the three remaining shapes a data platform standardizes:
systematic 1-in-k sampling (audit-friendly: the selected ranks are
enumerable), fixed-k-per-stratum sampling (every nation contributes
exactly k rows — the balanced debug sample), and COORDINATED sampling
(sample by the PARENT key, then take every child row — the only way a
sampled dataset keeps referential integrity for join-bearing queries;
sampling fact rows independently would orphan them).

All three inherit the b9/b10 determinism contract: selection is a pure
function of ``md5(key)``, spelled identically in Spark and DuckDB, so
membership is bit-stable across engines, re-runs, re-partitions and
corpus appends.

Spark-first shape, sized for 100 TB:
- Systematic ranks come from ``ranks.global_row_number`` — the two-pass
  distributed rank — never a single-partition ORDER BY window over the
  customer table (the oracle's row_number spelling is what it
  replaces).
- Per-stratum bottom-k uses a window partitioned by the stratum (25
  nations — bounded, skewless); the docstring adjudicates the huge-
  stratum variant (mergeable per-stratum bottom-k sketches).
- The coordinated sample filters the DIM map-side (1/16 hash bucket)
  and semi-joins the fact on the parent key — the fact is never
  hashed, so child rows follow their parent by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.functions.ranks import global_row_number
from recommendersystems_bigdata_spark.registry import query

_EVERY = 20
_PHASE = 7
_PER_STRATUM = 8


@query(
    "q_sample_systematic",
    oracle=f"""
    WITH ranked AS (
      SELECT c_custkey, c_mktsegment, c_nationkey,
             row_number() OVER (
               ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey) AS rn
      FROM customer
    )
    SELECT c_custkey, c_mktsegment, c_nationkey, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn % {_EVERY} = {_PHASE}
    ORDER BY rn
    """,
)
def q_sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AT at1 — systematic 1-in-20 sample: customers ranked by
    ``md5(custkey)`` (a uniform, engine-portable shuffle of the key
    space), keeping ranks ≡ 7 (mod 20). Systematic sampling gives the
    auditor an enumerable selection rule — given the rank table, the
    chosen ranks are a closed-form set, unlike bottom-k whose threshold
    is data-dependent.

    Scale: the rank is ``ranks.global_row_number`` (range partition +
    local index + bounded offset table) — no Exchange SinglePartition
    over the customer relation; the mod filter is map-side after the
    rank attaches."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        "c_nationkey",
        F.md5(F.col("c_custkey").cast("string")).alias("_h"),
    )
    ranked = global_row_number(cust, [F.asc("_h"), F.asc("c_custkey")], "rn")
    return (
        ranked.filter(F.col("rn") % _EVERY == _PHASE)
        .select("c_custkey", "c_mktsegment", "c_nationkey",
                F.col("rn").cast("long").alias("rn"))
        .orderBy("rn")
    )


@query(
    "q_sample_stratified_fixedk",
    oracle=f"""
    WITH ranked AS (
      SELECT c_nationkey, c_custkey, c_mktsegment,
             row_number() OVER (PARTITION BY c_nationkey
               ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey)
               AS stratum_rank
      FROM customer
    )
    SELECT c_nationkey, CAST(stratum_rank AS BIGINT) AS stratum_rank,
           c_custkey, c_mktsegment
    FROM ranked WHERE stratum_rank <= {_PER_STRATUM}
    ORDER BY c_nationkey, stratum_rank
    """,
)
def q_sample_stratified_fixedk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AT at2 — fixed-k-per-stratum sample: each nation's 8 customers
    with the lowest ``md5(custkey)`` — the balanced sample that
    guarantees every stratum is represented regardless of its size
    (b8's RNG stratified sampler is proportional and run-scoped; this
    one is balanced and key-deterministic). Per-stratum membership is
    stable under corpus appends exactly as in b9: a new row enters only
    by hashing below its stratum's current k-th hash.

    Scale: one window partitioned by the 25-nation stratum key —
    bounded partitions, no skew. For strata too large to sort, the
    production variant aggregates mergeable per-stratum bottom-k
    sketches (the b9 property per group); at 25 strata the window IS
    the right plan."""
    w = Window.partitionBy("c_nationkey").orderBy("_h", "c_custkey")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_custkey",
        "c_mktsegment",
        F.md5(F.col("c_custkey").cast("string")).alias("_h"),
    )
    return (
        cust.withColumn("stratum_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("stratum_rank") <= _PER_STRATUM)
        .select("c_nationkey", "stratum_rank", "c_custkey", "c_mktsegment")
        .orderBy("c_nationkey", "stratum_rank")
    )


@query(
    "q_sample_coordinated",
    oracle="""
    WITH sampled AS (
      SELECT c_custkey, c_mktsegment FROM customer
      WHERE substring(md5(CAST(c_custkey AS VARCHAR)), 1, 1) = '0'
    )
    SELECT s.c_mktsegment,
           CAST(count(DISTINCT s.c_custkey) AS BIGINT) AS n_customers,
           CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(COALESCE(sum(CAST(floor(o.o_totalprice * 100 + 0.5)
                                  AS BIGINT)), 0) AS BIGINT)
             AS revenue_cents
    FROM sampled s LEFT JOIN orders o ON s.c_custkey = o.o_custkey
    GROUP BY 1 ORDER BY s.c_mktsegment
    """,
)
def q_sample_coordinated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AT at3 — coordinated (referential-integrity) sample: customers
    whose ``md5(custkey)`` starts with nibble '0' (a 1/16 bucket), then
    ALL of their orders — sampling by the PARENT key so every child row
    follows, which keeps joins, LTV curves and per-customer sequences
    valid inside the sample (hashing fact rows independently, b10's
    shape, would orphan them). Reported as the per-segment census
    (customers, orders, exact revenue) that audits the sample's pull-
    through; zero-order customers stay visible via the LEFT join.

    Scale: the dim filters map-side (hash in the scan projection); the
    fact pays one equi-join on the parent key against the 1/16 dim —
    broadcastable at any realistic dim size — and a |segments|-row
    rollup."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    sampled = cust.filter(
        F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 1) == "0"
    ).select("c_custkey", "c_mktsegment")
    joined = sampled.join(
        orders, sampled.c_custkey == orders.o_custkey, "left"
    )
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_custkey").cast("long").alias("n_customers"),
            F.count("o_orderkey").cast("long").alias("n_orders"),
            F.coalesce(
                F.sum(
                    F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("revenue_cents"),
        )
        .orderBy("c_mktsegment")
    )
