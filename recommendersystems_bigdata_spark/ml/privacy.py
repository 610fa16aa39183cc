"""Privacy / governance audits over the customer dimension (SURVEY.md
§2.O, round 7): k-anonymity and l-diversity equivalence-class reports.

A training-data pipeline that joins user-keyed tables must know, before
release, how re-identifiable the quasi-identifier combinations are.
These are the two standard audits — k-anonymity (Sweeney 2002: every
quasi-identifier equivalence class must hold ≥ k individuals) and
l-diversity (Machanavajjhala et al., ICDE 2006: each class must also
span ≥ l distinct sensitive values, or a size-k class with one salary
band still leaks) — computed as plain distributed aggregations so they
run as a release gate at any corpus size.

Determinism discipline: group sizes and distinct counts are integers;
the sensitive attribute is banded with ``floor`` + integer division
(never a float quotient fed to round — see
memory/duckdb-spark-round-tie-divergence), so both audits hash-match
DuckDB exactly on any partition layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query

_K_THRESHOLD = 5
_L_THRESHOLD = 3


@query(
    "q_kanonymity_audit",
    oracle=f"""
    SELECT c_nationkey, c_mktsegment,
           count(*) AS group_size,
           CAST(CASE WHEN count(*) < {_K_THRESHOLD} THEN 1 ELSE 0 END AS BIGINT)
               AS risky
    FROM customer
    GROUP BY 1, 2
    """,
)
def q_kanonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """o1 — k-anonymity equivalence-class audit (k = 5).

    Treats (c_nationkey, c_mktsegment) as the quasi-identifier tuple and
    emits every equivalence class with its size and a ``risky`` flag
    (size < 5): the exact table a release gate reads to decide which
    classes need suppression or generalization before the keyed data can
    ship. Flag thresholding happens INSIDE the audit (not left to the
    consumer) so the gate's decision is itself hash-checked.

    Scale design: one partial-aggregated groupBy on the QI tuple — the
    map-side combine collapses each executor's rows to ≤|QI-classes|
    partials, so shuffle volume is class-count-bound (≤125 here), not
    row-count-bound; at 100 TB this is the same one-pass census any
    release pipeline can afford nightly. The QI tuple is configurable in
    principle (any column list), the plan shape is identical."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("group_size"),
        F.when(F.count(F.lit(1)) < _K_THRESHOLD, 1)
        .otherwise(0)
        .cast("long")
        .alias("risky"),
    )


@query(
    "q_ldiversity_audit",
    oracle=f"""
    SELECT c_nationkey, c_mktsegment,
           count(*) AS group_size,
           count(DISTINCT CAST(floor(c_acctbal) AS BIGINT) // 1000) AS l_distinct,
           CAST(CASE WHEN count(DISTINCT CAST(floor(c_acctbal) AS BIGINT) // 1000)
                          < {_L_THRESHOLD}
                     THEN 1 ELSE 0 END AS BIGINT) AS low_diversity
    FROM customer
    GROUP BY 1, 2
    """,
)
def q_ldiversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """o2 — l-diversity audit of the sensitive attribute (l = 3).

    Same quasi-identifier classes as o1, but the leak model is attribute
    disclosure: a class of 50 customers who all sit in one account-
    balance band reveals every member's band despite being 50-anonymous.
    The sensitive value is the thousand-unit balance band, computed as
    ``floor(acctbal)`` (exact on 2-dp doubles — the value is never within
    float error of an integer boundary unless it IS one, where the double
    is exact) followed by INTEGER division, so banding is bit-identical
    across engines; the audit reports each class's distinct-band count
    and a ``low_diversity`` flag (< 3 bands).

    Scale design: groupBy QI + count(distinct band) — Spark expands
    distinct aggregation to a two-phase partial/final plan over
    (QI, band), so shuffle volume is bounded by classes × bands, not
    rows. One pass, broadcast-free, the same nightly-gate economics as
    o1."""
    cust = load_table(spark, sf_dir, "customer").withColumn(
        "band", F.expr("CAST(floor(c_acctbal) AS BIGINT) div 1000")
    )
    return cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("group_size"),
        F.countDistinct("band").alias("l_distinct"),
        F.when(F.countDistinct("band") < _L_THRESHOLD, 1)
        .otherwise(0)
        .cast("long")
        .alias("low_diversity"),
    )
