"""Incremental view maintenance under DELETES (SURVEY.md §2.R, round 8).

The INSERT path of incremental maintenance — compute mergeable partial
states per partition, merge states instead of recomputing — is already
a first-class operator here: a19 ``q_incremental_agg``
(``sources/ingest.py``), whose hash match pins the monoid contract
``merge(state(A), state(B)) = state(A ∪ B)``. What a19 cannot do is
DELETES: a monoid has no inverse. This module adds the delete path —
count and sum form an abelian GROUP (every element has an inverse), so
a correction/GDPR/late-retraction batch maintains the standing
aggregate by merging NEGATED measures, no base-table rescan. min/max
deliberately stay out: they are only a semilattice (no inverse — a
deleted minimum forces a per-group recompute), and the docstring below
is the place that says so.

Certification, the repo's usual way: the Spark side executes the
retraction-merge plan, the DuckDB oracle executes the FULL RECOMPUTE
over the surviving rows, and the hash match proves retraction ≡
recompute on real data. (Gupta & Mumick, "Maintenance of Materialized
Views: Problems, Techniques, and Applications", IEEE Data Eng. Bull.
18(2), 1995 — the self-maintainability results exercised here;
TimescaleDB continuous aggregates / Materialize are the production
incarnations.)

Numeric discipline: measures are exact e2 integers (2-dp doubles ×100,
``floor(x*100+0.5)``), so add/negate/re-add is exact integer group
arithmetic — a float sum would drift between the incremental and
recompute paths by summation order, which is the usual reason naive
incremental pipelines "almost" match their backfills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query

_OPRICE_E2 = "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"


@query(
    "q_incr_retract_orders",
    oracle=f"""
    SELECT o_custkey, count(*) AS n_orders,
           CAST(sum({_OPRICE_E2}) AS BIGINT) AS total_e2
    FROM orders
    WHERE o_orderkey % 17 <> 0
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_incr_retract_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.R i1 — retraction merge: a per-customer (order count, exact e2
    spend) aggregate maintained under DELETES without touching the base
    table — the delete batch (every 17th order, a deterministic ~6%)
    aggregates with NEGATED measures and merges into the standing
    snapshot; groups whose count reaches zero drop out. The oracle
    recomputes directly over the surviving orders — the hash match
    certifies retraction-merge ≡ recompute, including customers whose
    every order was deleted (count 0 rows are filtered, matching the
    oracle's natural absence; the zero-sum agrees by group arithmetic,
    not by accident).

    count/sum invert because they form an abelian group; min/max do NOT
    (no inverse — a deleted minimum forces a per-group rescan), which is
    why this operator maintains exactly the group aggregates and a
    min/max delete falls back to a19-style recompute of the touched
    groups.

    Scale: the snapshot aggregate is the one fact-sized shuffle (and in
    steady state it ALREADY EXISTS as the stored materialization — it is
    rebuilt here so the operator is self-contained); the delete batch is
    pruned at its scan and aggregates to at most |touched customers|
    rows; the merge aggregate sits directly on the Union with NO third
    exchange — both branches are co-partitioned on the merge key
    (plan-pinned)."""
    orders = load_table(spark, sf_dir, "orders")
    price = F.expr(_OPRICE_E2)
    snapshot = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(price).alias("total_e2"),
    )
    retract = (
        orders.filter(F.col("o_orderkey") % 17 == 0)
        .groupBy("o_custkey")
        .agg(
            (-F.count(F.lit(1))).alias("n_orders"),
            (-F.sum(price)).alias("total_e2"),
        )
    )
    return (
        snapshot.unionByName(retract)
        .groupBy("o_custkey")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("total_e2").alias("total_e2"),
        )
        .filter(F.col("n_orders") > 0)
        .orderBy("o_custkey")
    )
