"""Exact contingency / association analytics (SURVEY.md §2.AS, round 9).

The 2×2-table family an experimentation or risk team runs when the
question is "does membership associate with an outcome?": the
contingency-table builder itself, odds ratio + relative risk (the
epidemiology pair — OR for case-control shape, RR when incidence is
meaningful), and Yule's Q (the bounded ±1 association coefficient,
(ad−bc)/(ad+bc), which unlike the odds ratio never divides by a zero
cell unless the table is degenerate). Exposure = AUTOMOBILE-segment
membership; outcome = the customer has at least one returned line item
('R') — per customer nation, so every statistic is a per-nation row.

Everything stays exact-integer: cell counts BIGINT, odds/risk ratios in
truncated MILLI-units (1000 = no association), Yule's Q in truncated bp
(±10000 bounds) — ``a·d`` products of per-nation counts are ≪ 2⁶³ at
any corpus size because cells are bounded by customers-per-nation, and
both engines truncate identically (negative numerators included,
verified by the repo-wide div/`//` contract).

Spark-first shape, sized for 100 TB:
- The outcome flag is ONE fact⋈fact equi-join (lineitem⋈orders on
  orderkey, sort-merge) followed by a partial-aggregated custkey
  rollup — `max(is_returned)` is commutative, so the map side absorbs
  the line-item fan-in before the shuffle.
- The flagged customer relation is built once per query and collapses
  immediately to a |nations|-row conditional census; every ratio is
  arithmetic on that census (no second pass, no join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query

# DuckDB: per-nation 2×2 cells. a = exposed & outcome, b = exposed & not,
# c = unexposed & outcome, d = unexposed & not.
_CELLS_SQL = """
returned AS (
  SELECT o.o_custkey AS ck, CAST(max(CASE WHEN l.l_returnflag = 'R'
                                          THEN 1 ELSE 0 END) AS BIGINT)
           AS has_return
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1
),
flagged AS (
  SELECT c.c_nationkey AS nk,
         CASE WHEN c.c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END
           AS exposed,
         COALESCE(r.has_return, 0) AS outcome
  FROM customer c LEFT JOIN returned r ON c.c_custkey = r.ck
),
cells AS (
  SELECT nk,
         CAST(sum(exposed * outcome) AS BIGINT) AS a,
         CAST(sum(exposed * (1 - outcome)) AS BIGINT) AS b,
         CAST(sum((1 - exposed) * outcome) AS BIGINT) AS c,
         CAST(sum((1 - exposed) * (1 - outcome)) AS BIGINT) AS d
  FROM flagged GROUP BY 1
)
"""


def _cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(nk, a, b, c, d): the per-nation 2×2 contingency cells."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    returned = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("o_custkey").alias("ck"))
        .agg(
            F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("long")
            .alias("has_return")
        )
    )
    flagged = (
        cust.join(returned, cust.c_custkey == returned.ck, "left")
        .select(
            F.col("c_nationkey").alias("nk"),
            F.when(F.col("c_mktsegment") == "AUTOMOBILE", 1)
            .otherwise(0)
            .alias("exposed"),
            F.coalesce(F.col("has_return"), F.lit(0)).alias("outcome"),
        )
    )
    return flagged.groupBy("nk").agg(
        F.sum(F.expr("exposed * outcome")).cast("long").alias("a"),
        F.sum(F.expr("exposed * (1 - outcome)")).cast("long").alias("b"),
        F.sum(F.expr("(1 - exposed) * outcome")).cast("long").alias("c"),
        F.sum(F.expr("(1 - exposed) * (1 - outcome)")).cast("long").alias("d"),
    )


@query(
    "q_contingency_2x2",
    oracle=f"""
    WITH {_CELLS_SQL}
    SELECT nk AS c_nationkey, a, b, c, d,
           a + b + c + d AS n_customers
    FROM cells ORDER BY c_nationkey
    """,
)
def q_contingency_2x2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AS as1 — the 2×2 contingency builder: per nation, the four
    cells of (AUTOMOBILE-segment membership × has-a-returned-item):
    a = exposed∧outcome, b = exposed∧¬outcome, c = ¬exposed∧outcome,
    d = neither; the cells sum to the nation's customer count (the
    conservation check tests pin). as2/as3 are pure arithmetic on this
    table.

    Scale: one fact⋈fact sort-merge (lineitem⋈orders on orderkey) with
    the outcome flag partial-aggregated map-side, one left join under
    the customer dim, |nations|-row census."""
    return (
        _cells(spark, sf_dir)
        .select(
            F.col("nk").alias("c_nationkey"),
            "a",
            "b",
            "c",
            "d",
            (F.col("a") + F.col("b") + F.col("c") + F.col("d")).alias(
                "n_customers"
            ),
        )
        .orderBy("c_nationkey")
    )


@query(
    "q_assoc_odds_relative_risk",
    oracle=f"""
    WITH {_CELLS_SQL}
    SELECT nk AS c_nationkey,
           (10000 * a) // nullif(a + b, 0) AS exposed_rate_bp,
           (10000 * c) // nullif(c + d, 0) AS unexposed_rate_bp,
           (1000 * a * d) // nullif(b * c, 0) AS odds_ratio_milli,
           (1000 * a * (c + d)) // nullif(c * (a + b), 0)
             AS relative_risk_milli
    FROM cells ORDER BY c_nationkey
    """,
)
def q_assoc_odds_relative_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AS as2 — odds ratio + relative risk per nation, in truncated
    milli-units (1000 = no association): OR = (a·d)/(b·c), RR =
    (a/(a+b))/(c/(c+d)) spelled division-last as (a·(c+d))/(c·(a+b)) so
    the only division is the final truncation. Degenerate cells (empty
    row or zero cross product) yield NULL via nullif in both engines —
    reported, not silently dropped. Outcome incidence rates for each
    arm ride along in bp.

    Scale: arithmetic on the |nations|-row census from as1's single
    pass."""
    c = _cells(spark, sf_dir)
    return c.select(
        F.col("nk").alias("c_nationkey"),
        F.expr("(10000 * a) div nullif(a + b, 0)").alias("exposed_rate_bp"),
        F.expr("(10000 * c) div nullif(c + d, 0)").alias(
            "unexposed_rate_bp"
        ),
        F.expr("(1000 * a * d) div nullif(b * c, 0)").alias(
            "odds_ratio_milli"
        ),
        F.expr("(1000 * a * (c + d)) div nullif(c * (a + b), 0)").alias(
            "relative_risk_milli"
        ),
    ).orderBy("c_nationkey")


@query(
    "q_assoc_yule_q",
    oracle=f"""
    WITH {_CELLS_SQL}
    SELECT nk AS c_nationkey,
           (10000 * (a * d - b * c)) // nullif(a * d + b * c, 0)
             AS yule_q_bp,
           CASE WHEN a * d - b * c > 0 THEN 'positive'
                WHEN a * d - b * c < 0 THEN 'negative'
                ELSE 'none' END AS association
    FROM cells ORDER BY c_nationkey
    """,
)
def q_assoc_yule_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AS as3 — Yule's Q per nation: (ad − bc)/(ad + bc) in truncated
    bp, bounded ±10000 by construction — the association coefficient
    that stays finite wherever the odds ratio blows up on a zero cell
    (it only NULLs when ad + bc = 0, a fully degenerate table). The
    signed÷positive truncation is the floor-vs-trunc divergence case;
    both engines truncate toward zero (repo-wide contract).

    Scale: same |nations|-row arithmetic."""
    c = _cells(spark, sf_dir)
    return c.select(
        F.col("nk").alias("c_nationkey"),
        F.expr(
            "(10000 * (a * d - b * c)) div nullif(a * d + b * c, 0)"
        ).alias("yule_q_bp"),
        F.when(F.expr("a * d - b * c > 0"), "positive")
        .when(F.expr("a * d - b * c < 0"), "negative")
        .otherwise("none")
        .alias("association"),
    ).orderBy("c_nationkey")
