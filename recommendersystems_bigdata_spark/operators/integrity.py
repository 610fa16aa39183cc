"""Ledger-integrity audits (SURVEY.md §2.AD, round 9).

The fraud/integrity tripwires a finance-adjacent warehouse runs beside
§2.AB's Benford test: round-amount bias (fabricated figures cluster on
.00/.99 endings), duplicate-charge candidates (same customer, same
exact amount, same day, different order keys — the double-billing
signature), and key-space gap auditing (missing id ranges reveal lost
ingestion batches or out-of-band deletes that tombstone accounting
should have caught).

Exactness discipline: amounts on the exact cent grid, ending classes
from `cents % 100` (non-negative operands — truncation identical in
both engines), shares in truncated-div bp, and gap arithmetic on
BIGINT keys.

Spark-first shape, sized for 100 TB:
- Round-amount bias: one map-side-combined groupBy to |priorities| x 3
  rows; the per-priority totals come from a window over that bounded
  relation.
- Duplicate charges: one groupBy on the (custkey, cents, day) composite
  — the shuffle any spelling pays — emitting only groups with >= 2
  distinct keys; no self-join, no pairwise work.
- Key-space gaps: the run decomposition uses the two-pass distributed
  global_row_number (key − rank is constant per contiguous run), never
  a single-partition window over the fact; only the |runs|-row relation
  sees an ordered window, and it is checkpointed first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.functions.ranks import global_row_number
from recommendersystems_bigdata_spark.registry import query

_CENTS = "CAST(floor({col} * 100 + 0.5) AS BIGINT)"


@query(
    "q_audit_round_amounts",
    oracle=f"""
    WITH c AS (
      SELECT o_orderpriority,
             CASE WHEN {_CENTS.format(col="o_totalprice")} % 100 = 0 THEN '00'
                  WHEN {_CENTS.format(col="o_totalprice")} % 100 = 99 THEN '99'
                  ELSE 'other' END AS ending
      FROM orders
    ),
    agg AS (
      SELECT o_orderpriority, ending, CAST(count(*) AS BIGINT) AS n
      FROM c GROUP BY 1, 2
    )
    SELECT o_orderpriority, ending, n,
           (10000 * n) // CAST(sum(n) OVER (PARTITION BY o_orderpriority)
                               AS BIGINT) AS share_bp
    FROM agg ORDER BY o_orderpriority, ending
    """,
)
def q_audit_round_amounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AD ad1 — round-amount bias audit: per order priority, how many
    totals end in exactly .00, exactly .99, or anything else, with the
    within-priority share in bp. Honest amounts put ~1% in each exact
    ending; hand-entered or fabricated figures cluster on them — the
    companion tripwire to §2.AB's Benford first-digit test (leading vs
    trailing digits catch different fabrication styles).

    Scale: one map-side-combined groupBy to |priorities| x 3 rows; the
    share window runs over that bounded aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.expr(_CENTS.format(col="o_totalprice"))
    ending = (
        F.when(cents % 100 == 0, F.lit("00"))
        .when(cents % 100 == 99, F.lit("99"))
        .otherwise(F.lit("other"))
    )
    agg = orders.groupBy("o_orderpriority", ending.alias("ending")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = F.sum("n").over(Window.partitionBy("o_orderpriority")).cast("long")
    return (
        agg.withColumn("tot", tot)
        .withColumn("share_bp", F.expr("(10000 * n) div tot"))
        .select("o_orderpriority", "ending", "n", "share_bp")
        .orderBy("o_orderpriority", "ending")
    )


@query(
    "q_audit_duplicate_candidates",
    oracle=f"""
    SELECT o_custkey,
           CAST(CAST(date_trunc('day', CAST(o_orderdate AS TIMESTAMP)) AS DATE)
                AS VARCHAR) AS day,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum({_CENTS.format(col="o_totalprice")}) AS BIGINT) AS total_cents,
           CAST(max({_CENTS.format(col="o_totalprice")})
                - min({_CENTS.format(col="o_totalprice")}) AS BIGINT)
             AS amount_spread_cents,
           CAST(min(o_orderkey) AS BIGINT) AS first_orderkey,
           CAST(max(o_orderkey) AS BIGINT) AS last_orderkey
    FROM orders
    GROUP BY 1, 2
    HAVING count(*) >= 2
    ORDER BY n_orders DESC, o_custkey, day
    """,
)
def q_audit_duplicate_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AD ad2 — duplicate-submission candidates: customers who placed
    TWO OR MORE orders on the same day, with the group's exact total and
    the spread between its largest and smallest amounts — spread 0 is
    the exact double-billing signature, small spreads are the re-keyed
    resubmits reconciliation teams eyeball (distinct from §2.K's content
    dedup: the keys differ, the duplication is a business-level
    anomaly). The corpus has genuine same-day multi-order groups, so the
    audit is non-vacuous at every test scale.

    Scale: one partial-aggregated groupBy on the (custkey, day)
    composite — the single shuffle any spelling of this audit pays; the
    HAVING filter collapses output to the anomaly set. No self-join, no
    pairwise candidate generation."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.expr(_CENTS.format(col="o_totalprice"))
    return (
        orders.groupBy(
            "o_custkey",
            F.to_date(F.date_trunc("day", "o_orderdate")).cast("string").alias("day"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(cents).cast("long").alias("total_cents"),
            (F.max(cents) - F.min(cents)).cast("long").alias("amount_spread_cents"),
            F.min("o_orderkey").cast("long").alias("first_orderkey"),
            F.max("o_orderkey").cast("long").alias("last_orderkey"),
        )
        .filter(F.col("n_orders") >= 2)
        .orderBy(F.desc("n_orders"), "o_custkey", "day")
    )


@query(
    "q_audit_keyspace_gaps",
    oracle="""
    WITH keys AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
    ranked AS (
      SELECT k, CAST(row_number() OVER (ORDER BY k) AS BIGINT) AS rn FROM keys
    ),
    runs AS (
      SELECT k - rn AS grp, CAST(min(k) AS BIGINT) AS run_start,
             CAST(max(k) AS BIGINT) AS run_end,
             CAST(count(*) AS BIGINT) AS run_len
      FROM ranked GROUP BY 1
    ),
    gaps AS (
      SELECT lag(run_end) OVER (ORDER BY run_start) + 1 AS gap_start,
             run_start - 1 AS gap_end,
             run_start - lag(run_end) OVER (ORDER BY run_start) - 1 AS gap_len
      FROM runs
    )
    SELECT gap_start, gap_end, gap_len
    FROM gaps WHERE gap_len >= 1
    ORDER BY gap_len DESC, gap_start LIMIT 10
    """,
)
def q_audit_keyspace_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AD ad3 — key-space gap audit: the 10 largest order-key ranges
    with NO line items (longest first, earliest on ties). The lineitem
    fact's parent-key sequence has genuine holes — orders whose detail
    rows never arrived — so contiguous missing ranges are lost ingestion
    batches or out-of-band deletes the tombstone ledger (a4) never
    recorded; b4's per-key FK audit finds the orphans, this one finds
    the RANGES, which is what points at a batch.

    Scale: the run decomposition is the gaps-and-islands trick on the
    KEY SPACE — key − global rank is constant within each contiguous
    run — computed with the two-pass distributed global_row_number, so
    the fact never funnels through one partition; only the |runs|-row
    relation (checkpointed) sees the ordered lag window and the
    TakeOrdered tail."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    keys = lineitem.select(F.col("l_orderkey").alias("k")).distinct()
    ranked = global_row_number(keys, [F.col("k").asc()], "rn")
    runs = (
        ranked.groupBy((F.col("k") - F.col("rn")).alias("grp"))
        .agg(
            F.min("k").cast("long").alias("run_start"),
            F.max("k").cast("long").alias("run_end"),
            F.count(F.lit(1)).cast("long").alias("run_len"),
        )
        .localCheckpoint()  # |runs| rows; the ordered lag window runs here
    )
    w = Window.orderBy("run_start")
    gaps = runs.select(
        (F.lag("run_end").over(w) + 1).alias("gap_start"),
        (F.col("run_start") - 1).alias("gap_end"),
        (F.col("run_start") - F.lag("run_end").over(w) - 1).alias("gap_len"),
    ).where(F.col("gap_len") >= 1)
    return gaps.orderBy(F.desc("gap_len"), "gap_start").limit(10)
