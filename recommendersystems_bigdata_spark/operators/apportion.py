"""Exact apportionment / proration (SURVEY.md §2.AU, round 9).

The penny-exact allocation family every billing / finance-engineering
system needs: prorating an order-level amount across its lines so the
allocations SUM EXACTLY to the order amount (largest-remainder a.k.a.
Hamilton rounding — naive per-line rounding leaks pennies), and the two
classic seat-apportionment methods over nations-by-customer-count:
Hamilton (largest remainder) and D'Hondt (highest averages), whose
DISAGREEMENT on the same input is itself the textbook result the
comparison column surfaces.

Everything is exact integer arithmetic:
- Largest remainder: floor share = (total·w_i) div W; the r = total −
  Σfloor leftover units go to the r largest remainders
  ((total·w_i) mod W, ties by line number / nation key) — allocations
  sum exactly by construction.
- D'Hondt: seat quotients v/d are ranked WITHOUT floats via the scaled
  integer (v·10⁶) div d (deterministic, identical truncation both
  engines; ties broken by (nation, divisor)).

Spark-first shape, sized for 100 TB:
- Proration is per-order window arithmetic: rank-of-remainder +
  running count inside each order's partition — ONE orderkey shuffle,
  no join, no iteration (largest-remainder is closed-form, unlike
  iterative water-filling).
- Apportionment runs on the |nations|-row census; the D'Hondt divisor
  explode is |nations|×|seats| — bounded by the seat count, not the
  corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query

_CENTS = "CAST(floor({col} * 100 + 0.5) AS BIGINT)"
_SEATS = 100


@query(
    "q_prorate_largest_remainder",
    oracle=f"""
    WITH lines AS (
      SELECT l_orderkey AS ok, l_linenumber AS ln,
             {_CENTS.format(col="l_extendedprice")} AS w
      FROM lineitem
    ),
    tot AS (
      SELECT ok, ln, w,
             CAST(sum(w) OVER (PARTITION BY ok) AS BIGINT) AS big_w,
             CAST(count(*) OVER (PARTITION BY ok) AS BIGINT) AS n_lines
      FROM lines
    ),
    ord AS (
      SELECT o_orderkey AS ok, {_CENTS.format(col="o_totalprice")} AS total
      FROM orders
    ),
    based AS (
      SELECT t.ok, t.ln, t.w, o.total,
             (o.total * t.w) // t.big_w AS floor_cents,
             (o.total * t.w) % t.big_w AS remainder
      FROM tot t JOIN ord o ON t.ok = o.ok
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY ok
                 ORDER BY remainder DESC, ln, w) AS rem_rank,
             CAST(total - sum(floor_cents) OVER (PARTITION BY ok)
                  AS BIGINT) AS leftover
      FROM based
    )
    SELECT ok AS l_orderkey, ln AS l_linenumber, w AS line_cents,
           floor_cents + CASE WHEN rem_rank <= leftover THEN 1 ELSE 0 END
             AS allocated_cents
    FROM ranked
    ORDER BY l_orderkey, l_linenumber, line_cents
    """,
)
def q_prorate_largest_remainder(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """§2.AU au1 — penny-exact line proration: each order's header total
    is allocated across its lines proportionally to extended price by
    the largest-remainder rule — floor shares first, then the leftover
    pennies (total − Σfloor, always < n_lines) to the largest
    remainders, (line number, line cents) breaking ties: this corpus's
    l_linenumber is NOT unique within an order (the a-suite contiguity
    audit documents that), so the tiebreak includes the weight — rows
    still tied after that are fully identical, and interchangeable
    allocations leave the result multiset unchanged (the hash compare
    is multiset-exact). Per-order allocations sum to the header total
    EXACTLY (the conservation identity the tests pin); naive rounding
    leaks up to n_lines/2 pennies per order.

    Scale: the weight window, remainder rank and leftover window all
    share ONE orderkey partitioning (single exchange + sort of the
    fact); the header joins in on the same key."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
        F.expr(_CENTS.format(col="l_extendedprice")).alias("w"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.expr(_CENTS.format(col="o_totalprice")).alias("total"),
    )
    w_ok = Window.partitionBy("ok")
    tot = li.withColumn(
        "big_w", F.sum("w").over(w_ok).cast("long")
    )
    based = tot.join(orders, "ok").withColumns(
        {
            "floor_cents": F.expr("(total * w) div big_w"),
            "remainder": F.expr("(total * w) % big_w"),
        }
    )
    ranked = based.withColumns(
        {
            "rem_rank": F.row_number().over(
                Window.partitionBy("ok").orderBy(
                    F.desc("remainder"), "ln", "w"
                )
            ),
            "leftover": (
                F.col("total") - F.sum("floor_cents").over(w_ok)
            ).cast("long"),
        }
    )
    return ranked.select(
        F.col("ok").alias("l_orderkey"),
        F.col("ln").alias("l_linenumber"),
        F.col("w").alias("line_cents"),
        (
            F.col("floor_cents")
            + F.when(F.col("rem_rank") <= F.col("leftover"), 1).otherwise(0)
        ).alias("allocated_cents"),
    ).orderBy("l_orderkey", "l_linenumber", "line_cents")


@query(
    "q_apportion_hamilton",
    oracle=f"""
    WITH pop AS (
      SELECT c_nationkey AS nk, CAST(count(*) AS BIGINT) AS v
      FROM customer GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(v) AS BIGINT) AS big_v FROM pop),
    based AS (
      SELECT nk, v,
             ({_SEATS} * v) // (SELECT big_v FROM tot) AS floor_seats,
             ({_SEATS} * v) % (SELECT big_v FROM tot) AS remainder
      FROM pop
    ),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY remainder DESC, nk) AS rem_rank,
             CAST({_SEATS} - sum(floor_seats) OVER () AS BIGINT) AS leftover
      FROM based
    )
    SELECT nk AS c_nationkey, v AS n_customers,
           floor_seats + CASE WHEN rem_rank <= leftover THEN 1 ELSE 0 END
             AS seats
    FROM ranked ORDER BY c_nationkey
    """,
)
def q_apportion_hamilton(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AU au2 — Hamilton (largest-remainder) apportionment: 100
    "seats" distributed over nations proportionally to customer count —
    floor quotas first, leftover seats to the largest remainders
    (nation key breaking ties). Seats sum to exactly 100 (pinned).
    The same kernel as au1, applied to a census instead of an order —
    quota apportionment is proration.

    Scale: one customer census shuffle; the remainder rank and leftover
    window run over the 25-row census (the only acceptable place for an
    unpartitioned window)."""
    pop = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).cast("long").alias("v"))
    )
    tot = pop.agg(F.sum("v").cast("long").alias("big_v"))
    based = pop.join(F.broadcast(tot)).withColumns(
        {
            "floor_seats": F.expr(f"({_SEATS} * v) div big_v"),
            "remainder": F.expr(f"({_SEATS} * v) % big_v"),
        }
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = based.withColumns(
        {
            "rem_rank": F.row_number().over(
                Window.orderBy(F.desc("remainder"), "nk")
            ),
            "leftover": (
                F.lit(_SEATS) - F.sum("floor_seats").over(w_all)
            ).cast("long"),
        }
    )
    return ranked.select(
        F.col("nk").alias("c_nationkey"),
        F.col("v").alias("n_customers"),
        (
            F.col("floor_seats")
            + F.when(F.col("rem_rank") <= F.col("leftover"), 1).otherwise(0)
        ).alias("seats"),
    ).orderBy("c_nationkey")


@query(
    "q_apportion_dhondt",
    oracle=f"""
    WITH pop AS (
      SELECT c_nationkey AS nk, CAST(count(*) AS BIGINT) AS v
      FROM customer GROUP BY 1
    ),
    quotients AS (
      SELECT nk, v, CAST(d AS BIGINT) AS d,
             (v * 1000000) // CAST(d AS BIGINT) AS q_scaled
      FROM pop, unnest(generate_series(1, {_SEATS})) AS t(d)
    ),
    awarded AS (
      SELECT nk, v,
             row_number() OVER (ORDER BY q_scaled DESC, nk, d) AS award
      FROM quotients
    )
    SELECT nk AS c_nationkey, CAST(max(v) AS BIGINT) AS n_customers,
           CAST(sum(CASE WHEN award <= {_SEATS} THEN 1 ELSE 0 END)
                AS BIGINT) AS seats
    FROM awarded GROUP BY 1 ORDER BY c_nationkey
    """,
)
def q_apportion_dhondt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AU au3 — D'Hondt (highest-averages) apportionment: the same
    100 seats, awarded one at a time to the largest quotient v/d
    (d = seats already won + 1) — computed closed-form by ranking ALL
    |nations|×100 quotients and taking the top 100. Quotients are
    ranked float-free via the scaled integer ``(v·10⁶) div d``
    (identical truncation both engines; (nation, divisor) breaks ties).
    D'Hondt systematically favors larger parties vs au2's Hamilton —
    comparing the two outputs on the same census is the textbook
    exercise, and the tests assert exactly that divergence pattern.

    Scale: the divisor explode is |nations|×seats — bounded by the
    seat count; the award rank is a 2500-row unpartitioned window."""
    pop = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).cast("long").alias("v"))
    )
    quotients = pop.select(
        "nk",
        "v",
        F.explode(F.sequence(F.lit(1), F.lit(_SEATS))).alias("d"),
    ).withColumns(
        {
            "d": F.col("d").cast("long"),
            "q_scaled": F.expr("(v * 1000000) div d"),
        }
    )
    awarded = quotients.withColumn(
        "award",
        F.row_number().over(Window.orderBy(F.desc("q_scaled"), "nk", "d")),
    )
    return (
        awarded.groupBy(F.col("nk").alias("c_nationkey"))
        .agg(
            F.max("v").cast("long").alias("n_customers"),
            F.sum(F.when(F.col("award") <= _SEATS, 1).otherwise(0))
            .cast("long")
            .alias("seats"),
        )
        .orderBy("c_nationkey")
    )
