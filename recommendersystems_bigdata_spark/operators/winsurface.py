"""Window-frame surface completeness (SURVEY.md §2.AQ, round 9).

The §2.E windows cover ranks/offsets/ROWS frames and §2.U u1 covers
value-based RANGE frames; this suite completes the ANSI window-frame
surface — including the clauses Spark does NOT implement, each lowered
to an equivalent Spark spelling and hash-matched against DuckDB's
NATIVE spelling (the strongest possible evidence the emulation is
exact):

- ``nth_value`` over an expanding frame (Spark-native).
- ``lead(...) IGNORE NULLS`` — next non-null value lookahead
  (Spark-native via SQL since 3.1).
- ``GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW`` — peer-group frames.
  Spark has no GROUPS mode; lowered to a bounded peer-group census +
  lag, joined back. Oracle: DuckDB's native GROUPS frame.
- ``EXCLUDE CURRENT ROW`` — leave-one-out frames. Spark has no frame
  exclusion; lowered to subtraction: (frame_sum − current) over
  (frame_count − 1). Oracle: DuckDB's native EXCLUDE CURRENT ROW.
- aggregate ``FILTER (WHERE ...)`` over a window — Spark lowers it to
  the CASE-WHEN inside the window aggregate. Oracle: DuckDB's native
  FILTER clause.

Exactness: cents grid + truncated division throughout; every ordering
is total ((orderdate, orderkey)), so offset/nth results are
deterministic under date ties.

Spark-first shape, sized for 100 TB: every query is ONE hash-partition
shuffle on o_custkey + one in-partition sort; the GROUPS emulation's
join-back runs against the (customer, day) census — smaller than the
fact — and stays on the same partitioning (no extra exchange under
sort-merge reuse).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query

_CENTS = "CAST(floor({col} * 100 + 0.5) AS BIGINT)"

# shared base: customer's orders with exact cents + epoch day
_BASE_SQL = f"""
base AS (
  SELECT o_custkey AS ck, o_orderkey AS ok, o_orderstatus AS status,
         CAST(date_diff('day', DATE '1970-01-01',
                        CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
         {_CENTS.format(col="o_totalprice")} AS cents
  FROM orders
)
"""


def _base(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        F.col("o_custkey").alias("ck"),
        F.col("o_orderkey").alias("ok"),
        F.col("o_orderstatus").alias("status"),
        F.expr(
            "CAST(datediff(CAST(o_orderdate AS DATE),"
            " DATE '1970-01-01') AS BIGINT)"
        ).alias("day"),
        F.expr(_CENTS.format(col="o_totalprice")).alias("cents"),
    )


@query(
    "q_win_nth_values",
    oracle=f"""
    WITH {_BASE_SQL},
    seq AS (
      SELECT ck, cents,
             row_number() OVER w AS rn,
             count(*) OVER (PARTITION BY ck) AS n_orders,
             nth_value(cents, 2) OVER w AS second_cents,
             nth_value(cents, 3) OVER w AS third_cents
      FROM base
      WINDOW w AS (PARTITION BY ck ORDER BY day, ok
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT ck AS o_custkey, CAST(n_orders AS BIGINT) AS n_orders,
           cents AS last_cents, second_cents, third_cents
    FROM seq WHERE rn = n_orders
    ORDER BY o_custkey
    """,
)
def q_win_nth_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AQ aq1 — nth_value over an expanding frame: each customer's
    2nd and 3rd order values (lifetime order, (day, orderkey) total
    order), read off the FINAL row of the expanding frame (rn =
    n_orders) so the frame provably covers the whole history; customers
    with fewer orders carry NULLs, exactly ANSI nth_value semantics.

    Scale: one custkey shuffle + sort; all four window functions share
    the frame."""
    w = (
        Window.partitionBy("ck")
        .orderBy("day", "ok")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    seq = (
        _base(spark, sf_dir)
        .withColumn("rn", F.row_number().over(Window.partitionBy("ck").orderBy("day", "ok")))
        .withColumn(
            "n_orders",
            F.count(F.lit(1)).over(Window.partitionBy("ck")).cast("long"),
        )
        .withColumn("second_cents", F.nth_value("cents", 2).over(w))
        .withColumn("third_cents", F.nth_value("cents", 3).over(w))
    )
    return (
        seq.filter(F.col("rn") == F.col("n_orders"))
        .select(
            F.col("ck").alias("o_custkey"),
            "n_orders",
            F.col("cents").alias("last_cents"),
            "second_cents",
            "third_cents",
        )
        .orderBy("o_custkey")
    )


@query(
    "q_win_lead_ignore_nulls",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
             CASE WHEN event_type = 'purchase'
                  THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END
               AS purchase_cents
      FROM events
    )
    SELECT user_id, event_id, event_type,
           lead(purchase_cents IGNORE NULLS) OVER
             (PARTITION BY user_id ORDER BY ts, event_id)
             AS next_purchase_cents
    FROM ev ORDER BY user_id, event_id
    """,
)
def q_win_lead_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AQ aq2 — IGNORE NULLS lookahead: every event annotated with
    the value of the user's NEXT purchase (non-purchase events carry
    NULL in the source column, so plain lead(1) would usually return
    NULL — IGNORE NULLS skips ahead to the next non-null). The
    time-to-next-conversion primitive attribution models start from.

    Scale: one user shuffle + time sort; IGNORE NULLS is evaluated in
    the same single window pass (no self-join lookahead)."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("_aq2_events")
    return spark.sql(
        """
        WITH ev AS (
          SELECT user_id, event_id, ts, event_type,
                 CASE WHEN event_type = 'purchase'
                      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END
                   AS purchase_cents
          FROM _aq2_events
        )
        SELECT user_id, event_id, event_type,
               lead(purchase_cents) IGNORE NULLS OVER
                 (PARTITION BY user_id ORDER BY ts, event_id)
                 AS next_purchase_cents
        FROM ev ORDER BY user_id, event_id
        """
    )


@query(
    "q_win_groups_frame",
    oracle=f"""
    WITH {_BASE_SQL},
    grouped AS (
      SELECT ck, ok, day, cents,
             dense_rank() OVER (PARTITION BY ck ORDER BY day) AS grp
      FROM base
    )
    SELECT ck AS o_custkey, ok AS o_orderkey, day, cents,
           CAST(sum(cents) OVER (PARTITION BY ck ORDER BY grp
                RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS two_day_group_cents
    FROM grouped ORDER BY o_custkey, o_orderkey
    """,
)
def q_win_groups_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AQ aq3 — GROUPS frame: per order, the customer's spend over
    the order's peer group (same order day) PLUS the previous distinct
    order day — ``GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW``, the
    rank-based frame mode Spark does not implement (and, as of this
    DuckDB build, neither does the oracle engine — its parser rejects
    GROUPS too). Spark lowering: a (customer, day) census, lag(1) over
    days, joined back onto the rows. Oracle: the textbook rank
    equivalence — a value RANGE frame over ``dense_rank(day)``
    (peers share a rank, so RANGE 1 PRECEDING over ranks IS the GROUPS
    frame) — a genuinely different mechanism, so the hash match proves
    the emulation exact (including single-day customers, whose
    previous group is empty).

    Scale: the census is bounded by active (customer, day) pairs; the
    join-back keys on the same (ck, day) the census was built on, so
    under sort-merge reuse the fact pays one shuffle + one bounded
    join."""
    base = _base(spark, sf_dir)
    census = base.groupBy("ck", "day").agg(
        F.sum("cents").cast("long").alias("day_cents")
    )
    w = Window.partitionBy("ck").orderBy("day")
    grouped = census.withColumn(
        "two_day_group_cents",
        (
            F.col("day_cents")
            + F.coalesce(F.lag("day_cents", 1).over(w), F.lit(0))
        ).cast("long"),
    )
    return (
        base.join(grouped.select("ck", "day", "two_day_group_cents"), ["ck", "day"])
        .select(
            F.col("ck").alias("o_custkey"),
            F.col("ok").alias("o_orderkey"),
            "day",
            "cents",
            "two_day_group_cents",
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "q_win_exclude_current",
    oracle=f"""
    WITH {_BASE_SQL}
    SELECT ck AS o_custkey, ok AS o_orderkey, cents,
           CAST(count(*) OVER win AS BIGINT) AS n_neighbors,
           CAST(sum(cents) OVER win AS BIGINT)
             // nullif(CAST(count(*) OVER win AS BIGINT), 0)
             AS loo_mean_cents
    FROM base
    WINDOW win AS (PARTITION BY ck ORDER BY day, ok
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
                   EXCLUDE CURRENT ROW)
    ORDER BY o_custkey, o_orderkey
    """,
)
def q_win_exclude_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AQ aq4 — EXCLUDE CURRENT ROW: each order against the mean of
    its ±3-row neighborhood EXCLUDING itself — the leave-one-out local
    baseline behind peer-comparison anomaly scores (an order is odd
    relative to its neighbors, not to itself). Spark has no frame
    exclusion; lowered by subtraction — ``(Σframe − current) div
    (count − 1)``, NULL for singleton frames — and hash-matched against
    DuckDB's native EXCLUDE CURRENT ROW.

    Scale: one custkey shuffle + sort; both frame aggregates share one
    window pass."""
    w = (
        Window.partitionBy("ck")
        .orderBy("day", "ok")
        .rowsBetween(-3, 3)
    )
    return (
        _base(spark, sf_dir)
        .withColumn("_sum", F.sum("cents").over(w).cast("long"))
        .withColumn("_cnt", F.count(F.lit(1)).over(w).cast("long"))
        .select(
            F.col("ck").alias("o_custkey"),
            F.col("ok").alias("o_orderkey"),
            "cents",
            (F.col("_cnt") - 1).alias("n_neighbors"),
            F.expr(
                "(_sum - cents) div nullif(_cnt - 1, 0)"
            ).alias("loo_mean_cents"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "q_win_filter_clause",
    oracle=f"""
    WITH {_BASE_SQL}
    SELECT ck AS o_custkey, ok AS o_orderkey, status,
           CAST(count(*) FILTER (WHERE status = 'F') OVER cum AS BIGINT)
             AS f_orders_so_far,
           CAST(COALESCE(sum(cents) FILTER (WHERE status = 'F') OVER cum,
                         0) AS BIGINT) AS f_cents_so_far
    FROM base
    WINDOW cum AS (PARTITION BY ck ORDER BY day, ok
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY o_custkey, o_orderkey
    """,
)
def q_win_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AQ aq5 — FILTER clause over a window: each order annotated
    with the customer's running count and spend of FULFILLED ('F')
    orders so far — ``agg(...) FILTER (WHERE ...) OVER w``, which Spark
    lowers to the CASE-WHEN-inside-the-aggregate spelling; the oracle
    is DuckDB's native FILTER clause, pinning the equivalence
    (including the empty-filter prefix, where COUNT gives 0 and SUM
    gives NULL → COALESCEd to 0 in both).

    Scale: one custkey shuffle + sort; both conditional aggregates
    ride the same expanding frame."""
    cum = (
        Window.partitionBy("ck")
        .orderBy("day", "ok")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    is_f = F.when(F.col("status") == "F", 1).otherwise(0)
    f_cents = F.when(F.col("status") == "F", F.col("cents")).otherwise(
        F.lit(0)
    )
    return (
        _base(spark, sf_dir)
        .withColumn("f_orders_so_far", F.sum(is_f).over(cum).cast("long"))
        .withColumn("f_cents_so_far", F.sum(f_cents).over(cum).cast("long"))
        .select(
            F.col("ck").alias("o_custkey"),
            F.col("ok").alias("o_orderkey"),
            "status",
            "f_orders_so_far",
            "f_cents_so_far",
        )
        .orderBy("o_custkey", "o_orderkey")
    )
