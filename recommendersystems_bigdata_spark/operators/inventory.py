"""Inventory / supply-chain flow analytics (SURVEY.md §2.AE, round 9).

The stock-ledger view of the lineitem fact: return lines
(``l_returnflag = 'R'``) are inbound restock lots, everything else is
outbound demand. That single signed-flow framing yields the classic
warehouse-ops suite — running stock balance with oversell detection,
FIFO lot-to-demand allocation, days-of-cover buckets, leftover-lot
aging, and the month-end carryover census — all exact-integer (unit
quantities are integral doubles cast to BIGINT) and all expressible
against the DuckDB oracle.

The interesting distributed kernel is FIFO allocation (ae2): instead of
an order-dependent sequential match, both sides get cumulative-quantity
intervals (``[cum − qty, cum)`` per lot / per demand line, windowed
within the part), and FIFO matching becomes an INTERVAL-OVERLAP
equi-join on the part key — ``allocated = least(ends) − greatest
(starts)`` — the standard cumulative-alignment trick that turns a
sequential algorithm into one shuffle plus a local residual predicate.

Spark-first shape, sized for 100 TB:
- Every window is partitioned by ``l_partkey`` — per-part flow streams
  are small (part count grows with the catalog, per-part history is
  bounded), so no single-partition window ever sees the fact.
- ae2/ae4 feed supply leg, demand leg and per-part totals from ONE
  interval-window lineage with NO checkpoint: ReusedExchange dedups
  the window's shuffle across the self-join, and a measured 10× A/B
  showed every materialization variant strictly slower (see ae2's
  docstring) — the one shuffle any per-part alignment pays.
- Census outputs (ae3/ae5) collapse to bucket/month cardinality before
  any ordered window, so global sorts only ever see bounded relations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query

# signed flow rows, shared by every query here: returns are +qty restocks,
# other lines are -qty demand; (ok, ln) makes the per-part order total.
_FLOWS_SQL = """
flows AS (
  SELECT l_partkey AS p, l_shipdate AS ts, l_orderkey AS ok,
         l_linenumber AS ln, CAST(l_quantity AS BIGINT) AS qty,
         l_returnflag = 'R' AS is_supply,
         CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS BIGINT)
              ELSE -CAST(l_quantity AS BIGINT) END AS sq
  FROM lineitem
)
"""


def _flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(p, ts, ok, ln, qty, is_supply, sq): the signed stock-flow view of
    lineitem — one scan, map-side projection only."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("long")
    return li.select(
        F.col("l_partkey").alias("p"),
        F.col("l_shipdate").alias("ts"),
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
        qty.alias("qty"),
        (F.col("l_returnflag") == "R").alias("is_supply"),
        F.when(F.col("l_returnflag") == "R", qty).otherwise(-qty).alias("sq"),
    )


# per-part event order: ship time, then the globally-unique (ok, ln) pair —
# a TOTAL order, so every running sum is engine-independent. (A function,
# not a module constant: Column construction needs an active session, and
# the registry imports this module before one exists.)
def _ord() -> list:
    return [F.col("ts").asc(), F.col("ok").asc(), F.col("ln").asc()]


_ORD_SQL = "ts, ok, ln"


@query(
    "q_inv_running_balance",
    oracle=f"""
    WITH {_FLOWS_SQL},
    bal AS (
      SELECT p, ts, sq,
             CAST(sum(sq) OVER (PARTITION BY p ORDER BY {_ORD_SQL}
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS bal
      FROM flows
    )
    SELECT p AS l_partkey, CAST(count(*) AS BIGINT) AS n_flows,
           CAST(sum(sq) AS BIGINT) AS net_qty,
           CAST(min(bal) AS BIGINT) AS min_balance,
           CAST(min(CASE WHEN bal < 0 THEN CAST(ts AS DATE) END) AS VARCHAR)
             AS first_short_day
    FROM bal GROUP BY 1 HAVING min(bal) < 0
    ORDER BY min_balance, l_partkey
    """,
)
def q_inv_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AE ae1 — running stock balance with oversell detection: per
    part, the signed flow stream (restocks +, demand −) in ship order;
    report every part whose running balance ever goes negative, with its
    flow count, net position, worst (minimum) balance and the first day
    it went short — the backorder exposure report.

    Scale: one window partitioned by the part key (per-part streams are
    bounded; the fact never funnels through one partition), then a
    partial-aggregated groupBy on the same key — AQE coalesces the
    already-co-partitioned exchange. Output ≤ |parts|."""
    w = Window.partitionBy("p").orderBy(*_ord()).rowsBetween(Window.unboundedPreceding, 0)
    bal = _flows(spark, sf_dir).withColumn("bal", F.sum("sq").over(w))
    return (
        bal.groupBy(F.col("p").alias("l_partkey"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_flows"),
            F.sum("sq").cast("long").alias("net_qty"),
            F.min("bal").cast("long").alias("min_balance"),
            F.min(F.when(F.col("bal") < 0, F.to_date("ts")))
            .cast("string")
            .alias("first_short_day"),
        )
        .where(F.col("min_balance") < 0)
        .orderBy("min_balance", "l_partkey")
    )


# cumulative-quantity intervals per part and side: lot i covers
# [cum_end - qty, cum_end) in the part's FIFO unit line.
_INTERVALS_SQL = f"""
iv AS (
  SELECT p, is_supply, qty,
         CAST(sum(qty) OVER (PARTITION BY p, is_supply ORDER BY {_ORD_SQL}
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_end,
         ts
  FROM flows
)
"""


def _intervals(flows: DataFrame) -> DataFrame:
    """Cumulative-quantity FIFO intervals, both sides in one window pass
    (partitioned by part AND side)."""
    w = (
        Window.partitionBy("p", "is_supply")
        .orderBy(*_ord())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return flows.select(
        "p", "is_supply", "qty", "ts", F.sum("qty").over(w).cast("long").alias("cum_end")
    )


@query(
    "q_inv_fifo_allocation",
    oracle=f"""
    WITH {_FLOWS_SQL},
    {_INTERVALS_SQL},
    s AS (SELECT p, cum_end - qty AS lo, cum_end AS hi FROM iv WHERE is_supply),
    d AS (SELECT p, cum_end - qty AS lo, cum_end AS hi FROM iv WHERE NOT is_supply),
    pairs AS (
      SELECT s.p,
             least(s.hi, d.hi) - greatest(s.lo, d.lo) AS allocated
      FROM s JOIN d ON s.p = d.p AND s.lo < d.hi AND d.lo < s.hi
    ),
    alloc AS (
      SELECT p, CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(allocated) AS BIGINT) AS alloc_qty
      FROM pairs GROUP BY 1
    ),
    tot AS (
      SELECT p, CAST(sum(CASE WHEN is_supply THEN qty ELSE 0 END) AS BIGINT)
                  AS supply_qty,
             CAST(sum(CASE WHEN is_supply THEN 0 ELSE qty END) AS BIGINT)
                  AS demand_qty
      FROM flows GROUP BY 1
    )
    SELECT a.p AS l_partkey, a.n_pairs, a.alloc_qty, t.supply_qty, t.demand_qty,
           t.demand_qty - a.alloc_qty AS unmet_demand,
           t.supply_qty - a.alloc_qty AS leftover_supply
    FROM alloc a JOIN tot t ON a.p = t.p
    ORDER BY l_partkey
    """,
)
def q_inv_fifo_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AE ae2 — FIFO lot allocation: match demand to restock lots in
    strict first-in-first-out order, per part. The sequential match is
    re-expressed as cumulative-quantity INTERVAL OVERLAP: each lot/demand
    line covers ``[cum − qty, cum)`` on the part's unit line, and a
    (lot, demand) pair allocates ``least(his) − greatest(los)`` units iff
    the intervals intersect — identical to walking both queues in order,
    with no sequential state. Output per part: pair count, allocated
    units, side totals, unmet demand and leftover supply (parts with
    both sides present; ``alloc = least(supply, demand)`` by
    construction, which the oracle certifies).

    Scale: the interval frame feeds three consumers (supply leg, demand
    leg, per-part totals) through PLAIN LINEAGE — no checkpoint:
    Catalyst's ReusedExchange dedups the window's shuffle across the
    self-join, so the fact is scanned and shuffled once anyway. This
    was measured, not assumed — a same-JVM A/B at the 10× probe:
    localCheckpoint above the window 39.6 s, below it 12.6 s, pure
    lineage 6.1 s (the materialization itself was the bottleneck). The
    match is an equi-join on the part key with a local overlap residual
    — within a part the overlap relation is linear in lots + demands
    (each unit is covered once per side), never quadratic."""
    iv = _intervals(_flows(spark, sf_dir))
    lo = (F.col("cum_end") - F.col("qty")).alias("lo")
    s = iv.where("is_supply").select("p", lo, F.col("cum_end").alias("hi"))
    d = iv.where(~F.col("is_supply")).select("p", lo, F.col("cum_end").alias("hi"))
    pairs = s.alias("s").join(
        d.alias("d"),
        (F.col("s.p") == F.col("d.p"))
        & (F.col("s.lo") < F.col("d.hi"))
        & (F.col("d.lo") < F.col("s.hi")),
    )
    alloc = pairs.groupBy(F.col("s.p").alias("p")).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(
            F.least(F.col("s.hi"), F.col("d.hi"))
            - F.greatest(F.col("s.lo"), F.col("d.lo"))
        )
        .cast("long")
        .alias("alloc_qty"),
    )
    tot = iv.groupBy("p").agg(
        F.sum(F.when(F.col("is_supply"), F.col("qty")).otherwise(0))
        .cast("long")
        .alias("supply_qty"),
        F.sum(F.when(F.col("is_supply"), 0).otherwise(F.col("qty")))
        .cast("long")
        .alias("demand_qty"),
    )
    return (
        alloc.join(tot, "p")
        .select(
            F.col("p").alias("l_partkey"),
            "n_pairs",
            "alloc_qty",
            "supply_qty",
            "demand_qty",
            (F.col("demand_qty") - F.col("alloc_qty")).alias("unmet_demand"),
            (F.col("supply_qty") - F.col("alloc_qty")).alias("leftover_supply"),
        )
        .orderBy("l_partkey")
    )


@query(
    "q_inv_cover_buckets",
    oracle=f"""
    WITH {_FLOWS_SQL},
    per_part AS (
      SELECT p,
             CAST(sum(CASE WHEN is_supply THEN qty ELSE 0 END) AS BIGINT)
               AS supply_qty,
             CAST(sum(CASE WHEN is_supply THEN 0 ELSE qty END) AS BIGINT)
               AS demand_qty,
             CAST(count(DISTINCT CASE WHEN NOT is_supply
                                      THEN CAST(ts AS DATE) END) AS BIGINT)
               AS demand_days
      FROM flows GROUP BY 1
    ),
    cover AS (
      SELECT p, supply_qty, demand_qty,
             (supply_qty * demand_days) // demand_qty AS cover_days
      FROM per_part WHERE supply_qty > 0 AND demand_qty > 0
    )
    SELECT CASE WHEN cover_days < 7 THEN 'a_lt7'
                WHEN cover_days < 30 THEN 'b_lt30'
                WHEN cover_days < 90 THEN 'c_lt90'
                WHEN cover_days < 365 THEN 'd_lt365'
                ELSE 'e_ge365' END AS cover_bucket,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(supply_qty) AS BIGINT) AS supply_qty,
           CAST(sum(demand_qty) AS BIGINT) AS demand_qty,
           CAST(min(cover_days) AS BIGINT) AS min_cover_days,
           CAST(max(cover_days) AS BIGINT) AS max_cover_days
    FROM cover GROUP BY 1 ORDER BY cover_bucket
    """,
)
def q_inv_cover_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AE ae3 — days-of-cover census: per part, on-hand supply vs the
    observed demand rate (total demand units over its distinct demand
    days), as exact truncated-div cover days ``supply × days // demand``;
    parts bucketed into the replenishment bands ops teams plan on
    (<7 / <30 / <90 / <365 / ≥365 days), with per-band part counts, unit
    totals and the cover range. Bucket labels carry an ordering prefix so
    lexical ORDER BY is the band order in both engines.

    Scale: one partial-aggregated groupBy on the part key (the distinct
    demand-day count is per-group, not global), then a 5-row census —
    the ordered output only ever sees 5 rows."""
    per_part = (
        _flows(spark, sf_dir)
        .groupBy("p")
        .agg(
            F.sum(F.when(F.col("is_supply"), F.col("qty")).otherwise(0))
            .cast("long")
            .alias("supply_qty"),
            F.sum(F.when(F.col("is_supply"), 0).otherwise(F.col("qty")))
            .cast("long")
            .alias("demand_qty"),
            F.countDistinct(F.when(~F.col("is_supply"), F.to_date("ts")))
            .cast("long")
            .alias("demand_days"),
        )
        .where((F.col("supply_qty") > 0) & (F.col("demand_qty") > 0))
        .withColumn("cover_days", F.expr("(supply_qty * demand_days) div demand_qty"))
    )
    bucket = (
        F.when(F.col("cover_days") < 7, "a_lt7")
        .when(F.col("cover_days") < 30, "b_lt30")
        .when(F.col("cover_days") < 90, "c_lt90")
        .when(F.col("cover_days") < 365, "d_lt365")
        .otherwise("e_ge365")
    )
    return (
        per_part.groupBy(bucket.alias("cover_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("supply_qty").cast("long").alias("supply_qty"),
            F.sum("demand_qty").cast("long").alias("demand_qty"),
            F.min("cover_days").cast("long").alias("min_cover_days"),
            F.max("cover_days").cast("long").alias("max_cover_days"),
        )
        .orderBy("cover_bucket")
    )


@query(
    "q_inv_leftover_aging",
    oracle=f"""
    WITH {_FLOWS_SQL},
    {_INTERVALS_SQL},
    dtot AS (
      SELECT p, CAST(sum(qty) AS BIGINT) AS d
      FROM flows WHERE NOT is_supply GROUP BY 1
    ),
    lots AS (
      SELECT s.p, s.ts, s.cum_end - s.qty AS lo, s.cum_end AS hi,
             coalesce(d.d, 0) AS d
      FROM iv s LEFT JOIN dtot d ON s.p = d.p
      WHERE s.is_supply
    )
    SELECT concat(lpad(CAST(CAST(year(CAST(ts AS TIMESTAMP)) AS BIGINT)
                            AS VARCHAR), 4, '0'), '-',
                  lpad(CAST(CAST(month(CAST(ts AS TIMESTAMP)) AS BIGINT)
                            AS VARCHAR), 2, '0')) AS receipt_month,
           CAST(count(*) AS BIGINT) AS n_lots,
           CAST(sum(hi - greatest(lo, d)) AS BIGINT) AS leftover_qty
    FROM lots WHERE hi > d
    GROUP BY 1 ORDER BY receipt_month
    """,
)
def q_inv_leftover_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AE ae4 — leftover-lot aging: after FIFO consumption (ae2's
    cumulative-unit line), a restock lot's unsold remainder is
    ``cum_end − greatest(cum_start, total_demand)`` whenever its interval
    extends past the part's total demand; aged by receipt month. The
    dead-stock report: which receiving months' lots are still on the
    shelf, and how many units.

    Scale: unlike ae2, only the SUPPLY side needs intervals here — the
    demand side enters as its per-part TOTAL, a plain partial-aggregated
    sum with no window — so the returnflag filter runs BEFORE the
    window (pushed into the parquet scan) and the cumulative sort sees
    a third of the fact. The first spelling windowed both sides and
    joined two consumers of that lineage: 12.7 s at the 10× probe vs
    3.8 s for this one. Each lot then joins the part total on the part
    key; the month rollup is a bounded census. No pairwise work at all
    — FIFO leftovers need only each lot vs the part TOTAL, not
    lot×demand pairs."""
    flows = _flows(spark, sf_dir)
    w = (
        Window.partitionBy("p")
        .orderBy(*_ord())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    supply = flows.where("is_supply").withColumn(
        "cum_end", F.sum("qty").over(w).cast("long")
    )
    dtot = (
        flows.where(~F.col("is_supply"))
        .groupBy("p")
        .agg(F.sum("qty").cast("long").alias("d"))
    )
    lots = (
        supply.join(dtot, "p", "left")
        .select(
            "p",
            "ts",
            (F.col("cum_end") - F.col("qty")).alias("lo"),
            F.col("cum_end").alias("hi"),
            F.coalesce(F.col("d"), F.lit(0)).alias("d"),
        )
        .where(F.col("hi") > F.col("d"))
    )
    month = F.concat(
        F.lpad(F.year("ts").cast("long").cast("string"), 4, "0"),
        F.lit("-"),
        F.lpad(F.month("ts").cast("long").cast("string"), 2, "0"),
    )
    return (
        lots.groupBy(month.alias("receipt_month"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lots"),
            F.sum(F.col("hi") - F.greatest(F.col("lo"), F.col("d")))
            .cast("long")
            .alias("leftover_qty"),
        )
        .orderBy("receipt_month")
    )


@query(
    "q_inv_monthly_net_census",
    oracle=f"""
    WITH {_FLOWS_SQL},
    pm AS (
      SELECT p,
             CAST(year(CAST(ts AS TIMESTAMP)) AS BIGINT) * 12
               + CAST(month(CAST(ts AS TIMESTAMP)) AS BIGINT) - 1 AS midx,
             CAST(sum(sq) AS BIGINT) AS net
      FROM flows GROUP BY 1, 2
    ),
    bal AS (
      SELECT p, midx, net,
             CAST(sum(net) OVER (PARTITION BY p ORDER BY midx
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS bal
      FROM pm
    )
    SELECT concat(lpad(CAST(midx // 12 AS VARCHAR), 4, '0'), '-',
                  lpad(CAST(midx % 12 + 1 AS VARCHAR), 2, '0')) AS month,
           CAST(count(*) AS BIGINT) AS n_parts_active,
           CAST(sum(CASE WHEN bal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
           CAST(sum(CASE WHEN bal > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_long,
           CAST(sum(net) AS BIGINT) AS net_month_qty,
           CAST(min(bal) AS BIGINT) AS worst_balance
    FROM bal GROUP BY 1 ORDER BY month
    """,
)
def q_inv_monthly_net_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AE ae5 — month-end carryover census: per part-month net flow,
    carried forward per part (running sum over its active months), then
    per month: active-part count, how many sit short vs long after
    carryover, the month's total net flow and the worst single-part
    balance. A part is counted in the months it has flow (no spine
    densification — z4's month spine is the densified complement).

    Scale: fact → part-month partial agg (shuffle 1); the carryover
    window partitions by part over ≤ |months| rows each; the month
    census is the second, bounded shuffle. The ordered output sees only
    |months| rows."""
    flows = _flows(spark, sf_dir)
    midx = (F.year("ts").cast("long") * 12 + F.month("ts").cast("long") - 1).alias(
        "midx"
    )
    pm = flows.groupBy("p", midx).agg(F.sum("sq").cast("long").alias("net"))
    w = Window.partitionBy("p").orderBy("midx").rowsBetween(
        Window.unboundedPreceding, 0
    )
    bal = pm.withColumn("bal", F.sum("net").over(w).cast("long"))
    month = F.expr(
        "concat(lpad(CAST(midx div 12 AS STRING), 4, '0'), '-',"
        " lpad(CAST(midx % 12 + 1 AS STRING), 2, '0'))"
    )
    return (
        bal.groupBy(month.alias("month"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts_active"),
            F.sum(F.when(F.col("bal") < 0, 1).otherwise(0))
            .cast("long")
            .alias("n_short"),
            F.sum(F.when(F.col("bal") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_long"),
            F.sum("net").cast("long").alias("net_month_qty"),
            F.min("bal").cast("long").alias("worst_balance"),
        )
        .orderBy("month")
    )
