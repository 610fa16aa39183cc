"""Window-function operators (SURVEY.md §2.E).

Every window here partitions by a key before ordering, so the sort is
per-partition (local after one hash shuffle) — never a global sort. The
global-window cases (ntile, percent_rank within type) are explicitly
bounded dims at any scale factor. All orderings are made total with a
unique key so rank/limit ties are deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query


@query(
    "q_win_rownum_topk",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def q_win_rownum_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """e1 — top-3 orders per customer; the grouped-top-k pattern.

    At scale this is the *only* safe per-group top-k: one shuffle on the
    partition key, per-partition sort, early filter — no global sort, no
    collect. Ties broken by o_orderkey for determinism.
    """
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_win_rank_dense",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice,
           CAST(rank()       OVER w AS BIGINT) AS price_rank,
           CAST(dense_rank() OVER w AS BIGINT) AS price_dense_rank
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC)
    """,
)
def q_win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """e2 — rank vs dense_rank within brand (tie values share ranks,
    which is deterministic even without a tie-break key)."""
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    return load_table(spark, sf_dir, "part").select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.rank().over(w).cast("long").alias("price_rank"),
        F.dense_rank().over(w).cast("long").alias("price_dense_rank"),
    )


@query(
    "q_win_ntile",
    oracle="""
    SELECT c_custkey, c_acctbal,
           CAST(ntile(4) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS BIGINT) AS quartile
    FROM customer
    """,
)
def q_win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """e3 — acctbal quartiles. The ORDER BY is total (custkey tie-break),
    so bucket assignment is engine-independent. Computed via the
    distributed global-ntile (functions/ranks.py) — a plain
    ``ntile().over(Window.orderBy(...))`` plans an Exchange
    SinglePartition, which cannot survive a 1.5B-row customer dim; the
    two-pass range-partitioned plan is exact-identical and scales."""
    from recommendersystems_bigdata_spark.functions.ranks import global_ntile

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    return global_ntile(
        cust, [F.col("c_acctbal").asc(), F.col("c_custkey").asc()], 4, "quartile"
    ).select("c_custkey", "c_acctbal", "quartile")


@query(
    "q_win_lag_lead",
    oracle="""
    SELECT event_id, user_id, value,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           value - lag(value) OVER w AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """e4 — per-user previous/next event value and delta (analytic offsets)."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


@query(
    "q_win_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate ASC, o_orderkey ASC
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_spent
    FROM orders
    """,
)
def q_win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """e5 — cumulative revenue per customer in order-date order."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spent"),
    )


@query(
    "q_win_moving_avg",
    oracle="""
    WITH daily AS (
      SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) - DATE '1970-01-01' AS day_num,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
             round(sum(value), 2) AS day_value,
             count(*) AS n_events
      FROM events
      GROUP BY 1, 2
    )
    SELECT day, day_value, n_events,
           round(avg(day_value) OVER (ORDER BY day_num
                                      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2)
             AS avg7
    FROM daily
    """,
)
def q_win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """e6 — 7-day moving average of daily event value.

    Two-level: daily tumbling aggregate first (shrinks 100 TB of events to
    one row per day), then a RANGE frame over epoch-day — the window runs
    over the *aggregated* relation, which is the only scalable order.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.withColumn("day", F.date_trunc("day", F.col("ts")))
        .groupBy(F.unix_date(F.col("ts").cast("date")).cast("long").alias("day_num"), "day")
        .agg(
            F.round(F.sum("value"), 2).alias("day_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    w = Window.orderBy("day_num").rangeBetween(-6, 0)
    return daily.select(
        "day",
        "day_value",
        "n_events",
        F.round(F.avg("day_value").over(w), 2).alias("avg7"),
    )


@query(
    "q_win_first_last",
    oracle="""
    SELECT DISTINCT user_id,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type)  OVER w AS last_type,
           first_value(CAST(ts AS TIMESTAMP)) OVER w AS first_ts,
           last_value(CAST(ts AS TIMESTAMP))  OVER w AS last_ts
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """e7 — first and latest event per user over the full partition frame."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.first("event_type").over(w).alias("first_type"),
            F.last("event_type").over(w).alias("last_type"),
            F.first("ts").over(w).alias("first_ts"),
            F.last("ts").over(w).alias("last_ts"),
        )
        .distinct()
    )


@query(
    "q_win_percent_cume",
    oracle="""
    SELECT p_type, p_partkey, p_retailprice,
           percent_rank() OVER w AS price_pct_rank,
           cume_dist()    OVER w AS price_cume_dist
    FROM part
    WINDOW w AS (PARTITION BY p_type ORDER BY p_retailprice ASC)
    """,
)
def q_win_percent_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """e8 — relative price position within part type (both formulas are
    rank-based, so tie rows get identical values on both engines)."""
    w = Window.partitionBy("p_type").orderBy(F.col("p_retailprice").asc())
    return load_table(spark, sf_dir, "part").select(
        "p_type",
        "p_partkey",
        "p_retailprice",
        F.percent_rank().over(w).alias("price_pct_rank"),
        F.cume_dist().over(w).alias("price_cume_dist"),
    )


@query(
    "q_win_corr_rolling",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
             round(sum(CASE WHEN event_type = 'view' THEN value ELSE 0 END), 2) AS v_view,
             round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 2) AS v_buy
      FROM events GROUP BY 1
    )
    SELECT CAST(day AS VARCHAR) AS day,
           round(corr(v_view, v_buy) OVER (ORDER BY day
                                           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4)
             AS corr_7d,
           CAST(count(*) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS n_days
    FROM daily
    """,
)
def q_win_corr_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day correlation between daily view-value and
    purchase-value series — windowed bivariate statistics, the
    co-movement signal dashboards track. The daily pre-aggregate
    reduces the window input to ~30 rows regardless of corpus size, so
    the single-partition ordered window is safe at any scale (the
    reduction shuffles, the window does not)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day")).agg(
        F.round(F.sum(F.when(F.col("event_type") == "view", F.col("value")).otherwise(0.0)), 2).alias("v_view"),
        F.round(F.sum(F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)), 2).alias("v_buy"),
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        F.col("day").cast("string").alias("day"),
        F.round(F.corr("v_view", "v_buy").over(w), 4).alias("corr_7d"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_days"),
    )


@query(
    "q_rfm_segmentation",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey,
             CAST(max(o_orderdate) AS TIMESTAMP) AS last_order,
             count(*) AS frequency,
             round(sum(o_totalprice), 2) AS monetary
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, last_order, frequency, monetary,
           CAST(ntile(4) OVER (ORDER BY last_order DESC, o_custkey) AS BIGINT) AS r_quartile,
           CAST(ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS BIGINT) AS f_quartile,
           CAST(ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS BIGINT) AS m_quartile
    FROM rfm
    """,
)
def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency / frequency / monetary per
    customer with quartile scores — the standard marketing-analytics
    segmentation. ntile runs on the per-customer aggregate (cardinality
    = customers, not orders), ordered with the unique-key tie-break that
    makes quartile assignment deterministic (hygiene rule e3).

    Each quartile comes from the distributed global-ntile
    (functions/ranks.py): three plain global windows would each plan an
    Exchange SinglePartition over the full customer set — the per-entity
    table is exactly what grows to billions at 100 TB. The three ntiles
    join back on the unique o_custkey."""
    from recommendersystems_bigdata_spark.functions.ranks import global_ntile

    orders = load_table(spark, sf_dir, "orders")
    rfm = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").cast("timestamp").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    ).localCheckpoint()  # three ntile passes + the output read the same agg
    rq = global_ntile(
        rfm.select("o_custkey", "last_order"),
        [F.col("last_order").desc(), F.col("o_custkey")], 4, "r_quartile",
    ).select("o_custkey", "r_quartile")
    fq = global_ntile(
        rfm.select("o_custkey", "frequency"),
        [F.col("frequency").desc(), F.col("o_custkey")], 4, "f_quartile",
    ).select("o_custkey", "f_quartile")
    mq = global_ntile(
        rfm.select("o_custkey", "monetary"),
        [F.col("monetary").desc(), F.col("o_custkey")], 4, "m_quartile",
    ).select("o_custkey", "m_quartile")
    return (
        rfm.join(rq, "o_custkey").join(fq, "o_custkey").join(mq, "o_custkey")
        .select("o_custkey", "last_order", "frequency", "monetary",
                "r_quartile", "f_quartile", "m_quartile")
    )


@query(
    "q_abc_pareto",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             CAST(round(sum(l_extendedprice * (1 - l_discount)) * 10000)
                  AS BIGINT) AS micros
      FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
      SELECT l_partkey, micros,
             sum(micros) OVER (ORDER BY micros DESC, l_partkey
                               ROWS UNBOUNDED PRECEDING) AS cum_m,
             sum(micros) OVER () AS total_m
      FROM rev
    )
    SELECT l_partkey, round(micros / 10000.0, 4) AS revenue,
           round(CAST(cum_m AS DOUBLE) / total_m, 4) AS cum_share,
           CASE WHEN cum_m * 2 <= total_m THEN 'A'
                WHEN cum_m * 5 <= total_m * 4 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked
    """,
)
def q_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification: parts ranked by revenue, cumulative
    share thresholds 50%/80% → A/B/C classes — the inventory-analytics
    staple.

    Exact-integer discipline: per-part revenue is an exact 4-decimal
    quantity (2dp price × 4dp discount product), so it converts losslessly
    to BIGINT micros. That makes the cumulative sum ASSOCIATIVE — which is
    what lets it run as the distributed global_running_sum
    (functions/ranks.py: range-partitioned local cumsum + broadcast
    offsets, no Exchange SinglePartition over the part catalog) while
    staying bit-identical to the oracle's ordered window. The A/B/C
    thresholds compare integers (cum·2 ≤ total, cum·5 ≤ total·4), so the
    50%/80% boundaries are exact on both engines; only the reported
    cum_share ratio touches floating point, as one divide of identical
    integers."""
    from recommendersystems_bigdata_spark.functions.ranks import global_running_sum

    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )
    # Checkpoint the aggregate once: global_running_sum's boundary sampling,
    # its shuffle pass, and the separate total all re-read it otherwise
    # (the recompute cost ranks.py's caller contract warns about).
    m = rev.select(
        "l_partkey", F.round(F.col("revenue") * 10000).cast("long").alias("micros")
    ).localCheckpoint()
    cum = global_running_sum(
        m, [F.col("micros").desc(), F.col("l_partkey").asc()], "micros", "cum_m"
    )
    total = m.agg(F.sum("micros").cast("long").alias("total_m"))
    return cum.join(F.broadcast(total), how="cross").select(
        "l_partkey",
        F.round(F.col("micros") / 10000.0, 4).alias("revenue"),
        F.round(F.col("cum_m").cast("double") / F.col("total_m"), 4).alias("cum_share"),
        F.when(F.col("cum_m") * 2 <= F.col("total_m"), "A")
        .when(F.col("cum_m") * 5 <= F.col("total_m") * 4, "B")
        .otherwise("C")
        .alias("abc_class"),
    )


@query(
    "q_win_ratio_to_report",
    oracle="""
    WITH rev AS (
      SELECT s_nationkey, s_suppkey, round(s_acctbal, 2) AS bal
      FROM supplier
    )
    SELECT s_nationkey, s_suppkey, bal,
           round(bal / sum(bal) OVER (PARTITION BY s_nationkey), 4) AS nation_share,
           CAST(rank() OVER (PARTITION BY s_nationkey ORDER BY bal DESC, s_suppkey)
                AS BIGINT) AS nation_rank
    FROM rev
    """,
)
def q_win_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each supplier's share of its nation's total
    account balance, plus within-nation rank — the classic share-of-
    total window report. One shuffle on the partition key; the full-
    partition sum and the rank reuse the same partitioning."""
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_nationkey", "s_suppkey", F.round("s_acctbal", 2).alias("bal")
    )
    wp = Window.partitionBy("s_nationkey")
    wr = Window.partitionBy("s_nationkey").orderBy(F.col("bal").desc(), F.col("s_suppkey"))
    return sup.select(
        "s_nationkey",
        "s_suppkey",
        "bal",
        F.round(F.col("bal") / F.sum("bal").over(wp), 4).alias("nation_share"),
        F.rank().over(wr).cast("long").alias("nation_rank"),
    )


@query(
    "q_decile_lift",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    ),
    tiled AS (
      SELECT cents, ntile(10) OVER (ORDER BY cents DESC, o_custkey) AS decile
      FROM spend
    ),
    per_decile AS (
      SELECT CAST(decile AS BIGINT) AS decile, count(*) AS n_customers,
             CAST(sum(cents) AS BIGINT) AS total_cents
      FROM tiled GROUP BY decile
    ),
    grand AS (SELECT CAST(sum(cents) AS BIGINT) AS g FROM spend)
    SELECT decile, n_customers, total_cents,
           CAST(floor(CAST(total_cents AS DOUBLE) * 1000000 / g) AS BIGINT)
             AS share_x1e6,
           CAST(floor(CAST(sum(total_cents) OVER (ORDER BY decile) AS DOUBLE)
                      * 1000000 / g) AS BIGINT) AS cum_share_x1e6
    FROM per_decile, grand
    """,
)
def q_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift / gain chart: customers ranked by total spend, cut
    into deciles, each decile's share and cumulative share of revenue —
    the chart every targeting model is judged with (and the windowed
    generalization of the ABC/Pareto classes, e11).

    Integer-cents end-to-end; the two shares are floor-scaled single
    divides. Scale: per-customer spend aggregates map-side; the decile
    cut comes from the distributed global-ntile (functions/ranks.py) —
    no single-partition pass over the customer set; the only global
    window left runs over the 10 decile rows.
    """
    from recommendersystems_bigdata_spark.functions.ranks import global_ntile

    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).cast("long").alias("cents")
    )
    tiled = global_ntile(
        spend, [F.col("cents").desc(), F.col("o_custkey").asc()], 10, "decile"
    ).select("cents", "decile")
    per_decile = tiled.groupBy(F.col("decile").cast("long").alias("decile")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").cast("long").alias("total_cents"),
    )
    grand = spend.agg(F.sum("cents").cast("long").alias("g"))
    cum_w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return per_decile.crossJoin(F.broadcast(grand)).select(
        "decile",
        "n_customers",
        "total_cents",
        F.floor(F.col("total_cents").cast("double") * 1_000_000 / F.col("g"))
        .cast("long")
        .alias("share_x1e6"),
        F.floor(
            F.sum("total_cents").over(cum_w).cast("double") * 1_000_000 / F.col("g")
        )
        .cast("long")
        .alias("cum_share_x1e6"),
    )
