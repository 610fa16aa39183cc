"""Time-windowed event operators, batch form (SURVEY.md §2.I).

These run the exact logic the streaming module applies with watermarks —
Spark's `window`/`session_window` functions work identically over batch
DataFrames, which is what makes them oracle-checkable. The tumbling and
sliding shapes aggregate immediately (shuffle carries per-window partials);
sessionization shuffles once on user_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table, load_tables
from recommendersystems_bigdata_spark.registry import query


@query(
    "q_tumble_window",
    oracle="""
    SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS w_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_tumble_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i1 — tumbling 1-day windows × event_type.

    `window(ts, '1 day').start` is epoch-aligned, so it equals
    date_trunc('day') — which is the oracle spelling.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("w_start"), "event_type", "n_events", "total_value")
    )


@query(
    "q_slide_window",
    oracle="""
    SELECT w_start, event_type, count(*) AS n_events
    FROM (
      SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) - to_hours(t.k) AS TIMESTAMP) AS w_start,
             event_type
      FROM events CROSS JOIN unnest([0, 1, 2, 3, 4, 5]) AS t(k)
    )
    GROUP BY w_start, event_type
    """,
)
def q_slide_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i2 — 6-hour windows sliding hourly: each event lands in 6 windows.

    The oracle enumerates the same 6 hop starts per event explicitly.
    Spark's window() does the expansion JVM-side before the aggregate, so
    the shuffle again carries per-(window, type) partials, not raw rows.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n_events")
    )


_SESSION_ORACLE = """
    WITH flagged AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                       - epoch_us(lag(CAST(ts AS TIMESTAMP))
                                  OVER (PARTITION BY user_id ORDER BY ts, event_id))
                       > 1800000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    numbered AS (
      SELECT user_id, ts,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           min(ts) AS session_start,
           count(*) AS n_events,
           (epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000 AS span_sec
    FROM numbered
    GROUP BY user_id, session_id
"""


@query("q_gaps_islands", oracle=_SESSION_ORACLE)
def q_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i8 — sessionization via gaps-and-islands window functions.

    lag → gap flag → running sum = session id. Identical output contract
    to q_session_window (its oracle twin); one user_id shuffle total.
    """
    ev = load_table(spark, sf_dir, "events")
    order_w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    run_w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gap_us = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.lag("ts").over(order_w).cast("timestamp")
    )
    flagged = ev.select(
        "user_id",
        "ts",
        F.when(gap_us > 1_800_000_000, 1)
        .when(F.lag("ts").over(order_w).isNull(), 1)
        .otherwise(0)
        .alias("new_session"),
    )
    numbered = flagged.withColumn("session_id", F.sum("new_session").over(run_w).cast("long"))
    span_us = F.unix_micros(F.max("ts").cast("timestamp")) - F.unix_micros(
        F.min("ts").cast("timestamp")
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.count(F.lit(1)).alias("n_events"),
        (span_us / 1_000_000).alias("span_sec"),
    )


@query(
    "q_session_window",
    oracle="""
    WITH s AS (
""" + _SESSION_ORACLE.replace("SELECT user_id, session_id,", "SELECT user_id,") + """
    )
    SELECT user_id, session_start, n_events, span_sec FROM s
    """,
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i3 — native session windows: per-user sessions with a 30-minute gap.

    `session_window(ts, '30 minutes')` ends a session at last_ts + gap, so
    span = end − start − 30 min — matching the gaps-and-islands oracle's
    max(ts) − min(ts). (session_id is internal to the oracle CTE; the
    output contract is keyed by user_id + session_start.)
    """
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    span_us = (
        F.unix_micros(F.col("w.end").cast("timestamp"))
        - F.unix_micros(F.col("w.start").cast("timestamp"))
        - 1_800_000_000
    )
    return agg.select(
        "user_id",
        F.col("w.start").alias("session_start"),
        "n_events",
        (span_us / 1_000_000).alias("span_sec"),
    )


@query(
    "q_stream_dedup",
    oracle="""
    SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts, value
    FROM (
      SELECT user_id, event_type, event_id, ts, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts ASC, event_id ASC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i4 (batch twin) — keep-first dedup on (user_id, event_type).

    dropDuplicates keeps an *arbitrary* row — nondeterministic under
    distribution — so the engine's dedup is the deterministic
    row_number()=1 form. The streaming variant (tests/test_streaming.py)
    uses withWatermark + dropDuplicates where arrival order defines
    'first'.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
    )


@query("q_agg_hll_sketch_merge")
def q_agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup — THE pre-aggregation pattern at 100 TB:
    build one fixed-size HLL sketch of distinct users per (day,
    event_type) partition, then answer the coarser per-event_type
    distinct-user question by *merging sketches* instead of rescanning
    raw data. A nightly job materializes the per-day sketches once;
    every later rollup (weekly, all-time, per-type) is an
    hll_union_agg over kilobytes.

    Rows-only check (sketch binaries are engine-specific); the estimate
    is gated against the exact distinct count within HLL error bounds in
    tests/test_plans.py.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id", 14).alias("sketch"))
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_users"),
            F.count(F.lit(1)).cast("long").alias("n_daily_sketches"),
        )
        .select("event_type", "approx_users", "n_daily_sketches")
    )


@query(
    "q_events_funnel",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
    ),
    v AS (SELECT user_id, min(ts) AS t_view FROM e WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
           CAST(1 + CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END
                  + CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS stage_reached
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    """,
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view → click → purchase): per user, the
    earliest strictly-ordered completion time of each stage.

    Three stage aggregates, each a groupBy on user_id — one shuffle key
    throughout, so AQE plans the chain as co-partitioned joins with no
    re-shuffle. The standard event-analytics funnel shape.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t_view")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    stage = (
        F.lit(1)
        + F.when(F.col("t_click").isNull(), 0).otherwise(1)
        + F.when(F.col("t_purchase").isNull(), 0).otherwise(1)
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select("user_id", "t_view", "t_click", "t_purchase", stage.cast("long").alias("stage_reached"))
    )


@query(
    "q_retention_cohort",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day FROM events
    ),
    cohort AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id),
    activity AS (SELECT DISTINCT user_id, day FROM e)
    SELECT CAST(c.cohort_day AS VARCHAR) AS cohort_day,
           CAST(date_diff('day', c.cohort_day, a.day) AS BIGINT) AS offset_days,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active_users
    FROM activity a JOIN cohort c ON a.user_id = c.user_id
    GROUP BY 1, 2
    """,
)
def q_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-active day, counted
    on each day-offset they return. Cohort assignment and the activity
    dedup both shuffle on user_id only; the final (cohort, offset) rollup
    is a partial-aggregated groupBy over already-deduped rows.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    )
    cohort = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = ev.distinct()
    return (
        activity.join(cohort, "user_id")
        .groupBy(
            F.col("cohort_day").cast("string").alias("cohort_day"),
            F.datediff("day", "cohort_day").cast("long").alias("offset_days"),
        )
        .agg(F.countDistinct("user_id").alias("n_active_users"))
    )


@query(
    "q_resample_ffill",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
             round(sum(value), 2) AS v
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ),
    bounds AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id),
    grid AS (
      SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds
    ),
    j AS (
      SELECT g.user_id, g.day, d.v FROM grid g LEFT JOIN daily d USING (user_id, day)
    )
    SELECT user_id, CAST(day AS VARCHAR) AS day,
           last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
                                            ROWS UNBOUNDED PRECEDING) AS value_filled,
           v IS NULL AS was_gap
    FROM j
    """,
)
def q_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + forward-fill: per-user daily purchase totals
    on a dense daily grid (each user's own [min_day, max_day] span), gaps
    carried forward with `last(..., ignorenulls=True)`.

    The grid explode is map-side off a tiny per-user bounds aggregate;
    the fill is one window per user partition — everything shuffles on
    user_id once. This is the gap-filling shape time-series stores call
    `time_bucket_gapfill`/`locf`.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .agg(F.round(F.sum("value"), 2).alias("v"))
    )
    bounds = daily.groupBy("user_id").agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    grid = bounds.select(
        "user_id", F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    j = grid.join(daily, ["user_id", "day"], "left")
    w = Window.partitionBy("user_id").orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return j.select(
        "user_id",
        F.col("day").cast("string").alias("day"),
        F.last("v", ignorenulls=True).over(w).alias("value_filled"),
        F.col("v").isNull().alias("was_gap"),
    )


@query(
    "q_events_pathing",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS e1,
             lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
             lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
      FROM events
    ),
    paths AS (
      SELECT e1 || '>' || e2 || '>' || e3 AS path, count(*) AS n
      FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
      GROUP BY 1
    )
    SELECT path, n, CAST(rn AS BIGINT) AS rank
    FROM (SELECT path, n, row_number() OVER (ORDER BY n DESC, path ASC) AS rn FROM paths)
    WHERE rn <= 10
    """,
)
def q_events_pathing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path mining: the 10 most common 3-step event sequences across all
    users — the flow-analysis view behind sankey funnels. One user_id
    shuffle for the double-lead window, then a tiny (≤ event-type³ paths)
    global aggregate, taken limit-first (TakeOrderedAndProject) so the
    ranking window only ever sees the 10 surviving rows."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    paths = seq.groupBy(
        F.concat_ws(">", "e1", "e2", "e3").alias("path")
    ).agg(F.count(F.lit(1)).alias("n"))
    top = paths.orderBy(F.col("n").desc(), F.col("path").asc()).limit(10)
    wr = Window.orderBy(F.col("n").desc(), F.col("path").asc())
    return top.withColumn("rank", F.row_number().over(wr).cast("long")).select(
        "path", "n", "rank"
    )


@query(
    "q_interval_concurrency",
    oracle="""
    WITH spans AS (
      SELECT o.o_orderkey,
             CAST(o.o_orderdate AS DATE) AS d0,
             CAST(max(l.l_shipdate) AS DATE) AS d1
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY o.o_orderkey, o.o_orderdate
      HAVING CAST(max(l.l_shipdate) AS DATE) > CAST(o.o_orderdate AS DATE)
    ),
    deltas AS (
      SELECT d0 AS day, 1 AS delta FROM spans
      UNION ALL
      SELECT d1 AS day, -1 FROM spans
    ),
    daily AS (SELECT day, CAST(sum(delta) AS BIGINT) AS net FROM deltas GROUP BY day)
    SELECT CAST(day AS VARCHAR) AS day,
           net,
           CAST(sum(net) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS open_orders
    FROM daily
    """,
)
def q_interval_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-concurrency (sweep line): how many orders are 'open'
    (placed but not fully shipped) on each day — the +1-at-start /
    −1-at-end trick that turns interval-overlap counting into a running
    sum, instead of an O(days × intervals) range join.

    The per-order span aggregate shuffles on orderkey; the sweep itself
    runs over the ~daily deltas table (2 rows per order reduced to one
    row per day), so the ordered window input is calendar-sized."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    spans = (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", F.to_date("o_orderdate").alias("d0"))
        .agg(F.to_date(F.max("l_shipdate")).alias("d1"))
        .filter(F.col("d1") > F.col("d0"))
    )
    deltas = spans.select(F.col("d0").alias("day"), F.lit(1).alias("delta")).unionByName(
        spans.select(F.col("d1").alias("day"), F.lit(-1).alias("delta"))
    )
    daily = deltas.groupBy("day").agg(F.sum("delta").cast("long").alias("net"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        F.col("day").cast("string").alias("day"),
        "net",
        F.sum("net").over(w).cast("long").alias("open_orders"),
    )


@query(
    "q_events_heatmap",
    oracle="""
    SELECT CAST(dayofweek(CAST(ts AS TIMESTAMP)) AS BIGINT) AS dow,
           CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS hod,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_events_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day activity heatmap — the load-profile
    aggregate behind every ops dashboard. Pure map-side date-part
    extraction into a ≤168-group aggregate.

    DuckDB dayofweek is 0=Sunday..6; Spark dayofweek is 1=Sunday..7 —
    aligned by subtracting 1 on the Spark side."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        (F.dayofweek("ts") - 1).cast("long").alias("dow"),
        F.hour("ts").cast("long").alias("hod"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@query(
    "q_rolling_active_users",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day
      FROM events
    ),
    contrib AS (
      SELECT user_id, CAST(day + to_days(CAST(t.k AS INTEGER)) AS DATE) AS w_day
      FROM ud CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS k) t
    ),
    bounds AS (SELECT min(day) AS dmin, max(day) AS dmax FROM ud)
    SELECT CAST(w_day AS VARCHAR) AS day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS wau
    FROM contrib, bounds
    WHERE w_day BETWEEN bounds.dmin AND bounds.dmax
    GROUP BY w_day
    """,
)
def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users (WAU): each (user, day) activity row
    contributes to the 7 trailing windows it falls in — the explode-to-
    windows trick that turns rolling COUNT DISTINCT (not decomposable as
    a window aggregate) into a plain groupBy. Fan-out is a fixed ×7 of
    the already-deduped (user, day) relation, so the shuffle stays
    proportional to active-user-days, never raw events."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")).distinct()
    bounds = ud.agg(F.min("day").alias("dmin"), F.max("day").alias("dmax"))
    contrib = ud.select(
        "user_id",
        F.explode(F.expr("sequence(day, date_add(day, 6), interval 1 day)")).alias("w_day"),
    )
    return (
        contrib.crossJoin(F.broadcast(bounds))
        .filter(F.col("w_day").between(F.col("dmin"), F.col("dmax")))
        .groupBy(F.col("w_day").cast("string").alias("day"))
        .agg(F.countDistinct("user_id").cast("long").alias("wau"))
    )


@query(
    "q_revenue_mom_growth",
    oracle="""
    WITH monthly AS (
      SELECT CAST(year(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS yr,
             CAST(month(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS mo,
             round(sum(o_totalprice), 2) AS revenue
      FROM orders GROUP BY 1, 2
    )
    SELECT yr, mo, revenue,
           round(revenue - lag(revenue) OVER (ORDER BY yr, mo), 2) AS delta,
           round((revenue - lag(revenue) OVER (ORDER BY yr, mo))
                 / lag(revenue) OVER (ORDER BY yr, mo) * 100, 4) AS pct_change
    FROM monthly
    """,
)
def q_revenue_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: monthly totals + lag-based delta
    and percent change — the canonical KPI trend query. The ordered
    window runs over the monthly aggregate (≤ a few dozen rows), never
    the fact table."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    w = Window.orderBy("yr", "mo")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "yr",
        "mo",
        "revenue",
        F.round(F.col("revenue") - prev, 2).alias("delta"),
        F.round((F.col("revenue") - prev) / prev * 100, 4).alias("pct_change"),
    )


@query(
    "q_events_error_rate",
    oracle="""
    SELECT CAST(CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS VARCHAR) AS day,
           count(*) AS n_events,
           CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_errors,
           round(CAST(count(*) FILTER (event_type = 'error') AS DOUBLE) / count(*), 4)
             AS error_rate
    FROM events
    GROUP BY 1
    """,
)
def q_events_error_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily error rate — the SLO time series every ops dashboard plots.
    Conditional count inside one partial-aggregated groupBy; the ratio
    divides exact integers so it matches the oracle bit-for-bit."""
    ev = load_table(spark, sf_dir, "events")
    n_err = F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
    return ev.groupBy(
        F.to_date(F.date_trunc("day", "ts")).cast("string").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        n_err.cast("long").alias("n_errors"),
        F.round(n_err.cast("double") / F.count(F.lit(1)), 4).alias("error_rate"),
    )


@query(
    "q_user_inactivity",
    oracle="""
    WITH last_seen AS (
      SELECT user_id,
             CAST(max(date_trunc('day', CAST(ts AS TIMESTAMP))) AS DATE) AS last_day,
             count(*) AS n_events
      FROM events GROUP BY user_id
    ),
    horizon AS (
      SELECT CAST(max(date_trunc('day', CAST(ts AS TIMESTAMP))) AS DATE) AS max_day
      FROM events
    )
    SELECT user_id, CAST(last_day AS VARCHAR) AS last_day, n_events,
           CAST(date_diff('day', last_day, horizon.max_day) AS BIGINT) AS days_inactive,
           date_diff('day', last_day, horizon.max_day) >= 7 AS churn_risk
    FROM last_seen, horizon
    """,
)
def q_user_inactivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inactivity / churn-risk flagging: days since each user's last
    activity relative to the corpus horizon, flagged at ≥7 idle days —
    the retention-ops complement to the cohort matrix (i12). One
    per-user aggregate plus a broadcast 1-row horizon."""
    ev = load_table(spark, sf_dir, "events")
    last_seen = ev.groupBy("user_id").agg(
        F.to_date(F.max(F.date_trunc("day", "ts"))).alias("last_day"),
        F.count(F.lit(1)).alias("n_events"),
    )
    horizon = ev.agg(F.to_date(F.max(F.date_trunc("day", "ts"))).alias("max_day"))
    idle = F.datediff("max_day", "last_day")
    return last_seen.crossJoin(F.broadcast(horizon)).select(
        "user_id",
        F.col("last_day").cast("string").alias("last_day"),
        "n_events",
        idle.cast("long").alias("days_inactive"),
        (idle >= 7).alias("churn_risk"),
    )


@query(
    "q_ship_ontime_rate",
    oracle="""
    SELECT CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS month,
           count(*) AS n_items,
           CAST(count(*) FILTER (datediff('day', o_orderdate, l_shipdate) <= 30)
                AS BIGINT) AS n_ontime,
           round(CAST(count(*) FILTER (datediff('day', o_orderdate, l_shipdate) <= 30)
                      AS DOUBLE) / count(*), 4) AS ontime_rate
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
)
def q_ship_ontime_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly on-time fulfillment rate: share of lineitems shipped
    within 30 days of their order date — the operational KPI twin of the
    latency distribution (h5), as an exact-integer conditional ratio.

    Scale: the join shuffles on the order key once; the monthly rollup
    is a ≤84-group aggregate with full map-side partials.
    """
    li, orders = load_tables(spark, sf_dir, "lineitem", "orders")
    ontime = F.when(F.datediff("l_shipdate", "o_orderdate") <= 30, 1).otherwise(0)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.to_date(F.date_trunc("month", "o_orderdate")).cast("string").alias("month")
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(ontime).cast("long").alias("n_ontime"),
            F.round(F.sum(ontime).cast("double") / F.count(F.lit(1)), 4).alias("ontime_rate"),
        )
    )


@query(
    "q_session_conversion",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                       - epoch_us(lag(CAST(ts AS TIMESTAMP))
                                  OVER (PARTITION BY user_id ORDER BY ts, event_id))
                       > 1800000000
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    numbered AS (
      SELECT user_id, event_type, ts,
             CAST(sum(new_session)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM flagged
    ),
    sessions AS (
      SELECT user_id, session_id,
             CAST(CAST(min(ts) AS DATE) AS VARCHAR) AS day,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
      FROM numbered GROUP BY user_id, session_id
    )
    SELECT day, count(*) AS n_sessions,
           CAST(sum(converted) AS BIGINT) AS n_converted,
           round(CAST(sum(converted) AS DOUBLE) / count(*), 4) AS conv_rate
    FROM sessions GROUP BY day
    """,
)
def q_session_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day session conversion rate: sessionize with the 30-minute
    gaps-and-islands machinery (i8), flag sessions containing a purchase,
    and roll up by session-start day — the funnel KPI most product
    dashboards lead with.

    Scale: one user_id shuffle covers both windows and the session
    rollup; the daily aggregate is a ≤(days) group map-side-combined agg.
    """
    ev = load_table(spark, sf_dir, "events")
    order_w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    run_w = order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.lag("ts").over(order_w).cast("timestamp")
    )
    flagged = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.when(gap_us > 1_800_000_000, 1)
        .when(F.lag("ts").over(order_w).isNull(), 1)
        .otherwise(0)
        .alias("new_session"),
    )
    numbered = flagged.withColumn("session_id", F.sum("new_session").over(run_w).cast("long"))
    sessions = numbered.groupBy("user_id", "session_id").agg(
        F.min("ts").cast("date").cast("string").alias("day"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("converted"),
    )
    return sessions.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("converted").cast("long").alias("n_converted"),
        F.round(F.sum("converted").cast("double") / F.count(F.lit(1)), 4).alias("conv_rate"),
    )


@query(
    "q_daily_value_percentiles",
    oracle="""
    SELECT CAST(CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS VARCHAR)
             AS day,
           count(*) AS n_events,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.95), 4) AS p95
    FROM events GROUP BY 1
    """,
)
def q_daily_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily p50/p95 of event value — the latency-SLO time-series shape
    (exact interpolated percentiles per day, d10's machinery on a time
    key). Scale: per-day exact percentiles sort within day partitions;
    at 100 TB the sketch path (d21) replaces the sort and merges
    per-executor GK summaries.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.to_date(F.date_trunc("day", "ts")).cast("string").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.percentile("value", 0.5), 4).alias("p50"),
        F.round(F.percentile("value", 0.95), 4).alias("p95"),
    )
