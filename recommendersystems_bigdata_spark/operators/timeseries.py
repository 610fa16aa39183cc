"""Hypertable-style time-series analytics (SURVEY.md §2.Q, round 8 tail).

The continuous-aggregate / downsampling / time-weighted toolkit a
time-series store (TimescaleDB-class hypertables, monitoring rollups)
layers over raw event streams, re-expressed as single-pass Spark
DataFrame plans over the ``events`` table:

- multi-resolution rollup: one GROUPING SETS pass materializes the
  hour/day/month aggregate levels a hypertable keeps as separate
  continuous aggregates — one shuffle for all three resolutions.
- exact EWMA: a binary-decay (alpha = 1/2) fixed-horizon moving average
  whose power-of-two weights keep the whole computation in int64 —
  no float recursion, engine-identical.
- rolling distinct cardinality: frame-bounded set semantics
  (collect_list → array_distinct → size), order-independent by
  construction.
- time-weighted average: the step-function integral TimescaleDB calls
  ``time_weight('locf')`` — value × microsecond holding time, summed in
  exact integers, one truncating divide at the end.
- M4 downsampling: the min/max/first/last-per-bucket reduction that
  preserves line-chart extrema exactly (Jugel et al., VLDB 2014).

Numeric discipline: ``value`` is a non-negative 2-dp double, so
``CAST(floor(value*100 + 0.5) AS BIGINT)`` is its exact e2 integer (see
``functions/exactmath.py``); every ratio is a truncating integer
division (Spark ``div`` == DuckDB ``//`` for the non-negative operands
here), never a rounded tie-capable float quotient. Timestamps compare
as exact integer microseconds (``unix_micros`` under the session's UTC
zone == DuckDB ``epoch_us``).

Scale: every operator below shuffles exactly once, on either the
grouping key or ``user_id``; window partitions are per-user event
streams (bounded: user activity, not corpus size). At 100 TB the
rollup's GROUPING SETS expansion is map-side (Expand before the
exchange carries 3× rows but partial-aggregates immediately), and the
per-user windows AQE-coalesce to the real key cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table, register_views
from recommendersystems_bigdata_spark.registry import query

# Exact e2 integer of the non-negative 2-dp `value` double — identical
# spelling both engines (exactmath.py's adjudicated floor(+0.5) form).
_VAL_E2 = "CAST(floor(value * 100 + 0.5) AS BIGINT)"


@query(
    "q_rollup_multires",
    oracle=f"""
    SELECT CASE WHEN grouping(h) = 0 THEN 'hour'
                WHEN grouping(d) = 0 THEN 'day'
                ELSE 'month' END AS resolution,
           coalesce(h, d, m) AS bucket_start,
           event_type,
           count(*) AS n_events,
           CAST(sum(v_e2) AS BIGINT) AS value_e2
    FROM (
      SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS h,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS d,
             CAST(date_trunc('month', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS m,
             event_type,
             {_VAL_E2} AS v_e2
      FROM events
    )
    GROUP BY GROUPING SETS ((h, event_type), (d, event_type), (m, event_type))
    """,
)
def q_rollup_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.Q q1 — multi-resolution continuous aggregate: hour, day and month
    rollups of ``(n_events, exact e2 value sum)`` per event_type in ONE
    grouping-sets pass — the batch analog of a hypertable keeping three
    continuous-aggregate levels in sync.

    Scale: Expand (3 rows per input row, one per grouping set) feeds a
    partial aggregate BEFORE the single exchange, so the shuffle carries
    ~|hour buckets × types| rows, not 3× the corpus. A 100 TB deployment
    materializes exactly this plan per refresh window instead of three
    separate scans."""
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT CASE WHEN grouping(h) = 0 THEN 'hour'
                    WHEN grouping(d) = 0 THEN 'day'
                    ELSE 'month' END AS resolution,
               coalesce(h, d, m) AS bucket_start,
               event_type,
               count(*) AS n_events,
               sum(v_e2) AS value_e2
        FROM (
          SELECT date_trunc('hour', ts) AS h,
                 date_trunc('day', ts) AS d,
                 date_trunc('month', ts) AS m,
                 event_type,
                 {_VAL_E2} AS v_e2
          FROM events
        )
        GROUP BY GROUPING SETS ((h, event_type), (d, event_type), (m, event_type))
        """
    )


@query(
    "q_ewma_binary_decay",
    oracle=f"""
    SELECT user_id, event_id, v_e2,
           (8 * v_e2 + 4 * l1 + 2 * l2 + 1 * l3) AS ewma_num_e2,
           ((8 * v_e2 + 4 * l1 + 2 * l2 + 1 * l3) * 100) // 15 AS ewma_e4
    FROM (
      SELECT user_id, event_id, {_VAL_E2} AS v_e2,
             lag({_VAL_E2}, 1) OVER w AS l1,
             lag({_VAL_E2}, 2) OVER w AS l2,
             lag({_VAL_E2}, 3) OVER w AS l3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    WHERE l3 IS NOT NULL
    """,
)
def q_ewma_binary_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.Q q2 — exact EWMA, binary decay: the alpha=1/2 exponentially
    weighted moving average over a fixed 4-event horizon. Power-of-two
    weights (8/4/2/1, denominator 15) keep the numerator in int64 and the
    final value an exact truncating-division e4 integer — the float
    recursion ``y = a·x + (1-a)·y`` is layout- and engine-sensitive; this
    spelling is bit-identical everywhere. Rows without a full horizon are
    excluded (no partial-weight edge semantics to disagree on).

    Scale: one shuffle on user_id; the three lags share one window sort.
    The horizon is O(1) state per row — at 100 TB this is a single
    window stage, never an unbounded frame."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = F.expr(_VAL_E2)
    out = (
        ev.select(
            "user_id",
            "event_id",
            v.alias("v_e2"),
            F.lag(v, 1).over(w).alias("l1"),
            F.lag(v, 2).over(w).alias("l2"),
            F.lag(v, 3).over(w).alias("l3"),
        )
        .filter(F.col("l3").isNotNull())
        .withColumn(
            "ewma_num_e2",
            F.expr("8 * v_e2 + 4 * l1 + 2 * l2 + 1 * l3"),
        )
        .withColumn("ewma_e4", F.expr("(ewma_num_e2 * 100) div 15"))
    )
    return out.select("user_id", "event_id", "v_e2", "ewma_num_e2", "ewma_e4")


@query(
    "q_rolling_distinct_types",
    oracle="""
    SELECT user_id, event_id,
           len(list_distinct(list(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))) AS n_types
    FROM events
    """,
)
def q_rolling_distinct_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.Q q3 — rolling distinct cardinality: how many DISTINCT event
    types each user's trailing 10 events span. ``count(DISTINCT ...)`` is
    not a legal window aggregate in either engine; both support the same
    set-semantics lowering — collect the frame, dedupe, measure — whose
    result is frame-ORDER-independent (a set), so the two engines agree
    without any ordering pact beyond the frame membership itself.

    Scale: one shuffle on user_id; the frame is 10 rows, so window state
    is O(1) per row. The exact-distinct frame answer stays cheap because
    the frame is bounded — an UNbounded distinct-over-time is the HLL
    sketch's job (q_agg_hll_sketch_merge), not a window frame's."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.size(F.array_distinct(F.collect_list("event_type").over(w))).alias(
            "n_types"
        ),
    )


@query(
    "q_time_weighted_avg",
    oracle=f"""
    SELECT user_id,
           count(*) AS n_segments,
           CAST(sum(dt_us) AS BIGINT) AS span_us,
           CAST(sum(v_e2 * dt_us) // sum(dt_us) AS BIGINT) AS twa_e2
    FROM (
      SELECT user_id, {_VAL_E2} AS v_e2,
             lead(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id)
             - epoch_us(CAST(ts AS TIMESTAMP)) AS dt_us
      FROM events
    )
    WHERE dt_us > 0
    GROUP BY user_id
    """,
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.Q q4 — time-weighted average (step/LOCF semantics): each value
    holds until the user's next event, so the average weights by HOLDING
    TIME, not by sample count — TimescaleDB's ``time_weight('locf')``.
    The integral runs as exact int64 ``value_e2 × microseconds`` products
    (max |term| ≈ 3×10^16 for a 2-dp value held a month — 300× headroom
    below 2^63 even summed over a year-long stream), with one truncating
    divide at the end. The trailing open segment is excluded, and so are
    ZERO-duration segments (``dt_us > 0``, not just non-null): they carry
    no weight by definition, and keeping them lets a user whose whole
    stream shares one timestamp reach the divide with a zero denominator
    — Spark's ANSI ``div`` throws there where DuckDB returns NULL (found
    by the fuzz spec in tests/test_property.py, not by the corpus, whose
    µs timestamps are distinct).

    Scale: one shuffle on user_id shared by the lead() window and the
    final groupBy (same key — Catalyst reuses the exchange), aggregate
    output one row per user."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = ev.select(
        "user_id",
        F.expr(_VAL_E2).alias("v_e2"),
        (F.lead(us).over(w) - us).alias("dt_us"),
    ).filter(F.col("dt_us") > 0)
    return seg.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum("dt_us").alias("span_us"),
        F.expr("sum(v_e2 * dt_us) div sum(dt_us)").alias("twa_e2"),
    )


@query(
    "q_downsample_m4",
    oracle=f"""
    SELECT user_id, bucket, count(*) AS n_points,
           min(v_e2) AS v_min_e2, max(v_e2) AS v_max_e2,
           max(CASE WHEN rn_asc = 1 THEN v_e2 END) AS v_first_e2,
           max(CASE WHEN rn_desc = 1 THEN v_e2 END) AS v_last_e2
    FROM (
      SELECT user_id,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS bucket,
             {_VAL_E2} AS v_e2,
             row_number() OVER (
               PARTITION BY user_id, date_trunc('day', CAST(ts AS TIMESTAMP))
               ORDER BY ts, event_id) AS rn_asc,
             row_number() OVER (
               PARTITION BY user_id, date_trunc('day', CAST(ts AS TIMESTAMP))
               ORDER BY ts DESC, event_id DESC) AS rn_desc
      FROM events
    )
    GROUP BY user_id, bucket
    """,
)
def q_downsample_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.Q q5 — M4 downsampling: per (user, day-bucket) keep exactly the
    four values a pixel-perfect line chart needs — min, max, first, last
    (Jugel et al., "M4: A Visualization-Oriented Time Series Data
    Aggregation", VLDB 2014). First/last are pinned by the unique
    ``(ts, event_id)`` order via row_number (both directions), not by
    any engine's first()/arg_min tie whim, so the reduction is
    deterministic on every layout.

    Scale: both row_number windows and the final groupBy share the
    ``(user_id, bucket)`` hash partitioning — one exchange total; output
    is |users × days|, the canonical 1000×-smaller chart-serving table."""
    ev = load_table(spark, sf_dir, "events")
    # Materialize the bucket BEFORE the windows so the two row_number
    # partitionings and the final groupBy all hash on the same attribute —
    # partitioning over the raw date_trunc expression reads as a distinct
    # key to Catalyst and costs a second exchange (measured).
    base = ev.select(
        "user_id",
        F.date_trunc("day", F.col("ts")).alias("bucket"),
        F.expr(_VAL_E2).alias("v_e2"),
        "ts",
        "event_id",
    )
    w_asc = Window.partitionBy("user_id", "bucket").orderBy("ts", "event_id")
    w_desc = Window.partitionBy("user_id", "bucket").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    pts = base.select(
        "user_id",
        "bucket",
        "v_e2",
        F.row_number().over(w_asc).alias("rn_asc"),
        F.row_number().over(w_desc).alias("rn_desc"),
    )
    return pts.groupBy("user_id", "bucket").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.min("v_e2").alias("v_min_e2"),
        F.max("v_e2").alias("v_max_e2"),
        F.max(F.when(F.col("rn_asc") == 1, F.col("v_e2"))).alias("v_first_e2"),
        F.max(F.when(F.col("rn_desc") == 1, F.col("v_e2"))).alias("v_last_e2"),
    )


@query(
    "q_counter_reset_increase",
    oracle=f"""
    WITH c AS (
      SELECT user_id, ts, event_id,
             sum({_VAL_E2}) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) % 100000 AS counter
      FROM events
    ), d AS (
      SELECT user_id, counter,
             lag(counter) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM c
    )
    SELECT user_id, count(*) AS n_samples,
           CAST(sum(CASE WHEN prev IS NULL THEN 0
                         WHEN counter >= prev THEN counter - prev
                         ELSE counter END) AS BIGINT) AS increase_e2,
           CAST(sum(CASE WHEN counter < prev THEN 1 ELSE 0 END) AS BIGINT)
             AS n_resets
    FROM d
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q_counter_reset_increase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.Q q6 — monotonic-counter increase with reset handling: the
    Prometheus ``increase()`` convention. The input counter is derived
    deterministically (per-user running e2 sum modulo 1e5, so it really
    does wrap), and the operator reconstructs total increase treating
    every drop as a restart-from-zero: ``delta >= 0 ? delta : current``
    — exactly how a monitoring store reads a crashed process's counter.
    All integer arithmetic; reset counts surface for auditability.

    Scale: one shuffle on user_id shared by the cumulative-sum window,
    the lag window (same (ts, event_id) sort — one Window stage chain,
    no re-sort) and the final per-user aggregate; O(1) state per row."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = (
        F.sum(F.expr(_VAL_E2))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        % 100000
    )
    c = ev.select("user_id", "ts", "event_id", cum.alias("counter"))
    d = c.select(
        "user_id", "counter", F.lag("counter").over(w).alias("prev")
    )
    inc = F.when(F.col("prev").isNull(), 0).when(
        F.col("counter") >= F.col("prev"), F.col("counter") - F.col("prev")
    ).otherwise(F.col("counter"))
    return (
        d.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.sum(inc).alias("increase_e2"),
            F.sum(
                F.when(F.col("counter") < F.col("prev"), 1).otherwise(0)
            ).alias("n_resets"),
        )
        .orderBy("user_id")
    )


@query(
    "q_gapfill_interpolate",
    oracle=f"""
    WITH daily AS (
      SELECT user_id, day, v_e2 FROM (
        SELECT user_id,
               CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
               {_VAL_E2} AS v_e2,
               row_number() OVER (
                 PARTITION BY user_id, date_trunc('day', CAST(ts AS TIMESTAMP))
                 ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) WHERE rn = 1
    ), grid AS (
      SELECT user_id,
             CAST(unnest(generate_series(dmin, dmax, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM (SELECT user_id, min(day) AS dmin, max(day) AS dmax
            FROM daily GROUP BY 1)
    ), filled AS (
      SELECT g.user_id, g.day, d.v_e2,
        last_value(d.v_e2 IGNORE NULLS) OVER w_fwd AS v0,
        last_value(CASE WHEN d.v_e2 IS NOT NULL THEN g.day END IGNORE NULLS)
          OVER w_fwd AS d0,
        first_value(d.v_e2 IGNORE NULLS) OVER w_bwd AS v1,
        first_value(CASE WHEN d.v_e2 IS NOT NULL THEN g.day END IGNORE NULLS)
          OVER w_bwd AS d1
      FROM grid g LEFT JOIN daily d ON d.user_id = g.user_id AND d.day = g.day
      WINDOW w_fwd AS (PARTITION BY g.user_id ORDER BY g.day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             w_bwd AS (PARTITION BY g.user_id ORDER BY g.day
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, CAST(day AS TIMESTAMP) AS day,
           CAST(CASE WHEN v_e2 IS NOT NULL THEN v_e2
                ELSE v0 + ((v1 - v0) * (day - d0)) // (d1 - d0) END AS BIGINT)
             AS v_e2_filled,
           CAST(CASE WHEN v_e2 IS NOT NULL THEN 1 ELSE 0 END AS INT)
             AS observed
    FROM filled
    """,
)
def q_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.Q q7 — gap-fill with LINEAR interpolation (TimescaleDB
    ``time_bucket_gapfill`` + ``interpolate``; complements LOCF
    q_resample_ffill): each user's daily series is completed over the
    full min..max day grid, missing days interpolated between the
    bracketing observations. Daily "last" value is pinned by the unique
    (ts, event_id) descending row_number (no engine tie whim); the
    interpolation ``v0 + (v1-v0)·Δd div span`` is a truncating integer
    division (Spark ``div`` ≡ DuckDB ``//`` toward zero for any sign —
    (v1-v0) is frequently negative here), never a rounded float. Grid
    edges are always observed (the grid spans observations), so no
    NULL-edge semantics to disagree on.

    Scale: the grid explode is bounded (per-user span in days, ≤31 on
    this corpus; a year-long deployment caps it by chunking the grid to
    the refresh window); the (user, day) join and both ignore-nulls
    carry windows share the per-user partitioning. Nothing in the plan
    scales with events except the initial daily reduction."""
    ev = load_table(spark, sf_dir, "events")
    w_day = Window.partitionBy("user_id", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    daily = (
        ev.select(
            "user_id",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
            F.expr(_VAL_E2).alias("v_e2"),
            "ts",
            "event_id",
        )
        .withColumn("rn", F.row_number().over(w_day))
        .filter(F.col("rn") == 1)
        .select("user_id", "day", "v_e2")
    )
    grid = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("dmin"), F.max("day").alias("dmax"))
        .select(
            "user_id",
            F.explode(
                F.sequence(F.col("dmin"), F.col("dmax"), F.expr("interval 1 day"))
            ).alias("day"),
        )
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_bwd = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("v_e2").isNotNull(), F.col("day"))
    filled = (
        grid.join(daily, ["user_id", "day"], "left")
        .withColumn("v0", F.last("v_e2", ignorenulls=True).over(w_fwd))
        .withColumn("d0", F.last(obs_day, ignorenulls=True).over(w_fwd))
        .withColumn("v1", F.first("v_e2", ignorenulls=True).over(w_bwd))
        .withColumn("d1", F.first(obs_day, ignorenulls=True).over(w_bwd))
    )
    return filled.select(
        "user_id",
        # dates leave the engines as different pandas dtypes (str vs
        # datetime); a µs timestamp canonicalizes identically — the same
        # adjudication q_rollup_multires carries
        F.col("day").cast("timestamp_ntz").alias("day"),
        F.when(F.col("v_e2").isNotNull(), F.col("v_e2"))
        .otherwise(
            F.expr(
                "v0 + ((v1 - v0) * datediff(day, d0)) div datediff(d1, d0)"
            )
        )
        .cast("long")
        .alias("v_e2_filled"),
        F.when(F.col("v_e2").isNotNull(), 1).otherwise(0).cast("int")
        .alias("observed"),
    )


@query(
    "q_trend_slope",
    oracle=f"""
    WITH pts AS (
      SELECT user_id,
             CAST(date_diff('day',
                    min(CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE))
                      OVER (PARTITION BY user_id),
                    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE))
                  AS BIGINT) AS x,
             {_VAL_E2} AS y
      FROM events
    )
    SELECT user_id, count(*) AS n_points,
           CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT)
             AS slope_num,
           CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT)
             AS slope_den,
           CAST(CASE WHEN count(*) * sum(x * y) - sum(x) * sum(y) > 0 THEN 1
                     WHEN count(*) * sum(x * y) - sum(x) * sum(y) < 0 THEN -1
                     ELSE 0 END AS INT) AS trend
    FROM pts
    GROUP BY user_id
    HAVING count(*) * sum(x * x) - sum(x) * sum(x) > 0
    ORDER BY user_id
    """,
)
def q_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.Q q8 — per-user value trend as an EXACT RATIONAL OLS slope:
    the least-squares slope over (day offset, value_e2) points is
    ``(n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)`` — both sides of the fraction
    are pure int64 sums of integer products, so the repo reports the
    UNREDUCED numerator and denominator exactly instead of a
    layout-sensitive float division, plus the sign as the trend class
    (+1 rising / −1 falling / 0 flat). x is the day offset from the
    user's own first active day (0..29 on this corpus), y the exact e2
    value. Users whose points share one day (denominator 0 — slope
    undefined) are excluded by the HAVING, identically in both engines.
    Overflow headroom: n ≤ 10³ points/user-month, x ≤ 31, y ≤ 10⁶ ⇒
    |n·Σxy| ≲ 10¹³, five orders below 2^63.

    Scale: one shuffle on user_id shared by the min-day window and the
    final aggregate (same key); all five sufficient statistics
    (n, Σx, Σy, Σxy, Σx²) partial-aggregate map-side — the classic
    one-pass regression-state pattern, and the state is mergeable, so
    this drops into the a19 snapshot+delta refresh unchanged."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    w_user = Window.partitionBy("user_id")
    pts = ev.select(
        "user_id",
        F.datediff(day, F.min(day).over(w_user)).cast("long").alias("x"),
        F.expr(_VAL_E2).alias("y"),
    )
    agg = pts.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.expr("sum(x * y)").alias("sxy"),
        F.expr("sum(x * x)").alias("sxx"),
    )
    num = F.col("n_points") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n_points") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        agg.select(
            "user_id",
            "n_points",
            num.cast("long").alias("slope_num"),
            den.cast("long").alias("slope_den"),
            F.when(num > 0, 1).when(num < 0, -1).otherwise(0)
            .cast("int")
            .alias("trend"),
        )
        .filter(F.col("slope_den") > 0)
        .orderBy("user_id")
    )
