"""Traffic-shape screens over the event stream (SURVEY.md §2.BM, round 9).

The "is this user a human or a script" family over the events table —
the log-hygiene screens a training-data pipeline runs before treating
clickstream-derived signals as ground truth, beside §2.I's
sessionization and §2.AA's series diagnostics:

- bm1: the burst screen — each user's maximum event count inside any
  sliding 60-second window, via a RANGE frame on epoch seconds
  (``RANGE BETWEEN 59 PRECEDING AND CURRENT ROW`` — identical peer
  semantics in both engines, duplicate timestamps included on both
  sides), flagged against the documented burst threshold.
- bm2: the metronome screen — the modal inter-event gap per user and
  its share of all gaps: scripts fire on fixed intervals, humans
  don't. The gap order is totalized by (ts, event_id) so the lag is
  deterministic under equal timestamps; the mode is tie-broken to the
  SMALLEST gap (``max_by`` would be pick-dependent).
- bm3: the duty-cycle profile — active minutes (distinct epoch-minute
  buckets) over span minutes in bp, plus events per active minute in
  milli: always-on low-rate pollers separate from bursty humans here.
- bm4: the screen scorecard — one row per screen with flagged/total
  user counts and the flagged share bp, recomposing bm1/bm2/bm3's
  published flags exactly (the §2.BI bi4 self-consistency rule).

Thresholds (burst ≥ 2 events/min, mode share ≥ 3 %, duty ≥ 15 bp with
a minimum history) are config defaults sized to the corpus's sparse
synthetic traffic so both flag branches are exercised at every SF;
the screens are parametric by construction.

Exactness: epoch seconds are exact integers (µs div 10⁶, matching the
catalog's ns→µs truncation and DuckDB's ``epoch_us // 1000000``);
every share is a truncating division of non-negative integers.

Spark-first shape, sized for 100 TB: every screen is ONE fact pass
whose only wide operations are keyed BY USER — the burst window, the
gap lag, and the per-user aggregations all share the user_id
partitioning (per-user event counts are bounded and skew-free here;
a pathological single-user firehose would take the §2.L salting
device) — reduced to a users-sized relation, never a global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query

_ES_SPARK = "unix_micros(CAST(ts AS TIMESTAMP)) div 1000000"
_ES_DUCK = "epoch_us(CAST(ts AS TIMESTAMP)) // 1000000"

_BURST_N = 2  # events inside one sliding minute
_MODE_BP = 300  # modal gap share ≥ 3 %
_MODE_MIN_GAPS = 30
_DUTY_BP = 15
_DUTY_MIN_SPAN_MIN = 60

# DuckDB: the shared per-user epoch-second relation and derived screens.
_BURST_SQL = f"""
e AS (
  SELECT user_id, {_ES_DUCK} AS es, event_id FROM events
),
bw AS (
  SELECT user_id, count(*) OVER (PARTITION BY user_id ORDER BY es
           RANGE BETWEEN 59 PRECEDING AND CURRENT ROW) AS c
  FROM e
),
burst AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
         CAST(max(c) AS BIGINT) AS max_burst_60s
  FROM bw GROUP BY user_id
),
span AS (
  SELECT user_id, CAST(max(es) - min(es) AS BIGINT) AS span_sec FROM e
  GROUP BY user_id
)
"""
_GAP_SQL = f"""
eg AS (
  SELECT user_id, {_ES_DUCK} AS es, event_id FROM events
),
g AS (
  SELECT user_id,
         es - lag(es) OVER (PARTITION BY user_id ORDER BY es, event_id)
           AS gap
  FROM eg
),
gc AS (
  SELECT user_id, gap, CAST(count(*) AS BIGINT) AS cnt
  FROM g WHERE gap IS NOT NULL GROUP BY user_id, gap
),
gm AS (
  SELECT user_id, CAST(max(cnt) AS BIGINT) AS mode_cnt,
         CAST(sum(cnt) AS BIGINT) AS n_gaps
  FROM gc GROUP BY user_id
),
mode AS (
  SELECT gc.user_id, gm.n_gaps, gm.mode_cnt,
         CAST(min(gc.gap) AS BIGINT) AS mode_gap_sec
  FROM gc JOIN gm ON gc.user_id = gm.user_id AND gc.cnt = gm.mode_cnt
  GROUP BY gc.user_id, gm.n_gaps, gm.mode_cnt
)
"""
_DUTY_SQL = f"""
ed AS (
  SELECT user_id, {_ES_DUCK} AS es FROM events
),
duty AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
         CAST(count(DISTINCT es // 60) AS BIGINT) AS active_min,
         CAST((max(es) - min(es)) // 60 + 1 AS BIGINT) AS span_min
  FROM ed GROUP BY user_id
)
"""


def _es_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "user_id", F.expr(f"CAST({_ES_SPARK} AS BIGINT)").alias("es"), "event_id"
    )


@query(
    "q_burst_rate_screen",
    oracle=f"""
    WITH {_BURST_SQL}
    SELECT b.user_id, b.n, s.span_sec, b.max_burst_60s,
           b.max_burst_60s >= {_BURST_N} AS burst_flag
    FROM burst b JOIN span s ON b.user_id = s.user_id
    ORDER BY b.user_id
    """,
)
def q_burst_rate_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BM bm1 — the burst screen: per user, the maximum event count
    inside any sliding 60-second window (RANGE frame on exact epoch
    seconds, duplicate-timestamp peers included identically in both
    engines), the event count, the activity span, and the flag against
    the documented burst threshold. The classic rate-limiter view of a
    log, computed exactly rather than by minute-bucket approximation
    (a bucket boundary splits a burst; the RANGE frame doesn't).

    Scale: one fact pass; the window and both aggregations share the
    user_id partitioning — no global window, output users-sized."""
    e = _es_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("es")
        .rangeBetween(-59, 0)
    )
    bw = e.select("user_id", "es", F.count(F.lit(1)).over(w).alias("c"))
    return (
        bw.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.max("c").cast("long").alias("max_burst_60s"),
            F.expr("CAST(max(es) - min(es) AS BIGINT)").alias("span_sec"),
        )
        .select(
            "user_id",
            "n",
            "span_sec",
            "max_burst_60s",
            (F.col("max_burst_60s") >= _BURST_N).alias("burst_flag"),
        )
        .orderBy("user_id")
    )


@query(
    "q_metronome_screen",
    oracle=f"""
    WITH {_GAP_SQL}
    SELECT user_id, n_gaps, mode_gap_sec, mode_cnt,
           CAST((10000 * mode_cnt) // n_gaps AS BIGINT) AS mode_share_bp,
           (10000 * mode_cnt) // n_gaps >= {_MODE_BP}
             AND n_gaps >= {_MODE_MIN_GAPS} AS metronomic
    FROM mode ORDER BY user_id
    """,
)
def q_metronome_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BM bm2 — the metronome screen: per user, the modal
    inter-event gap (ties broken to the smallest gap), its count and
    share of all gaps in bp, and the regularity flag — scripts repeat
    an interval, humans scatter. The lag's ordering is totalized by
    (epoch second, event_id) so equal timestamps produce the same gap
    sequence in both engines.

    Scale: gap lag and both census aggregations share the user_id
    partitioning; the mode join is (user, gap)-census vs user-census,
    both bounded by distinct gap values, not events."""
    e = _es_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    g = e.select(
        "user_id", (F.col("es") - F.lag("es").over(w)).alias("gap")
    ).where(F.col("gap").isNotNull())
    gc = g.groupBy("user_id", "gap").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    gm = gc.groupBy("user_id").agg(
        F.max("cnt").cast("long").alias("mode_cnt"),
        F.sum("cnt").cast("long").alias("n_gaps"),
    )
    mode = (
        gc.join(gm, "user_id")
        .where(F.col("cnt") == F.col("mode_cnt"))
        .groupBy("user_id", "n_gaps", "mode_cnt")
        .agg(F.min("gap").cast("long").alias("mode_gap_sec"))
    )
    return mode.select(
        "user_id",
        "n_gaps",
        "mode_gap_sec",
        "mode_cnt",
        F.expr("CAST((10000 * mode_cnt) div n_gaps AS BIGINT)").alias(
            "mode_share_bp"
        ),
        F.expr(
            f"(10000 * mode_cnt) div n_gaps >= {_MODE_BP}"
            f" AND n_gaps >= {_MODE_MIN_GAPS}"
        ).alias("metronomic"),
    ).orderBy("user_id")


@query(
    "q_duty_cycle_profile",
    oracle=f"""
    WITH {_DUTY_SQL}
    SELECT user_id, n, active_min, span_min,
           CAST((10000 * active_min) // span_min AS BIGINT) AS duty_bp,
           CAST((1000 * n) // active_min AS BIGINT)
             AS events_per_active_min_milli,
           (10000 * active_min) // span_min >= {_DUTY_BP}
             AND span_min >= {_DUTY_MIN_SPAN_MIN} AS always_on
    FROM duty ORDER BY user_id
    """,
)
def q_duty_cycle_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BM bm3 — the duty-cycle profile: per user, distinct active
    epoch-minutes over span minutes in bp and the event rate per
    active minute in milli, with the always-on flag — the view that
    separates low-rate pollers (high duty, low rate) from bursty
    humans (low duty). Active minutes are an exact distinct count of
    integer minute buckets, not an approximation.

    Scale: one partial-aggregated fact pass keyed by user (the
    distinct-minute count is a two-level aggregation under the same
    partitioning); output users-sized."""
    e = _es_events(spark, sf_dir)
    duty = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct(F.expr("es div 60")).cast("long").alias("active_min"),
        F.expr("CAST((max(es) - min(es)) div 60 + 1 AS BIGINT)").alias(
            "span_min"
        ),
    )
    return duty.select(
        "user_id",
        "n",
        "active_min",
        "span_min",
        F.expr("CAST((10000 * active_min) div span_min AS BIGINT)").alias(
            "duty_bp"
        ),
        F.expr("CAST((1000 * n) div active_min AS BIGINT)").alias(
            "events_per_active_min_milli"
        ),
        F.expr(
            f"(10000 * active_min) div span_min >= {_DUTY_BP}"
            f" AND span_min >= {_DUTY_MIN_SPAN_MIN}"
        ).alias("always_on"),
    ).orderBy("user_id")


@query(
    "q_traffic_screen_summary",
    oracle=f"""
    WITH {_BURST_SQL},
    bsum AS (
      SELECT 'burst' AS screen,
             CAST(count(*) FILTER (WHERE max_burst_60s >= {_BURST_N})
                  AS BIGINT) AS users_flagged,
             CAST(count(*) AS BIGINT) AS users_total
      FROM burst
    ),
    {_GAP_SQL.strip().lstrip()},
    msum AS (
      SELECT 'metronome' AS screen,
             CAST(count(*) FILTER (WHERE (10000 * mode_cnt) // n_gaps
                    >= {_MODE_BP} AND n_gaps >= {_MODE_MIN_GAPS})
                  AS BIGINT) AS users_flagged,
             CAST(count(*) AS BIGINT) AS users_total
      FROM mode
    ),
    {_DUTY_SQL.strip().lstrip()},
    dsum AS (
      SELECT 'duty' AS screen,
             CAST(count(*) FILTER (WHERE (10000 * active_min) // span_min
                    >= {_DUTY_BP} AND span_min >= {_DUTY_MIN_SPAN_MIN})
                  AS BIGINT) AS users_flagged,
             CAST(count(*) AS BIGINT) AS users_total
      FROM duty
    ),
    u AS (
      SELECT * FROM bsum UNION ALL SELECT * FROM msum
      UNION ALL SELECT * FROM dsum
    )
    SELECT screen, users_flagged, users_total,
           CAST((10000 * users_flagged) // users_total AS BIGINT)
             AS flagged_bp
    FROM u ORDER BY screen
    """,
)
def q_traffic_screen_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BM bm4 — the screen scorecard: one row per screen (burst /
    metronome / duty) with flagged and total user counts and the
    flagged share in bp, recomposed from bm1/bm2/bm3's PUBLISHED flag
    columns — so the scorecard is provably consistent with the
    per-user screens (the §2.BI bi4 rule, pinned in
    tests/test_botscreen.py).

    Scale: three users-sized relations reduced to 1 row each; the
    union is 3 rows."""

    def _summ(df: DataFrame, screen: str, flag: str) -> DataFrame:
        return df.agg(
            F.count_if(F.col(flag)).cast("long").alias("users_flagged"),
            F.count(F.lit(1)).cast("long").alias("users_total"),
        ).select(F.lit(screen).alias("screen"), "users_flagged", "users_total")

    rows = (
        _summ(q_burst_rate_screen(spark, sf_dir), "burst", "burst_flag")
        .unionAll(
            _summ(q_metronome_screen(spark, sf_dir), "metronome", "metronomic")
        )
        .unionAll(
            _summ(q_duty_cycle_profile(spark, sf_dir), "duty", "always_on")
        )
    )
    return rows.select(
        "screen",
        "users_flagged",
        "users_total",
        F.expr("CAST((10000 * users_flagged) div users_total AS BIGINT)").alias(
            "flagged_bp"
        ),
    ).orderBy("screen")
