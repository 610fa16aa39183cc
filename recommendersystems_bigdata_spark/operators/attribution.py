"""Marketing attribution over the event stream (SURVEY.md §2.S, round 8).

The conversion-credit toolkit an event warehouse runs on top of the
funnel/pathing operators (§2.I): join each conversion to the user's
preceding touchpoints inside a lookback window, then assign credit
under the standard models — first-touch, last-touch, linear — and
measure time-to-convert per acquisition channel. Spark-first shape:
the conversion⋈touch pairing is a theta join whose USER equi-conjunct
keeps it hash-partitioned (never a nested loop, the c8 rule), and the
per-conversion rankings are windows over the already-paired frame.

Determinism discipline: touch order inside a conversion is pinned by
the unique (ts, event_id) pair, never an engine's tie whim; timestamps
compare as exact integer microseconds; the linear split is
``10000 div n`` basis points per touch with the remainder
(``10000 mod n``) assigned to the LAST touch by convention — so every
conversion's credits sum to exactly 10000 bp and no float division
exists anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query

# Lookback window: 7 days in exact integer microseconds.
_LOOKBACK_US = 7 * 86400 * 1_000_000

# Touch channels: user-initiated pre-conversion events. 'error' is
# system noise, 'purchase' is the conversion itself.
_TOUCH_TYPES = ("click", "view", "signup")


def _sql_in(names: tuple[str, ...]) -> str:
    return "(" + ", ".join(f"'{n}'" for n in names) + ")"


_PAIRS_SQL = f"""
    WITH conv AS (
      SELECT user_id, event_id AS conv_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS conv_us
      FROM events WHERE event_type = 'purchase'
    ), touch AS (
      SELECT user_id, event_id AS touch_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS touch_us
      FROM events WHERE event_type IN {_sql_in(_TOUCH_TYPES)}
    ), pairs AS (
      SELECT c.user_id, c.conv_id, c.conv_us, t.touch_id, t.event_type,
             t.touch_us,
             row_number() OVER (PARTITION BY c.user_id, c.conv_id
                                ORDER BY t.touch_us, t.touch_id) AS rn_asc,
             row_number() OVER (PARTITION BY c.user_id, c.conv_id
                                ORDER BY t.touch_us DESC, t.touch_id DESC)
               AS rn_desc,
             count(*) OVER (PARTITION BY c.user_id, c.conv_id) AS n_touch
      FROM conv c JOIN touch t
        ON t.user_id = c.user_id
       AND t.touch_us < c.conv_us
       AND t.touch_us >= c.conv_us - {_LOOKBACK_US}
    )
"""


@query(
    "q_attribution_multitouch",
    oracle=f"""
    {_PAIRS_SQL}
    SELECT event_type AS channel,
           CAST(sum(CASE WHEN rn_asc = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS first_touch_conv,
           CAST(sum(CASE WHEN rn_desc = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS last_touch_conv,
           CAST(sum(10000 // n_touch
                    + CASE WHEN rn_desc = 1 THEN 10000 % n_touch ELSE 0 END)
                AS BIGINT) AS linear_credit_bp,
           count(*) AS n_touches
    FROM pairs
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_attribution_multitouch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.S s1 — multi-touch conversion attribution: every purchase is
    joined to the same user's click/view/signup touches in the prior 7
    days, and each channel's credit is reported under the three standard
    models at once — first-touch conversions, last-touch conversions,
    and linear credit in exact integer basis points (``10000 div n`` per
    touch, remainder to the last touch, so every conversion distributes
    exactly 10000 bp). Conversions with no in-window touch drop out of
    all three models identically in both engines.

    Scale: the conversion⋈touch pairing hash-partitions on user_id (the
    time predicate is the join residual — never a nested loop); both
    row_number directions and the touch count share the
    (user, conversion) window sort over the already-paired frame; the
    final aggregate is |channels| rows. Pair volume is bounded by
    touches-per-user-week × conversions — user-activity-bounded, not
    corpus²."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    conv = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("conv_id"), us.alias("conv_us")
    )
    touch = ev.filter(F.col("event_type").isin(*_TOUCH_TYPES)).select(
        F.col("user_id").alias("t_user"),
        F.col("event_id").alias("touch_id"),
        "event_type",
        us.alias("touch_us"),
    )
    pairs = conv.join(
        touch,
        (F.col("t_user") == F.col("user_id"))
        & (F.col("touch_us") < F.col("conv_us"))
        & (F.col("touch_us") >= F.col("conv_us") - F.lit(_LOOKBACK_US)),
    )
    w = Window.partitionBy("user_id", "conv_id")
    ranked = pairs.select(
        "event_type",
        F.row_number()
        .over(w.orderBy("touch_us", "touch_id"))
        .alias("rn_asc"),
        F.row_number()
        .over(w.orderBy(F.col("touch_us").desc(), F.col("touch_id").desc()))
        .alias("rn_desc"),
        F.count(F.lit(1)).over(w).alias("n_touch"),
    )
    return (
        ranked.groupBy(F.col("event_type").alias("channel"))
        .agg(
            F.sum(F.when(F.col("rn_asc") == 1, 1).otherwise(0))
            .cast("long")
            .alias("first_touch_conv"),
            F.sum(F.when(F.col("rn_desc") == 1, 1).otherwise(0))
            .cast("long")
            .alias("last_touch_conv"),
            F.sum(
                F.expr("10000 div n_touch")
                + F.when(F.col("rn_desc") == 1, F.expr("10000 % n_touch"))
                .otherwise(0)
            )
            .cast("long")
            .alias("linear_credit_bp"),
            F.count(F.lit(1)).alias("n_touches"),
        )
        .orderBy("channel")
    )


@query(
    "q_attribution_lag",
    oracle=f"""
    {_PAIRS_SQL}
    SELECT event_type AS first_channel,
           count(*) AS n_conversions,
           CAST(min(conv_us - touch_us) AS BIGINT) AS min_lag_us,
           CAST(max(conv_us - touch_us) AS BIGINT) AS max_lag_us,
           CAST(sum(conv_us - touch_us) // count(*) AS BIGINT) AS mean_lag_us
    FROM pairs
    WHERE rn_asc = 1
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_attribution_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.S s2 — time-to-convert by acquisition channel: for every
    attributed conversion, the lag from its FIRST in-window touch to the
    purchase, aggregated per first-touch channel (count, min/max, and a
    truncating-integer-division mean in exact microseconds — never a
    float average). The first touch is pinned by (ts, event_id)
    ascending row_number, so channel assignment is deterministic under
    ties.

    Scale: reuses s1's pairing and window shape; the rn_asc = 1 filter
    reduces the frame to one row per conversion before the |channels|-row
    aggregate."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    conv = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("conv_id"), us.alias("conv_us")
    )
    touch = ev.filter(F.col("event_type").isin(*_TOUCH_TYPES)).select(
        F.col("user_id").alias("t_user"),
        F.col("event_id").alias("touch_id"),
        "event_type",
        us.alias("touch_us"),
    )
    pairs = conv.join(
        touch,
        (F.col("t_user") == F.col("user_id"))
        & (F.col("touch_us") < F.col("conv_us"))
        & (F.col("touch_us") >= F.col("conv_us") - F.lit(_LOOKBACK_US)),
    )
    w = Window.partitionBy("user_id", "conv_id").orderBy("touch_us", "touch_id")
    first = (
        pairs.withColumn("rn_asc", F.row_number().over(w))
        .filter(F.col("rn_asc") == 1)
        .withColumn("lag_us", F.col("conv_us") - F.col("touch_us"))
    )
    return (
        first.groupBy(F.col("event_type").alias("first_channel"))
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.min("lag_us").cast("long").alias("min_lag_us"),
            F.max("lag_us").cast("long").alias("max_lag_us"),
            F.expr("sum(lag_us) div count(1)").cast("long").alias("mean_lag_us"),
        )
        .orderBy("first_channel")
    )


@query(
    "q_attribution_time_decay",
    oracle=f"""
    {_PAIRS_SQL}
    , weighted AS (
      SELECT user_id, conv_id, event_type, rn_desc,
             (1 << greatest(0, 6 - CAST((conv_us - touch_us) // 86400000000
                                        AS INT))) AS w
      FROM pairs
    ), totaled AS (
      SELECT user_id, conv_id, event_type, rn_desc,
             (w * 10000) // sum(w) OVER (PARTITION BY user_id, conv_id)
               AS credit_trunc
      FROM weighted
    ), credited AS (
      SELECT event_type, rn_desc, credit_trunc,
             10000 - sum(credit_trunc)
               OVER (PARTITION BY user_id, conv_id) AS rem
      FROM totaled
    )
    SELECT event_type AS channel,
           CAST(sum(credit_trunc
                    + CASE WHEN rn_desc = 1 THEN rem ELSE 0 END) AS BIGINT)
             AS decay_credit_bp,
           count(*) AS n_touches
    FROM credited
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.S s3 — time-decay attribution, the fourth standard model: a
    touch's weight HALVES per day of age (power-of-two weights
    ``2^(max(0, 6 − age_days))`` inside the 7-day lookback — the
    q2-EWMA trick that keeps exponential decay in exact int64). The
    lookback's INCLUSIVE lower bound admits a touch exactly 7 days old
    (age_days = 7); the ``greatest(0, ...)`` clamp pins its weight at 1
    — the same as day 6 — instead of a negative shift, which DuckDB
    rejects outright and Java shift-masks into garbage (the round-8
    ADVICE boundary finding). Each
    conversion's 10000 bp distribute proportionally to weight via
    truncating division, remainder to the most recent touch — so decay
    credits sum to exactly 10000 per conversion, like s1's linear model,
    and no float power/divide exists anywhere.

    Scale: identical shape to s1 — the user-equi pairing plus
    (user, conversion) windows (weight total, truncated-credit total,
    recency rank) over the paired frame; final aggregate is |channels|
    rows."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    conv = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("conv_id"), us.alias("conv_us")
    )
    touch = ev.filter(F.col("event_type").isin(*_TOUCH_TYPES)).select(
        F.col("user_id").alias("t_user"),
        F.col("event_id").alias("touch_id"),
        "event_type",
        us.alias("touch_us"),
    )
    pairs = conv.join(
        touch,
        (F.col("t_user") == F.col("user_id"))
        & (F.col("touch_us") < F.col("conv_us"))
        & (F.col("touch_us") >= F.col("conv_us") - F.lit(_LOOKBACK_US)),
    )
    w = Window.partitionBy("user_id", "conv_id")
    weighted = pairs.select(
        "user_id",
        "conv_id",
        "event_type",
        F.row_number()
        .over(w.orderBy(F.col("touch_us").desc(), F.col("touch_id").desc()))
        .alias("rn_desc"),
        F.expr(
            "shiftleft(1, greatest(0, 6 - CAST((conv_us - touch_us)"
            " div 86400000000 AS INT)))"
        ).alias("wt"),
    ).withColumn("w_total", F.sum("wt").over(w))
    credited = weighted.withColumn(
        "credit_trunc", F.expr("(wt * 10000) div w_total")
    ).withColumn("rem", F.lit(10000) - F.sum("credit_trunc").over(w))
    return (
        credited.groupBy(F.col("event_type").alias("channel"))
        .agg(
            F.sum(
                F.col("credit_trunc")
                + F.when(F.col("rn_desc") == 1, F.col("rem")).otherwise(0)
            )
            .cast("long")
            .alias("decay_credit_bp"),
            F.count(F.lit(1)).alias("n_touches"),
        )
        .orderBy("channel")
    )
