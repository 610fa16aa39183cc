"""Sequence / pattern mining over ordered event streams (SURVEY.md §2.V,
round 9).

The clickstream-mining layer between the i-series event analytics and the
s-series attribution: operators whose subject is the ORDER of a user's
events, not their counts. Funnels (i5), 3-gram pathing (i-series) and
first-order transitions (d-series) already cover fixed-shape questions;
this module adds the general sequence toolkit — per-user history
signatures with regex pattern predicates, anchored context mining around
a target event, error-recovery timing, per-type inter-arrival statistics,
cold-start path prefixes, and behavioral switch rates.

Engine-portability rules (the repo-wide exactness discipline):
- every ordered aggregation sorts by ``(ts, event_id)`` with the µs-truncated
  timestamp on BOTH engines, so ns-tie ordering can never diverge;
- event types are encoded as their (distinct) initial letters, so history
  strings are byte-identical across engines;
- sequence predicates use regexes WITHOUT backreferences (Java regex and
  DuckDB's RE2 agree on that fragment);
- all durations are exact integer microseconds and all rates exact integer
  basis points via truncating division — no float ever crosses the hash.

Spark-first shape: one ``user_id`` shuffle serves every per-user window or
groupBy here (AQE chains them without re-shuffling); outputs are either
bounded frames (per-type, per-day, top-k via TakeOrderedAndProject) or
per-user frames whose size is |users|, not |events|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query

# 10-minute recovery horizon for v3, exact integer microseconds.
_RECOVERY_US = 10 * 60 * 1_000_000


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with the type-initial column every operator here keys on."""
    return load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.substring("event_type", 1, 1).alias("ini"),
    )


_USER_WINDOW = lambda: Window.partitionBy("user_id").orderBy(  # noqa: E731
    F.col("ts").asc(), F.col("event_id").asc()
)


@query(
    "q_seq_user_signature",
    oracle="""
    SELECT user_id,
           string_agg(substring(event_type, 1, 1), ''
                      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS signature,
           count(*) AS n_events,
           count(DISTINCT event_type) AS n_types,
           regexp_matches(
             string_agg(substring(event_type, 1, 1), ''
                        ORDER BY CAST(ts AS TIMESTAMP), event_id),
             'v.*p') AS converted
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q_seq_user_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.V v1 — per-user history signature: the full event history as an
    ordered type-initial string, plus event/type counts and a regex
    conversion predicate (a view somewhere before a purchase, ``v.*p``).
    The signature string is the substrate for arbitrary sequence-pattern
    queries — MATCH_RECOGNIZE-style questions become regexes over it.

    Scale: one user_id shuffle; ``collect_list`` state is one byte per
    event (the initial), so a 10k-event user costs 10 kB of aggregation
    state — the signature column is deliberately a compressed alphabet,
    not the raw event rows. Output is |users| rows."""
    ev = _events(spark, sf_dir)
    sig = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "ini"))),
            lambda s: s["ini"],
        ),
        "",
    )
    return (
        ev.groupBy("user_id")
        .agg(
            sig.alias("signature"),
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
        )
        .select(
            "user_id",
            "signature",
            "n_events",
            "n_types",
            F.col("signature").rlike("v.*p").alias("converted"),
        )
        .orderBy("user_id")
    )


@query(
    "q_seq_purchase_context",
    oracle="""
    WITH seq AS (
      SELECT substring(event_type, 1, 1) AS ini,
             coalesce(lag(substring(event_type, 1, 1), 1) OVER w, '-') AS prev1,
             coalesce(lag(substring(event_type, 1, 1), 2) OVER w, '-') AS prev2
      FROM events
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP), event_id)
    )
    SELECT prev2, prev1, count(*) AS n
    FROM seq WHERE ini = 'p'
    GROUP BY prev2, prev1
    ORDER BY n DESC, prev2, prev1
    LIMIT 10
    """,
)
def q_seq_purchase_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.V v2 — anchored context mining: for every purchase, the two
    events that preceded it (user-ordered), counted and ranked — "what do
    people do right before buying". Differs from the unanchored 3-gram
    pathing query: the pattern is pinned to a target event, the shape
    behind next-best-action training sets. Boundary purchases (fewer than
    two prior events) keep a '-' placeholder so they count too.

    Scale: one user_id shuffle for the lag window, then a partial-
    aggregated groupBy over ≤ (|types|+1)² context pairs and a
    TakeOrderedAndProject top-10 — no global sort."""
    ev = _events(spark, sf_dir)
    w = _USER_WINDOW()
    seq = ev.select(
        F.col("ini"),
        F.coalesce(F.lag("ini", 1).over(w), F.lit("-")).alias("prev1"),
        F.coalesce(F.lag("ini", 2).over(w), F.lit("-")).alias("prev2"),
    )
    return (
        seq.filter(F.col("ini") == "p")
        .groupBy("prev2", "prev1")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "prev2", "prev1")
        .limit(10)
    )


@query(
    "q_seq_error_recovery",
    oracle=f"""
    WITH e AS (
      SELECT CAST(ts AS TIMESTAMP) AS ts, event_type,
             epoch_us(lead(CAST(ts AS TIMESTAMP)) OVER w)
               - epoch_us(CAST(ts AS TIMESTAMP)) AS gap_us,
             lead(substring(event_type, 1, 1)) OVER w AS next_ini
      FROM events
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP), event_id)
    )
    SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day,
           count(*) AS n_errors,
           CAST(sum(CASE WHEN gap_us IS NOT NULL AND gap_us <= {_RECOVERY_US}
                         AND next_ini <> 'e' THEN 1 ELSE 0 END) AS BIGINT) AS n_recovered,
           CAST((sum(CASE WHEN gap_us IS NOT NULL AND gap_us <= {_RECOVERY_US}
                               AND next_ini <> 'e' THEN 1 ELSE 0 END) * 10000)
                // count(*) AS BIGINT) AS recovery_bp
    FROM e WHERE event_type = 'error'
    GROUP BY 1 ORDER BY 1
    """,
)
def q_seq_error_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.V v3 — error-recovery analysis: an error event is "recovered"
    when the same user's next event arrives within 10 minutes and is not
    another error; daily recovery rate in exact basis points. The
    reliability-engineering view of the clickstream — how often users
    push through a failure vs. abandon.

    Scale: one user_id shuffle for the lead window; the daily rollup is a
    partial-aggregated groupBy over |days| keys. Durations are integer
    microseconds end to end."""
    ev = _events(spark, sf_dir)
    w = _USER_WINDOW()
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    nxt_us = F.unix_micros(F.lead("ts").over(w).cast("timestamp"))
    e = ev.select(
        "ts",
        "event_type",
        (nxt_us - us).alias("gap_us"),
        F.lead("ini").over(w).alias("next_ini"),
    ).filter(F.col("event_type") == "error")
    recovered = F.sum(
        F.when(
            F.col("gap_us").isNotNull()
            & (F.col("gap_us") <= _RECOVERY_US)
            & (F.col("next_ini") != "e"),
            1,
        ).otherwise(0)
    )
    return (
        e.groupBy(F.date_trunc("day", "ts").cast("date").cast("string").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_errors"), recovered.alias("n_recovered"))
        .select(
            "day",
            "n_errors",
            "n_recovered",
            F.expr("CAST((n_recovered * 10000) div n_errors AS BIGINT)").alias(
                "recovery_bp"
            ),
        )
        .orderBy("day")
    )


@query(
    "q_seq_interarrival",
    oracle="""
    WITH g AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP))
               - epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY CAST(ts AS TIMESTAMP), event_id)) AS gap_us
      FROM events
    )
    SELECT event_type, count(gap_us) AS n_gaps,
           min(gap_us) AS min_gap_us, max(gap_us) AS max_gap_us,
           CAST(sum(gap_us) // count(gap_us) AS BIGINT) AS avg_gap_us
    FROM g WHERE gap_us IS NOT NULL
    GROUP BY event_type
    HAVING count(gap_us) > 0
    ORDER BY event_type
    """,
)
def q_seq_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.V v4 — inter-arrival statistics: per event type, the gaps
    between a user's consecutive events of that type (min/max/truncated
    mean, exact integer microseconds). The cadence profile that feeds
    session-gap calibration (i3's 30-minute threshold) and burst
    detection.

    Scale: the lag window partitions by (user_id, event_type) — one
    shuffle, finer keys than the user windows so skewless — then a
    |types|-row partial-aggregated rollup."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    lag_us = F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
    g = ev.select("event_type", (us - lag_us).alias("gap_us")).filter(
        F.col("gap_us").isNotNull()
    )
    return (
        g.groupBy("event_type")
        .agg(
            F.count("gap_us").alias("n_gaps"),
            F.min("gap_us").alias("min_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
            F.expr("CAST(sum(gap_us) div count(gap_us) AS BIGINT)").alias(
                "avg_gap_us"
            ),
        )
        .filter(F.col("n_gaps") > 0)
        .orderBy("event_type")
    )


@query(
    "q_seq_first_path",
    oracle="""
    WITH ranked AS (
      SELECT user_id, substring(event_type, 1, 1) AS ini,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
      FROM events
    ),
    paths AS (
      SELECT user_id, string_agg(ini, '>' ORDER BY rn) AS path
      FROM ranked WHERE rn <= 5 GROUP BY user_id
    )
    SELECT path, count(*) AS n_users
    FROM paths GROUP BY path
    ORDER BY n_users DESC, path
    LIMIT 10
    """,
)
def q_seq_first_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.V v5 — cold-start path prefixes: each user's first five events
    as a '>'-joined type path, with the 10 most common prefixes — the
    onboarding-flow census. Complements v1 (whole histories) by looking
    only at the head, where product-flow decisions live.

    Scale: row_number + the prefix aggregation share one user_id
    shuffle; the path census groups ≤ |types|⁵ bounded keys and the
    top-10 lowers to TakeOrderedAndProject."""
    ev = _events(spark, sf_dir)
    ranked = ev.select(
        "user_id", "ini", F.row_number().over(_USER_WINDOW()).alias("rn")
    ).filter(F.col("rn") <= 5)
    paths = ranked.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "ini"))),
                lambda s: s["ini"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.col("n_users").desc(), "path")
        .limit(10)
    )


@query(
    "q_seq_switch_rate",
    oracle="""
    WITH t AS (
      SELECT user_id,
             lag(substring(event_type, 1, 1)) OVER (
               PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev,
             substring(event_type, 1, 1) AS ini
      FROM events
    )
    SELECT user_id,
           count(prev) AS n_transitions,
           CAST(sum(CASE WHEN prev IS NOT NULL AND prev <> ini THEN 1 ELSE 0 END)
                AS BIGINT) AS n_switches,
           CAST((sum(CASE WHEN prev IS NOT NULL AND prev <> ini
                          THEN 1 ELSE 0 END) * 10000)
                // count(prev) AS BIGINT) AS switch_bp
    FROM t
    GROUP BY user_id
    HAVING count(prev) > 0
    ORDER BY user_id
    """,
)
def q_seq_switch_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.V v6 — behavioral switch rate: per user, the share of
    consecutive-event transitions that CHANGE event type (exact basis
    points). High switchers browse across activities; low switchers
    repeat one action — a cheap, exact behavioral segmentation feature
    (contrast d-series transition matrices, which aggregate over users).

    Scale: one user_id shuffle shared by the lag window and the per-user
    rollup; output is |users| rows. Single-event users (no transitions)
    are excluded rather than risking a 0-divisor."""
    ev = _events(spark, sf_dir)
    t = ev.select("user_id", "ini", F.lag("ini").over(_USER_WINDOW()).alias("prev"))
    switches = F.sum(
        F.when(F.col("prev").isNotNull() & (F.col("prev") != F.col("ini")), 1).otherwise(0)
    )
    return (
        t.groupBy("user_id")
        .agg(F.count("prev").alias("n_transitions"), switches.alias("n_switches"))
        .filter(F.col("n_transitions") > 0)
        .select(
            "user_id",
            "n_transitions",
            "n_switches",
            F.expr("CAST((n_switches * 10000) div n_transitions AS BIGINT)").alias(
                "switch_bp"
            ),
        )
        .orderBy("user_id")
    )
