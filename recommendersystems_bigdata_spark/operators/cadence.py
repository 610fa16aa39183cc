"""Purchase-cadence analytics (SURVEY.md §2.AZ, round 9).

The repeat-purchase-rhythm family over the orders fact: consecutive
inter-purchase gaps per customer (the lifecycle team's core metric),
the exact per-segment gap median/quartiles, a per-customer regularity
classification ("metronome" buyers vs erratic ones), and the
acceleration census (is each customer's LAST gap shorter than their
FIRST — speeding up or cooling down). Complements §2.I's event-based
inactivity/retention (those read the events stream; this reads the
order ledger) and §2.D's repeat-purchase rate (a count, not a rhythm).

Semantics pinned by tests: the per-customer sequence is the TOTAL
order (o_orderdate, o_orderkey) — same-day orders produce legitimate
0-day gaps and the key tiebreak makes every gap deterministic. Gaps
are whole days (midnight timestamps; Spark ``datediff`` == DuckDB
``date_diff('day', …)``). The telescoping identity Σgaps == last−first
(span) is asserted, and per-customer mean gap is spelled
``(1000·span) div n_gaps`` — exact, no float mean.

Spark-first shape, sized for 100 TB:
- ONE orders pass through a per-custkey window (lag over the natural
  per-key partitioning — the canonical keyed-fact window, ~15 rows per
  key) produces the gap relation; everything else is censuses.
- az2's exact quantiles use the §2.AP distinct-value-CDF lowering: gap
  DAYS are grid-bounded (≤ corpus span ≈ 2.4k distinct values), so the
  rank windows run over (segment, gap) — never the fact.
- az3/az4 are per-customer partial aggregates (min/max/min_by/max_by —
  all commutative, map-side combined) rolled to bounded censuses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query

# DuckDB: per-customer consecutive gaps over the (orderdate, orderkey)
# total order; gap in whole days, idx 1-based per customer.
_GAPS_SQL = """
seq AS (
  SELECT o_custkey AS ck, o_orderdate AS od, o_orderkey AS ok,
         lag(o_orderdate) OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
           AS prev
  FROM orders
),
gaps AS (
  SELECT ck, CAST(date_diff('day', prev, od) AS BIGINT) AS gap,
         CAST(row_number() OVER
           (PARTITION BY ck ORDER BY od, ok) AS BIGINT) AS idx
  FROM seq WHERE prev IS NOT NULL
)
"""
# idx follows the same (orderdate, orderkey) TOTAL order as the lag, so
# it is both fully deterministic and temporally meaningful (idx 1 = the
# customer's first gap, idx n = their latest).


def _gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ck, gap, idx): consecutive inter-purchase gaps in whole days,
    idx 1-based in temporal order."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = orders.select(
        F.col("o_custkey").alias("ck"),
        F.col("o_orderdate").alias("od"),
        F.col("o_orderkey").alias("ok"),
        F.lag("o_orderdate").over(w).alias("prev"),
    )
    gapped = seq.where(F.col("prev").isNotNull()).select(
        "ck",
        F.datediff(F.col("od"), F.col("prev")).cast("long").alias("gap"),
        "od",
        "ok",
    )
    w2 = Window.partitionBy("ck").orderBy("od", "ok")
    return gapped.select(
        "ck", "gap", F.row_number().over(w2).cast("long").alias("idx")
    )


_BUCKETS = (
    ("000", 0, 0),
    ("001-007", 1, 7),
    ("008-030", 8, 30),
    ("031-090", 31, 90),
    ("091-365", 91, 365),
    ("366+", 366, None),
)


def _bucket_case(col: str) -> str:
    whens = []
    for name, lo, hi in _BUCKETS:
        cond = f"{col} >= {lo}" + (f" AND {col} <= {hi}" if hi is not None else "")
        whens.append(f"WHEN {cond} THEN '{name}'")
    return "CASE " + " ".join(whens) + " END"


def _bucket_lo_case(col: str) -> str:
    whens = []
    for name, lo, hi in _BUCKETS:
        cond = f"{col} >= {lo}" + (f" AND {col} <= {hi}" if hi is not None else "")
        whens.append(f"WHEN {cond} THEN {lo}")
    return "CAST(CASE " + " ".join(whens) + " END AS BIGINT)"


@query(
    "q_interpurchase_gaps",
    oracle=f"""
    WITH {_GAPS_SQL}
    , census AS (
      SELECT {_bucket_case("gap")} AS gap_bucket,
             {_bucket_lo_case("gap")} AS bucket_lo_days,
             CAST(count(*) AS BIGINT) AS n_gaps,
             CAST(min(gap) AS BIGINT) AS min_gap_days,
             CAST(max(gap) AS BIGINT) AS max_gap_days
      FROM gaps GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(sum(n_gaps) AS BIGINT) AS t FROM census)
    SELECT gap_bucket, bucket_lo_days, n_gaps,
           (10000 * n_gaps) // t AS gap_share_bp,
           min_gap_days, max_gap_days
    FROM census, tot ORDER BY bucket_lo_days
    """,
)
def q_interpurchase_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AZ az1 — the inter-purchase-gap census: every consecutive
    order gap (whole days, per-customer (orderdate, orderkey) order),
    bucketed into lifecycle bands with counts, share bp and the exact
    min/max inside each band. Same-day repeat orders land in the '000'
    band — reported, not collapsed (they are real ledger rows).

    Scale: one per-custkey window over the orders fact (canonical
    keyed partitioning, ~15 rows/key), then a 6-row census + 1-row
    broadcast total."""
    gaps = _gaps(spark, sf_dir)
    census = gaps.groupBy(
        F.expr(_bucket_case("gap")).alias("gap_bucket"),
        F.expr(_bucket_lo_case("gap")).alias("bucket_lo_days"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.min("gap").cast("long").alias("min_gap_days"),
        F.max("gap").cast("long").alias("max_gap_days"),
    )
    tot = census.agg(F.sum("n_gaps").cast("long").alias("t"))
    return (
        census.crossJoin(F.broadcast(tot))
        .select(
            "gap_bucket",
            "bucket_lo_days",
            "n_gaps",
            F.expr("(10000 * n_gaps) div t").alias("gap_share_bp"),
            "min_gap_days",
            "max_gap_days",
        )
        .orderBy("bucket_lo_days")
    )


@query(
    "q_cadence_quartiles_by_segment",
    oracle=f"""
    WITH {_GAPS_SQL}
    , hist AS (
      SELECT c.c_mktsegment AS seg, g.gap,
             CAST(count(*) AS BIGINT) AS cnt
      FROM gaps g JOIN customer c ON g.ck = c.c_custkey
      GROUP BY 1, 2
    ),
    cdf AS (
      SELECT seg, gap, cnt,
             CAST(sum(cnt) OVER (PARTITION BY seg ORDER BY gap
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS hi,
             CAST(sum(cnt) OVER (PARTITION BY seg) AS BIGINT) AS n
      FROM hist
    )
    SELECT seg AS c_mktsegment, CAST(max(n) AS BIGINT) AS n_gaps,
           CAST(min(gap) FILTER (WHERE hi - cnt + 1 <= 1) AS BIGINT)
             AS min_gap_days,
           min(CASE WHEN hi >= (n + 1) // 4 THEN gap END) AS q1_gap_days,
           min(CASE WHEN hi >= (n + 1) // 2 THEN gap END)
             AS median_gap_days,
           min(CASE WHEN hi >= (3 * (n + 1)) // 4 THEN gap END)
             AS q3_gap_days,
           CAST(max(gap) AS BIGINT) AS max_gap_days
    FROM cdf GROUP BY 1 ORDER BY c_mktsegment
    """,
)
def q_cadence_quartiles_by_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """§2.AZ az2 — exact gap quartiles per market segment: Q1, the
    (lower) median and Q3 of inter-purchase days at ranks
    ``(n+1) div 4 / (n+1) div 2 / (3(n+1)) div 4``, via the §2.AP
    distinct-value-CDF lowering — gap DAYS are grid-bounded, so the
    rank windows run over the (segment, gap) census, never a
    per-segment fact sort. No float interpolation anywhere.

    Scale: the gap relation joins customer by shuffle (SF-scaled
    relation, not broadcastable), partial-aggregates to the bounded
    census, then two census windows + a 5-row rollup."""
    gaps = _gaps(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer")
    hist = (
        gaps.join(cust, gaps.ck == cust.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("seg"), "gap")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w_cum = (
        Window.partitionBy("seg")
        .orderBy("gap")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("seg")
    cdf = hist.select(
        "seg",
        "gap",
        "cnt",
        F.sum("cnt").over(w_cum).cast("long").alias("hi"),
        F.sum("cnt").over(w_all).cast("long").alias("n"),
    )
    return (
        cdf.groupBy(F.col("seg").alias("c_mktsegment"))
        .agg(
            F.max("n").cast("long").alias("n_gaps"),
            F.min("gap").cast("long").alias("min_gap_days"),
            F.min(
                F.when(F.expr("hi >= (n + 1) div 4"), F.col("gap"))
            ).alias("q1_gap_days"),
            F.min(
                F.when(F.expr("hi >= (n + 1) div 2"), F.col("gap"))
            ).alias("median_gap_days"),
            F.min(
                F.when(F.expr("hi >= (3 * (n + 1)) div 4"), F.col("gap"))
            ).alias("q3_gap_days"),
            F.max("gap").cast("long").alias("max_gap_days"),
        )
        .orderBy("c_mktsegment")
    )


_CLASSES = (
    ("metronome", 0, 7),
    ("steady", 8, 30),
    ("loose", 31, 90),
    ("erratic", 91, None),
)


@query(
    "q_cadence_regularity",
    oracle=f"""
    WITH {_GAPS_SQL}
    , percust AS (
      SELECT ck, CAST(count(*) AS BIGINT) AS n_gaps,
             CAST(sum(gap) AS BIGINT) AS span_days,
             CAST(max(gap) - min(gap) AS BIGINT) AS gap_range
      FROM gaps GROUP BY 1
    ),
    classed AS (
      SELECT CASE WHEN gap_range <= 7 THEN 'metronome'
                  WHEN gap_range <= 30 THEN 'steady'
                  WHEN gap_range <= 90 THEN 'loose'
                  ELSE 'erratic' END AS regularity_class,
             CAST(CASE WHEN gap_range <= 7 THEN 0
                       WHEN gap_range <= 30 THEN 8
                       WHEN gap_range <= 90 THEN 31
                       ELSE 91 END AS BIGINT) AS class_lo_days,
             n_gaps, span_days
      FROM percust
    ),
    census AS (
      SELECT regularity_class, class_lo_days,
             CAST(count(*) AS BIGINT) AS n_customers,
             CAST(sum(n_gaps) AS BIGINT) AS total_gaps,
             CAST(sum(span_days) AS BIGINT) AS total_span_days
      FROM classed GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(sum(n_customers) AS BIGINT) AS t FROM census)
    SELECT regularity_class, class_lo_days, n_customers,
           (10000 * n_customers) // t AS customer_share_bp,
           (1000 * total_span_days) // total_gaps AS mean_gap_days_milli
    FROM census, tot ORDER BY class_lo_days
    """,
)
def q_cadence_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AZ az3 — regularity classes among repeat customers: per
    customer the gap RANGE (max − min) classifies rhythm — metronome
    (≤7 days spread), steady, loose, erratic — and the class census
    reports customer share plus the ratio-of-sums mean gap
    (``(1000·Σspan) div Σgaps``: exact, whale-robust, documented as
    ratio-of-sums rather than mean-of-means). Σgap per customer ==
    last−first order date (telescoping) — the identity the test pins.

    Scale: per-custkey partial aggregate (commutative min/max/sum —
    map-side combined, no window), 4-row census, 1-row broadcast
    total."""
    gaps = _gaps(spark, sf_dir)
    percust = gaps.groupBy("ck").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("gap").cast("long").alias("span_days"),
        (F.max("gap") - F.min("gap")).cast("long").alias("gap_range"),
    )
    cls = (
        F.when(F.col("gap_range") <= 7, "metronome")
        .when(F.col("gap_range") <= 30, "steady")
        .when(F.col("gap_range") <= 90, "loose")
        .otherwise("erratic")
    )
    cls_lo = (
        F.when(F.col("gap_range") <= 7, 0)
        .when(F.col("gap_range") <= 30, 8)
        .when(F.col("gap_range") <= 90, 31)
        .otherwise(91)
    )
    census = (
        percust.select(
            cls.alias("regularity_class"),
            cls_lo.cast("long").alias("class_lo_days"),
            "n_gaps",
            "span_days",
        )
        .groupBy("regularity_class", "class_lo_days")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("n_gaps").cast("long").alias("total_gaps"),
            F.sum("span_days").cast("long").alias("total_span_days"),
        )
    )
    tot = census.agg(F.sum("n_customers").cast("long").alias("t"))
    return (
        census.crossJoin(F.broadcast(tot))
        .select(
            "regularity_class",
            "class_lo_days",
            "n_customers",
            F.expr("(10000 * n_customers) div t").alias("customer_share_bp"),
            F.expr("(1000 * total_span_days) div total_gaps").alias(
                "mean_gap_days_milli"
            ),
        )
        .orderBy("class_lo_days")
    )


@query(
    "q_cadence_trend",
    oracle=f"""
    WITH {_GAPS_SQL}
    , percust AS (
      SELECT ck, CAST(count(*) AS BIGINT) AS n_gaps,
             CAST(min_by(gap, idx) AS BIGINT) AS first_gap,
             CAST(max_by(gap, idx) AS BIGINT) AS last_gap
      FROM gaps GROUP BY 1 HAVING count(*) >= 2
    )
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CASE WHEN last_gap < first_gap THEN 1 ELSE 0 END)
                AS BIGINT) AS n_accelerating,
           CAST(sum(CASE WHEN last_gap > first_gap THEN 1 ELSE 0 END)
                AS BIGINT) AS n_decelerating,
           CAST(sum(CASE WHEN last_gap = first_gap THEN 1 ELSE 0 END)
                AS BIGINT) AS n_stable,
           CAST((10000 * CAST(sum(CASE WHEN last_gap < first_gap
                                       THEN 1 ELSE 0 END) AS BIGINT))
                // count(*) AS BIGINT) AS accelerating_bp
    FROM percust p JOIN customer c ON p.ck = c.c_custkey
    GROUP BY 1 ORDER BY c_mktsegment
    """,
)
def q_cadence_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AZ az4 — the acceleration census: among customers with ≥2
    gaps, compare the LAST inter-purchase gap to the FIRST (min_by/
    max_by on the gap index, which follows the (orderdate, orderkey)
    total order — unique per customer, so the pick is exact) and census
    accelerating / decelerating / stable per market segment with the
    accelerating share in bp. The lifecycle team's "are repeat buyers
    speeding up" one-pager.

    Scale: per-custkey partial aggregate (min_by/max_by are
    commutative over the unique idx), one shuffle join under the
    SF-scaled customer relation, 5-row census."""
    gaps = _gaps(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer")
    percust = (
        gaps.groupBy("ck")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.expr("min_by(gap, idx)").cast("long").alias("first_gap"),
            F.expr("max_by(gap, idx)").cast("long").alias("last_gap"),
        )
        .where(F.col("n_gaps") >= 2)
    )
    return (
        percust.join(cust, percust.ck == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum(
                F.when(F.col("last_gap") < F.col("first_gap"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_accelerating"),
            F.sum(
                F.when(F.col("last_gap") > F.col("first_gap"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_decelerating"),
            F.sum(
                F.when(F.col("last_gap") == F.col("first_gap"), 1).otherwise(
                    0
                )
            )
            .cast("long")
            .alias("n_stable"),
        )
        .select(
            "c_mktsegment",
            "n_customers",
            "n_accelerating",
            "n_decelerating",
            "n_stable",
            F.expr("(10000 * n_accelerating) div n_customers").alias(
                "accelerating_bp"
            ),
        )
        .orderBy("c_mktsegment")
    )
