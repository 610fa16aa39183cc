"""Mix standardization / composition-adjusted metrics (SURVEY.md §2.BA,
round 9).

The "is the KPI moving, or is the MIX moving?" family — the
analytical sibling of §2.AV's revenue bridge, applied to RATES and
AVERAGES instead of totals:

- ba1: the post-stratification weight table — what weight each market
  segment needs for the order census to match a reference mix (equal
  mix over the observed segments, the survey-calibration default).
- ba2: mix-adjusted average order value — raw AOV vs the equal-mix
  AOV (the unweighted mean of per-segment AOVs); the gap IS the
  composition effect on the headline.
- ba3: directly standardized return rates per nation (the
  epidemiology method): each nation's per-segment return rates
  weighted by the GLOBAL segment mix, so nations with different
  customer compositions become comparable. Cells the nation lacks
  renormalize the standard (matched-weight convention, documented).
- ba4: the Oaxaca-style ΔAOV decomposition between 1996 and 1997:
  per segment, a WITHIN effect (base-share-weighted AOV change) and a
  MIX effect (share-shift-weighted comparison AOV). The rational
  identity Σ(within + mix) == ΔAOV is exact; the integer spelling
  truncates each per-segment term once, so the test asserts closure
  within the documented ±1-milli-per-truncation envelope (2 terms × 5
  segments) rather than pretending false exactness — unlike §2.AV's
  per-part residual, per-SEGMENT terms have no common denominator to
  absorb into.

Exactness: order values in exact cents, AOVs in truncated milli-cents
(``(1000·rev) div n``), shares/rates in truncated bp, weights in
truncated milli. All censuses are bounded (5 segments, ≤125
nation×segment cells), so every division runs on bounded relations;
BIGINT suffices throughout (milli-scaled revenue sums stay ≪ 2⁶³ at
the 5-row segment census until corpus revenue passes ~$9.2
quadrillion-cents/10³ — same envelope as the repo's bp convention).

Spark-first shape, sized for 100 TB:
- ba1/ba2: ONE orders⋈customer shuffle (customer is SF-scaled, never
  broadcast) partial-aggregated to the 5-row segment census.
- ba3: ONE Q10-style star pass (lineitem⋈orders⋈customer) to the
  ≤125-cell census; the segment standard derives from THAT census —
  no second fact pass.
- ba4: the same orders⋈customer pass with conditional year sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query

_CENTS = "CAST(floor({col} * 100 + 0.5) AS BIGINT)"

# DuckDB: the per-segment order census.
_SEG_SQL = f"""
seg AS (
  SELECT c.c_mktsegment AS segment,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum({_CENTS.format(col="o.o_totalprice")}) AS BIGINT)
           AS rev_cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1
),
tot AS (
  SELECT CAST(sum(n_orders) AS BIGINT) AS n,
         CAST(sum(rev_cents) AS BIGINT) AS t,
         CAST(count(*) AS BIGINT) AS s
  FROM seg
)
"""


def _seg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(segment, n_orders, rev_cents): the 5-row order census."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.expr(_CENTS.format(col="o_totalprice")))
            .cast("long")
            .alias("rev_cents"),
        )
    )


@query(
    "q_segment_mix_weights",
    oracle=f"""
    WITH {_SEG_SQL}
    SELECT segment, n_orders,
           (10000 * n_orders) // n AS obs_share_bp,
           10000 // s AS ref_share_bp,
           (1000 * n) // (s * n_orders) AS weight_milli
    FROM seg, tot ORDER BY segment
    """,
)
def q_segment_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BA ba1 — the post-stratification weight table: per segment,
    the observed order share vs the equal-mix reference (10000/S bp
    over the S observed segments) and the weight that calibrates the
    census to it, ``(1000·N) div (S·n_s)`` in truncated milli — a
    segment at exactly 1/S of the orders weighs 1000. Weighted counts
    re-aggregate to the reference mix by construction (the test pins
    the Σ n_s·w_s ≈ N identity inside the truncation envelope).

    Scale: one orders⋈customer shuffle (SF-scaled relation, shuffle
    join) to the 5-row census; the totals ride a 1-row broadcast."""
    seg = _seg(spark, sf_dir)
    tot = seg.agg(
        F.sum("n_orders").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("s"),
    )
    return (
        seg.crossJoin(F.broadcast(tot))
        .select(
            "segment",
            "n_orders",
            F.expr("(10000 * n_orders) div n").alias("obs_share_bp"),
            F.expr("10000 div s").alias("ref_share_bp"),
            F.expr("(1000 * n) div (s * n_orders)").alias("weight_milli"),
        )
        .orderBy("segment")
    )


@query(
    "q_mix_adjusted_aov",
    oracle=f"""
    WITH {_SEG_SQL}
    , aovs AS (
      SELECT CAST(sum((1000 * rev_cents) // n_orders) AS BIGINT)
               AS sum_aov_milli
      FROM seg
    )
    SELECT n AS n_orders, t AS total_cents,
           (1000 * t) // n AS raw_aov_milli,
           sum_aov_milli // s AS mix_adjusted_aov_milli,
           (1000 * t) // n - sum_aov_milli // s AS mix_effect_milli
    FROM aovs, tot
    """,
)
def q_mix_adjusted_aov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BA ba2 — the composition check on the headline AOV: raw
    average order value (ratio of sums) vs the EQUAL-MIX AOV (the
    unweighted mean of per-segment AOVs). A positive mix effect means
    the order mix leans toward high-value segments — the headline
    flatters the underlying per-segment behavior. One audit row, all
    milli-cents with single truncations per term.

    Scale: the same 5-row census; two bounded aggregations after it."""
    seg = _seg(spark, sf_dir)
    aovs = seg.agg(
        F.sum(F.expr("(1000 * rev_cents) div n_orders"))
        .cast("long")
        .alias("sum_aov_milli"),
        F.count(F.lit(1)).cast("long").alias("s"),
        F.sum("n_orders").cast("long").alias("n"),
        F.sum("rev_cents").cast("long").alias("t"),
    )
    return aovs.select(
        F.col("n").alias("n_orders"),
        F.col("t").alias("total_cents"),
        F.expr("(1000 * t) div n").alias("raw_aov_milli"),
        F.expr("sum_aov_milli div s").alias("mix_adjusted_aov_milli"),
        F.expr("(1000 * t) div n - sum_aov_milli div s").alias(
            "mix_effect_milli"
        ),
    )


# DuckDB: the nation×segment return census (one star pass).
_CELL_SQL = """
cells AS (
  SELECT n.n_name AS nation, c.c_mktsegment AS segment,
         CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_returned
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
),
std AS (
  SELECT segment, CAST(sum(n_lines) AS BIGINT) AS seg_lines
  FROM cells GROUP BY 1
)
"""


@query(
    "q_standardized_return_rate",
    oracle=f"""
    WITH {_CELL_SQL}
    SELECT nation,
           CAST(sum(n_lines) AS BIGINT) AS n_lines,
           (10000 * CAST(sum(n_returned) AS BIGINT))
             // CAST(sum(n_lines) AS BIGINT) AS crude_rate_bp,
           CAST(sum(((10000 * n_returned) // n_lines) * seg_lines)
                AS BIGINT) // CAST(sum(seg_lines) AS BIGINT)
             AS std_rate_bp,
           CAST(sum(((10000 * n_returned) // n_lines) * seg_lines)
                AS BIGINT) // CAST(sum(seg_lines) AS BIGINT)
             - (10000 * CAST(sum(n_returned) AS BIGINT))
               // CAST(sum(n_lines) AS BIGINT) AS composition_gap_bp
    FROM cells JOIN std USING (segment)
    GROUP BY 1 ORDER BY nation
    """,
)
def q_standardized_return_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BA ba3 — directly standardized return rates: per nation, the
    crude return rate vs the rate its per-segment behavior would show
    under the GLOBAL segment mix (per-cell rate bp × global segment
    line counts, renormalized over the segments the nation actually
    has — the matched-weight convention). The gap isolates how much of
    a nation's headline rate is composition. Per-cell rates truncate
    once (documented); weights are exact integer line counts.

    Scale: ONE Q10-style star pass to the ≤125-cell census
    (checkpoint-pinned — the segment standard derives from the same
    census, no second fact pass); the standardization is a bounded
    join + rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cells = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("long")
            .alias("n_returned"),
        )
        .localCheckpoint()  # ≤125 cells; the standard reads it too
    )
    std = cells.groupBy("segment").agg(
        F.sum("n_lines").cast("long").alias("seg_lines")
    )
    return (
        cells.join(F.broadcast(std), "segment")
        .groupBy("nation")
        .agg(
            F.sum("n_lines").cast("long").alias("n_lines"),
            F.sum("n_returned").cast("long").alias("n_returned"),
            F.sum(
                F.expr("((10000 * n_returned) div n_lines) * seg_lines")
            )
            .cast("long")
            .alias("wsum"),
            F.sum("seg_lines").cast("long").alias("wtot"),
        )
        .select(
            "nation",
            "n_lines",
            F.expr("(10000 * n_returned) div n_lines").alias(
                "crude_rate_bp"
            ),
            F.expr("wsum div wtot").alias("std_rate_bp"),
            F.expr(
                "wsum div wtot - (10000 * n_returned) div n_lines"
            ).alias("composition_gap_bp"),
        )
        .orderBy("nation")
    )


_Y0, _Y1 = 1996, 1997


@query(
    "q_aov_mix_decomposition",
    oracle=f"""
    WITH segyr AS (
      SELECT c.c_mktsegment AS segment,
             CAST(sum(CASE WHEN year(o.o_orderdate) = {_Y0} THEN 1
                           ELSE 0 END) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN year(o.o_orderdate) = {_Y0}
                           THEN {_CENTS.format(col="o.o_totalprice")}
                           ELSE 0 END) AS BIGINT) AS rev0,
             CAST(sum(CASE WHEN year(o.o_orderdate) = {_Y1} THEN 1
                           ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN year(o.o_orderdate) = {_Y1}
                           THEN {_CENTS.format(col="o.o_totalprice")}
                           ELSE 0 END) AS BIGINT) AS rev1
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE year(o.o_orderdate) IN ({_Y0}, {_Y1})
      GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(n0) AS BIGINT) AS nn0, CAST(sum(n1) AS BIGINT) AS nn1
      FROM segyr
    )
    SELECT segment,
           (10000 * n0) // nn0 AS share0_bp,
           (10000 * n1) // nn1 AS share1_bp,
           (1000 * rev0) // n0 AS aov0_milli,
           (1000 * rev1) // n1 AS aov1_milli,
           (((10000 * n0) // nn0)
              * ((1000 * rev1) // n1 - (1000 * rev0) // n0)) // 10000
             AS within_contrib_milli,
           (((10000 * n1) // nn1 - (10000 * n0) // nn0)
              * ((1000 * rev1) // n1)) // 10000 AS mix_contrib_milli
    FROM segyr, tot ORDER BY segment
    """,
)
def q_aov_mix_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BA ba4 — the Oaxaca-style split of the 1996→1997 AOV change:
    per segment, the WITHIN effect (1996 share × AOV change) and the
    MIX effect (share shift × 1997 AOV). In exact rationals the
    contributions sum to ΔAOV identically; this integer spelling
    truncates each term once, so the test asserts Σ(within + mix)
    lands within the ±1-milli-per-truncation envelope of the
    independently computed ΔAOV (≤ 4 truncations per segment) — the
    honest version of "exact", stated rather than hidden.

    Scale: one orders⋈customer shuffle with conditional year sums
    (single fact pass, both years in one census), a 1-row broadcast
    total, arithmetic on 5 rows."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    segyr = (
        orders.where(F.year("o_orderdate").isin(_Y0, _Y1))
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.sum(F.when(F.year("o_orderdate") == _Y0, 1).otherwise(0))
            .cast("long")
            .alias("n0"),
            F.sum(
                F.when(
                    F.year("o_orderdate") == _Y0,
                    F.expr(_CENTS.format(col="o_totalprice")),
                ).otherwise(0)
            )
            .cast("long")
            .alias("rev0"),
            F.sum(F.when(F.year("o_orderdate") == _Y1, 1).otherwise(0))
            .cast("long")
            .alias("n1"),
            F.sum(
                F.when(
                    F.year("o_orderdate") == _Y1,
                    F.expr(_CENTS.format(col="o_totalprice")),
                ).otherwise(0)
            )
            .cast("long")
            .alias("rev1"),
        )
    )
    tot = segyr.agg(
        F.sum("n0").cast("long").alias("nn0"),
        F.sum("n1").cast("long").alias("nn1"),
    )
    return (
        segyr.crossJoin(F.broadcast(tot))
        .select(
            "segment",
            F.expr("(10000 * n0) div nn0").alias("share0_bp"),
            F.expr("(10000 * n1) div nn1").alias("share1_bp"),
            F.expr("(1000 * rev0) div n0").alias("aov0_milli"),
            F.expr("(1000 * rev1) div n1").alias("aov1_milli"),
            F.expr(
                "(((10000 * n0) div nn0)"
                " * ((1000 * rev1) div n1 - (1000 * rev0) div n0))"
                " div 10000"
            ).alias("within_contrib_milli"),
            F.expr(
                "(((10000 * n1) div nn1 - (10000 * n0) div nn0)"
                " * ((1000 * rev1) div n1)) div 10000"
            ).alias("mix_contrib_milli"),
        )
        .orderBy("segment")
    )
