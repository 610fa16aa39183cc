"""Event-study / difference-in-differences suite (SURVEY.md §2.BE,
round 9).

The causal-flavored reporting family: did the PROMO assortment's
revenue move differently from the rest of the catalog across a
cutover, beyond what the market did anyway? Treatment = promo parts
(``p_type LIKE 'PROMO%'`` — the same cohort TPC-H Q14 measures),
event = the 1998-01-01 ship-year boundary, and every estimate ships
with its placebo twin (the same contrast one year earlier, where no
effect should appear — the standard pre-trend audit):

- be1: the scenario×cohort×period cell census — the 2×2 DiD table for
  the 'actual' contrast (pre=1997, post=1998) and the 'placebo'
  contrast (pre=1996, post=1997), with exact line counts, truncated
  revenue cents, and per-line means in truncated milli-cents.
- be2: the effect table — per scenario, the four cell means, each
  cohort's post−pre delta, and ``did_milli`` = treat delta − control
  delta. Composed from be1's PUBLISHED truncated means (documented:
  the deltas are differences of already-truncated milli values, so
  be2 reproduces exactly from be1's table).
- be3: per-brand abnormal revenue share — each brand's share of
  ship-year revenue in truncated bp, 1997 vs 1998, ranked by the
  shift. The share basis makes it a market-adjusted move: a brand
  that merely rides the market keeps its bp.
- be4: DiD on discount DEPTH — did promo parts get discounted more
  deeply after the event? Mean discount in exact bp per cell (TPC-H
  discounts are exact integer percents), cohort deltas, and the
  scenario's ``did_bp``, placebo beside it.

Exactness: revenue in the repo's exact integer-e4 discount-revenue
units (``functions/exactmath.py``), accumulated in 128-bit
(HUGEINT / DECIMAL(38,0)); published cents and milli-cent means are
single truncating divisions of those sums; discounts live on exact
integer percents so their bp means are BIGINT-exact. All divisions run
census-side on ≤25-row relations.

Spark-first shape, sized for 100 TB: ONE lineitem⋈part shuffle join
(part is SF-scaled — shuffle, never broadcast) per query, with the
4-row scenario/period map and the 2-value cohort flag attached
map-side (a broadcast VALUES relation / a CASE over p_type), partial-
aggregated straight to a ≤50-row census. No second fact pass anywhere;
be2 reuses be1's cell aggregation shape, not its output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from recommendersystems_bigdata_spark.catalog import load_tables
from recommendersystems_bigdata_spark.registry import query

_PRICE_E2 = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
_DISC_E2 = "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)"
_REV_E4 = f"{_PRICE_E2} * (100 - {_DISC_E2})"
_COHORT = "CASE WHEN p.p_type LIKE 'PROMO%' THEN 'treat' ELSE 'control' END"
# Spark spelling: the joined DataFrame carries unqualified columns.
_COHORT_SPARK = _COHORT.replace("p.p_type", "p_type")

# (scenario, ship-year, period): the event map. 1997 is BOTH the actual
# contrast's pre year and the placebo's post year, so the fact expands
# through a join, not a CASE.
_SCEN_ROWS = (
    ("actual", 1997, "pre"),
    ("actual", 1998, "post"),
    ("placebo", 1996, "pre"),
    ("placebo", 1997, "post"),
)
_SCEN_SQL = (
    "scen(scenario, yr, period) AS (VALUES "
    + ", ".join(f"('{s}', {y}, '{p}')" for s, y, p in _SCEN_ROWS)
    + ")"
)

# DuckDB: the scenario×cohort×period cell census (8 rows).
_CELLS_SQL = f"""
{_SCEN_SQL},
cells AS (
  SELECT s.scenario, {_COHORT} AS cohort, s.period,
         CAST(count(*) AS BIGINT) AS n_lines,
         sum(CAST({_REV_E4} AS HUGEINT)) AS rev_e4,
         CAST(sum({_DISC_E2}) AS BIGINT) AS disc_e2
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN scen s ON year(l.l_shipdate) = s.yr
  GROUP BY 1, 2, 3
)
"""


def _cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 8-row scenario×cohort×period census with exact 128-bit sums."""
    lineitem, part = load_tables(spark, sf_dir, "lineitem", "part")
    scen = spark.createDataFrame(
        list(_SCEN_ROWS), schema="scenario string, yr int, period string"
    )
    dec = "decimal(38,0)"
    return (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .join(F.broadcast(scen), F.year("l_shipdate") == F.col("yr"))
        .groupBy(
            "scenario",
            F.expr(_COHORT_SPARK).alias("cohort"),
            "period",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.expr(f"CAST({_REV_E4} AS {dec})")).alias("rev_e4"),
            F.sum(F.expr(_DISC_E2)).cast("long").alias("disc_e2"),
        )
    )


@query(
    "q_did_cells",
    oracle=f"""
    WITH {_CELLS_SQL}
    SELECT scenario, cohort, period, n_lines,
           CAST(rev_e4 // 100 AS BIGINT) AS rev_cents,
           CAST((10 * rev_e4) // n_lines AS BIGINT) AS mean_millicents
    FROM cells ORDER BY scenario, cohort, period
    """,
)
def q_did_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BE be1 — the DiD cell table: for each scenario (actual
    1997→1998, placebo 1996→1997), cohort (promo parts vs the rest)
    and period, the exact line count, revenue in truncated cents
    (``Σe4 div 100``) and the per-line mean in truncated milli-cents
    (``(10·Σe4) div n``). 8 rows; be2's effects recompose from exactly
    these published means.

    Scale: one SF-scaled lineitem⋈part shuffle join; the 4-row
    scenario map joins as a broadcast on ship-year (years outside both
    contrasts drop at the join — a partition-prunable predicate under
    a date-partitioned layout); partial aggregation collapses map-side
    to 8 cells."""
    return (
        _cells(spark, sf_dir)
        .select(
            "scenario",
            "cohort",
            "period",
            "n_lines",
            F.expr("CAST(rev_e4 div 100 AS BIGINT)").alias("rev_cents"),
            F.expr(
                "CAST((CAST(10 AS decimal(38,0)) * rev_e4) div n_lines"
                " AS BIGINT)"
            ).alias("mean_millicents"),
        )
        .orderBy("scenario", "cohort", "period")
    )


_MEANS_SQL = f"""
{_CELLS_SQL},
means AS (
  SELECT scenario, cohort, period,
         CAST((10 * rev_e4) // n_lines AS BIGINT) AS mean_mc
  FROM cells
),
wide AS (
  SELECT scenario,
         max(CASE WHEN cohort = 'treat' AND period = 'pre' THEN mean_mc END)
           AS treat_pre_mc,
         max(CASE WHEN cohort = 'treat' AND period = 'post' THEN mean_mc END)
           AS treat_post_mc,
         max(CASE WHEN cohort = 'control' AND period = 'pre' THEN mean_mc END)
           AS control_pre_mc,
         max(CASE WHEN cohort = 'control' AND period = 'post' THEN mean_mc END)
           AS control_post_mc
  FROM means GROUP BY 1
)
"""


@query(
    "q_did_effect",
    oracle=f"""
    WITH {_MEANS_SQL}
    SELECT scenario, treat_pre_mc, treat_post_mc, control_pre_mc,
           control_post_mc,
           treat_post_mc - treat_pre_mc AS treat_delta_mc,
           control_post_mc - control_pre_mc AS control_delta_mc,
           (treat_post_mc - treat_pre_mc)
             - (control_post_mc - control_pre_mc) AS did_mc
    FROM wide ORDER BY scenario
    """,
)
def q_did_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BE be2 — the difference-in-differences estimate per scenario:
    the four cell means (truncated milli-cents, identical to be1's
    published values), each cohort's post−pre delta, and their
    difference ``did_mc``. The placebo row is the audit: a did_mc of
    comparable size there says the 'actual' effect is pre-trend, not
    event. Deltas compose be1's ALREADY-truncated means — exact with
    respect to the published table, one truncation per mean, as
    documented.

    Scale: the same single-pass 8-cell census as be1, pivoted
    census-side with conditional max — no extra fact work."""
    cells = _cells(spark, sf_dir)
    means = cells.select(
        "scenario",
        "cohort",
        "period",
        F.expr(
            "CAST((CAST(10 AS decimal(38,0)) * rev_e4) div n_lines AS BIGINT)"
        ).alias("mean_mc"),
    )
    wide = means.groupBy("scenario").agg(
        *[
            F.max(
                F.when(
                    (F.col("cohort") == c) & (F.col("period") == p),
                    F.col("mean_mc"),
                )
            ).alias(f"{c}_{p}_mc")
            for c in ("treat", "control")
            for p in ("pre", "post")
        ]
    )
    return wide.select(
        "scenario",
        "treat_pre_mc",
        "treat_post_mc",
        "control_pre_mc",
        "control_post_mc",
        (F.col("treat_post_mc") - F.col("treat_pre_mc")).alias(
            "treat_delta_mc"
        ),
        (F.col("control_post_mc") - F.col("control_pre_mc")).alias(
            "control_delta_mc"
        ),
        (
            (F.col("treat_post_mc") - F.col("treat_pre_mc"))
            - (F.col("control_post_mc") - F.col("control_pre_mc"))
        ).alias("did_mc"),
    ).orderBy("scenario")


@query(
    "q_event_abnormal_brand_share",
    oracle=f"""
    WITH brand_yr AS (
      SELECT p.p_brand AS brand, year(l.l_shipdate) AS yr,
             sum(CAST({_REV_E4} AS HUGEINT)) AS rev_e4
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE year(l.l_shipdate) IN (1997, 1998)
      GROUP BY 1, 2
    ),
    shares AS (
      SELECT brand, yr,
             CAST((10000 * rev_e4)
                  // sum(rev_e4) OVER (PARTITION BY yr) AS BIGINT)
               AS share_bp
      FROM brand_yr
    )
    SELECT a.brand,
           a.share_bp AS pre_share_bp,
           b.share_bp AS post_share_bp,
           b.share_bp - a.share_bp AS abnormal_bp
    FROM shares a JOIN shares b ON b.brand = a.brand
    WHERE a.yr = 1997 AND b.yr = 1998
    ORDER BY abnormal_bp DESC, a.brand
    """,
)
def q_event_abnormal_brand_share(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """§2.BE be3 — per-brand ABNORMAL revenue share across the event:
    each brand's share of total ship-year revenue in truncated bp for
    1997 and 1998, and the shift. Shares rather than levels make the
    move market-adjusted — a brand that only grows with the market
    keeps its bp, so non-zero ``abnormal_bp`` is brand-specific
    reallocation. Σ share_bp per year is ≤ 10⁴ (truncation), so the
    abnormal column nets to ~0 across brands — the semantic gate pins
    that closure within the 25-truncation envelope.

    Scale: one year-filtered (partition-prunable) lineitem⋈part pass
    to the 50-row brand×year census; the year-total window and the
    pre/post self-join run census-side."""
    lineitem, part = load_tables(spark, sf_dir, "lineitem", "part")
    dec = "decimal(38,0)"
    from pyspark.sql import Window

    brand_yr = (
        lineitem.where(F.year("l_shipdate").isin(1997, 1998))
        .join(part, lineitem.l_partkey == part.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.year("l_shipdate").alias("yr"),
        )
        .agg(F.sum(F.expr(f"CAST({_REV_E4} AS {dec})")).alias("rev_e4"))
    )
    shares = brand_yr.select(
        "brand",
        "yr",
        F.expr(
            f"CAST((CAST(10000 AS {dec}) * rev_e4) div"
            " (sum(rev_e4) OVER (PARTITION BY yr)) AS BIGINT)"
        ).alias("share_bp"),
    )
    a = shares.where(F.col("yr") == 1997).alias("a")
    b = shares.where(F.col("yr") == 1998).alias("b")
    return (
        a.join(b, F.col("b.brand") == F.col("a.brand"))
        .select(
            F.col("a.brand").alias("brand"),
            F.col("a.share_bp").alias("pre_share_bp"),
            F.col("b.share_bp").alias("post_share_bp"),
            (F.col("b.share_bp") - F.col("a.share_bp")).alias("abnormal_bp"),
        )
        .orderBy(F.col("abnormal_bp").desc(), "brand")
    )


@query(
    "q_did_discount_depth",
    oracle=f"""
    WITH {_CELLS_SQL},
    means AS (
      SELECT scenario, cohort, period,
             (100 * disc_e2) // n_lines AS mean_bp
      FROM cells
    ),
    wide AS (
      SELECT scenario,
             max(CASE WHEN cohort = 'treat' AND period = 'pre' THEN mean_bp END)
               AS treat_pre_bp,
             max(CASE WHEN cohort = 'treat' AND period = 'post' THEN mean_bp END)
               AS treat_post_bp,
             max(CASE WHEN cohort = 'control' AND period = 'pre' THEN mean_bp END)
               AS control_pre_bp,
             max(CASE WHEN cohort = 'control' AND period = 'post' THEN mean_bp END)
               AS control_post_bp
      FROM means GROUP BY 1
    )
    SELECT scenario, treat_pre_bp, treat_post_bp, control_pre_bp,
           control_post_bp,
           (treat_post_bp - treat_pre_bp)
             - (control_post_bp - control_pre_bp) AS did_bp
    FROM wide ORDER BY scenario
    """,
)
def q_did_discount_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BE be4 — DiD on discount DEPTH: mean line discount in exact
    truncated bp per scenario×cohort×period cell (TPC-H discounts are
    exact integer percents, so ``(100·Σpct) div n`` is the exact
    truncated bp mean — BIGINT throughout, no 128-bit needed), the
    pivoted four means, and ``did_bp`` with its placebo twin. Answers
    "did the promo shelf get discounted more aggressively after the
    event than the market did?".

    Scale: identical single-pass shape to be1 — the census carries the
    discount sum beside the revenue sum, so be4 is census-side
    arithmetic on 8 rows."""
    cells = _cells(spark, sf_dir)
    means = cells.select(
        "scenario",
        "cohort",
        "period",
        F.expr("(100 * disc_e2) div n_lines").alias("mean_bp"),
    )
    wide = means.groupBy("scenario").agg(
        *[
            F.max(
                F.when(
                    (F.col("cohort") == c) & (F.col("period") == p),
                    F.col("mean_bp"),
                )
            ).alias(f"{c}_{p}_bp")
            for c in ("treat", "control")
            for p in ("pre", "post")
        ]
    )
    return wide.select(
        "scenario",
        "treat_pre_bp",
        "treat_post_bp",
        "control_pre_bp",
        "control_post_bp",
        (
            (F.col("treat_post_bp") - F.col("treat_pre_bp"))
            - (F.col("control_post_bp") - F.col("control_pre_bp"))
        ).alias("did_bp"),
    ).orderBy("scenario")
