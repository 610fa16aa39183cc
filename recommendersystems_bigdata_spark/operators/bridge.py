"""Revenue bridge / price-volume-mix decomposition (SURVEY.md §2.AV, round 9).

The finance-review family: "1997 revenue is up X vs 1996 — how much of
that is price, how much volume, how much assortment?" Decomposed the
way an FP&A bridge is actually built:

- Per PART traded in both years (the matched sample), the classic
  two-factor split against base-year average selling price
  p0 = rev0/qty0: ``price = rev1 − qty1·p0`` (what the same units would
  have cost at old prices) and ``volume = (qty1 − qty0)·p0`` (the unit
  change at old prices). A per-part residual absorbs the micro-cent
  truncation so the three terms close EXACTLY to rev1 − rev0 — the
  closure is arithmetic identity, not approximation.
- Parts sold in only one of the years are the NEW / DISCONTINUED legs —
  they are assortment change, not price or volume, and get their own
  census (av2) and their own waterfall steps (av3).
- Mix SHIFT (av4) reads the same two-year census as quantity-share
  movement per brand — who gained share of units, in bp.

Everything is exact integer cents / micro-cents per the repo contract:
revenue sums in BIGINT cents, base ASP as truncated micro-cents
(``(rev0·10⁴) div qty0`` — the Laspeyres convention, pricing.py §2.AI),
effects as truncated-cent products, shares in truncated bp. Products
stay bounded because they run on the per-PART census (per-part yearly
qty ≪ 2³², ASP micro-cents ≪ 2⁴⁰ — same argument as ai4), never on
raw fact rows; the only 128-bit arithmetic is the share scaling on the
bounded brand census (DECIMAL(38,0) / HUGEINT, fuzz-matched toward-zero
quotients).

Spark-first shape, sized for 100 TB:
- ONE lineitem pass builds the (part, year) census behind a pushed
  ship-date range predicate (min/max-prunable at the parquet scan);
  every query below is joins/arithmetic on that bounded census.
- The part dimension broadcasts for brand lookups; year totals are
  1-row broadcast cross joins (the adjudicated pattern).
- av3's waterfall is CLOSED FORM on a 1-row scalar relation — no
  window, no iteration; running totals are precomputed expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query

_CENTS = "CAST(floor({col} * 100 + 0.5) AS BIGINT)"

_Y0, _Y1 = 1996, 1997

# DuckDB: the (part, year) census for the two bridge years, plus the
# matched/base decomposition. p0_micro is the base-year ASP in truncated
# micro-cents; the per-part effects close exactly via the residual.
_PY_SQL = f"""
py AS (
  SELECT l_partkey AS p,
         CAST(year(CAST(l_shipdate AS TIMESTAMP)) AS BIGINT) AS yr,
         CAST(sum({_CENTS.format(col="l_extendedprice")}) AS BIGINT)
           AS rev_cents,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem
  WHERE CAST(l_shipdate AS TIMESTAMP) >= TIMESTAMP '{_Y0}-01-01'
    AND CAST(l_shipdate AS TIMESTAMP) <  TIMESTAMP '{_Y1 + 1}-01-01'
  GROUP BY 1, 2
),
y0 AS (SELECT p, rev_cents AS rev0, qty AS qty0 FROM py WHERE yr = {_Y0}),
y1 AS (SELECT p, rev_cents AS rev1, qty AS qty1 FROM py WHERE yr = {_Y1}),
common AS (
  SELECT y0.p, rev0, qty0, rev1, qty1,
         (rev0 * 10000) // qty0 AS p0_micro
  FROM y0 JOIN y1 ON y0.p = y1.p
),
effects AS (
  SELECT p, rev0, rev1, qty0, qty1,
         rev1 - (qty1 * p0_micro) // 10000 AS price_eff,
         ((qty1 - qty0) * p0_micro) // 10000 AS vol_eff,
         (rev1 - rev0)
           - (rev1 - (qty1 * p0_micro) // 10000)
           - (((qty1 - qty0) * p0_micro) // 10000) AS resid_eff
  FROM common
)
"""


def _py_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(p, yr, rev_cents, qty) for the two bridge years — one fact pass
    behind a pushed ship-date range filter."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit(f"{_Y0}-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(f"{_Y1 + 1}-01-01").cast("timestamp"))
        )
        .groupBy(
            F.col("l_partkey").alias("p"),
            F.year("l_shipdate").cast("long").alias("yr"),
        )
        .agg(
            F.sum(F.expr(_CENTS.format(col="l_extendedprice")))
            .cast("long")
            .alias("rev_cents"),
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"),
        )
    )


def _effects(py: DataFrame) -> DataFrame:
    """Per matched part: rev/qty both years + the exact three-way split."""
    y0 = py.where(F.col("yr") == _Y0).select(
        "p", F.col("rev_cents").alias("rev0"), F.col("qty").alias("qty0")
    )
    y1 = py.where(F.col("yr") == _Y1).select(
        "p", F.col("rev_cents").alias("rev1"), F.col("qty").alias("qty1")
    )
    return (
        y0.join(y1, "p")
        .withColumn("p0_micro", F.expr("(rev0 * 10000) div qty0"))
        .select(
            "p",
            "rev0",
            "rev1",
            "qty0",
            "qty1",
            F.expr("rev1 - (qty1 * p0_micro) div 10000").alias("price_eff"),
            F.expr("((qty1 - qty0) * p0_micro) div 10000").alias("vol_eff"),
            F.expr(
                "(rev1 - rev0)"
                " - (rev1 - (qty1 * p0_micro) div 10000)"
                " - (((qty1 - qty0) * p0_micro) div 10000)"
            ).alias("resid_eff"),
        )
    )


@query(
    "q_bridge_pvm_brand",
    oracle=f"""
    WITH {_PY_SQL}
    SELECT p.p_brand,
           CAST(count(*) AS BIGINT) AS n_common_parts,
           CAST(sum(e.rev0) AS BIGINT) AS rev0_cents,
           CAST(sum(e.rev1) AS BIGINT) AS rev1_cents,
           CAST(sum(e.rev1 - e.rev0) AS BIGINT) AS delta_cents,
           CAST(sum(e.price_eff) AS BIGINT) AS price_effect_cents,
           CAST(sum(e.vol_eff) AS BIGINT) AS volume_effect_cents,
           CAST(sum(e.resid_eff) AS BIGINT) AS mix_residual_cents
    FROM effects e JOIN part p ON e.p = p.p_partkey
    GROUP BY 1 ORDER BY p_brand
    """,
)
def q_bridge_pvm_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AV av1 — price-volume-mix bridge per brand over the matched
    {1996, 1997} part sample: rev both years, the delta, and its exact
    three-way split (price effect at base ASP, volume effect at base
    ASP, truncation residual). Per brand the three effects sum to
    delta_cents EXACTLY — per-part identity, so it survives any
    grouping (the conservation test pins it).

    Scale: one pushed-range fact pass to the (part, year) census,
    localCheckpoint-pinned — the y0/y1 branches would otherwise each
    re-scan the fact (measured: 2 lineitem scans unpinned); the matched
    self-join and all arithmetic run on the bounded census; part dim
    broadcasts for the brand rollup; |brands| output rows."""
    part = load_table(spark, sf_dir, "part")
    eff = _effects(_py_census(spark, sf_dir).localCheckpoint())
    return (
        eff.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            eff.p == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common_parts"),
            F.sum("rev0").cast("long").alias("rev0_cents"),
            F.sum("rev1").cast("long").alias("rev1_cents"),
            F.sum(F.col("rev1") - F.col("rev0")).cast("long").alias("delta_cents"),
            F.sum("price_eff").cast("long").alias("price_effect_cents"),
            F.sum("vol_eff").cast("long").alias("volume_effect_cents"),
            F.sum("resid_eff").cast("long").alias("mix_residual_cents"),
        )
        .orderBy("p_brand")
    )


@query(
    "q_bridge_new_lost",
    oracle=f"""
    WITH {_PY_SQL}
    , classified AS (
      SELECT COALESCE(y0.p, y1.p) AS p,
             CASE WHEN y0.p IS NULL THEN 'new'
                  WHEN y1.p IS NULL THEN 'lost'
                  ELSE 'common' END AS status,
             COALESCE(y0.rev0, 0) AS rev0, COALESCE(y1.rev1, 0) AS rev1
      FROM y0 FULL OUTER JOIN y1 ON y0.p = y1.p
    )
    SELECT p.p_brand,
           CAST(sum(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS BIGINT)
             AS new_parts,
           CAST(sum(CASE WHEN status = 'new' THEN rev1 ELSE 0 END) AS BIGINT)
             AS new_rev_cents,
           CAST(sum(CASE WHEN status = 'lost' THEN 1 ELSE 0 END) AS BIGINT)
             AS lost_parts,
           CAST(sum(CASE WHEN status = 'lost' THEN rev0 ELSE 0 END) AS BIGINT)
             AS lost_rev_cents,
           CAST(sum(CASE WHEN status = 'common' THEN 1 ELSE 0 END) AS BIGINT)
             AS common_parts
    FROM classified c JOIN part p ON c.p = p.p_partkey
    GROUP BY 1 ORDER BY p_brand
    """,
)
def q_bridge_new_lost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AV av2 — assortment change per brand: parts that sold in 1997
    but not 1996 (new) and vice versa (discontinued), with the revenue
    each leg carries — the bridge's non-matched legs, reported where
    av1's matched split cannot see them. Common-part counts ride along
    so av1 ∪ av2 partitions each brand's part census exactly.

    Scale: full-outer join of the two bounded year slices of the same
    census (never the fact; checkpoint-pinned so each slice does not
    re-scan it), broadcast brand lookup, |brands| rows."""
    py = _py_census(spark, sf_dir).localCheckpoint()
    part = load_table(spark, sf_dir, "part")
    y0 = py.where(F.col("yr") == _Y0).select(
        F.col("p").alias("p0"), F.col("rev_cents").alias("rev0")
    )
    y1 = py.where(F.col("yr") == _Y1).select(
        F.col("p").alias("p1"), F.col("rev_cents").alias("rev1")
    )
    classified = (
        y0.join(y1, y0.p0 == y1.p1, "full_outer")
        .select(
            F.coalesce("p0", "p1").alias("p"),
            F.when(F.col("p0").isNull(), "new")
            .when(F.col("p1").isNull(), "lost")
            .otherwise("common")
            .alias("status"),
            F.coalesce("rev0", F.lit(0)).alias("rev0"),
            F.coalesce("rev1", F.lit(0)).alias("rev1"),
        )
    )
    return (
        classified.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            classified.p == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            F.sum(F.when(F.col("status") == "new", 1).otherwise(0))
            .cast("long")
            .alias("new_parts"),
            F.sum(F.when(F.col("status") == "new", F.col("rev1")).otherwise(0))
            .cast("long")
            .alias("new_rev_cents"),
            F.sum(F.when(F.col("status") == "lost", 1).otherwise(0))
            .cast("long")
            .alias("lost_parts"),
            F.sum(F.when(F.col("status") == "lost", F.col("rev0")).otherwise(0))
            .cast("long")
            .alias("lost_rev_cents"),
            F.sum(F.when(F.col("status") == "common", 1).otherwise(0))
            .cast("long")
            .alias("common_parts"),
        )
        .orderBy("p_brand")
    )


@query(
    "q_bridge_waterfall",
    oracle=f"""
    WITH {_PY_SQL}
    , scalars AS (
      SELECT
        (SELECT COALESCE(CAST(sum(rev0) AS BIGINT), 0) FROM effects)
          + (SELECT COALESCE(CAST(sum(y0.rev0) AS BIGINT), 0) FROM y0
             WHERE y0.p NOT IN (SELECT p FROM y1)) AS rev0_total,
        (SELECT COALESCE(CAST(sum(rev1) AS BIGINT), 0) FROM effects)
          + (SELECT COALESCE(CAST(sum(y1.rev1) AS BIGINT), 0) FROM y1
             WHERE y1.p NOT IN (SELECT p FROM y0)) AS rev1_total,
        (SELECT COALESCE(CAST(sum(vol_eff) AS BIGINT), 0) FROM effects)
          AS vol,
        (SELECT COALESCE(CAST(sum(price_eff) AS BIGINT), 0) FROM effects)
          AS price,
        (SELECT COALESCE(CAST(sum(resid_eff) AS BIGINT), 0) FROM effects)
          AS resid,
        (SELECT COALESCE(CAST(sum(y1.rev1) AS BIGINT), 0) FROM y1
         WHERE y1.p NOT IN (SELECT p FROM y0)) AS new_rev,
        (SELECT COALESCE(CAST(sum(y0.rev0) AS BIGINT), 0) FROM y0
         WHERE y0.p NOT IN (SELECT p FROM y1)) AS lost_rev
    )
    SELECT * FROM (
      SELECT CAST(1 AS BIGINT) AS step, 'base_{_Y0}' AS component,
             rev0_total AS amount_cents, rev0_total AS running_cents
      FROM scalars
      UNION ALL SELECT 2, 'volume', vol, rev0_total + vol FROM scalars
      UNION ALL SELECT 3, 'price', price, rev0_total + vol + price
      FROM scalars
      UNION ALL SELECT 4, 'mix_residual', resid,
             rev0_total + vol + price + resid FROM scalars
      UNION ALL SELECT 5, 'new_parts', new_rev,
             rev0_total + vol + price + resid + new_rev FROM scalars
      UNION ALL SELECT 6, 'lost_parts', -lost_rev,
             rev0_total + vol + price + resid + new_rev - lost_rev
      FROM scalars
      UNION ALL SELECT 7, 'end_{_Y1}', rev1_total, rev1_total FROM scalars
    ) ORDER BY step
    """,
)
def q_bridge_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AV av3 — the company-level revenue waterfall from 1996 to
    1997: base revenue, then the volume / price / residual legs over
    the matched sample, then the new-parts and discontinued-parts
    assortment legs, ending at 1997 revenue. Running totals are CLOSED
    FORM on one scalar row — step 6's running equals step 7's total by
    arithmetic identity (the closure test), so the waterfall can never
    "leak" cents.

    Scale: the census is localCheckpoint-ed and read three ways
    (matched effects, new leg, lost leg — all bounded); the 7-row
    output is pure expression arithmetic on a 1-row relation, no
    window, no iteration."""
    py = _py_census(spark, sf_dir).localCheckpoint()
    eff = _effects(py)
    y0 = py.where(F.col("yr") == _Y0).select(
        F.col("p").alias("p0"), F.col("rev_cents").alias("rev0")
    )
    y1 = py.where(F.col("yr") == _Y1).select(
        F.col("p").alias("p1"), F.col("rev_cents").alias("rev1")
    )
    common = eff.agg(
        F.coalesce(F.sum("rev0"), F.lit(0)).cast("long").alias("rev0_common"),
        F.coalesce(F.sum("rev1"), F.lit(0)).cast("long").alias("rev1_common"),
        F.coalesce(F.sum("vol_eff"), F.lit(0)).cast("long").alias("vol"),
        F.coalesce(F.sum("price_eff"), F.lit(0)).cast("long").alias("price"),
        F.coalesce(F.sum("resid_eff"), F.lit(0)).cast("long").alias("resid"),
    )
    new_leg = (
        y1.join(y0, y1.p1 == y0.p0, "left_anti")
        .agg(F.coalesce(F.sum("rev1"), F.lit(0)).cast("long").alias("new_rev"))
    )
    lost_leg = (
        y0.join(y1, y0.p0 == y1.p1, "left_anti")
        .agg(F.coalesce(F.sum("rev0"), F.lit(0)).cast("long").alias("lost_rev"))
    )
    scalars = (
        common.crossJoin(F.broadcast(new_leg))
        .crossJoin(F.broadcast(lost_leg))
        .select(
            (F.col("rev0_common") + F.col("lost_rev")).alias("rev0_total"),
            (F.col("rev1_common") + F.col("new_rev")).alias("rev1_total"),
            "vol",
            "price",
            "resid",
            "new_rev",
            "lost_rev",
        )
    )
    return scalars.select(
        F.expr(
            f"""stack(7,
              CAST(1 AS BIGINT), 'base_{_Y0}', rev0_total, rev0_total,
              CAST(2 AS BIGINT), 'volume', vol, rev0_total + vol,
              CAST(3 AS BIGINT), 'price', price, rev0_total + vol + price,
              CAST(4 AS BIGINT), 'mix_residual', resid,
                rev0_total + vol + price + resid,
              CAST(5 AS BIGINT), 'new_parts', new_rev,
                rev0_total + vol + price + resid + new_rev,
              CAST(6 AS BIGINT), 'lost_parts', -lost_rev,
                rev0_total + vol + price + resid + new_rev - lost_rev,
              CAST(7 AS BIGINT), 'end_{_Y1}', rev1_total, rev1_total
            ) AS (step, component, amount_cents, running_cents)"""
        )
    ).orderBy("step")


@query(
    "q_bridge_mix_shift",
    oracle=f"""
    WITH {_PY_SQL}
    , brand_yr AS (
      SELECT p.p_brand,
             CAST(sum(CASE WHEN yr = {_Y0} THEN qty ELSE 0 END) AS BIGINT)
               AS qty0,
             CAST(sum(CASE WHEN yr = {_Y1} THEN qty ELSE 0 END) AS BIGINT)
               AS qty1
      FROM py JOIN part p ON py.p = p.p_partkey
      GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(qty0) AS BIGINT) AS t0, CAST(sum(qty1) AS BIGINT) AS t1
      FROM brand_yr
    )
    SELECT p_brand, qty0, qty1,
           (10000 * qty0) // t0 AS share0_bp,
           (10000 * qty1) // t1 AS share1_bp,
           (10000 * qty1) // t1 - (10000 * qty0) // t0 AS share_delta_bp,
           CASE WHEN (10000 * qty1) // t1 > (10000 * qty0) // t0
                  THEN 'gainer'
                WHEN (10000 * qty1) // t1 < (10000 * qty0) // t0
                  THEN 'loser'
                ELSE 'flat' END AS direction
    FROM brand_yr, tot ORDER BY p_brand
    """,
)
def q_bridge_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AV av4 — unit-mix shift per brand: each brand's share of
    total units in 1996 vs 1997 (truncated bp) and the share movement,
    labeled gainer/loser/flat — the assortment-mix read of the same
    two-year census (ALL parts, not just matched: share shift includes
    new/lost assortment by construction).

    Scale: the census rolls up to |brands| rows map-side; year totals
    are a 1-row broadcast cross join; everything after the single fact
    pass is arithmetic on 25 rows."""
    py = _py_census(spark, sf_dir)
    part = load_table(spark, sf_dir, "part")
    brand_yr = (
        py.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            py.p == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            F.sum(F.when(F.col("yr") == _Y0, F.col("qty")).otherwise(0))
            .cast("long")
            .alias("qty0"),
            F.sum(F.when(F.col("yr") == _Y1, F.col("qty")).otherwise(0))
            .cast("long")
            .alias("qty1"),
        )
    )
    tot = brand_yr.agg(
        F.sum("qty0").cast("long").alias("t0"),
        F.sum("qty1").cast("long").alias("t1"),
    )
    return (
        brand_yr.crossJoin(F.broadcast(tot))
        .select(
            "p_brand",
            "qty0",
            "qty1",
            F.expr("(10000 * qty0) div t0").alias("share0_bp"),
            F.expr("(10000 * qty1) div t1").alias("share1_bp"),
            F.expr("(10000 * qty1) div t1 - (10000 * qty0) div t0").alias(
                "share_delta_bp"
            ),
            F.when(
                F.expr("(10000 * qty1) div t1 > (10000 * qty0) div t0"),
                "gainer",
            )
            .when(
                F.expr("(10000 * qty1) div t1 < (10000 * qty0) div t0"),
                "loser",
            )
            .otherwise("flat")
            .alias("direction"),
        )
        .orderBy("p_brand")
    )
