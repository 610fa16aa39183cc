"""Exact least-squares & correlation suite (SURVEY.md §2.BD, round 9).

Closed-form first/second-moment regression over the pricing fact — the
"fit a line without a solver" family, all from ONE pass of exact
integer sums (n, Σx, Σy, Σx², Σy², Σxy) per brand:

- bd1: per-brand OLS of gross line revenue (cents) on quantity —
  slope and intercept in truncated milli-cents, from the centered
  cross-moments ``S_xy = n·Σxy − Σx·Σy`` / ``S_xx = n·Σx² − (Σx)²``.
  The intercept is computed FROM THE PUBLISHED truncated slope
  (``(1000·Σy − slope_milli·Σx) div n``) rather than the independent
  rational form, so a reader can reproduce every fitted value from the
  table's own columns — and bd4's residuals are exact against bd1 by
  construction.
- bd2: per-brand signed squared Pearson correlation of quantity vs
  whole-dollar revenue, ``sign(S_xy)·(10⁴·S_xy²) div (S_xx·S_yy)`` in
  truncated basis points — the sqrt-free spelling (r² is rational even
  though r is not), same device as §2.AA's ratio-form autocorrelation.
- bd3: arc price elasticity of demand between ADJACENT discount bands
  (the 0..10 integer-percent bands TPC-H discounts live on): the
  midpoint formula ``((q₂−q₁)·(p₁+p₂)) / ((q₁+q₂)·(p₂−p₁))`` in
  truncated milli, with band unit prices in exact micro-dollars from
  the e4 discount-revenue units (``functions/exactmath.py``).
- bd4: the top-3 |residual| lines per brand against bd1's published
  fit — residuals in exact milli-cents, two-stage (salted) top-k so no
  single window partition ever sees a whole brand at 100 TB.

Exactness: x = quantity (an exact small integer), y = gross price in
exact cents (bd1/bd4) or exact whole dollars (bd2, to shrink the r²
product). Centered moments and their products accumulate in 128-bit
(DECIMAL(38,0) Spark / HUGEINT DuckDB); every published ratio is a
truncating integer division (``div`` / ``//``), never a rounded float.
Headroom: bd1's worst 128-bit term (n·Σy² in cents²) clears DECIMAL(38)
through ~sf300 for per-brand groups; bd2's ``10⁴·S_xy²`` clears it
through ~sf0.3 in whole dollars — past that, pre-scale y to tens of
dollars (r² is scale-invariant; the truncated bp digit can move by at
most one). Documented rather than needed at test scale, same policy as
§2.AA/§2.AI.

Spark-first shape, sized for 100 TB:
- ONE lineitem⋈part shuffle (part is SF-scaled → shuffle join, never
  broadcast) partial-aggregated map-side to the 25-row brand moment
  census; bd1/bd2 finish on that census.
- bd3 aggregates the same join to the ≤275-row brand×band census and
  self-joins adjacent bands census-side.
- bd4 re-scans the fact once, joins the 25-row bd1 parameter table as
  a BROADCAST, and runs the two-stage top-k: a local rank inside
  (brand, 32-way salt) partitions, then the global rank over the ≤
  25·32·3 survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from recommendersystems_bigdata_spark.catalog import load_tables
from recommendersystems_bigdata_spark.registry import query

_QTY = "CAST(floor(l_quantity + 0.5) AS BIGINT)"
_PRICE_E2 = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
_DISC_E2 = "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)"
_REV_E4 = f"{_PRICE_E2} * (100 - {_DISC_E2})"

# DuckDB: the per-brand moment census (y in cents). 128-bit second
# moments; first moments stay BIGINT (headroom noted in the module doc).
_MOM_SQL = f"""
mom AS (
  SELECT p.p_brand AS brand,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum({_QTY}) AS BIGINT) AS sx,
         CAST(sum({_PRICE_E2}) AS BIGINT) AS sy,
         sum(CAST({_QTY} AS HUGEINT) * {_QTY}) AS sxx,
         sum(CAST({_PRICE_E2} AS HUGEINT) * {_PRICE_E2}) AS syy,
         sum(CAST({_QTY} AS HUGEINT) * {_PRICE_E2}) AS sxy
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1
),
cen AS (
  SELECT brand, n, sx, sy,
         n * sxx - CAST(sx AS HUGEINT) * sx AS s_xx,
         n * syy - CAST(sy AS HUGEINT) * sy AS s_yy,
         n * sxy - CAST(sx AS HUGEINT) * sy AS s_xy
  FROM mom
)
"""


def _moments(spark: SparkSession, sf_dir: str, price_expr: str) -> DataFrame:
    """The 25-row per-brand centered-moment census; ``price_expr`` is the
    exact-integer y spelling (cents for bd1/bd4, whole dollars for bd2)."""
    lineitem, part = load_tables(spark, sf_dir, "lineitem", "part")
    dec = "decimal(38,0)"
    mom = (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.expr(_QTY)).cast("long").alias("sx"),
            F.sum(F.expr(price_expr)).cast("long").alias("sy"),
            F.sum(F.expr(f"CAST({_QTY} AS {dec}) * {_QTY}")).alias("sxx"),
            F.sum(
                F.expr(f"CAST({price_expr} AS {dec}) * ({price_expr})")
            ).alias("syy"),
            F.sum(F.expr(f"CAST({_QTY} AS {dec}) * ({price_expr})")).alias(
                "sxy"
            ),
        )
    )
    return mom.select(
        "brand",
        "n",
        "sx",
        "sy",
        F.expr(f"n * sxx - CAST(sx AS {dec}) * sx").alias("s_xx"),
        F.expr(f"n * syy - CAST(sy AS {dec}) * sy").alias("s_yy"),
        F.expr(f"n * sxy - CAST(sx AS {dec}) * sy").alias("s_xy"),
    )


@query(
    "q_ols_brand_price_curve",
    oracle=f"""
    WITH {_MOM_SQL}
    SELECT brand, n AS n_lines,
           CAST((1000 * s_xy) // s_xx AS BIGINT) AS slope_milli,
           CAST((1000 * CAST(sy AS HUGEINT)
                 - ((1000 * s_xy) // s_xx) * sx) // n AS BIGINT)
             AS intercept_milli
    FROM cen ORDER BY brand
    """,
)
def q_ols_brand_price_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BD bd1 — per-brand OLS fit of gross line price (cents) on
    quantity: ``slope_milli = (1000·S_xy) div S_xx`` milli-cents per
    unit, and the intercept recomposed from that PUBLISHED slope,
    ``(1000·Σy − slope_milli·Σx) div n`` — so fitted values (and bd4's
    residuals) reproduce exactly from this table alone. (This corpus
    draws price independently of quantity, so slopes hover near zero
    relative to the intercept — the semantic gate pins the exact
    closed-form values against a Fraction rebuild, not a shape claim.)

    Scale: one SF-scaled lineitem⋈part shuffle join partial-aggregated
    to the 25-row moment census; everything after is census-side
    128-bit arithmetic (DECIMAL(38,0) / HUGEINT, truncating div)."""
    dec = "decimal(38,0)"
    return (
        _moments(spark, sf_dir, _PRICE_E2)
        .select(
            "brand",
            F.col("n").alias("n_lines"),
            F.expr(f"CAST((CAST(1000 AS {dec}) * s_xy) div s_xx AS BIGINT)").alias(
                "slope_milli"
            ),
            F.expr(
                f"CAST((CAST(1000 AS {dec}) * sy"
                f" - ((CAST(1000 AS {dec}) * s_xy) div s_xx) * sx)"
                f" div n AS BIGINT)"
            ).alias("intercept_milli"),
        )
        .orderBy("brand")
    )


# Whole-dollar gross price: exact truncating division of exact cents.
# Two spellings — Spark's `div` and DuckDB's `//` (adjudicated sign-
# compatible, see operators/tpch_extra.py's numeric-discipline note;
# operands here are non-negative anyway).
_PRICE_USD = f"({_PRICE_E2} div 100)"
_PRICE_USD_DUCK = f"({_PRICE_E2} // 100)"


@query(
    "q_corr_quantity_price",
    oracle=f"""
    WITH {_MOM_SQL.replace(_PRICE_E2, _PRICE_USD_DUCK)}
    SELECT brand, n AS n_lines,
           CASE WHEN s_xy < 0 THEN -1 WHEN s_xy > 0 THEN 1 ELSE 0 END
             AS corr_sign,
           CAST((10000 * s_xy * s_xy) // (s_xx * s_yy) AS BIGINT) AS r2_bp
    FROM cen ORDER BY brand
    """,
)
def q_corr_quantity_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BD bd2 — per-brand signed r² of quantity vs whole-dollar gross
    price in truncated bp: ``(10⁴·S_xy²) div (S_xx·S_yy)`` with the
    sign published separately — the sqrt-free exact spelling of
    Pearson correlation (r itself is irrational; r² is a ratio of
    integers). On this corpus price is drawn independently of
    quantity, so r² sits near zero — the semantic gate pins the exact
    rational value per brand against a Fraction rebuild and the
    0 ≤ r2_bp ≤ 10⁴ Cauchy-Schwarz bound.

    Scale: the same single-pass moment census as bd1, y pre-scaled to
    whole dollars so the 128-bit ``10⁴·S_xy²`` product keeps headroom
    (envelope and the further pre-scaling hatch in the module doc)."""
    dec = "decimal(38,0)"
    return (
        _moments(spark, sf_dir, _PRICE_USD)
        .select(
            "brand",
            F.col("n").alias("n_lines"),
            F.expr(
                "CAST(CASE WHEN s_xy < 0 THEN -1 WHEN s_xy > 0 THEN 1"
                " ELSE 0 END AS INT)"
            ).alias("corr_sign"),
            F.expr(
                f"CAST((CAST(10000 AS {dec}) * s_xy * s_xy)"
                f" div (s_xx * s_yy) AS BIGINT)"
            ).alias("r2_bp"),
        )
        .orderBy("brand")
    )


# DuckDB: the per-brand × discount-band demand census (band = integer
# percent 0..10; unit price in exact micro-dollars from e4 revenue).
_BAND_SQL = f"""
band AS (
  SELECT p.p_brand AS brand, {_DISC_E2} AS band_pct,
         CAST(sum({_QTY}) AS BIGINT) AS qty,
         sum(CAST({_REV_E4} AS HUGEINT)) AS rev_e4
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
),
pu AS (
  SELECT brand, band_pct, qty,
         CAST((100 * rev_e4) // qty AS BIGINT) AS pu_micro
  FROM band
)
"""


@query(
    "q_elasticity_discount_arc",
    oracle=f"""
    WITH {_BAND_SQL}
    SELECT a.brand, a.band_pct AS band_from, b.band_pct AS band_to,
           a.qty AS qty_from, b.qty AS qty_to,
           a.pu_micro AS pu_from_micro, b.pu_micro AS pu_to_micro,
           CAST((1000 * (b.qty - a.qty) * (CAST(a.pu_micro AS HUGEINT) + b.pu_micro))
                // ((a.qty + b.qty) * (CAST(b.pu_micro AS HUGEINT) - a.pu_micro))
             AS BIGINT) AS elasticity_milli
    FROM pu a JOIN pu b ON b.brand = a.brand AND b.band_pct = a.band_pct + 1
    WHERE b.pu_micro <> a.pu_micro
    ORDER BY a.brand, a.band_pct
    """,
)
def q_elasticity_discount_arc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BD bd3 — arc (midpoint) price elasticity of demand between
    adjacent discount bands, per brand: bands are the exact integer
    discount percents TPC-H draws (0..10), band unit price is the
    effective (discounted) revenue per unit in truncated micro-dollars,
    and ``elasticity_milli`` is the midpoint formula as ONE truncating
    division of exact 128-bit products. Adjacent bands with equal unit
    price are excluded (zero denominator — no elasticity is defined),
    matching the oracle's WHERE.

    Scale: the same single lineitem⋈part pass as bd1 aggregated to the
    ≤275-row brand×band census; the adjacent-band self-join runs on
    that census, never on the fact."""
    lineitem, part = load_tables(spark, sf_dir, "lineitem", "part")
    dec = "decimal(38,0)"
    band = (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.expr(_DISC_E2).alias("band_pct"),
        )
        .agg(
            F.sum(F.expr(_QTY)).cast("long").alias("qty"),
            F.sum(F.expr(f"CAST({_REV_E4} AS {dec})")).alias("rev_e4"),
        )
        .select(
            "brand",
            "band_pct",
            "qty",
            F.expr(
                f"CAST((CAST(100 AS {dec}) * rev_e4) div qty AS BIGINT)"
            ).alias("pu_micro"),
        )
    )
    a = band.alias("a")
    b = band.alias("b")
    return (
        a.join(
            b,
            (F.col("b.brand") == F.col("a.brand"))
            & (F.col("b.band_pct") == F.col("a.band_pct") + 1),
        )
        .where(F.col("b.pu_micro") != F.col("a.pu_micro"))
        .select(
            F.col("a.brand").alias("brand"),
            F.col("a.band_pct").alias("band_from"),
            F.col("b.band_pct").alias("band_to"),
            F.col("a.qty").alias("qty_from"),
            F.col("b.qty").alias("qty_to"),
            F.col("a.pu_micro").alias("pu_from_micro"),
            F.col("b.pu_micro").alias("pu_to_micro"),
            F.expr(
                f"CAST((CAST(1000 AS {dec}) * (b.qty - a.qty)"
                f" * (CAST(a.pu_micro AS {dec}) + b.pu_micro))"
                f" div (CAST(a.qty + b.qty AS {dec})"
                f" * (CAST(b.pu_micro AS {dec}) - a.pu_micro)) AS BIGINT)"
            ).alias("elasticity_milli"),
        )
        .orderBy("brand", "band_from")
    )


@query(
    "q_ols_residual_outliers",
    oracle=f"""
    WITH {_MOM_SQL},
    params AS (
      SELECT brand,
             CAST((1000 * s_xy) // s_xx AS BIGINT) AS slope_milli,
             CAST((1000 * CAST(sy AS HUGEINT)
                   - ((1000 * s_xy) // s_xx) * sx) // n AS BIGINT)
               AS intercept_milli
      FROM cen
    ),
    res AS (
      SELECT p.p_brand AS brand, l.l_orderkey, l.l_linenumber,
             {_QTY} AS qty, {_PRICE_E2} AS price_cents,
             1000 * {_PRICE_E2} - pr.slope_milli * {_QTY}
               - pr.intercept_milli AS residual_milli
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN params pr ON pr.brand = p.p_brand
    )
    SELECT brand, rnk, l_orderkey, l_linenumber, qty, price_cents,
           residual_milli
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY brand
               ORDER BY abs(residual_milli) DESC, l_orderkey, l_linenumber
             ) AS rnk
      FROM res
    )
    WHERE rnk <= 3
    ORDER BY brand, rnk
    """,
)
def q_ols_residual_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BD bd4 — the 3 worst-fit lines per brand against bd1's
    PUBLISHED fit: ``residual_milli = 1000·price_cents −
    slope_milli·qty − intercept_milli`` (exact integers — bd1's params
    are the table's own truncated milli values, so the residuals here
    are reproducible from bd1's output, not from a hidden rational
    fit). Deterministic order: |residual| desc, then (orderkey,
    linenumber).

    Scale: one fact re-scan joining the 25-row parameter census as a
    BROADCAST, then a TWO-STAGE top-k: rank inside (brand, 32-way
    salt) partitions first — no window partition ever holds a whole
    brand — then the global rank over the ≤ 25·32·3 survivors. The
    oracle spells the single-window form; results agree because the
    local stage only discards rows that cannot reach the global
    top 3."""
    from pyspark.sql import Window

    lineitem, part = load_tables(spark, sf_dir, "lineitem", "part")
    dec = "decimal(38,0)"
    params = (
        _moments(spark, sf_dir, _PRICE_E2)
        .select(
            "brand",
            F.expr(f"CAST((CAST(1000 AS {dec}) * s_xy) div s_xx AS BIGINT)").alias(
                "slope_milli"
            ),
            F.expr(
                f"CAST((CAST(1000 AS {dec}) * sy"
                f" - ((CAST(1000 AS {dec}) * s_xy) div s_xx) * sx)"
                f" div n AS BIGINT)"
            ).alias("intercept_milli"),
        )
    )
    res = (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .join(F.broadcast(params), F.col("p_brand") == params.brand)
        .select(
            "brand",
            "l_orderkey",
            "l_linenumber",
            F.expr(_QTY).alias("qty"),
            F.expr(_PRICE_E2).alias("price_cents"),
            F.expr(
                f"1000 * {_PRICE_E2} - slope_milli * {_QTY} - intercept_milli"
            ).alias("residual_milli"),
        )
    )
    local = Window.partitionBy(
        "brand", F.pmod(F.hash("l_orderkey", "l_linenumber"), F.lit(32))
    ).orderBy(
        F.abs(F.col("residual_milli")).desc(), "l_orderkey", "l_linenumber"
    )
    survivors = (
        res.withColumn("lrnk", F.row_number().over(local))
        .where(F.col("lrnk") <= 3)
        .drop("lrnk")
    )
    final = Window.partitionBy("brand").orderBy(
        F.abs(F.col("residual_milli")).desc(), "l_orderkey", "l_linenumber"
    )
    return (
        survivors.withColumn("rnk", F.row_number().over(final))
        .where(F.col("rnk") <= 3)
        .select(
            "brand",
            "rnk",
            "l_orderkey",
            "l_linenumber",
            "qty",
            "price_cents",
            "residual_milli",
        )
        .orderBy("brand", "rnk")
    )
