"""Pricing / margin analytics (SURVEY.md §2.AI, round 9).

The commercial-finance view of the lineitem fact: unit-price spread
auditing, discount-band impact, brand-level margin waterfalls, a
Laspeyres price index, and the tax-burden profile. The exactness
problem this suite solves is RATIOS WITHOUT FLOATS: unit price is
extendedprice/quantity and an index is a ratio of basket sums — both
irrational on the cent grid — so every rate here is a TRUNCATED-DIV
integer in a declared basis (micro-cents per unit = ``(cents × 10⁴)
div qty``, shares/rates in bp, index in bp vs the base year), computed
identically in both engines. Discount/tax doubles are converted to
integer bp once (``floor(x·10⁴ + 0.5)``) and all money stays BIGINT
cents.

Spark-first shape, sized for 100 TB:
- Every query is one fact scan into a partial-aggregated groupBy
  (part / band / brand / (part, year) / status) — no windows over the
  fact, no self-joins.
- ai3 broadcasts the part dimension; ai4's index is two bounded
  relations (per-part base-year weights, per-(part, year) prices)
  joined on the part key after aggregation, then a |years|-row census.
- Overflow audit for ai4's cross-multiplied sums is in the docstring
  (≤2×10¹⁷ at corpus shapes, < 2⁶³).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query

_CENTS = "CAST(floor({col} * 100 + 0.5) AS BIGINT)"
_BP = "CAST(floor({col} * 10000 + 0.5) AS BIGINT)"


@query(
    "q_price_spread_audit",
    oracle=f"""
    WITH u AS (
      SELECT l_partkey AS p,
             ({_CENTS.format(col="l_extendedprice")} * 10000)
               // CAST(l_quantity AS BIGINT) AS unit_micro
      FROM lineitem
    ),
    per_part AS (
      SELECT p, CAST(count(*) AS BIGINT) AS n_lines,
             CAST(count(DISTINCT unit_micro) AS BIGINT) AS n_prices,
             CAST(min(unit_micro) AS BIGINT) AS min_unit_micro,
             CAST(max(unit_micro) AS BIGINT) AS max_unit_micro
      FROM u GROUP BY 1
    )
    SELECT p AS l_partkey, n_lines, n_prices, min_unit_micro, max_unit_micro,
           (10000 * (max_unit_micro - min_unit_micro))
             // greatest(min_unit_micro, 1) AS spread_bp
    FROM per_part WHERE n_prices >= 2
    ORDER BY spread_bp DESC, l_partkey LIMIT 100
    """,
)
def q_price_spread_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AI ai1 — unit-price spread audit: per part, how many distinct
    unit prices it sold at (micro-cents per unit, the exact truncated
    ratio) and the min→max spread in bp of the minimum — the top-100
    widest spreads are where pricing governance looks first (channel
    leakage, stale contracts, fat-finger entries).

    Scale: spelled as TWO explicit aggregation levels — (part, price)
    with a line count, then part — instead of ``countDistinct`` beside
    min/max, which Catalyst rewrites into an Expand that DOUBLES the
    map-side rows before the first exchange. The two-level form's first
    partial agg collapses duplicate prices early, and the second
    exchange moves only the deduped (part, price) pairs (plan-asserted
    Expand-free). TakeOrdered keeps 100."""
    li = load_table(spark, sf_dir, "lineitem")
    unit = F.expr(
        f"({_CENTS.format(col='l_extendedprice')} * 10000)"
        " div CAST(l_quantity AS BIGINT)"
    )
    per_price = (
        li.select(F.col("l_partkey").alias("p"), unit.alias("unit_micro"))
        .groupBy("p", "unit_micro")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    per_part = (
        per_price.groupBy("p")
        .agg(
            F.sum("cnt").cast("long").alias("n_lines"),
            F.count(F.lit(1)).cast("long").alias("n_prices"),
            F.min("unit_micro").cast("long").alias("min_unit_micro"),
            F.max("unit_micro").cast("long").alias("max_unit_micro"),
        )
        .where(F.col("n_prices") >= 2)
    )
    return (
        per_part.select(
            F.col("p").alias("l_partkey"),
            "n_lines",
            "n_prices",
            "min_unit_micro",
            "max_unit_micro",
            F.expr(
                "(10000 * (max_unit_micro - min_unit_micro))"
                " div greatest(min_unit_micro, 1)"
            ).alias("spread_bp"),
        )
        .orderBy(F.desc("spread_bp"), "l_partkey")
        .limit(100)
    )


@query(
    "q_discount_band_impact",
    oracle=f"""
    WITH d AS (
      SELECT {_BP.format(col="l_discount")} AS disc_bp,
             {_CENTS.format(col="l_extendedprice")} AS gross_cents,
             CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem
    ),
    banded AS (
      SELECT CASE WHEN disc_bp = 0 THEN 'a_none'
                  WHEN disc_bp <= 200 THEN 'b_le2pct'
                  WHEN disc_bp <= 500 THEN 'c_le5pct'
                  WHEN disc_bp <= 800 THEN 'd_le8pct'
                  ELSE 'e_gt8pct' END AS band,
             gross_cents, qty,
             (gross_cents * disc_bp) // 10000 AS disc_cents
      FROM d
    )
    SELECT band, CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(qty) AS BIGINT) AS qty,
           CAST(sum(gross_cents) AS BIGINT) AS gross_cents,
           CAST(sum(disc_cents) AS BIGINT) AS discount_cents,
           (10000 * CAST(sum(disc_cents) AS BIGINT))
             // CAST(sum(gross_cents) AS BIGINT) AS realized_disc_bp
    FROM banded GROUP BY 1 ORDER BY band
    """,
)
def q_discount_band_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AI ai2 — discount-band impact: lines bucketed by discount
    depth (none / ≤2% / ≤5% / ≤8% / >8%), with volume, gross cents, the
    exact discount given (``gross × disc_bp div 10⁴`` per line — the
    cent-grid rounding a billing system applies) and the band's realized
    discount rate in bp. The promo-spend decomposition.

    Scale: discount doubles → integer bp once, then one map-side-
    combined groupBy to 5 rows."""
    li = load_table(spark, sf_dir, "lineitem")
    d = li.select(
        F.expr(_BP.format(col="l_discount")).alias("disc_bp"),
        F.expr(_CENTS.format(col="l_extendedprice")).alias("gross_cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    band = (
        F.when(F.col("disc_bp") == 0, "a_none")
        .when(F.col("disc_bp") <= 200, "b_le2pct")
        .when(F.col("disc_bp") <= 500, "c_le5pct")
        .when(F.col("disc_bp") <= 800, "d_le8pct")
        .otherwise("e_gt8pct")
    )
    banded = d.select(
        band.alias("band"),
        "gross_cents",
        "qty",
        F.expr("(gross_cents * disc_bp) div 10000").alias("disc_cents"),
    )
    return (
        banded.groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum("qty").cast("long").alias("qty"),
            F.sum("gross_cents").cast("long").alias("gross_cents"),
            F.sum("disc_cents").cast("long").alias("discount_cents"),
        )
        .withColumn(
            "realized_disc_bp",
            F.expr("(10000 * discount_cents) div gross_cents"),
        )
        .orderBy("band")
    )


@query(
    "q_margin_by_brand",
    oracle=f"""
    WITH m AS (
      SELECT p.p_brand,
             {_CENTS.format(col="l.l_extendedprice")} AS revenue_cents,
             {_CENTS.format(col="p.p_retailprice")}
               * CAST(l.l_quantity AS BIGINT) AS list_cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    )
    SELECT p_brand, CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(revenue_cents) AS BIGINT) AS revenue_cents,
           CAST(sum(list_cents) AS BIGINT) AS list_cents,
           CAST(sum(revenue_cents) - sum(list_cents) AS BIGINT)
             AS realization_cents,
           (10000 * CAST(sum(revenue_cents) AS BIGINT))
             // CAST(sum(list_cents) AS BIGINT) AS realization_bp
    FROM m GROUP BY 1 ORDER BY p_brand
    """,
)
def q_margin_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AI ai3 — brand realization waterfall: per brand, actual
    revenue vs list value (retail price × quantity, both exact cents),
    the realization gap and the realization rate in bp — the "how far
    off list do we sell" report, by brand (q9's profit-lite answers the
    nation/year cut; this is the merchandising cut).

    Scale: part dimension broadcast; one partial-aggregated groupBy to
    |brands| rows; the fact is scanned once with only 3 columns read."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    m = li.join(
        F.broadcast(part.select("p_partkey", "p_brand", "p_retailprice")),
        li.l_partkey == F.col("p_partkey"),
    ).select(
        "p_brand",
        F.expr(_CENTS.format(col="l_extendedprice")).alias("revenue_cents"),
        (
            F.expr(_CENTS.format(col="p_retailprice"))
            * F.col("l_quantity").cast("long")
        ).alias("list_cents"),
    )
    return (
        m.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum("revenue_cents").cast("long").alias("revenue_cents"),
            F.sum("list_cents").cast("long").alias("list_cents"),
        )
        .select(
            "p_brand",
            "n_lines",
            "revenue_cents",
            "list_cents",
            (F.col("revenue_cents") - F.col("list_cents")).alias(
                "realization_cents"
            ),
            F.expr("(10000 * revenue_cents) div list_cents").alias(
                "realization_bp"
            ),
        )
        .orderBy("p_brand")
    )


@query(
    "q_price_index_laspeyres",
    oracle=f"""
    WITH py AS (
      SELECT l_partkey AS p,
             CAST(year(CAST(l_shipdate AS TIMESTAMP)) AS BIGINT) AS yr,
             (CAST(sum({_CENTS.format(col="l_extendedprice")}) AS BIGINT)
                * 10000) // CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
               AS price_micro,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem GROUP BY 1, 2
    ),
    base AS (
      SELECT p, price_micro AS p0, qty AS q0 FROM py
      WHERE yr = (SELECT min(yr) FROM py)
    ),
    joined AS (
      SELECT py.yr,
             sum(CAST(py.price_micro AS HUGEINT) * b.q0) AS num,
             sum(CAST(b.p0 AS HUGEINT) * b.q0) AS den,
             CAST(count(*) AS BIGINT) AS n_parts
      FROM py JOIN base b ON py.p = b.p
      GROUP BY 1
    )
    SELECT yr, n_parts, CAST((10000 * num) // den AS BIGINT) AS index_bp
    FROM joined ORDER BY yr
    """,
)
def q_price_index_laspeyres(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AI ai4 — Laspeyres price index: yearly price level vs the
    first shipping year, weighting each part's exact per-year unit
    price (``Σcents×10⁴ div Σqty`` micro-cents) by its BASE-year
    quantity — ``index_y = Σ p_y·q₀ / Σ p₀·q₀`` in bp. Only parts
    traded in both years enter year y's basket (each year's ratio uses
    its own matched denominator), the standard matched-sample
    convention. Overflow: the cross-multiplied basket sums exceed 2⁶³
    — the 10× probe caught ``10⁴·Σ(p·q₀)`` overflowing ALREADY AT
    sf0.1 (price_micro ~2×10⁹ × Σqty ~10³ × 2×10⁴ parts ≈ 4×10¹⁶,
    ×10⁴ ≈ 4×10²⁰) — so num/den accumulate in 128-bit integers
    (DECIMAL(38,0) in Spark, HUGEINT in DuckDB; identical truncated
    quotient, fuzz-matched) while everything fact-side stays BIGINT.
    The 128-bit arithmetic runs only on the bounded |parts|×|years|
    relation, never on the fact.

    Scale: one (part, year) partial agg over the fact, pinned with a
    localCheckpoint — Catalyst does not reuse common subplans, so
    without the pin the base-year slice, the 1-row min-year scalar and
    the index join would each RE-SCAN the fact (measured: 3 lineitem
    scans). With it the fact is read once and the self-join runs over
    the bounded |parts|×|years| relation; |years| output rows."""
    li = load_table(spark, sf_dir, "lineitem")
    py = li.groupBy(
        F.col("l_partkey").alias("p"),
        F.year("l_shipdate").cast("long").alias("yr"),
    ).agg(
        F.expr(
            f"(sum({_CENTS.format(col='l_extendedprice')}) * 10000)"
            " div sum(CAST(l_quantity AS BIGINT))"
        )
        .cast("long")
        .alias("price_micro"),
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"),
    ).localCheckpoint()  # |parts|x|years|; base/scalar/index reuse it
    base_yr = py.agg(F.min("yr").alias("y0"))
    base = (
        py.join(F.broadcast(base_yr), py.yr == F.col("y0"))
        .select("p", F.col("price_micro").alias("p0"), F.col("qty").alias("q0"))
    )
    dec = "decimal(38,0)"
    joined = (
        py.join(base, "p")
        .groupBy("yr")
        .agg(
            F.sum(
                F.col("price_micro").cast(dec) * F.col("q0").cast(dec)
            ).alias("num"),
            F.sum(F.col("p0").cast(dec) * F.col("q0").cast(dec)).alias("den"),
            F.count(F.lit(1)).cast("long").alias("n_parts"),
        )
    )
    return joined.select(
        "yr",
        "n_parts",
        F.expr(
            "CAST((CAST(10000 AS DECIMAL(38,0)) * num) div den AS BIGINT)"
        ).alias("index_bp"),
    ).orderBy("yr")


@query(
    "q_tax_burden_profile",
    oracle=f"""
    WITH t AS (
      SELECT l_returnflag AS rf, l_linestatus AS ls,
             {_CENTS.format(col="l_extendedprice")} AS gross_cents,
             {_BP.format(col="l_discount")} AS disc_bp,
             {_BP.format(col="l_tax")} AS tax_bp
      FROM lineitem
    ),
    x AS (
      SELECT rf, ls, gross_cents,
             gross_cents - (gross_cents * disc_bp) // 10000 AS net_cents,
             ((gross_cents - (gross_cents * disc_bp) // 10000) * tax_bp)
               // 10000 AS tax_cents
      FROM t
    )
    SELECT rf, ls, CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(gross_cents) AS BIGINT) AS gross_cents,
           CAST(sum(net_cents) AS BIGINT) AS net_cents,
           CAST(sum(tax_cents) AS BIGINT) AS tax_cents,
           (10000 * CAST(sum(tax_cents) AS BIGINT))
             // CAST(sum(net_cents) AS BIGINT) AS effective_tax_bp
    FROM x GROUP BY 1, 2 ORDER BY rf, ls
    """,
)
def q_tax_burden_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AI ai5 — tax-burden profile: per (returnflag, linestatus)
    cell, exact gross → net (post-discount) → tax cents with the cell's
    effective tax rate in bp, rounding at the per-line cent grid in the
    order a billing engine does (discount first, tax on net). The
    fiscal complement of d1's pricing summary.

    Scale: two bp conversions + cent arithmetic map-side, one groupBy
    to ≤9 cells."""
    li = load_table(spark, sf_dir, "lineitem")
    t = li.select(
        F.col("l_returnflag").alias("rf"),
        F.col("l_linestatus").alias("ls"),
        F.expr(_CENTS.format(col="l_extendedprice")).alias("gross_cents"),
        F.expr(_BP.format(col="l_discount")).alias("disc_bp"),
        F.expr(_BP.format(col="l_tax")).alias("tax_bp"),
    )
    x = t.select(
        "rf",
        "ls",
        "gross_cents",
        F.expr("gross_cents - (gross_cents * disc_bp) div 10000").alias("net_cents"),
        F.expr(
            "((gross_cents - (gross_cents * disc_bp) div 10000) * tax_bp) div 10000"
        ).alias("tax_cents"),
    )
    return (
        x.groupBy("rf", "ls")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum("gross_cents").cast("long").alias("gross_cents"),
            F.sum("net_cents").cast("long").alias("net_cents"),
            F.sum("tax_cents").cast("long").alias("tax_cents"),
        )
        .withColumn(
            "effective_tax_bp", F.expr("(10000 * tax_cents) div net_cents")
        )
        .orderBy("rf", "ls")
    )
