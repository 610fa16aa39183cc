"""Newsvendor service levels — empirical-quantile stocking analysis
(SURVEY.md §2.CE, round 11).

"How much stock covers 95% of months, and what does the cost ratio
say" — the classic newsvendor / service-level family over per-brand
monthly demand, beside §2.BK's ABC-XYZ variability classes (which
CLASSIFY a series but never recommend a level), §2.AE's FIFO flows
(execution, not planning) and §2.BZ's pooling benefit (variance,
not quantiles):

- ce1: the demand-quantile census — per brand, the empirical
  order-statistic stock levels at 50/80/90/95/99% service.
- ce2: the fill-rate backtest — hold the p95 level, replay the
  series: realized fill in bp and stockout months.
- ce3: the critical-fractile table — for four (underage, overage)
  cost ratios, the textbook newsvendor quantile cu/(cu+co) and its
  exact-rank stock level.
- ce4: the pooled-stock saving — Σ per-brand p95 stocks vs the p95
  of the company-pooled series (quantiles are NOT subadditive, so
  the saving is signed and published sign-explicitly).

THE SERIES MODEL (shared with §2.BZ): demand x_{b,t} = Σ round(qty)
per brand per ship-month; the month axis is the GLOBAL calendar T
with implicit zeros. ORDER STATISTICS OVER THE DENSE SERIES WITHOUT
DENSIFYING — the suite's device: with z_b = T − observed_months(b)
implicit zero months, the k-th smallest dense value is

    0                                if k ≤ z_b
    the (k − z_b)-th smallest OBSERVED value otherwise

so a partitioned rank window over the SPARSE census (≤ |months| rows
per brand) plus the closed form replaces any dense-grid
materialization. Service ranks are exact rational ceilings,
``k(q) = ceil(T·cu/(cu+co))`` for fractile cu/(cu+co) and
``k(level_bp) = ceil(T·level_bp/10⁴) = (T·level_bp + 9999) div 10⁴``
— never a float quantile (published levels are values that actually
occurred, or exact zeros). The backtest is sparse-safe the same way:
``filled = Σ_t min(x_t, s)`` gets 0 from every zero month, and a
zero month can never stock out.

Headroom: monthly per-brand quantities ≤ ~10⁸ at sf1000; every
published value is a demand quantity or bp — BIGINT throughout.

Spark-first shape, sized for 100 TB: ONE fact pass (lineitem with
the part dim attached UNHINTED — AQE broadcasts while it fits, the
anova._census adjudication) partial-aggregates to the
(brand, month) census — ≤ |brands|·|months| ≈ 2.1k rows at ANY SF,
checkpointed; ranks are windows PARTITIONED BY BRAND over ≤ 84 rows;
the level/cost relations (5 and 4 rows) broadcast; ce4 reduces the
same census twice. Nothing after the first aggregation grows with
the fact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_tables
from recommendersystems_bigdata_spark.registry import query

_QTY = "CAST(floor(l_quantity + 0.5) AS BIGINT)"

_LEVELS = (5000, 8000, 9000, 9500, 9900)
_COSTS = ((9, 1), (4, 1), (1, 1), (1, 4))

# DuckDB: sparse (brand, month, qty) census + global T + per-brand
# ranked observed values with the zero-offset closed form.
_CEN_DUCK = f"""
base AS (
  SELECT p.p_brand AS brand,
         CAST(year(l.l_shipdate) * 12 + month(l.l_shipdate) AS BIGINT)
           AS t,
         CAST(sum({_QTY.replace('l_quantity', 'l.l_quantity')})
              AS BIGINT) AS qty
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
),
cal AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS months FROM base),
ranked AS (
  SELECT brand, qty,
         row_number() OVER (PARTITION BY brand ORDER BY qty, t)
           AS rn
  FROM base
),
zeros AS (
  SELECT brand, CAST(count(*) AS BIGINT) AS obs,
         (SELECT months FROM cal) - CAST(count(*) AS BIGINT) AS z
  FROM base GROUP BY 1
)
"""

# the k-th smallest DENSE value for a (brand, k) relation named `want`
# (columns brand, lvl, k): zero if k <= z, else ranked value k - z
_PICK_DUCK = """
picked AS (
  SELECT w.brand, w.lvl, w.k, z.obs, z.z,
         CASE WHEN w.k <= z.z THEN 0 ELSE r.qty END AS stock
  FROM want w
  JOIN zeros z ON w.brand = z.brand
  LEFT JOIN ranked r ON r.brand = w.brand AND r.rn = w.k - z.z
)
"""


def _base(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part = load_tables(spark, sf_dir, "lineitem", "part")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            (F.year("l_shipdate") * 12 + F.month("l_shipdate"))
            .cast("long")
            .alias("t"),
        )
        .agg(F.expr(f"CAST(sum({_QTY}) AS BIGINT)").alias("qty"))
        .localCheckpoint()
    )


def _parts(base: DataFrame):
    """(cal 1-row, ranked, zeros) shared relations."""
    cal = base.agg(
        F.expr("CAST(count(DISTINCT t) AS BIGINT)").alias("months")
    )
    ranked = base.select(
        "brand",
        "qty",
        F.row_number()
        .over(Window.partitionBy("brand").orderBy("qty", "t"))
        .cast("long")
        .alias("rn"),
    )
    zeros = (
        base.groupBy("brand")
        .agg(F.count(F.lit(1)).cast("long").alias("obs"))
        .crossJoin(F.broadcast(cal))
        .select("brand", "obs", F.expr("months - obs").alias("z"))
    )
    return cal, ranked, zeros


def _pick(want: DataFrame, ranked: DataFrame, zeros: DataFrame) -> DataFrame:
    """Attach the k-th smallest dense value to (brand, lvl, k) rows."""
    r = ranked.select(
        F.col("brand").alias("rbrand"),
        F.col("qty").alias("rqty"),
        "rn",
    )
    return (
        want.join(zeros, "brand")
        .join(
            r,
            (F.col("rbrand") == F.col("brand"))
            & (F.col("rn") == F.expr("k - z")),
            "left",
        )
        .select(
            "brand",
            "lvl",
            "k",
            "obs",
            "z",
            F.expr("CASE WHEN k <= z THEN 0 ELSE rqty END").alias(
                "stock"
            ),
        )
    )


@query(
    "q_news_demand_quantiles",
    oracle=f"""
    WITH {_CEN_DUCK},
    want AS (
      SELECT z.brand, l.lvl,
             (((SELECT months FROM cal) * l.lvl + 9999) // 10000) AS k
      FROM zeros z
      CROSS JOIN (SELECT CAST(unnest({list(_LEVELS)}) AS BIGINT)
                    AS lvl) l
    ),
    {_PICK_DUCK}
    SELECT brand, CAST((SELECT months FROM cal) AS BIGINT) AS months,
           max(obs) AS observed_months,
           CAST(max(CASE WHEN lvl = 5000 THEN stock END) AS BIGINT)
             AS stock_p50,
           CAST(max(CASE WHEN lvl = 8000 THEN stock END) AS BIGINT)
             AS stock_p80,
           CAST(max(CASE WHEN lvl = 9000 THEN stock END) AS BIGINT)
             AS stock_p90,
           CAST(max(CASE WHEN lvl = 9500 THEN stock END) AS BIGINT)
             AS stock_p95,
           CAST(max(CASE WHEN lvl = 9900 THEN stock END) AS BIGINT)
             AS stock_p99
    FROM picked GROUP BY brand ORDER BY brand
    """,
)
def q_news_demand_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.CE ce1 — the demand-quantile census: per brand, the exact
    empirical order-statistic stock level at 50/80/90/95/99% service
    over the DENSE monthly series (zero months via the closed form —
    see the module doc; every published level is a demand that
    actually occurred, or an exact zero).

    Scale: brand-partitioned rank windows over ≤ |months| rows; the
    5-level relation broadcasts."""
    base = _base(spark, sf_dir)
    cal, ranked, zeros = _parts(base)
    spark_ = base.sparkSession
    levels = spark_.createDataFrame(
        [(lv,) for lv in _LEVELS], "lvl bigint"
    )
    want = (
        zeros.select("brand")
        .crossJoin(F.broadcast(levels))
        .crossJoin(F.broadcast(cal))
        .select(
            "brand",
            "lvl",
            F.expr("(months * lvl + 9999) div 10000").alias("k"),
        )
    )
    picked = _pick(want, ranked, zeros)
    agg = picked.groupBy("brand").agg(
        F.expr("CAST(max(obs) AS BIGINT)").alias("observed_months"),
        *[
            F.expr(
                f"CAST(max(CASE WHEN lvl = {lv} THEN stock END)"
                f" AS BIGINT)"
            ).alias(f"stock_p{lv // 100}")
            for lv in _LEVELS
        ],
    )
    return (
        agg.crossJoin(F.broadcast(cal))
        .select(
            "brand",
            "months",
            "observed_months",
            "stock_p50",
            "stock_p80",
            "stock_p90",
            "stock_p95",
            "stock_p99",
        )
        .orderBy("brand")
    )


@query(
    "q_news_fill_rate_backtest",
    oracle=f"""
    WITH {_CEN_DUCK},
    want AS (
      SELECT z.brand, CAST(9500 AS BIGINT) AS lvl,
             (((SELECT months FROM cal) * 9500 + 9999) // 10000) AS k
      FROM zeros z
    ),
    {_PICK_DUCK}
    SELECT p.brand, CAST(p.stock AS BIGINT) AS stock_p95,
           CAST(sum(b.qty) AS BIGINT) AS demand_total,
           CAST(sum(least(b.qty, p.stock)) AS BIGINT) AS filled_total,
           CAST((10000 * sum(least(b.qty, p.stock))) // sum(b.qty)
                AS BIGINT) AS fill_bp,
           CAST(sum(CASE WHEN b.qty > p.stock THEN 1 ELSE 0 END)
                AS BIGINT) AS stockout_months
    FROM picked p JOIN base b ON p.brand = b.brand
    GROUP BY 1, 2 ORDER BY p.brand
    """,
)
def q_news_fill_rate_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.CE ce2 — the fill-rate backtest: hold each brand's p95
    stock level and replay the series — total demand, units filled
    (``Σ min(x_t, s)`` — zero months add nothing, sparse-safe),
    realized fill in bp, and stockout months (a zero month can never
    stock out, so the observed census suffices).

    Scale: the p95 pick rejoins the sparse census brand-wise —
    census-side forever."""
    base = _base(spark, sf_dir)
    cal, ranked, zeros = _parts(base)
    want = zeros.crossJoin(F.broadcast(cal)).select(
        "brand",
        F.lit(9500).cast("long").alias("lvl"),
        F.expr("(months * 9500 + 9999) div 10000").alias("k"),
    )
    picked = _pick(want, ranked, zeros).select(
        F.col("brand").alias("pbrand"), F.col("stock")
    )
    return (
        picked.join(base, F.col("pbrand") == base.brand)
        .groupBy("pbrand", "stock")
        .agg(
            F.expr("CAST(sum(qty) AS BIGINT)").alias("demand_total"),
            F.expr("CAST(sum(least(qty, stock)) AS BIGINT)").alias(
                "filled_total"
            ),
            F.expr(
                "CAST((10000 * sum(least(qty, stock))) div sum(qty)"
                " AS BIGINT)"
            ).alias("fill_bp"),
            F.expr(
                "CAST(sum(CASE WHEN qty > stock THEN 1 ELSE 0 END)"
                " AS BIGINT)"
            ).alias("stockout_months"),
        )
        .select(
            F.col("pbrand").alias("brand"),
            F.col("stock").cast("long").alias("stock_p95"),
            "demand_total",
            "filled_total",
            "fill_bp",
            "stockout_months",
        )
        .orderBy("brand")
    )


@query(
    "q_news_critical_fractile",
    oracle=f"""
    WITH {_CEN_DUCK},
    costs AS (
      SELECT * FROM (VALUES {', '.join(f'({cu}, {co})' for cu, co in _COSTS)})
        AS v(cu, co)
    ),
    want AS (
      SELECT z.brand,
             CAST(c.cu * 100 + c.co AS BIGINT) AS lvl,
             (((SELECT months FROM cal) * c.cu + c.cu + c.co - 1)
              // (c.cu + c.co)) AS k
      FROM zeros z CROSS JOIN costs c
    ),
    {_PICK_DUCK}
    SELECT brand,
           CAST(lvl // 100 AS BIGINT) AS cost_underage,
           CAST(lvl % 100 AS BIGINT) AS cost_overage,
           CAST((10000 * (lvl // 100)) // (lvl // 100 + lvl % 100)
                AS BIGINT) AS fractile_bp,
           CAST(k AS BIGINT) AS service_rank,
           CAST(stock AS BIGINT) AS stock
    FROM picked ORDER BY brand, cost_underage DESC, cost_overage
    """,
)
def q_news_critical_fractile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.CE ce3 — the critical-fractile table: for each (underage,
    overage) cost pair, the textbook newsvendor quantile cu/(cu+co)
    (its rank an exact RATIONAL ceiling — ``ceil(T·cu/(cu+co))`` —
    so no bp round-trip ever truncates twice) and the stock level at
    that rank. The (cu, co) pair is carried through the shared pick
    join encoded as ``lvl = 100·cu + co`` and decoded at publish.

    Scale: a 4-row cost relation broadcast against the brand census;
    the same partitioned rank pick."""
    base = _base(spark, sf_dir)
    cal, ranked, zeros = _parts(base)
    spark_ = base.sparkSession
    costs = spark_.createDataFrame(
        list(_COSTS), "cu bigint, co bigint"
    )
    want = (
        zeros.select("brand")
        .crossJoin(F.broadcast(costs))
        .crossJoin(F.broadcast(cal))
        .select(
            "brand",
            F.expr("cu * 100 + co").alias("lvl"),
            F.expr("(months * cu + cu + co - 1) div (cu + co)").alias(
                "k"
            ),
        )
    )
    picked = _pick(want, ranked, zeros)
    return (
        picked.select(
            "brand",
            F.expr("CAST(lvl div 100 AS BIGINT)").alias(
                "cost_underage"
            ),
            F.expr("CAST(lvl % 100 AS BIGINT)").alias("cost_overage"),
            F.expr(
                "CAST((10000 * (lvl div 100))"
                " div (lvl div 100 + lvl % 100) AS BIGINT)"
            ).alias("fractile_bp"),
            F.col("k").cast("long").alias("service_rank"),
            F.col("stock").cast("long").alias("stock"),
        )
        .orderBy("brand", F.col("cost_underage").desc(), "cost_overage")
    )


@query(
    "q_news_pool_stock_saving",
    oracle=f"""
    WITH {_CEN_DUCK},
    want AS (
      SELECT z.brand, CAST(9500 AS BIGINT) AS lvl,
             (((SELECT months FROM cal) * 9500 + 9999) // 10000) AS k
      FROM zeros z
    ),
    {_PICK_DUCK},
    per_brand AS (SELECT CAST(sum(stock) AS BIGINT) AS sum_stock,
                         CAST(count(*) AS BIGINT) AS brands
                  FROM picked),
    pooled_series AS (
      SELECT t, CAST(sum(qty) AS BIGINT) AS qty FROM base GROUP BY 1
    ),
    pooled_ranked AS (
      SELECT qty, row_number() OVER (ORDER BY qty, t) AS rn
      FROM pooled_series
    ),
    pooled_pick AS (
      SELECT qty AS pooled_stock FROM pooled_ranked
      WHERE rn = (((SELECT months FROM cal) * 9500 + 9999) // 10000)
    )
    SELECT b.brands, b.sum_stock, p.pooled_stock,
           CAST(b.sum_stock - p.pooled_stock AS BIGINT) AS saving,
           CAST(CASE WHEN b.sum_stock = 0 THEN NULL
                WHEN b.sum_stock >= p.pooled_stock
                THEN (10000 * (b.sum_stock - p.pooled_stock))
                     // b.sum_stock
                ELSE -((10000 * (p.pooled_stock - b.sum_stock))
                       // b.sum_stock) END AS BIGINT) AS saving_bp
    FROM per_brand b CROSS JOIN pooled_pick p
    """,
)
def q_news_pool_stock_saving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.CE ce4 — the pooled-stock saving: Σ per-brand p95 stocks vs
    the p95 of the company-pooled monthly series (the pooled series
    has no zero months whenever any brand ships, so its rank needs no
    offset — but the rank is the same exact ceiling). Quantiles are
    NOT subadditive, so the saving is signed (§2.BT sign-split) —
    pooling can in principle RAISE the level.

    Scale: two reductions of the same checkpointed census; the
    pooled rank is a window over ≤ |months| rows."""
    base = _base(spark, sf_dir)
    cal, ranked, zeros = _parts(base)
    want = zeros.crossJoin(F.broadcast(cal)).select(
        "brand",
        F.lit(9500).cast("long").alias("lvl"),
        F.expr("(months * 9500 + 9999) div 10000").alias("k"),
    )
    per_brand = _pick(want, ranked, zeros).agg(
        F.count(F.lit(1)).cast("long").alias("brands"),
        F.expr("CAST(sum(stock) AS BIGINT)").alias("sum_stock"),
    )
    pooled = base.groupBy("t").agg(
        F.expr("CAST(sum(qty) AS BIGINT)").alias("qty")
    )
    pooled_ranked = pooled.select(
        "qty",
        F.row_number()
        .over(Window.orderBy("qty", "t"))
        .cast("long")
        .alias("rn"),
    )
    pooled_pick = (
        pooled_ranked.crossJoin(F.broadcast(cal))
        .filter("rn = (months * 9500 + 9999) div 10000")
        .select(F.col("qty").alias("pooled_stock"))
    )
    return per_brand.crossJoin(pooled_pick).select(
        "brands",
        "sum_stock",
        "pooled_stock",
        F.expr("CAST(sum_stock - pooled_stock AS BIGINT)").alias(
            "saving"
        ),
        F.expr(
            "CAST(CASE WHEN sum_stock = 0 THEN NULL"
            " WHEN sum_stock >= pooled_stock"
            " THEN (10000 * (sum_stock - pooled_stock)) div sum_stock"
            " ELSE -((10000 * (pooled_stock - sum_stock))"
            " div sum_stock) END AS BIGINT)"
        ).alias("saving_bp"),
    )
