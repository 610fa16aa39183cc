"""Lead–lag cross-correlation screens between two daily series
(SURVEY.md §2.CA, round 11).

"Does order intake LEAD shipment volume, and by how many days" — the
cross-series timing family over the daily order-count and daily
shipped-line-count series, beside §2.AA's single-series
autocorrelation (one series against itself) and §2.BD's contemporan-
eous correlation (no lag axis):

- ca1: the aligned daily pair census — the dense order-calendar
  spine with both zero-filled counts (the series the screen reads).
- ca2: the cross-correlation lag table — for each lag ℓ ∈ {0, 7, …,
  91} days, the reduced Pearson components and the signed r² in
  micro units.
- ca3: the best lag — the argmax of the signed r² (ties → smallest
  lag) with the lead/coincident/uncorrelated verdict.
- ca4: the same lag table on FIRST DIFFERENCES — the standard
  spurious-trend guard (two series that merely both grow correlate
  at every lag; their day-over-day changes do not).

THE SERIES MODEL (engine-free): x_t = orders placed on day t, y_t =
lineitem rows shipped on day t; the evaluation spine is the DENSE
order calendar D = [min(o_orderdate), max(o_orderdate)] (missing days
are zeros), fixed across lags; y is evaluated ON THAT SAME spine and
the shifted lookup y_{t+ℓ} is zero wherever t+ℓ falls outside D —
the screen compares strictly within the common calendar (shipments
past the last order day are out of frame by convention). With
n = |D|:

    num(ℓ) = n·Σ x_t·y_{t+ℓ} − Σx·Σy(ℓ)      (signed, exact)
    dx     = n·Σx² − (Σx)²                    (lag-free, ≥ 0)
    dy(ℓ)  = n·Σy² − (Σy)²                    (≥ 0)

REDUCED-COMPONENT SPELLING (the §2.BO headroom device): the published
components divide by n first — ``num_r = sign(num)·(|num| div n)``,
``dx_r = dx div n``, ``dy_r = dy div n`` — then

    r2_signed_micro = sign(num) · (10⁶·num_r²) div (dx_r·dy_r)
                      (NULL when dx_r = 0 or dy_r = 0 — a constant
                       series, where correlation is undefined)

Both engines publish the IDENTICAL truncated spelling (sign-explicit
divisions keep Spark ``div`` ≡ DuckDB ``//``; each n-reduction loses
< 1 part in ~10¹⁵ at sf1000 — decades beneath micro precision — and
keeps 10⁶·num_r² ≈ 1.3·10³⁷ inside decimal(38,0)/HUGEINT where the
full-scale 10⁶·num² ≈ 7·10⁴³ would overflow past ~sf30). ca4's
differences are signed series; all sums are plain integer arithmetic
and only the final divisions carry the sign-split.

Spark-first shape, sized for 100 TB: TWO fact passes partial-
aggregate orders and lineitem to daily censuses (≤ |calendar| rows —
~2.4k over seven years, CALENDAR-bounded, independent of SF); the
spine × 14-lag expansion, the shifted lookups (equi-joins on the
lagged date) and every correlation are calendar-side arithmetic on
≤ 34k rows forever. The 14-row lag relation broadcasts; no window
runs unpartitioned over anything larger than the bounded spine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from recommendersystems_bigdata_spark.catalog import load_table, load_tables
from recommendersystems_bigdata_spark.registry import query

_DEC = "decimal(38,0)"

# DuckDB: dense spine + zero-filled daily censuses + the lag relation.
_SERIES_DUCK = """
xb AS (
  SELECT CAST(min(CAST(o_orderdate AS DATE)) AS DATE) AS d0,
         CAST(max(CAST(o_orderdate AS DATE)) AS DATE) AS d1
  FROM orders
),
spine AS (
  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
           AS d
  FROM xb
),
xs AS (
  SELECT CAST(o_orderdate AS DATE) AS d, CAST(count(*) AS BIGINT) AS x
  FROM orders GROUP BY 1
),
ys AS (
  SELECT CAST(l_shipdate AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
  FROM lineitem GROUP BY 1
),
series AS (
  SELECT s.d, COALESCE(x.x, 0) AS x, COALESCE(y.y, 0) AS y
  FROM spine s
  LEFT JOIN xs x ON s.d = x.d
  LEFT JOIN ys y ON s.d = y.d
),
lags AS (SELECT CAST(unnest(range(0, 92, 7)) AS BIGINT) AS lag)
"""

# per-lag reduced components + signed micro r² over a (lag, x, yl)
# relation named `pairs` — CTE chain and final SELECT split so ca3 can
# wrap the SELECT in its own CTE
_XCORR_CTES_DUCK = """
sums AS (
  SELECT lag, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(x) AS HUGEINT) AS sx,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(sum(yl) AS HUGEINT) AS sy,
         CAST(sum(CAST(yl AS HUGEINT) * yl) AS HUGEINT) AS syy,
         CAST(sum(CAST(x AS HUGEINT) * yl) AS HUGEINT) AS sxy
  FROM pairs GROUP BY 1
),
comps AS (
  SELECT lag, n,
         CASE WHEN n * sxy - sx * sy >= 0
              THEN (n * sxy - sx * sy) // n
              ELSE -((sx * sy - n * sxy) // n) END AS num_r,
         (n * sxx - sx * sx) // n AS dx_r,
         (n * syy - sy * sy) // n AS dy_r
  FROM sums
)
"""

_XCORR_SELECT_DUCK = """
SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n,
       CAST(num_r AS BIGINT) AS num_r,
       CAST(dx_r AS BIGINT) AS dx_r,
       CAST(dy_r AS BIGINT) AS dy_r,
       CAST(CASE WHEN dx_r = 0 OR dy_r = 0 THEN NULL
            WHEN num_r >= 0
            THEN (1000000 * num_r * num_r) // (dx_r * dy_r)
            ELSE -((1000000 * num_r * num_r) // (dx_r * dy_r))
            END AS BIGINT) AS r2_signed_micro
FROM comps
"""


def _series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dense zero-filled (d, x, y) daily census, checkpointed."""
    orders, li = load_tables(spark, sf_dir, "orders", "lineitem")
    bounds = orders.agg(
        F.expr("CAST(min(CAST(o_orderdate AS DATE)) AS DATE)").alias("d0"),
        F.expr("CAST(max(CAST(o_orderdate AS DATE)) AS DATE)").alias("d1"),
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("d")
    )
    xs = orders.groupBy(
        F.expr("CAST(o_orderdate AS DATE)").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    ys = li.groupBy(
        F.expr("CAST(l_shipdate AS DATE)").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    return (
        spine.join(xs, "d", "left")
        .join(ys, "d", "left")
        .select(
            "d",
            F.expr("COALESCE(x, 0)").alias("x"),
            F.expr("COALESCE(y, 0)").alias("y"),
        )
        .localCheckpoint()
    )


def _xcorr(pairs: DataFrame) -> DataFrame:
    """Per-lag reduced components + signed micro r² (see module doc)."""
    sums = pairs.groupBy("lag").agg(
        F.expr(f"CAST(count(*) AS {_DEC})").alias("n"),
        F.expr(f"CAST(sum(x) AS {_DEC})").alias("sx"),
        F.expr(f"CAST(sum(CAST(x AS {_DEC}) * x) AS {_DEC})").alias("sxx"),
        F.expr(f"CAST(sum(yl) AS {_DEC})").alias("sy"),
        F.expr(f"CAST(sum(CAST(yl AS {_DEC}) * yl) AS {_DEC})").alias(
            "syy"
        ),
        F.expr(f"CAST(sum(CAST(x AS {_DEC}) * yl) AS {_DEC})").alias(
            "sxy"
        ),
    )
    comps = sums.select(
        "lag",
        "n",
        F.expr(
            "CASE WHEN n * sxy - sx * sy >= 0"
            " THEN (n * sxy - sx * sy) div n"
            " ELSE -((sx * sy - n * sxy) div n) END"
        ).alias("num_r"),
        F.expr("(n * sxx - sx * sx) div n").alias("dx_r"),
        F.expr("(n * syy - sy * sy) div n").alias("dy_r"),
    )
    return comps.select(
        F.col("lag").cast("long").alias("lag"),
        F.col("n").cast("long").alias("n"),
        F.col("num_r").cast("long").alias("num_r"),
        F.col("dx_r").cast("long").alias("dx_r"),
        F.col("dy_r").cast("long").alias("dy_r"),
        F.expr(
            f"CAST(CASE WHEN dx_r = 0 OR dy_r = 0 THEN NULL"
            f" WHEN num_r >= 0"
            f" THEN (CAST(1000000 AS {_DEC}) * num_r * num_r)"
            f" div (CAST(dx_r AS {_DEC}) * dy_r)"
            f" ELSE -((CAST(1000000 AS {_DEC}) * num_r * num_r)"
            f" div (CAST(dx_r AS {_DEC}) * dy_r))"
            f" END AS BIGINT)"
        ).alias("r2_signed_micro"),
    )


def _lagged_pairs(series: DataFrame) -> DataFrame:
    """(lag, x, yl): the spine joined to y at d+lag, zero-filled."""
    spark = series.sparkSession
    lags = spark.range(1).select(
        F.explode(F.expr("sequence(0, 91, 7)")).alias("lag")
    )
    ys = series.select(F.col("d").alias("dy"), F.col("y").alias("yv"))
    return (
        series.select("d", "x")
        .crossJoin(F.broadcast(lags))
        .join(
            ys,
            F.expr("dy = date_add(d, CAST(lag AS INT))"),
            "left",
        )
        .select("lag", "x", F.expr("COALESCE(yv, 0)").alias("yl"))
    )


@query(
    "q_leadlag_daily_series",
    oracle=f"""
    WITH {_SERIES_DUCK}
    SELECT CAST(d AS VARCHAR) AS d, x AS orders_cnt, y AS shipped_cnt
    FROM series ORDER BY d
    """,
)
def q_leadlag_daily_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.CA ca1 — the aligned daily pair census: the dense order-
    calendar spine with zero-filled order and shipped-line counts —
    the exact series every other key in the suite consumes.

    Scale: two fact passes to calendar-bounded censuses (~2.4k rows
    at ANY SF); the spine join is calendar-side."""
    return (
        _series(spark, sf_dir)
        .select(
            F.col("d").cast("string").alias("d"),
            F.col("x").alias("orders_cnt"),
            F.col("y").alias("shipped_cnt"),
        )
        .orderBy("d")
    )


@query(
    "q_leadlag_xcorr_table",
    oracle=f"""
    WITH {_SERIES_DUCK},
    pairs AS (
      SELECT l.lag, s.x,
             COALESCE(y2.y, 0) AS yl
      FROM series s
      CROSS JOIN lags l
      LEFT JOIN series y2 ON y2.d = s.d + to_days(CAST(l.lag AS INT))
    ),
    {_XCORR_CTES_DUCK}
    {_XCORR_SELECT_DUCK}
    ORDER BY lag
    """,
)
def q_leadlag_xcorr_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.CA ca2 — the cross-correlation lag table: for each lag
    ℓ ∈ {0, 7, …, 91}, the n-reduced Pearson components and the
    sign-explicit truncated r² in micro units (the module-doc
    spelling; NULL on a constant series).

    Scale: the spine×14 expansion and every sum are calendar-side;
    the 14-row lag relation broadcasts."""
    return _xcorr(_lagged_pairs(_series(spark, sf_dir))).orderBy("lag")


@query(
    "q_leadlag_best_lag",
    oracle=f"""
    WITH {_SERIES_DUCK},
    pairs AS (
      SELECT l.lag, s.x,
             COALESCE(y2.y, 0) AS yl
      FROM series s
      CROSS JOIN lags l
      LEFT JOIN series y2 ON y2.d = s.d + to_days(CAST(l.lag AS INT))
    ),
    {_XCORR_CTES_DUCK},
    tab AS ({_XCORR_SELECT_DUCK}),
    best AS (
      SELECT *, row_number() OVER (
               ORDER BY r2_signed_micro DESC NULLS LAST, lag) AS rn
      FROM tab
    )
    SELECT lag AS best_lag, n, num_r, r2_signed_micro,
           CASE WHEN r2_signed_micro IS NULL
                     OR r2_signed_micro <= 0 THEN 'uncorrelated_or_negative'
                WHEN lag = 0 THEN 'coincident'
                ELSE 'x_leads_y' END AS verdict
    FROM best WHERE rn = 1
    """,
)
def q_leadlag_best_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.CA ca3 — the best lag: the argmax of the signed micro r²
    over the 14-lag table (ties → smallest lag; NULLs last), with the
    lead/coincident/uncorrelated verdict — "orders lead shipments by
    ℓ days" as one deterministic row.

    Scale: a top-1 over 14 calendar-side rows."""
    tab = _xcorr(_lagged_pairs(_series(spark, sf_dir)))
    from pyspark.sql import Window

    w = Window.orderBy(
        F.col("r2_signed_micro").desc_nulls_last(), F.col("lag")
    )
    return (
        tab.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select(
            F.col("lag").alias("best_lag"),
            "n",
            "num_r",
            "r2_signed_micro",
            F.expr(
                "CASE WHEN r2_signed_micro IS NULL"
                " OR r2_signed_micro <= 0 THEN 'uncorrelated_or_negative'"
                " WHEN lag = 0 THEN 'coincident'"
                " ELSE 'x_leads_y' END"
            ).alias("verdict"),
        )
    )


@query(
    "q_leadlag_diff_xcorr",
    oracle=f"""
    WITH {_SERIES_DUCK},
    diffs AS (
      SELECT cur.d, cur.x - prev.x AS x, cur.y - prev.y AS y
      FROM series cur
      JOIN series prev ON cur.d = prev.d + to_days(1)
    ),
    pairs AS (
      SELECT l.lag, dd.x,
             COALESCE(d2.y, 0) AS yl
      FROM diffs dd
      CROSS JOIN lags l
      LEFT JOIN diffs d2 ON d2.d = dd.d + to_days(CAST(l.lag AS INT))
    ),
    {_XCORR_CTES_DUCK}
    {_XCORR_SELECT_DUCK}
    ORDER BY lag
    """,
)
def q_leadlag_diff_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.CA ca4 — the lag table on FIRST DIFFERENCES (Δx_t = x_t −
    x_{t−1} over the dense spine, likewise Δy; the shifted lookup now
    reads the DIFFERENCE series and zero-fills off its end) — the
    spurious-trend guard: level series that merely both grow
    correlate everywhere, their changes do not. All sums are signed
    integer arithmetic; only the final divisions carry the §2.BT
    sign-split.

    Scale: a consecutive-day equi-join on the calendar spine (never a
    single-partition window), then the ca2 machinery."""
    series = _series(spark, sf_dir)
    cur = series.select("d", "x", "y")
    prev = series.select(
        F.expr("date_add(d, 1)").alias("d"),
        F.col("x").alias("px"),
        F.col("y").alias("py"),
    )
    diffs = cur.join(prev, "d").select(
        "d",
        F.expr("x - px").alias("x"),
        F.expr("y - py").alias("y"),
    )
    spark_ = series.sparkSession
    lags = spark_.range(1).select(
        F.explode(F.expr("sequence(0, 91, 7)")).alias("lag")
    )
    d2 = diffs.select(F.col("d").alias("dy"), F.col("y").alias("yv"))
    pairs = (
        diffs.select("d", "x")
        .crossJoin(F.broadcast(lags))
        .join(
            d2,
            F.expr("dy = date_add(d, CAST(lag AS INT))"),
            "left",
        )
        .select("lag", "x", F.expr("COALESCE(yv, 0)").alias("yl"))
    )
    return _xcorr(pairs).orderBy("lag")
