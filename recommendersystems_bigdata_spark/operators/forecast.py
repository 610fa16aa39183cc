"""Forecast backtesting (SURVEY.md §2.AM, round 9).

The demand-planning feedback loop a revenue warehouse runs every cycle:
backtest simple reference models (seasonal-naive lag-12 and trailing
3-month moving average) against realized monthly revenue, then score
them — MAE, signed bias, weighted MAPE, the cumulative tracking signal
(the classic "is the forecast drifting?" control chart), and a
per-segment model bake-off. Reference models are the industry-standard
floor every fancier model must beat; backtesting THEM is how a pipeline
earns trust in its error metrics before any ML enters.

Exactness discipline (repo-wide contract): revenue on the exact cent
grid (``floor(v*100 + 0.5)``), calendar months as the integer index
``yr*12 + (mo-1)``, every ratio in truncated basis points (Spark
``div`` == DuckDB ``//``, toward-zero on BIGINT — verified on negative
signed errors, where floor-vs-trunc would diverge), and the MA-3
forecast as the truncated integer mean ``sum div 3``. No floats
anywhere, so both engines hash bit-identically.

Spark-first shape, sized for 100 TB:
- The fact pays ONE partial-aggregated shuffle to (segment, month) —
  customer dim broadcast onto orders — and is then zero-filled onto a
  dense per-segment month spine (``sequence`` + ``explode``, bounded by
  |segments|×|months|, NOT corpus-sized) so lag-12 / trailing windows
  are well-defined across gap months.
- The filled relation is localCheckpoint-pinned once per query:
  spine bounds and the actual-join both branch from the monthly
  aggregate, and Catalyst does not reuse common subplans (the §2.AA
  lesson — unpinned, the fact pass would run twice).
- Every window partitions by segment over the bounded spine: one
  exchange of |segments|×|months| rows, then single-pass rollups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query

_CENTS = "CAST(floor({col} * 100 + 0.5) AS BIGINT)"

_YIDX = (
    "(CAST(year(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) * 12"
    " + CAST(month(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) - 1)"
)
_IDX2YM = (
    "concat(lpad(CAST({i} // 12 AS VARCHAR), 4, '0'), '-',"
    " lpad(CAST({i} % 12 + 1 AS VARCHAR), 2, '0'))"
)
_SPARK_IDX2YM = (
    "concat(lpad(CAST({i} div 12 AS STRING), 4, '0'), '-',"
    " lpad(CAST({i} % 12 + 1 AS STRING), 2, '0'))"
)

# DuckDB: monthly revenue per market segment, zero-filled onto the dense
# per-segment month spine so lag/trailing windows see every month.
_FILLED_SQL = f"""
monthly AS (
  SELECT c.c_mktsegment AS seg, {_YIDX} AS yidx,
         CAST(sum({_CENTS.format(col="o.o_totalprice")}) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
spine AS (
  SELECT seg, unnest(generate_series(min(yidx), max(yidx))) AS yidx
  FROM monthly GROUP BY seg
),
filled AS (
  SELECT s.seg, s.yidx, COALESCE(m.cents, 0) AS cents
  FROM spine s LEFT JOIN monthly m ON s.seg = m.seg AND s.yidx = m.yidx
)
"""


def _filled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(seg, yidx, cents): monthly segment revenue on the dense spine.

    One fact shuffle (customer dim broadcast, partial-aggregated groupBy
    to segment×month), localCheckpoint-pinned because the spine bounds
    AND the left join both branch from it; every downstream window runs
    on this bounded |segments|×|months| relation."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    monthly = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.expr(_YIDX).alias("yidx"),
        )
        .agg(
            F.sum(F.expr(_CENTS.format(col="o_totalprice")))
            .cast("long")
            .alias("cents")
        )
        .localCheckpoint()
    )
    spine = (
        monthly.groupBy("seg")
        .agg(F.min("yidx").alias("mn"), F.max("yidx").alias("mx"))
        .select("seg", F.explode(F.expr("sequence(mn, mx)")).alias("yidx"))
    )
    return spine.join(monthly, ["seg", "yidx"], "left").select(
        "seg", "yidx", F.coalesce("cents", F.lit(0)).alias("cents")
    )


def _with_models(filled: DataFrame) -> DataFrame:
    """Attach both reference forecasts + signed errors; keep only the
    common evaluation window (lag-12 defined ⇒ the 3 trailing months are
    too, so both models are scored on identical months)."""
    w = Window.partitionBy("seg").orderBy("yidx")
    return (
        filled.withColumn("fc_snaive", F.lag("cents", 12).over(w))
        .withColumn(
            "fc_ma3",
            F.expr(
                "sum(cents) OVER (PARTITION BY seg ORDER BY yidx"
                " ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) div 3"
            ),
        )
        .filter(F.col("fc_snaive").isNotNull())
    )


@query(
    "q_fc_snaive_backtest",
    oracle=f"""
    WITH {_FILLED_SQL}
    SELECT seg, {_IDX2YM.format(i="yidx")} AS ym,
           cents AS actual_cents,
           lag(cents, 12) OVER w AS forecast_cents,
           cents - lag(cents, 12) OVER w AS err_cents,
           abs(cents - lag(cents, 12) OVER w) AS abs_err_cents
    FROM filled
    WINDOW w AS (PARTITION BY seg ORDER BY yidx)
    QUALIFY lag(cents, 12) OVER w IS NOT NULL
    ORDER BY seg, ym
    """,
)
def q_fc_snaive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AM am1 — seasonal-naive backtest: forecast each month's
    segment revenue with the same month one year earlier (lag 12 over
    the zero-filled spine), emitting actual, forecast, signed and
    absolute error in exact cents. Months without a year-ago
    observation are excluded (not zero-forecast) — the standard
    burn-in convention.

    Scale: one fact shuffle to segment×month; lag window over the
    bounded spine (|segments|×|months| rows, single exchange)."""
    w = Window.partitionBy("seg").orderBy("yidx")
    return (
        _filled(spark, sf_dir)
        .withColumn("forecast_cents", F.lag("cents", 12).over(w))
        .filter(F.col("forecast_cents").isNotNull())
        .select(
            "seg",
            F.expr(_SPARK_IDX2YM.format(i="yidx")).alias("ym"),
            F.col("cents").alias("actual_cents"),
            "forecast_cents",
            (F.col("cents") - F.col("forecast_cents")).alias("err_cents"),
            F.abs(F.col("cents") - F.col("forecast_cents")).alias(
                "abs_err_cents"
            ),
        )
        .orderBy("seg", "ym")
    )


@query(
    "q_fc_ma3_backtest",
    oracle=f"""
    WITH {_FILLED_SQL},
    fc AS (
      SELECT seg, yidx, cents,
             CASE WHEN count(*) OVER w3 = 3
                  THEN CAST(sum(cents) OVER w3 AS BIGINT) // 3
             END AS forecast_cents
      FROM filled
      WINDOW w3 AS (PARTITION BY seg ORDER BY yidx
                    ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
    )
    SELECT seg, {_IDX2YM.format(i="yidx")} AS ym,
           cents AS actual_cents, forecast_cents,
           cents - forecast_cents AS err_cents,
           abs(cents - forecast_cents) AS abs_err_cents
    FROM fc WHERE forecast_cents IS NOT NULL
    ORDER BY seg, ym
    """,
)
def q_fc_ma3_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AM am2 — trailing moving-average backtest: forecast each month
    with the truncated integer mean of the three preceding months
    (``sum div 3`` over ROWS 3 PRECEDING..1 PRECEDING — never the
    current row, so the forecast is honest). The first three spine
    months per segment have no full window and are excluded via the
    explicit ``count(*) = 3`` guard, not a silent partial mean.

    Scale: identical to am1 — one fact shuffle, one bounded window."""
    w3 = (
        Window.partitionBy("seg")
        .orderBy("yidx")
        .rowsBetween(-3, -1)
    )
    fc = _filled(spark, sf_dir).withColumn(
        "forecast_cents",
        F.when(
            F.count(F.lit(1)).over(w3) == 3,
            F.expr(
                "sum(cents) OVER (PARTITION BY seg ORDER BY yidx"
                " ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) div 3"
            ),
        ),
    )
    return (
        fc.filter(F.col("forecast_cents").isNotNull())
        .select(
            "seg",
            F.expr(_SPARK_IDX2YM.format(i="yidx")).alias("ym"),
            F.col("cents").alias("actual_cents"),
            "forecast_cents",
            (F.col("cents") - F.col("forecast_cents")).alias("err_cents"),
            F.abs(F.col("cents") - F.col("forecast_cents")).alias(
                "abs_err_cents"
            ),
        )
        .orderBy("seg", "ym")
    )


@query(
    "q_fc_accuracy_summary",
    oracle=f"""
    WITH {_FILLED_SQL},
    scored AS (
      SELECT seg, yidx, cents,
             lag(cents, 12) OVER w AS fc_snaive,
             sum(cents) OVER (PARTITION BY seg ORDER BY yidx
                 ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) // 3 AS fc_ma3
      FROM filled
      WINDOW w AS (PARTITION BY seg ORDER BY yidx)
      QUALIFY lag(cents, 12) OVER w IS NOT NULL
    ),
    long AS (
      SELECT seg, 'snaive' AS model, cents, cents - fc_snaive AS err
      FROM scored
      UNION ALL
      SELECT seg, 'ma3' AS model, cents, cents - fc_ma3 AS err
      FROM scored
    )
    SELECT seg, model,
           CAST(count(*) AS BIGINT) AS n_months,
           CAST(sum(abs(err)) AS BIGINT) // count(*) AS mae_cents,
           CAST(sum(err) AS BIGINT) // count(*) AS bias_cents,
           (10000 * CAST(sum(abs(err)) AS BIGINT))
             // CAST(sum(cents) AS BIGINT) AS wmape_bp
    FROM long GROUP BY 1, 2 ORDER BY seg, model
    """,
)
def q_fc_accuracy_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AM am3 — forecast-accuracy scorecard: per segment × model,
    MAE and signed bias in truncated cents and weighted MAPE in bp
    (``10000·Σ|err| div Σactual`` — wMAPE, not per-month MAPE, so
    zero-revenue fill months can't divide by zero). Both models are
    scored on the IDENTICAL month set (lag-12 burn-in, which subsumes
    the MA-3 burn-in) — the comparison is apples-to-apples by
    construction.

    Scale: one fact shuffle; the two-model unpivot is a ×2 of the
    bounded spine, then a |segments|×2-row partial-aggregated rollup."""
    long = (
        _with_models(_filled(spark, sf_dir))
        .select(
            "seg",
            "cents",
            F.explode(
                F.map_from_arrays(
                    F.array(F.lit("snaive"), F.lit("ma3")),
                    F.array(
                        F.col("cents") - F.col("fc_snaive"),
                        F.col("cents") - F.col("fc_ma3"),
                    ),
                )
            ).alias("model", "err"),
        )
    )
    return (
        long.groupBy("seg", "model")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_months"),
            F.expr("sum(abs(err)) div count(*)").alias("mae_cents"),
            F.expr("sum(err) div count(*)").alias("bias_cents"),
            F.expr("(10000 * sum(abs(err))) div sum(cents)").alias(
                "wmape_bp"
            ),
        )
        .orderBy("seg", "model")
    )


@query(
    "q_fc_tracking_signal",
    oracle=f"""
    WITH {_FILLED_SQL},
    scored AS (
      SELECT seg, yidx, cents,
             cents - lag(cents, 12) OVER w AS err
      FROM filled
      WINDOW w AS (PARTITION BY seg ORDER BY yidx)
      QUALIFY lag(cents, 12) OVER w IS NOT NULL
    )
    SELECT seg, {_IDX2YM.format(i="yidx")} AS ym,
           CAST(sum(err) OVER c AS BIGINT) AS cum_err_cents,
           CAST(sum(abs(err)) OVER c AS BIGINT) AS cum_abs_err_cents,
           (10000 * CAST(sum(err) OVER c AS BIGINT))
             // nullif(CAST(sum(abs(err)) OVER c AS BIGINT), 0)
             AS signal_bp
    FROM scored
    WINDOW c AS (PARTITION BY seg ORDER BY yidx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY seg, ym
    """,
)
def q_fc_tracking_signal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AM am4 — tracking signal: the running ratio of cumulative
    signed error to cumulative absolute error (in bp, ±10000 bounds)
    for the seasonal-naive model — the demand-planning control chart
    that flags a persistently one-sided forecast long before MAE moves.
    Signed÷signed division is where floor-vs-trunc would diverge; both
    engines truncate toward zero (verified), and an all-zero error
    prefix yields NULL via nullif in both.

    Scale: lag + two cumulative windows share ONE segment partition —
    a single exchange + sort of the bounded spine."""
    w = Window.partitionBy("seg").orderBy("yidx")
    c = w.rowsBetween(Window.unboundedPreceding, 0)
    scored = (
        _filled(spark, sf_dir)
        .withColumn("err", F.col("cents") - F.lag("cents", 12).over(w))
        .filter(F.col("err").isNotNull())
    )
    return (
        scored.withColumn("cum_err_cents", F.sum("err").over(c).cast("long"))
        .withColumn(
            "cum_abs_err_cents", F.sum(F.abs("err")).over(c).cast("long")
        )
        .select(
            "seg",
            F.expr(_SPARK_IDX2YM.format(i="yidx")).alias("ym"),
            "cum_err_cents",
            "cum_abs_err_cents",
            F.expr(
                "(10000 * cum_err_cents) div nullif(cum_abs_err_cents, 0)"
            ).alias("signal_bp"),
        )
        .orderBy("seg", "ym")
    )


@query(
    "q_fc_model_winner",
    oracle=f"""
    WITH {_FILLED_SQL},
    scored AS (
      SELECT seg, cents,
             lag(cents, 12) OVER w AS fc_snaive,
             sum(cents) OVER (PARTITION BY seg ORDER BY yidx
                 ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) // 3 AS fc_ma3
      FROM filled
      WINDOW w AS (PARTITION BY seg ORDER BY yidx)
      QUALIFY lag(cents, 12) OVER w IS NOT NULL
    ),
    mae AS (
      SELECT seg,
             CAST(sum(abs(cents - fc_snaive)) AS BIGINT) // count(*)
               AS mae_snaive_cents,
             CAST(sum(abs(cents - fc_ma3)) AS BIGINT) // count(*)
               AS mae_ma3_cents,
             CAST(count(*) AS BIGINT) AS n_months
      FROM scored GROUP BY 1
    )
    SELECT seg, n_months, mae_snaive_cents, mae_ma3_cents,
           CASE WHEN mae_ma3_cents < mae_snaive_cents
                THEN 'ma3' ELSE 'snaive' END AS winner,
           (10000 * abs(mae_snaive_cents - mae_ma3_cents))
             // nullif(greatest(mae_snaive_cents, mae_ma3_cents), 0)
             AS margin_bp
    FROM mae ORDER BY seg
    """,
)
def q_fc_model_winner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AM am5 — model bake-off: per segment, both models' MAE on the
    common evaluation window, the winner (ties to the simpler seasonal
    naive), and the win margin as bp of the worse MAE. The one-line
    answer a planning team actually consumes from am1–am3.

    Scale: same single fact shuffle + bounded windows as am3; the
    final census is |segments| rows."""
    scored = _with_models(_filled(spark, sf_dir))
    mae = scored.groupBy("seg").agg(
        F.expr("sum(abs(cents - fc_snaive)) div count(*)").alias(
            "mae_snaive_cents"
        ),
        F.expr("sum(abs(cents - fc_ma3)) div count(*)").alias(
            "mae_ma3_cents"
        ),
        F.count(F.lit(1)).cast("long").alias("n_months"),
    )
    return mae.select(
        "seg",
        "n_months",
        "mae_snaive_cents",
        "mae_ma3_cents",
        F.when(
            F.col("mae_ma3_cents") < F.col("mae_snaive_cents"), "ma3"
        )
        .otherwise("snaive")
        .alias("winner"),
        F.expr(
            "(10000 * abs(mae_snaive_cents - mae_ma3_cents))"
            " div nullif(greatest(mae_snaive_cents, mae_ma3_cents), 0)"
        ).alias("margin_bp"),
    ).orderBy("seg")
