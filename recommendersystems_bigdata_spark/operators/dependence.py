"""Dependence audits between customer metrics (SURVEY.md §2.BX,
round 10).

"Are high spenders also frequent buyers, and is the association real"
— the empirical decile-copula family between two PER-CUSTOMER metrics
(total spend, order count), beside §2.AS's 2×2 odds ratios (binary
outcomes), §2.Y's two-sample drift tests (one metric, two groups) and
§2.BD's linear correlation (raw values, not ranks):

- bx1: the 10×10 decile dependence grid — observed counts and the
  exact signed independence deviation per cell.
- bx2: the chi-square independence test over the grid, in cleared
  truncated milli with a published 95% verdict — no float, no sqrt.
- bx3: row profiles — per spend decile, the modal count-decile, its
  share, and the diagonal share (the "rank agreement" readout).
- bx4: the lift map — per cell, observed/expected in bp (the
  association-lift heatmap over the metric ranks).

EXACTNESS SPELLINGS: deciles are ANSI NTILE over the deterministic
total orders (metric asc, custkey asc) — Spark side via the
DISTRIBUTED closed-form global_ntile (functions/ranks.py, no
single-partition exchange), DuckDB via native ntile (parity
established at §2.E's q_win_ntile). With N customers, row totals r_i,
column totals c_j and observed o_ij:

    dev_ij        = N·o_ij − r_i·c_j                  (exact integer)
    contrib_milli = (1000·dev_ij²) div (N·r_i·c_j)    (χ² cell term)
    chi2_milli    = Σ_ij contrib_milli                (truncated sum:
                    each of ≤100 cells loses < 1 milli, so the
                    published statistic sits within 0.1 of 1000·χ²)
    dof           = (rows−1)·(cols−1) of the REALIZED dense grid
                    (= 81 whenever N ≥ 10 customers — every corpus SF)
    verdict       = chi2_milli > 103 010  ⇒ 'dependent'
                    (χ²₀.₉₅ at 81 dof = 103.010; published ONLY when
                    the realized dof is the nominal 81 — NULL
                    otherwise, never a miscalibrated threshold;
                    identical truncated spelling both engines ⇒
                    identical verdict)
    lift_bp       = (10⁴·N·o_ij) div (r_i·c_j)

Headroom: N ≤ 1.5e8 customers at sf1000; N·r·c ≤ N³/100 ≈ 3e22 and
1000·dev² ≤ 1000·N⁴/... evaluated in decimal(38,0)/HUGEINT — dev² ≤
(N²/4)² is the binding term at ~5e31·10³ = 5e34 < 10³⁸.

Spark-first shape, sized for 100 TB: ONE orders pass
partial-aggregates to the per-customer metric relation (dim-sized);
TWO distributed global-ntile passes rank it (the two-pass range
shuffle + Arrow local index + broadcast offsets device); everything
after is arithmetic on the ≤100-cell grid with 1-row/10-row
broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.functions.ranks import global_ntile
from recommendersystems_bigdata_spark.registry import query

_CENTS = "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
_DEC = "decimal(38,0)"

# DuckDB: per-customer metrics → two decile ranks → the 10×10 grid
# with row/col/total margins attached.
_GRID_DUCK = f"""
cust AS (
  SELECT o_custkey,
         CAST(sum({_CENTS}) AS BIGINT) AS spend_cents,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT o_custkey,
         CAST(ntile(10) OVER (ORDER BY spend_cents, o_custkey) AS BIGINT)
           AS spend_d,
         CAST(ntile(10) OVER (ORDER BY n_orders, o_custkey) AS BIGINT)
           AS orders_d
  FROM cust
),
sparse AS (
  SELECT spend_d, orders_d, CAST(count(*) AS BIGINT) AS obs
  FROM ranked GROUP BY 1, 2
),
-- densify to the full deciles×deciles grid: empty cells carry obs = 0
-- (their χ² contribution is E, not nothing) — ntile guarantees every
-- decile is non-empty for N ≥ 10, so margins never hit zero
grid AS (
  SELECT d1.spend_d, d2.orders_d, COALESCE(s.obs, 0) AS obs
  FROM (SELECT DISTINCT spend_d FROM sparse) d1
  CROSS JOIN (SELECT DISTINCT orders_d FROM sparse) d2
  LEFT JOIN sparse s
    ON d1.spend_d = s.spend_d AND d2.orders_d = s.orders_d
),
margins AS (
  SELECT g.spend_d, g.orders_d, g.obs,
         CAST(r.rt AS HUGEINT) AS row_tot,
         CAST(c.ct AS HUGEINT) AS col_tot,
         CAST(t.n AS HUGEINT) AS n
  FROM grid g
  JOIN (SELECT spend_d, sum(obs) AS rt FROM grid GROUP BY 1) r
    ON g.spend_d = r.spend_d
  JOIN (SELECT orders_d, sum(obs) AS ct FROM grid GROUP BY 1) c
    ON g.orders_d = c.orders_d
  CROSS JOIN (SELECT sum(obs) AS n FROM grid) t
)
"""


def _margins(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        F.expr(f"CAST(sum({_CENTS}) AS BIGINT)").alias("spend_cents"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    ).localCheckpoint()
    ranked = global_ntile(
        cust, [F.col("spend_cents").asc(), F.col("o_custkey").asc()], 10,
        "spend_d",
    )
    ranked = global_ntile(
        ranked, [F.col("n_orders").asc(), F.col("o_custkey").asc()], 10,
        "orders_d",
    )
    sparse = ranked.groupBy("spend_d", "orders_d").agg(
        F.count(F.lit(1)).cast("long").alias("obs")
    )
    # densify: empty cells carry obs = 0 (their χ² contribution is E);
    # ntile keeps every decile non-empty for N ≥ 10 so margins stay > 0
    grid = (
        sparse.select("spend_d")
        .distinct()
        .crossJoin(sparse.select("orders_d").distinct())
        .join(sparse, ["spend_d", "orders_d"], "left")
        .select(
            "spend_d",
            "orders_d",
            F.coalesce("obs", F.lit(0)).cast("long").alias("obs"),
        )
        .localCheckpoint()
    )
    rows = grid.groupBy("spend_d").agg(F.sum("obs").alias("rt"))
    cols = grid.groupBy("orders_d").agg(F.sum("obs").alias("ct"))
    tot = grid.agg(F.sum("obs").alias("nn"))
    return (
        grid.join(F.broadcast(rows), "spend_d")
        .join(F.broadcast(cols), "orders_d")
        .crossJoin(F.broadcast(tot))
        .select(
            "spend_d",
            "orders_d",
            "obs",
            F.expr(f"CAST(rt AS {_DEC})").alias("row_tot"),
            F.expr(f"CAST(ct AS {_DEC})").alias("col_tot"),
            F.expr(f"CAST(nn AS {_DEC})").alias("n"),
        )
    )


@query(
    "q_dependence_grid",
    oracle=f"""
    WITH {_GRID_DUCK}
    SELECT spend_d, orders_d, obs,
           CAST(row_tot AS BIGINT) AS row_tot,
           CAST(col_tot AS BIGINT) AS col_tot,
           CAST(n * obs - row_tot * col_tot AS BIGINT) AS dev
    FROM margins ORDER BY spend_d, orders_d
    """,
)
def q_dependence_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BX bx1 — the decile dependence grid: observed count per
    (spend decile, order-count decile) cell with row/column totals and
    the exact signed independence deviation ``dev = N·obs − r·c``
    (zero everywhere ⟺ perfect rank independence at this resolution).

    Scale: one orders pass to the per-customer relation, two
    distributed ntile passes, a ≤100-cell grid."""
    return (
        _margins(spark, sf_dir)
        .select(
            "spend_d",
            "orders_d",
            "obs",
            F.expr("CAST(row_tot AS BIGINT)").alias("row_tot"),
            F.expr("CAST(col_tot AS BIGINT)").alias("col_tot"),
            F.expr("CAST(n * obs - row_tot * col_tot AS BIGINT)").alias(
                "dev"
            ),
        )
        .orderBy("spend_d", "orders_d")
    )


@query(
    "q_dependence_chi2",
    oracle=f"""
    WITH {_GRID_DUCK},
    cells AS (
      SELECT n, spend_d, orders_d,
             (n * obs - row_tot * col_tot) AS dev,
             (1000 * (n * obs - row_tot * col_tot)
                   * (n * obs - row_tot * col_tot))
               // (n * row_tot * col_tot) AS contrib_milli
      FROM margins
    )
    SELECT CAST(max(n) AS BIGINT) AS n_customers,
           CAST(count(*) AS BIGINT) AS cells,
           CAST(sum(contrib_milli) AS BIGINT) AS chi2_milli,
           CAST((count(DISTINCT spend_d) - 1)
                * (count(DISTINCT orders_d) - 1) AS BIGINT) AS dof,
           CASE WHEN (count(DISTINCT spend_d) - 1)
                     * (count(DISTINCT orders_d) - 1) <> 81 THEN NULL
                WHEN sum(contrib_milli) > 103010 THEN 'dependent'
                ELSE 'independent' END AS verdict
    FROM cells
    """,
)
def q_dependence_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BX bx2 — the chi-square independence test over the grid:
    the truncated-milli statistic (each of ≤100 cells loses < 1 milli
    — both engines publish the identical spelling) and the 95% verdict
    against χ²₀.₉₅(81) = 103.010 as the integer compare
    ``chi2_milli > 103010``. The grid is DENSE — empty cells carry
    obs = 0 and contribute their full expected-count term — so the
    statistic is the complete Pearson χ² of the realized design. dof
    is DERIVED from that realized grid, (rows−1)·(cols−1) — 81
    whenever N ≥ 10 customers gives ntile its full 10 deciles per
    axis (every corpus SF), fewer only on degenerate tiny inputs —
    and the verdict is published only at the nominal 81 (its 103.010
    threshold IS the 81-dof critical value; any other realized dof
    publishes a NULL verdict rather than a miscalibrated one).

    Scale: a 1-row reduction of the grid."""
    cells = _margins(spark, sf_dir).select(
        "n",
        "spend_d",
        "orders_d",
        F.expr(
            f"CAST((CAST(1000 AS {_DEC}) * (n * obs - row_tot * col_tot)"
            f" * (n * obs - row_tot * col_tot))"
            f" div (n * row_tot * col_tot) AS BIGINT)"
        ).alias("contrib_milli"),
    )
    dof = (
        "(count(DISTINCT spend_d) - 1) * (count(DISTINCT orders_d) - 1)"
    )
    return cells.agg(
        F.expr("CAST(max(n) AS BIGINT)").alias("n_customers"),
        F.count(F.lit(1)).cast("long").alias("cells"),
        F.sum("contrib_milli").cast("long").alias("chi2_milli"),
        F.expr(f"CAST({dof} AS BIGINT)").alias("dof"),
        F.expr(
            f"CASE WHEN {dof} <> 81 THEN NULL"
            " WHEN sum(contrib_milli) > 103010 THEN 'dependent'"
            " ELSE 'independent' END"
        ).alias("verdict"),
    )


@query(
    "q_dependence_row_profiles",
    oracle=f"""
    WITH {_GRID_DUCK},
    best AS (
      SELECT spend_d, orders_d, obs,
             CAST(row_tot AS BIGINT) AS row_tot,
             row_number() OVER (PARTITION BY spend_d
                                ORDER BY obs DESC, orders_d) AS rn
      FROM margins
    ),
    diag AS (
      SELECT spend_d, CAST(sum(CASE WHEN spend_d = orders_d THEN obs
                                    ELSE 0 END) AS BIGINT) AS diag_obs
      FROM margins GROUP BY spend_d
    )
    SELECT b.spend_d, b.row_tot,
           b.orders_d AS modal_orders_d,
           b.obs AS modal_obs,
           CAST((10000 * b.obs) // b.row_tot AS BIGINT) AS modal_share_bp,
           CAST((10000 * d.diag_obs) // b.row_tot AS BIGINT)
             AS diagonal_share_bp
    FROM best b JOIN diag d ON b.spend_d = d.spend_d
    WHERE b.rn = 1 ORDER BY b.spend_d
    """,
)
def q_dependence_row_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BX bx3 — row profiles: per spend decile, the modal
    order-count decile (tiebreak: obs desc, decile asc), its share of
    the row, and the DIAGONAL share (obs where orders_d = spend_d) —
    the readable "do the ranks agree" table behind bx2's verdict.

    Scale: partitioned top-1 window + rollup over the ≤100-cell
    grid."""
    from pyspark.sql import Window

    m = _margins(spark, sf_dir).localCheckpoint()
    w = Window.partitionBy("spend_d").orderBy(
        F.col("obs").desc(), F.col("orders_d").asc()
    )
    best = m.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    diag = m.groupBy("spend_d").agg(
        F.sum(
            F.when(F.col("spend_d") == F.col("orders_d"), F.col("obs"))
            .otherwise(0)
        )
        .cast("long")
        .alias("diag_obs")
    )
    return (
        best.join(diag, "spend_d")
        .select(
            "spend_d",
            F.expr("CAST(row_tot AS BIGINT)").alias("row_tot"),
            F.col("orders_d").alias("modal_orders_d"),
            F.col("obs").alias("modal_obs"),
            F.expr("CAST((10000 * obs) div row_tot AS BIGINT)").alias(
                "modal_share_bp"
            ),
            F.expr("CAST((10000 * diag_obs) div row_tot AS BIGINT)").alias(
                "diagonal_share_bp"
            ),
        )
        .orderBy("spend_d")
    )


@query(
    "q_dependence_lift_map",
    oracle=f"""
    WITH {_GRID_DUCK}
    SELECT spend_d, orders_d, obs,
           CAST((10000 * n * obs) // (row_tot * col_tot) AS BIGINT)
             AS lift_bp
    FROM margins ORDER BY spend_d, orders_d
    """,
)
def q_dependence_lift_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BX bx4 — the lift map: per cell, observed over expected in
    bp (``(10⁴·N·obs) div (r·c)`` — 10⁴ = independence) — the
    association heatmap a dashboard renders from bx1's grid.

    Scale: arithmetic on the ≤100-cell grid."""
    return (
        _margins(spark, sf_dir)
        .select(
            "spend_d",
            "orders_d",
            "obs",
            F.expr(
                f"CAST((CAST(10000 AS {_DEC}) * n * obs)"
                f" div (row_tot * col_tot) AS BIGINT)"
            ).alias("lift_bp"),
        )
        .orderBy("spend_d", "orders_d")
    )
