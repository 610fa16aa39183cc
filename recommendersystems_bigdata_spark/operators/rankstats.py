"""Nonparametric rank statistics / distribution-drift tests (SURVEY.md
§2.Y, round 9).

The distribution-comparison layer a training-data pipeline runs when two
corpus snapshots, sources, or time slices must be declared "same
distribution" or "drifted" WITHOUT assuming normality: Mann-Whitney U
(one-vs-rest per segment), a decile-binned Goodman-Kruskal gamma
(Kendall-family ordinal association), the two-sample Kolmogorov-Smirnov
distance, Mood's median test, and the Wilcoxon signed-rank test on paired
per-entity periods. The parametric drift checks live in §2.D
(q_drift_chi2, q_ab_test_proportions); these are their rank-based
complements — robust to outliers and monotone transforms, which is what
you want when the drifting column is a heavy-tailed quality score.

Exactness discipline (the repo-wide contract): every statistic is
integer. Values enter on the exact cent grid (`floor(v*100 + 0.5)` —
exact for 2-dp non-negative doubles, deterministic for the 2-dp negative
balances), tie-averaged ranks are kept DOUBLED (`2·rank_min + ties − 1`,
an integer for any tie pattern), effect sizes leave in basis points via
integer division (Spark `div` and DuckDB `//` both truncate toward zero
on BIGINT operands — measured in functions/exactmath.py — so signed
effects like rank-biserial and gamma agree bit-for-bit; no float
division, no rounding of tie-capable quotients anywhere).

Spark-first shape, sized for 100 TB:
- Rank tables are built on the DISTINCT-value relation, never the fact:
  the cent grid bounds the distinct count (≤ ~50k for the bounded event
  values), so the one ordered cumulative window runs over a grid-bounded
  input regardless of corpus size — the same collapse q_percentile_cont_
  exact uses. Facts only ever see a map-side partial aggregate to
  (group, value) counts.
- The Wilcoxon diff grid is NOT value-bounded (per-customer period sums),
  so its cumulative ranks use functions/ranks.global_running_sum — the
  two-pass distributed cumsum with no single-partition exchange.
- Decile binning uses functions/ranks.global_ntile (ANSI ntile from the
  distributed global row number); the gamma pair census then runs on the
  10×10 cell table, never on row pairs: O(cells²)=10⁴ products, not
  O(n²).
- Everything downstream of the first aggregate is cardinality-bounded
  (|types|, |grid|, |cells|), broadcastable, and sorted only at the
  bounded tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.functions.ranks import (
    global_ntile,
    global_running_sum,
)
from recommendersystems_bigdata_spark.registry import query

# exact cent grid for the 2-dp event values / prices / balances
_CENTS = "CAST(floor({col} * 100 + 0.5) AS BIGINT)"
_SQL_CENTS = _CENTS  # identical spelling runs in DuckDB

# KS compares these two event populations (both ~20% of events at every SF)
_KS_A, _KS_B = "click", "purchase"
# Wilcoxon pairs per-customer spend across these two complete order years
_WX_Y1, _WX_Y2 = 1996, 1997


def _event_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.where(F.col("value").isNotNull()).select(
        "event_type", F.expr(_CENTS.format(col="value")).alias("v")
    )


@query(
    "q_ranks_mannwhitney",
    oracle=f"""
    WITH e AS (
      SELECT event_type, {_SQL_CENTS.format(col="value")} AS v
      FROM events WHERE value IS NOT NULL
    ),
    pv AS (SELECT event_type, v, count(*) AS c FROM e GROUP BY 1, 2),
    vals AS (SELECT v, CAST(sum(c) AS BIGINT) AS cnt FROM pv GROUP BY 1),
    rk AS (
      SELECT v, CAST(2 * (sum(cnt) OVER (ORDER BY v) - cnt) + cnt + 1 AS BIGINT)
               AS rank2
      FROM vals
    ),
    pt AS (
      SELECT event_type, CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(c * rank2) AS BIGINT) AS rank2_sum
      FROM pv JOIN rk USING (v) GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS bn FROM pt)
    SELECT event_type, n, rank2_sum,
           rank2_sum - n * (n + 1) AS u2,
           CAST((rank2_sum - n * (n + 1)) * 10000
                // (2 * n * (bn - n)) AS BIGINT) AS auc_bp,
           CAST(2 * ((rank2_sum - n * (n + 1)) * 10000
                // (2 * n * (bn - n))) - 10000 AS BIGINT) AS rb_bp
    FROM pt, tot ORDER BY event_type
    """,
)
def q_ranks_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.Y y1 — Mann-Whitney U, one-vs-rest per event type: doubled
    tie-averaged rank sum, the doubled U statistic, the exact AUC
    (P[group value > rest value] + ½P[=]) in basis points, and the
    rank-biserial effect size in signed basis points. The question it
    answers for a pipeline: "does THIS source's quality score
    stochastically dominate the rest of the corpus?"

    u2 = rank2_sum − n(n+1) is 2·U ≥ 0 (rank2_sum is minimized at
    n(n+1)); auc_bp = u2·10⁴ div (2·n·(N−n)) keeps the division on
    non-negative integers; rb = 2·auc − 1 needs no further division.

    Scale: the fact collapses map-side to (type, cent) counts; the only
    ordered window runs over the DISTINCT cent grid (≤ ~50k rows at any
    corpus size — the grid, not the data, bounds it); the rank join is
    grid×types sized. rank2_sum ≤ 2N² needs 128-bit only past ~2·10⁹
    rows per group — the expression widens to DECIMAL(38) unchanged."""
    pv = (
        _event_cents(spark, sf_dir)
        .groupBy("event_type", "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    vals = pv.groupBy("v").agg(F.sum("c").alias("cnt"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rk = vals.select(
        "v",
        (2 * (F.sum("cnt").over(w) - F.col("cnt")) + F.col("cnt") + 1).alias("rank2"),
    )
    pt = (
        pv.join(rk, "v")
        .groupBy("event_type")
        .agg(
            F.sum("c").alias("n"),
            F.sum(F.col("c") * F.col("rank2")).alias("rank2_sum"),
        )
    )
    tot = pt.agg(F.sum("n").alias("bn"))
    return (
        pt.crossJoin(F.broadcast(tot))
        .withColumn("u2", F.col("rank2_sum") - F.col("n") * (F.col("n") + 1))
        .withColumn("auc_bp", F.expr("u2 * 10000 div (2 * n * (bn - n))"))
        .select(
            "event_type",
            "n",
            "rank2_sum",
            "u2",
            "auc_bp",
            (2 * F.col("auc_bp") - 10000).alias("rb_bp"),
        )
        .orderBy("event_type")
    )


@query(
    "q_ranks_kendall_binned",
    oracle=f"""
    WITH p AS (
      SELECT c.c_custkey AS k,
             {_SQL_CENTS.format(col="c.c_acctbal")} AS x,
             CAST(sum({_SQL_CENTS.format(col="o.o_totalprice")}) AS BIGINT) AS y
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    b AS (
      SELECT ntile(10) OVER (ORDER BY x, k) AS bx,
             ntile(10) OVER (ORDER BY y, k) AS by_
      FROM p
    ),
    cells AS (SELECT bx, by_, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1, 2),
    pairs AS (
      SELECT
        CAST(sum(CASE WHEN b2.bx > b1.bx AND b2.by_ > b1.by_
                      THEN b1.n * b2.n ELSE 0 END) AS BIGINT) AS concordant,
        CAST(sum(CASE WHEN b2.bx > b1.bx AND b2.by_ < b1.by_
                      THEN b1.n * b2.n ELSE 0 END) AS BIGINT) AS discordant
      FROM cells b1, cells b2
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_pairs FROM cells)
    SELECT n_pairs, concordant, discordant,
           CAST((concordant - discordant) * 10000
                // (concordant + discordant) AS BIGINT) AS gamma_bp
    FROM pairs, tot
    """,
)
def q_ranks_kendall_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.Y y2 — Goodman-Kruskal gamma (the Kendall-family ordinal
    association) between customer account balance and realized order
    spend, computed on decile bins: concordant / discordant pair counts
    and gamma in signed basis points. Binned-first is the 100 TB
    spelling: exact Kendall tau needs O(n log n) pair accounting per
    partition boundary, while the 10×10 census loses only within-bin
    pairs (declared ties, the standard coarse-gamma semantics) and turns
    the pair count into 10⁴ integer products.

    Scale: per-customer (x, y) is one orders groupBy; the two decile
    labels come from functions/ranks.global_ntile (distributed two-pass
    ANSI ntile — no single-partition exchange); everything after is a
    100-row table. The pair census is cells×cells (10⁴ products), never
    row×row. Signed gamma_bp relies on div/`//` truncating toward zero
    identically in both engines (measured, functions/exactmath.py)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    p = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .select(
            cust.c_custkey.alias("k"),
            F.expr(_CENTS.format(col="c_acctbal")).alias("x"),
            F.expr(_CENTS.format(col="o_totalprice")).alias("yc"),
        )
        .groupBy("k", "x")
        .agg(F.sum("yc").alias("y"))
    )
    p = p.localCheckpoint()  # two ntile passes read one materialization
    bx = global_ntile(p, [F.col("x"), F.col("k")], 10, "bx").select("k", "bx")
    by = global_ntile(p, [F.col("y"), F.col("k")], 10, "by_").select("k", "by_")
    cells = (
        bx.join(by, "k").groupBy("bx", "by_").agg(F.count(F.lit(1)).alias("n"))
    )
    a, b = cells.alias("a"), cells.alias("b")
    prod = F.col("a.n") * F.col("b.n")
    pairs = (
        a.crossJoin(F.broadcast(b))
        .agg(
            F.sum(
                F.when(
                    (F.col("b.bx") > F.col("a.bx")) & (F.col("b.by_") > F.col("a.by_")),
                    prod,
                ).otherwise(F.lit(0))
            ).alias("concordant"),
            F.sum(
                F.when(
                    (F.col("b.bx") > F.col("a.bx")) & (F.col("b.by_") < F.col("a.by_")),
                    prod,
                ).otherwise(F.lit(0))
            ).alias("discordant"),
        )
    )
    tot = cells.agg(F.sum("n").alias("n_pairs"))
    return (
        pairs.crossJoin(F.broadcast(tot))
        .select(
            "n_pairs",
            "concordant",
            "discordant",
            F.expr(
                "(concordant - discordant) * 10000 div (concordant + discordant)"
            ).alias("gamma_bp"),
        )
    )


@query(
    "q_ranks_ks_distance",
    oracle=f"""
    WITH e AS (
      SELECT event_type, {_SQL_CENTS.format(col="value")} AS v
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('{_KS_A}', '{_KS_B}')
    ),
    pv AS (
      SELECT v,
             CAST(sum(CASE WHEN event_type = '{_KS_A}' THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(sum(CASE WHEN event_type = '{_KS_B}' THEN 1 ELSE 0 END) AS BIGINT) AS b
      FROM e GROUP BY 1
    ),
    cum AS (
      SELECT CAST(sum(a) OVER (ORDER BY v) AS BIGINT) AS ca,
             CAST(sum(b) OVER (ORDER BY v) AS BIGINT) AS cb
      FROM pv
    ),
    tot AS (
      SELECT CAST(sum(a) AS BIGINT) AS na, CAST(sum(b) AS BIGINT) AS nb FROM pv
    )
    SELECT na AS n_{_KS_A}, nb AS n_{_KS_B},
           CAST(max(abs(ca * nb - cb * na)) AS BIGINT) AS d_num,
           CAST(max(abs(ca * nb - cb * na)) * 10000 // (na * nb) AS BIGINT)
             AS ks_bp
    FROM cum, tot GROUP BY na, nb
    """,
)
def q_ranks_ks_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.Y y3 — exact two-sample Kolmogorov-Smirnov distance between the
    click and purchase value distributions: D = max|F₁(v) − F₂(v)| held
    as the exact integer numerator over the common denominator n₁·n₂
    (d_num = max|cum₁·n₂ − cum₂·n₁|), plus basis points. The classic
    "did the value distribution shift between these two populations"
    test, with zero float ECDFs.

    Scale: the two facts collapse map-side to per-cent-value side
    counts; the single ordered cumulative window runs over the distinct
    cent grid (grid-bounded, not corpus-bounded); totals are a 1-row
    broadcast. cum·n products stay inside int64 to ~10⁹ rows per side
    and widen to DECIMAL(38) past it."""
    e = _event_cents(spark, sf_dir).where(
        F.col("event_type").isin(_KS_A, _KS_B)
    )
    pv = e.groupBy("v").agg(
        F.sum(F.when(F.col("event_type") == _KS_A, 1).otherwise(0)).alias("a"),
        F.sum(F.when(F.col("event_type") == _KS_B, 1).otherwise(0)).alias("b"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = pv.select(
        F.sum("a").over(w).alias("ca"), F.sum("b").over(w).alias("cb")
    )
    tot = pv.agg(F.sum("a").alias("na"), F.sum("b").alias("nb"))
    d = (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.first("na").alias("na"),
            F.first("nb").alias("nb"),
            F.max(F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na"))).alias(
                "d_num"
            ),
        )
    )
    return d.select(
        F.col("na").alias(f"n_{_KS_A}"),
        F.col("nb").alias(f"n_{_KS_B}"),
        "d_num",
        F.expr("d_num * 10000 div (na * nb)").alias("ks_bp"),
    )


@query(
    "q_ranks_median_test",
    oracle=f"""
    WITH e AS (
      SELECT event_type, {_SQL_CENTS.format(col="value")} AS v
      FROM events WHERE value IS NOT NULL
    ),
    vals AS (SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM e GROUP BY 1),
    cum AS (SELECT v, CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS c FROM vals),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM vals),
    med AS (
      SELECT min(v) AS median_cents FROM cum, tot WHERE c >= (n + 1) // 2
    ),
    cells AS (
      SELECT event_type,
             CASE WHEN v <= median_cents THEN 'le' ELSE 'gt' END AS side,
             CAST(count(*) AS BIGINT) AS o
      FROM e, med GROUP BY 1, 2
    ),
    tt AS (
      SELECT event_type, side, o,
             sum(o) OVER (PARTITION BY event_type) AS row_t,
             sum(o) OVER (PARTITION BY side) AS col_t,
             sum(o) OVER () AS grand
      FROM cells
    ),
    chi AS (
      SELECT CAST(sum(CAST(floor(
               (o - CAST(row_t * col_t AS DOUBLE) / grand)
               * (o - CAST(row_t * col_t AS DOUBLE) / grand)
               / (CAST(row_t * col_t AS DOUBLE) / grand) * 1000000) AS BIGINT))
             AS BIGINT) AS chi2_x1e6
      FROM tt
    ),
    bytype AS (
      SELECT event_type,
             CAST(sum(CASE WHEN side = 'le' THEN o ELSE 0 END) AS BIGINT) AS n_le,
             CAST(sum(CASE WHEN side = 'gt' THEN o ELSE 0 END) AS BIGINT) AS n_gt
      FROM cells GROUP BY 1
    )
    SELECT event_type, n_le, n_gt, median_cents, chi2_x1e6
    FROM bytype, med, chi ORDER BY event_type
    """,
)
def q_ranks_median_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.Y y4 — Mood's median test across event types: the exact grand
    lower median on the cent grid (smallest value whose cumulative count
    reaches ⌈N/2⌉), each type's ≤median / >median split, and the 2×k χ²
    statistic in the repo's per-cell-floored ×10⁶ integer spelling
    (q_drift_chi2's layout-invariant pattern — each χ² term is a short
    IEEE chain from exact integer counts, floored to an integer BEFORE
    the sum).

    Scale: median comes from the grid-bounded distinct-value cumulative
    (the percentile_cont collapse); the contingency table is types×2
    cells aggregated map-side; every window past the first aggregate
    runs on ≤2·|types| rows. The median broadcasts as a 1-row side."""
    e = _event_cents(spark, sf_dir)
    vals = e.groupBy("v").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = vals.select("v", F.sum("cnt").over(w).alias("c"))
    tot = vals.agg(F.sum("cnt").alias("n"))
    med = (
        cum.crossJoin(F.broadcast(tot))
        .where(F.expr("c >= (n + 1) div 2"))
        .agg(F.min("v").alias("median_cents"))
    )
    cells = (
        e.crossJoin(F.broadcast(med))
        .select(
            "event_type",
            F.when(F.col("v") <= F.col("median_cents"), "le")
            .otherwise("gt")
            .alias("side"),
        )
        .groupBy("event_type", "side")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    tt = cells.select(
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("row_t"),
        F.sum("o").over(Window.partitionBy("side")).alias("col_t"),
        F.sum("o").over(Window.partitionBy()).alias("grand"),
    )
    exp = (F.col("row_t") * F.col("col_t")).cast("double") / F.col("grand")
    term = F.floor((F.col("o") - exp) * (F.col("o") - exp) / exp * 1_000_000).cast(
        "long"
    )
    chi = tt.agg(F.sum(term).cast("long").alias("chi2_x1e6"))
    bytype = cells.groupBy("event_type").agg(
        F.sum(F.when(F.col("side") == "le", F.col("o")).otherwise(0)).alias("n_le"),
        F.sum(F.when(F.col("side") == "gt", F.col("o")).otherwise(0)).alias("n_gt"),
    )
    return (
        bytype.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(chi))
        .select("event_type", "n_le", "n_gt", "median_cents", "chi2_x1e6")
        .orderBy("event_type")
    )


@query(
    "q_ranks_wilcoxon",
    oracle=f"""
    WITH p AS (
      SELECT o_custkey,
             CAST(sum(CASE WHEN year(o_orderdate) = {_WX_Y1}
                  THEN {_SQL_CENTS.format(col="o_totalprice")} ELSE 0 END) AS BIGINT) AS x,
             CAST(sum(CASE WHEN year(o_orderdate) = {_WX_Y2}
                  THEN {_SQL_CENTS.format(col="o_totalprice")} ELSE 0 END) AS BIGINT) AS y,
             sum(CASE WHEN year(o_orderdate) = {_WX_Y1} THEN 1 ELSE 0 END) AS c1,
             sum(CASE WHEN year(o_orderdate) = {_WX_Y2} THEN 1 ELSE 0 END) AS c2
      FROM orders GROUP BY 1
    ),
    d AS (
      SELECT y - x AS d, abs(y - x) AS absd
      FROM p WHERE c1 > 0 AND c2 > 0 AND y <> x
    ),
    vals AS (SELECT absd, CAST(count(*) AS BIGINT) AS cnt FROM d GROUP BY 1),
    rk AS (
      SELECT absd,
             CAST(2 * (sum(cnt) OVER (ORDER BY absd) - cnt) + cnt + 1 AS BIGINT)
               AS rank2
      FROM vals
    ),
    j AS (SELECT d.d, rk.rank2 FROM d JOIN rk USING (absd)),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
             CAST(sum(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
             CAST(sum(CASE WHEN d > 0 THEN rank2 ELSE 0 END) AS BIGINT) AS w2_plus,
             CAST(sum(CASE WHEN d < 0 THEN rank2 ELSE 0 END) AS BIGINT) AS w2_minus
      FROM j
    )
    SELECT n_pairs, n_pos, n_neg, w2_plus, w2_minus,
           CAST((w2_plus - w2_minus) * 10000 // (w2_plus + w2_minus) AS BIGINT)
             AS rb_bp
    FROM s
    """,
)
def q_ranks_wilcoxon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.Y y5 — Wilcoxon signed-rank test on paired per-customer spend,
    1996 vs 1997 (customers active in BOTH years, zero diffs
    dropped — the standard signed-rank handling): doubled tie-averaged
    ranks of |diff| in exact cents, the doubled W⁺/W⁻ statistics, and
    the matched-pairs rank-biserial effect (W⁺−W⁻)/(W⁺+W⁻) in signed
    basis points. This is the paired drift test — "did the SAME
    entities' metric move between two periods" — where Mann-Whitney
    compares unpaired populations.

    Scale: the pair table is one orders groupBy (|customers| rows). The
    |diff| grid is NOT value-bounded (period sums), so the cumulative
    tie counts use functions/ranks.global_running_sum — the two-pass
    distributed cumsum — instead of a single-partition window; the rank
    join back is on the distinct-diff relation. Signed rb_bp depends on
    div/`//` truncating toward zero identically (measured)."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.expr(_CENTS.format(col="o_totalprice"))
    yr = F.year("o_orderdate")
    p = orders.groupBy("o_custkey").agg(
        F.sum(F.when(yr == _WX_Y1, cents).otherwise(0)).alias("x"),
        F.sum(F.when(yr == _WX_Y2, cents).otherwise(0)).alias("y"),
        F.sum(F.when(yr == _WX_Y1, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(yr == _WX_Y2, 1).otherwise(0)).alias("c2"),
    )
    d = (
        p.where((F.col("c1") > 0) & (F.col("c2") > 0) & (F.col("y") != F.col("x")))
        .select((F.col("y") - F.col("x")).alias("d"))
        .withColumn("absd", F.abs("d"))
    )
    vals = d.groupBy("absd").agg(F.count(F.lit(1)).alias("cnt"))
    cum = global_running_sum(vals, [F.col("absd")], "cnt", "c")
    rk = cum.select(
        "absd",
        (2 * (F.col("c") - F.col("cnt")) + F.col("cnt") + 1).alias("rank2"),
    )
    j = d.join(rk, "absd")
    s = j.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(F.col("d") < 0, 1).otherwise(0)).alias("n_neg"),
        F.sum(F.when(F.col("d") > 0, F.col("rank2")).otherwise(0)).alias("w2_plus"),
        F.sum(F.when(F.col("d") < 0, F.col("rank2")).otherwise(0)).alias("w2_minus"),
    )
    return s.select(
        "n_pairs",
        "n_pos",
        "n_neg",
        "w2_plus",
        "w2_minus",
        F.expr("(w2_plus - w2_minus) * 10000 div (w2_plus + w2_minus)").alias("rb_bp"),
    )
