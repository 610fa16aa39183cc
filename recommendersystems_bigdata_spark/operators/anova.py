"""Variance decomposition — one-way ANOVA in exact integers
(SURVEY.md §2.BO, round 9).

"Which dimension explains order value" — the between/within variance
split and its eta²/F summary, the analysis that ranks candidate
segmentations BEFORE anyone builds per-segment models; beside §2.D's
moments and §2.BD's exact least squares:

- bo1: per-segment moments — n, exact cent sums, truncated means, and
  the population variance in milli-cents² from the cleared form
  ``(n·Σx² − S²)/n²``.
- bo2: the one-way decomposition for the market-segment grouping —
  scaled sums of squares, mean squares, eta² in bp and the F statistic
  in milli.
- bo3: per-segment effects — each segment's truncated mean against
  the grand mean, the signed effect in cents.
- bo4: the variance-explained ladder — eta²/F for FOUR candidate
  groupings (market segment, customer nation, order priority, order
  year) in one table: the "feature importance by variance explained"
  ranking.

THE TRUNCATED-TERM SPELLING (the suite's exactness device): the only
non-integer term in one-way ANOVA is ``Σ_g S_g²/n_g``. Both engines
evaluate the IDENTICAL truncated spelling ``q_g = S_g² div n_g`` (each
term loses < 1 cent², so the scaled SSB loses < k·N cent² against an
``sst_scaled`` of order N²·Var — a relative error below k/N² of the
variance, decades beneath the published bp/milli precision at any SF,
and in any case bit-identical across engines because both publish the
spelling, not the ideal). Everything else is exact 128-bit integer
arithmetic on cent sums:

    sst_scaled = N·Σx² − S²           (= N²·Var_total, exact)
    ssb_scaled = N·Σ_g q_g − S²       (truncated spelling)
    ssw_scaled = sst_scaled − ssb_scaled
    vb         = ssb_scaled div N²    (published var_between_cents2)
    vw         = ssw_scaled div N²    (published var_within_cents2)
    eta2_bp    = (10⁴·ssb_scaled) div sst_scaled     (NULL if sst = 0)
    f_milli    = (1000·vb·(N−k)) div (vw·(k−1))      (NULL if vw = 0,
                                                      k ≤ 1, or the
                                                      quotient > 2⁶³−1)

Exactness of the inputs: cents are exact; all divisions are truncating
on non-negative integers (ssb_scaled ≥ −k·N only under truncation and
is clamped at 0 via greatest — the ideal value is ≥ 0 by
Cauchy–Schwarz). Degenerate censuses (SSW = 0 or k = 1, where F is
undefined) publish NULL in BOTH engines via an explicit CASE — never
an engine-dependent division by zero (Spark-4 ANSI throws where
DuckDB ``//`` yields NULL). `tests/test_anova.py` fuzzes the spelling
against exact-rational ANOVA and pins the error bound.

HEADROOM (decimal(38,0) / HUGEINT, both ~10³⁸): the largest
intermediate is eta2_bp's numerator 10⁴·ssb_scaled ≤ 10⁴·N²·Var_cents²
— with Var_cents² ≈ 2·10¹⁴ on this data that is ~4.5·10³⁶ at sf1000
(N ≈ 1.5·10⁹ orders ≈ 100 TB), inside range with ~30× to spare. The F
statistic is deliberately re-derived from the N²-reduced components
vb/vw (variances in cents², scale-FREE), so its numerator
1000·vb·(N−k) ≈ 10²⁶ at sf1000 — the naive full-scale spelling
1000·ssb_scaled·(N−k) ≈ 10⁴⁴ would overflow both engines around sf10
on adversarial (eta²→1) data. vb/vw themselves fit BIGINT at any SF.
The PUBLISHED quotient must also fit BIGINT: it is computed as an
exact decimal (never a long-valued `div` / HUGEINT→BIGINT cast) and
published NULL past 2⁶³−1 — the near-degenerate regime (vw = 1 cent²
under a huge vb·(N−k)) where an F in milli units stops being a
meaningful number anyway.

Spark-first shape, sized for 100 TB: one fact pass per grouping,
partial-aggregated to the ≤|groups|-row census (the nation/segment
groupings attach the customer dim attributes onto orders UNHINTED —
AQE broadcasts while the dim fits and shuffle-joins beyond, see the
comment in ``_census``; customer-side aggregation never happens); the
decomposition is census-side; bo4 unions four bounded censuses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from recommendersystems_bigdata_spark.catalog import load_table, load_tables
from recommendersystems_bigdata_spark.registry import query

_CENTS = "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
_DEC = "decimal(38,0)"

# DuckDB: per-group census for a given grouping expression, and the
# scaled decomposition over it.
def _duck_census(group_expr: str, joins: str) -> str:
    return f"""
g AS (
  SELECT {group_expr} AS grp,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum({_CENTS}) AS BIGINT) AS s,
         CAST(sum(CAST({_CENTS} AS HUGEINT) * {_CENTS}) AS HUGEINT) AS ssq
  FROM orders{joins}
  GROUP BY 1
),
t AS (
  SELECT CAST(sum(n) AS HUGEINT) AS big_n,
         CAST(sum(s) AS HUGEINT) AS big_s,
         CAST(sum(ssq) AS HUGEINT) AS big_ssq,
         CAST(count(*) AS BIGINT) AS k,
         CAST(sum(CAST(s AS HUGEINT) * s // n) AS HUGEINT) AS sum_q
  FROM g
),
d AS (
  SELECT k, CAST(big_n AS BIGINT) AS n,
         big_n * big_ssq - big_s * big_s AS sst_scaled,
         greatest(big_n * sum_q - big_s * big_s, 0) AS ssb_scaled
  FROM t
)
"""


_DUCK_DECOMP_SELECT = """
SELECT grouping, k, n,
       CAST(CASE WHEN sst_scaled = 0 THEN NULL
            ELSE (10000 * ssb_scaled) // sst_scaled END AS BIGINT)
         AS eta2_bp,
       CAST(CASE WHEN fq IS NULL OR fq > 9223372036854775807 THEN NULL
            ELSE fq END AS BIGINT) AS f_milli,
       CAST(vb AS BIGINT) AS var_between_cents2,
       CAST(vw AS BIGINT) AS var_within_cents2
FROM (
  SELECT grouping, k, n, sst_scaled, ssb_scaled, vb, vw,
         (1000 * vb * (n - k))
           // (CASE WHEN vw = 0 OR k <= 1 THEN NULL
               ELSE vw * (k - 1) END) AS fq
  FROM (
    SELECT {label} AS grouping, k, n, sst_scaled, ssb_scaled,
           ssb_scaled // (CAST(n AS HUGEINT) * n) AS vb,
           (sst_scaled - ssb_scaled) // (CAST(n AS HUGEINT) * n) AS vw
    FROM d
  )
)
"""

_SEG_JOIN = " o JOIN customer c ON o.o_custkey = c.c_custkey"
_NAT_JOIN = (
    " o JOIN customer c ON o.o_custkey = c.c_custkey"
    " JOIN nation nt ON c.c_nationkey = nt.n_nationkey"
)


def _census(spark: SparkSession, sf_dir: str, grouping: str) -> DataFrame:
    """(grp, n, s, ssq) census for one of the four groupings."""
    # The customer attach is deliberately UNHINTED: at test SF the
    # 2-column dim sits under the auto-broadcast threshold (plan test
    # sees a BroadcastHashJoin), while at 100 TB a hundreds-of-GB
    # customer dim must shuffle-join — forcing the hint measured 36×
    # at the 100× probe (a 15M-entry broadcast build, twice). The
    # 25-row nation dim stays an explicit broadcast.
    orders = load_table(spark, sf_dir, "orders")
    if grouping == "segment":
        customer = load_table(spark, sf_dir, "customer")
        base = orders.join(
            customer.select("c_custkey", "c_mktsegment"),
            orders.o_custkey == F.col("c_custkey"),
        ).select(F.col("c_mktsegment").alias("grp"), "o_totalprice")
    elif grouping == "nation":
        customer, nation = load_tables(spark, sf_dir, "customer", "nation")
        dim = customer.select("c_custkey", "c_nationkey").join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        ).select("c_custkey", "n_name")
        base = orders.join(
            dim, orders.o_custkey == F.col("c_custkey")
        ).select(F.col("n_name").alias("grp"), "o_totalprice")
    elif grouping == "priority":
        base = orders.select(
            F.col("o_orderpriority").alias("grp"), "o_totalprice"
        )
    else:  # year
        base = orders.select(
            F.year("o_orderdate").cast("string").alias("grp"), "o_totalprice"
        )
    return base.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(f"CAST(sum({_CENTS}) AS BIGINT)").alias("s"),
        F.expr(
            f"CAST(sum(CAST({_CENTS} AS {_DEC}) * {_CENTS}) AS {_DEC})"
        ).alias("ssq"),
    )


def _decomp(census: DataFrame, label: str) -> DataFrame:
    # Spark's `div` on decimal operands RETURNS LONG, so the naive
    # ``(s·s) div n`` overflows once s² div n exceeds 2⁶³ (measured at
    # the 10× probe). The exact identity
    #   s² div n = s·(s div n) + (s·(s mod n)) div n
    # keeps every intermediate in range: s·(s div n) multiplies in
    # decimal, and the second term's div VALUE is < s. DuckDB's
    # HUGEINT ``//`` computes the same value directly.
    sum_q_term = (
        f"CAST(s AS {_DEC}) * (s div n)"
        f" + (CAST(s AS {_DEC}) * (s % n)) div n"
    )
    t = census.agg(
        F.expr(f"CAST(sum(n) AS {_DEC})").alias("big_n"),
        F.expr(f"CAST(sum(s) AS {_DEC})").alias("big_s"),
        F.expr(f"CAST(sum(ssq) AS {_DEC})").alias("big_ssq"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.expr(f"CAST(sum({sum_q_term}) AS {_DEC})").alias("sum_q"),
    )
    d = t.select(
        "k",
        F.expr("CAST(big_n AS BIGINT)").alias("n"),
        F.expr("big_n * big_ssq - big_s * big_s").alias("sst_scaled"),
        F.expr(
            f"greatest(big_n * sum_q - big_s * big_s, CAST(0 AS {_DEC}))"
        ).alias("ssb_scaled"),
    )
    # vb/vw (the PUBLISHED variance components, cents²) are scale-free
    # — Spark's long-valued `div` is safe because a variance in cents²
    # fits long at any SF — and F is re-derived FROM them so the F
    # numerator stays ~10³·Var·N (≈10²⁶ at sf1000) instead of
    # 10³·N²·Var·N (≈10⁴⁴, past decimal(38,0)/HUGEINT). The published
    # F loses < 1/vw + 1/vb relative against the full-scale spelling —
    # decades beneath milli precision (tests pin the 1-ulp bound).
    # Degenerate censuses (SSW = 0, i.e. vw = 0, or k = 1) publish
    # NULL in BOTH engines — never a division by zero (Spark-4 ANSI
    # would throw where DuckDB // yields NULL). The quotient itself is
    # computed in DECIMAL (the `(x - x % y) / y` exact truncating
    # spelling — an integer quotient ≤ 1.4·10³¹ at sf1000 is exactly
    # representable in decimal(38,6)) and published only when it fits
    # BIGINT: a NEAR-degenerate census (vw as small as 1 cent² under a
    # huge vb·(n−k)) would otherwise overflow the long-valued `div` in
    # Spark and the HUGEINT→BIGINT cast in DuckDB — both engines now
    # publish NULL past 2⁶³−1 instead of throwing.
    v = d.select(
        F.lit(label).alias("grouping"),
        "k",
        "n",
        "sst_scaled",
        "ssb_scaled",
        F.expr(f"ssb_scaled div (CAST(n AS {_DEC}) * n)").alias("vb"),
        F.expr(
            f"(sst_scaled - ssb_scaled) div (CAST(n AS {_DEC}) * n)"
        ).alias("vw"),
    )
    v2 = v.select(
        "*",
        F.expr(f"CAST(1000 AS {_DEC}) * vb * (n - k)").alias("f_num"),
        F.expr(
            f"CASE WHEN vw = 0 OR k <= 1 THEN CAST(NULL AS {_DEC})"
            f" ELSE CAST(vw AS {_DEC}) * (k - 1) END"
        ).alias("f_den"),
    ).select(
        "*",
        # exact truncating quotient in decimal — NULL-den on degenerate
        F.expr("(f_num - f_num % f_den) / f_den").alias("fq"),
    )
    return v2.select(
        "grouping",
        "k",
        "n",
        F.expr(
            f"CAST(CASE WHEN sst_scaled = 0 THEN NULL"
            f" ELSE (CAST(10000 AS {_DEC}) * ssb_scaled) div sst_scaled"
            f" END AS BIGINT)"
        ).alias("eta2_bp"),
        F.expr(
            "CAST(CASE WHEN fq IS NULL"
            " OR fq > CAST(9223372036854775807 AS decimal(38,6))"
            " THEN NULL ELSE fq END AS BIGINT)"
        ).alias("f_milli"),
        F.col("vb").cast("long").alias("var_between_cents2"),
        F.col("vw").cast("long").alias("var_within_cents2"),
    )


@query(
    "q_anova_groups",
    oracle=f"""
    WITH {_duck_census("c.c_mktsegment", _SEG_JOIN)}
    SELECT grp AS segment, n, s AS sum_cents,
           CAST(s // n AS BIGINT) AS mean_cents,
           CAST((1000 * (n * ssq - CAST(s AS HUGEINT) * s))
                // (CAST(n AS HUGEINT) * n) AS BIGINT) AS var_milli_cents2
    FROM g ORDER BY segment
    """,
)
def q_anova_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BO bo1 — per-market-segment order-value moments: n, exact
    cent sum, truncated mean, and the population variance in
    milli-cents² from the cleared form ``(n·Σx² − S²)/n²`` — no float
    variance, the §2.BK device on the money column.

    Scale: the customer segment attaches to orders AQE-decided
    (broadcast under the threshold, shuffle-join beyond); one
    partial-aggregated fact pass to the 5-row census."""
    census = _census(spark, sf_dir, "segment")
    return (
        census.select(
            F.col("grp").alias("segment"),
            "n",
            F.col("s").alias("sum_cents"),
            F.expr("CAST(s div n AS BIGINT)").alias("mean_cents"),
            F.expr(
                f"CAST((1000 * (n * ssq - CAST(s AS {_DEC}) * s))"
                f" div (CAST(n AS {_DEC}) * n) AS BIGINT)"
            ).alias("var_milli_cents2"),
        )
        .orderBy("segment")
    )


@query(
    "q_anova_decomposition",
    oracle=f"""
    WITH {_duck_census("c.c_mktsegment", _SEG_JOIN)}
    {_DUCK_DECOMP_SELECT.format(label="'segment'")}
    """,
)
def q_anova_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BO bo2 — the one-way decomposition for the market-segment
    grouping, one row: group count k, N, eta² in bp, the F statistic
    in milli, and the between/within variance components in cents²
    (scaled sums over N² — the truncated-term spelling in the module
    doc, fuzzed against exact-rational ANOVA).

    Scale: bo1's census reduced to one row; all arithmetic 128-bit
    census-side."""
    return _decomp(_census(spark, sf_dir, "segment"), "segment")


@query(
    "q_anova_segment_effects",
    oracle=f"""
    WITH {_duck_census("c.c_mktsegment", _SEG_JOIN)},
    gt AS (
      SELECT CAST(sum(s) AS HUGEINT) AS big_s,
             CAST(sum(n) AS HUGEINT) AS big_n
      FROM g
    )
    SELECT grp AS segment, n,
           CAST(s // n AS BIGINT) AS mean_cents,
           CAST(big_s // big_n AS BIGINT) AS grand_mean_cents,
           CAST(s // n - big_s // big_n AS BIGINT) AS effect_cents
    FROM g, gt ORDER BY segment
    """,
)
def q_anova_segment_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BO bo3 — per-segment effects: each segment's truncated mean
    against the grand mean and the signed effect in cents — the
    readable companion to bo2's "is there an effect at all". Both
    means are PUBLISHED truncations, so the effect column recomposes
    from the other two exactly.

    Scale: the 5-row census plus a 1-row grand-total broadcast."""
    census = _census(spark, sf_dir, "segment")
    gt = census.agg(
        F.expr(f"CAST(sum(s) AS {_DEC})").alias("big_s"),
        F.expr(f"CAST(sum(n) AS {_DEC})").alias("big_n"),
    )
    return (
        census.crossJoin(F.broadcast(gt))
        .select(
            F.col("grp").alias("segment"),
            "n",
            F.expr("CAST(s div n AS BIGINT)").alias("mean_cents"),
            F.expr("CAST(big_s div big_n AS BIGINT)").alias(
                "grand_mean_cents"
            ),
            F.expr(
                "CAST(s div n - big_s div big_n AS BIGINT)"
            ).alias("effect_cents"),
        )
        .orderBy("segment")
    )


@query(
    "q_variance_explained_ladder",
    oracle=f"""
    WITH {_duck_census("c.c_mktsegment", _SEG_JOIN)}
    {_DUCK_DECOMP_SELECT.format(label="'segment'")}
    UNION ALL
    (WITH {_duck_census("nt.n_name", _NAT_JOIN)}
     {_DUCK_DECOMP_SELECT.format(label="'nation'")})
    UNION ALL
    (WITH {_duck_census("o_orderpriority", "")}
     {_DUCK_DECOMP_SELECT.format(label="'priority'")})
    UNION ALL
    (WITH {_duck_census("CAST(year(o_orderdate) AS VARCHAR)", "")}
     {_DUCK_DECOMP_SELECT.format(label="'year'")})
    ORDER BY grouping
    """,
)
def q_variance_explained_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BO bo4 — the variance-explained ladder: eta²/F for four
    candidate groupings of order value (market segment, customer
    nation, order priority, order year) in one table — the
    "which dimension is worth segmenting on" ranking, i.e. variance-
    based feature importance computed exactly.

    Scale: four independent single-pass censuses (each ≤25 rows),
    each reduced census-side; the union is 4 rows. The nation/segment
    groupings attach dim attributes to the fact by broadcast."""
    rows = None
    for grouping in ("nation", "priority", "segment", "year"):
        d = _decomp(_census(spark, sf_dir, grouping), grouping)
        rows = d if rows is None else rows.unionAll(d)
    return rows.orderBy("grouping")
