"""Privacy / governance audits over the customer dimension (SURVEY.md
§2.O): k-anonymity, l-diversity, recursive (c,l)-diversity and
t-closeness equivalence-class reports.

A training-data pipeline that joins user-keyed tables must know, before
release, how re-identifiable the quasi-identifier combinations are.
These are the standard audits — k-anonymity (Sweeney 2002: every
quasi-identifier equivalence class must hold ≥ k individuals),
l-diversity and its recursive (c,l) refinement (Machanavajjhala et al.,
ICDE 2006: each class must span ≥ l sensitive values, and no single
value may dominate the class), and t-closeness (Li, Li & Venkatasubramanian,
ICDE 2007: each class's sensitive-value distribution must stay within
distance t of the corpus-wide distribution) — computed as plain
distributed aggregations so they run as a release gate at any corpus
size.

Every audit takes the quasi-identifier column list as a parameter
(:func:`kanonymity_report` etc.); the registered queries bind the
repo's canonical QI tuple ``(c_nationkey, c_mktsegment)`` so the oracle
SQL is a fixed string, but the plan shape is identical for any column
list.

Determinism discipline: group sizes and distinct counts are integers;
the sensitive attribute is banded on exact integer CENTS with true
FLOOR division (the mod-normalized spelling below — round-7's
truncating ``div 1000`` merged every balance in (-1000, 0) into band 0
with [0, 1000), understating risk for negative-balance classes); the
t-closeness distance is an integer basis-point cross-multiply (never a
float quotient fed to round — see
memory/duckdb-spark-round-tie-divergence), so all audits hash-match
DuckDB exactly on any partition layout.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table, register_views
from recommendersystems_bigdata_spark.registry import query

_K_THRESHOLD = 5
_L_THRESHOLD = 3
# recursive (c,l)-diversity: top band count must be < c × (tail past the
# first l−1 bands); c=3, l=3 is the paper's running example.
_CL_C = 3
# t-closeness: flag classes whose total-variation distance from the
# corpus-wide band distribution exceeds 0.2 (2000 basis points).
_T_BP = 2000
_QI: tuple[str, ...] = ("c_nationkey", "c_mktsegment")
_BAND_CENTS = 100_000  # 1000 currency units, in exact integer cents


def _floor_div_sql(expr: str, d: int, op: str) -> str:
    """True floor division of a possibly-negative integer SQL expression
    by positive ``d``, spelled with a TRUNCATING integer-division operator
    ``op`` (Spark ``div`` / DuckDB ``//`` — both truncate toward zero, and
    both engines' ``%`` takes the dividend's sign, verified on negatives).
    Normalizing the remainder first makes the numerator exactly divisible,
    so truncation equals floor on both engines."""
    return f"((({expr}) - ((({expr}) % {d}) + {d}) % {d}) {op} {d})"


_CENTS = "CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)"
_BAND_SPARK = _floor_div_sql(_CENTS, _BAND_CENTS, "div")
_BAND_DUCK = _floor_div_sql(_CENTS, _BAND_CENTS, "//")


def _with_band(df: DataFrame) -> DataFrame:
    return df.withColumn("band", F.expr(_BAND_SPARK))


def kanonymity_report(df: DataFrame, qi: Sequence[str], k: int = _K_THRESHOLD) -> DataFrame:
    """Equivalence-class census over any QI column list: (qi..., group_size,
    risky) with risky = 1 iff the class holds fewer than ``k`` rows."""
    return df.groupBy(*qi).agg(
        F.count(F.lit(1)).alias("group_size"),
        F.when(F.count(F.lit(1)) < k, 1).otherwise(0).cast("long").alias("risky"),
    )


@query(
    "q_kanonymity_audit",
    oracle=f"""
    SELECT c_nationkey, c_mktsegment,
           count(*) AS group_size,
           CAST(CASE WHEN count(*) < {_K_THRESHOLD} THEN 1 ELSE 0 END AS BIGINT)
               AS risky
    FROM customer
    GROUP BY 1, 2
    """,
)
def q_kanonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """o1 — k-anonymity equivalence-class audit (k = 5).

    Treats (c_nationkey, c_mktsegment) as the quasi-identifier tuple and
    emits every equivalence class with its size and a ``risky`` flag
    (size < 5): the exact table a release gate reads to decide which
    classes need suppression or generalization before the keyed data can
    ship. Flag thresholding happens INSIDE the audit (not left to the
    consumer) so the gate's decision is itself hash-checked.

    Scale design: one partial-aggregated groupBy on the QI tuple — the
    map-side combine collapses each executor's rows to ≤|QI-classes|
    partials, so shuffle volume is class-count-bound (≤125 here), not
    row-count-bound; at 100 TB this is the same one-pass census any
    release pipeline can afford nightly. The QI tuple is a real
    parameter of :func:`kanonymity_report`; this query binds the
    canonical pair so the oracle is a fixed string."""
    return kanonymity_report(load_table(spark, sf_dir, "customer"), _QI)


def ldiversity_report(
    df: DataFrame, qi: Sequence[str], l_threshold: int = _L_THRESHOLD
) -> DataFrame:
    """Distinct-sensitive-band census per QI class (``df`` must already
    carry the integer ``band`` column)."""
    return df.groupBy(*qi).agg(
        F.count(F.lit(1)).alias("group_size"),
        F.countDistinct("band").alias("l_distinct"),
        F.when(F.countDistinct("band") < l_threshold, 1)
        .otherwise(0)
        .cast("long")
        .alias("low_diversity"),
    )


@query(
    "q_ldiversity_audit",
    oracle=f"""
    SELECT c_nationkey, c_mktsegment,
           count(*) AS group_size,
           count(DISTINCT {_BAND_DUCK}) AS l_distinct,
           CAST(CASE WHEN count(DISTINCT {_BAND_DUCK}) < {_L_THRESHOLD}
                     THEN 1 ELSE 0 END AS BIGINT) AS low_diversity
    FROM customer
    GROUP BY 1, 2
    """,
)
def q_ldiversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """o2 — l-diversity audit of the sensitive attribute (l = 3).

    Same quasi-identifier classes as o1, but the leak model is attribute
    disclosure: a class of 50 customers who all sit in one account-
    balance band reveals every member's band despite being 50-anonymous.
    The sensitive value is the thousand-unit balance band computed on
    exact integer cents (``floor(acctbal*100+0.5)``) with TRUE floor
    division (mod-normalized — see :func:`_floor_div_sql`), so negative
    balances band as −1, −2, … instead of collapsing into band 0 as a
    truncating division would (the round-7 bug this fixed: merging
    (−1000, 0) with [0, 1000) inflated apparent diversity for classes
    holding negative balances). The audit reports each class's
    distinct-band count and a ``low_diversity`` flag (< 3 bands).

    Scale design: groupBy QI + count(distinct band) — Spark expands
    distinct aggregation to a two-phase partial/final plan over
    (QI, band), so shuffle volume is bounded by classes × bands, not
    rows. One pass, broadcast-free, the same nightly-gate economics as
    o1."""
    return ldiversity_report(_with_band(load_table(spark, sf_dir, "customer")), _QI)


def cl_diversity_report(
    df: DataFrame, qi: Sequence[str], c: int = _CL_C
) -> DataFrame:
    """Recursive (c, 3)-diversity per QI class (``df`` must carry ``band``):
    with per-class band counts r1 ≥ r2 ≥ …, the class passes iff
    r1 < c · (r3 + r4 + …) — the most common sensitive value must not
    dominate the tail past the two most common. All-integer, so the
    verdict is exact. Tie discipline: r1/r2 are the two largest VALUES of
    the count multiset (row_number tiebreak by band id only decides which
    band carries which rank, never the summed values)."""
    qi_cols = [F.col(c_) for c_ in qi]
    cls = df.groupBy(*qi, "band").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy(*qi_cols).orderBy(F.desc("cnt"), F.asc("band"))
    ranked = cls.withColumn("rn", F.row_number().over(w))
    out = ranked.groupBy(*qi).agg(
        F.sum("cnt").alias("group_size"),
        F.count(F.lit(1)).alias("n_bands"),
        F.coalesce(F.sum(F.when(F.col("rn") == 1, F.col("cnt"))), F.lit(0))
        .cast("long")
        .alias("top1_count"),
        F.coalesce(F.sum(F.when(F.col("rn") == 2, F.col("cnt"))), F.lit(0))
        .cast("long")
        .alias("top2_count"),
    )
    tail = F.col("group_size") - F.col("top1_count") - F.col("top2_count")
    return out.select(
        *qi,
        F.col("group_size").cast("long").alias("group_size"),
        "n_bands",
        "top1_count",
        "top2_count",
        tail.cast("long").alias("tail_count"),
        F.when(F.col("top1_count") < c * tail, 1).otherwise(0).cast("long").alias("cl_ok"),
    )


@query(
    "q_cl_diversity_audit",
    oracle=f"""
    WITH cls AS (
      SELECT c_nationkey, c_mktsegment, {_BAND_DUCK} AS band, count(*) AS cnt
      FROM customer
      GROUP BY 1, 2, 3
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY c_nationkey, c_mktsegment
               ORDER BY cnt DESC, band ASC) AS rn
      FROM cls
    ),
    agg AS (
      SELECT c_nationkey, c_mktsegment,
             sum(cnt) AS group_size,
             count(*) AS n_bands,
             coalesce(sum(CASE WHEN rn = 1 THEN cnt END), 0) AS top1_count,
             coalesce(sum(CASE WHEN rn = 2 THEN cnt END), 0) AS top2_count
      FROM ranked
      GROUP BY 1, 2
    )
    SELECT c_nationkey, c_mktsegment,
           CAST(group_size AS BIGINT) AS group_size,
           n_bands,
           CAST(top1_count AS BIGINT) AS top1_count,
           CAST(top2_count AS BIGINT) AS top2_count,
           CAST(group_size - top1_count - top2_count AS BIGINT) AS tail_count,
           CAST(CASE WHEN top1_count < {_CL_C} * (group_size - top1_count - top2_count)
                     THEN 1 ELSE 0 END AS BIGINT) AS cl_ok
    FROM agg
    """,
)
def q_cl_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """o3 — recursive (c, l)-diversity audit (c = 3, l = 3).

    Plain l-diversity (o2) counts distinct sensitive bands but a class
    can hold 3 bands where one covers 98% of rows — an attacker's
    posterior is still near-certain. The recursive refinement
    (Machanavajjhala et al. §4.2) requires the MOST COMMON band's count
    r1 to stay below c × (sum of counts past the first l−1 bands):
    skewed-but-technically-diverse classes fail. Every quantity is an
    integer count and r1/r2 are multiset order statistics, so the
    verdict needs no float and hash-matches exactly.

    Scale design: one partial-aggregated groupBy on (QI, band) — shuffle
    bounded by classes × bands — then a window rank WITHIN each class
    (partition sizes = bands per class, ≤ ~20 here, never rows) and a
    final class-level aggregate. The QI tuple is a parameter of
    :func:`cl_diversity_report`."""
    return cl_diversity_report(_with_band(load_table(spark, sf_dir, "customer")), _QI)


def tcloseness_report(
    df: DataFrame, qi: Sequence[str], t_bp: int = _T_BP
) -> DataFrame:
    """t-closeness per QI class (``df`` must carry ``band``): total-
    variation distance between the class's band distribution and the
    corpus-wide one, in exact integer basis points.

    TVD = ½ Σ_s |p_class(s) − p_corpus(s)| = Σ_s max(p_class(s) −
    p_corpus(s), 0) — the one-sided form needs only bands PRESENT in the
    class (absent bands contribute nothing to the positive part), so no
    dense band × class grid is materialized. Cross-multiplied to
    integers: tvd_bp = (10000 · Σ_s max(cnt·N − g_s·n_c, 0)) div (n_c·N),
    truncating division on non-negative operands — identical on both
    engines. Products are summed as decimal(38,0): |cnt·N| ≤ N² needs
    int128 once N exceeds ~3·10⁹ rows, which a 100 TB customer dimension
    can reach."""
    qi_cols = [F.col(c_) for c_ in qi]
    cls = df.groupBy(*qi, "band").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy(*qi_cols)
    cls = cls.withColumn("n_c", F.sum("cnt").over(w))
    glob = cls.groupBy("band").agg(F.sum("cnt").alias("g"))
    total = glob.agg(F.sum("g").cast("long").alias("n_total"))
    joined = (
        cls.join(F.broadcast(glob), "band")
        .join(F.broadcast(total), how="cross")
        .withColumn(
            "pos",
            F.greatest(
                F.col("cnt").cast("decimal(38,0)") * F.col("n_total")
                - F.col("g").cast("decimal(38,0)") * F.col("n_c"),
                F.lit(0).cast("decimal(38,0)"),
            ),
        )
    )
    out = joined.groupBy(*qi).agg(
        F.max("n_c").cast("long").alias("group_size"),
        F.sum("pos").alias("pos_sum"),
        F.max("n_total").alias("n_total"),
    )
    tvd = F.expr(
        "CAST((CAST(10000 AS DECIMAL(38,0)) * pos_sum)"
        " div (CAST(group_size AS DECIMAL(38,0)) * n_total) AS BIGINT)"
    )
    return out.select(
        *qi,
        "group_size",
        tvd.alias("tvd_bp"),
        F.when(tvd > t_bp, 1).otherwise(0).cast("long").alias("breach"),
    )


@query(
    "q_tcloseness_audit",
    oracle=f"""
    WITH cls AS (
      SELECT c_nationkey, c_mktsegment, {_BAND_DUCK} AS band, count(*) AS cnt
      FROM customer
      GROUP BY 1, 2, 3
    ),
    sized AS (
      SELECT *, sum(cnt) OVER (PARTITION BY c_nationkey, c_mktsegment) AS n_c
      FROM cls
    ),
    band_tot AS (SELECT band, sum(cnt) AS g FROM cls GROUP BY band),
    tot AS (SELECT sum(g) AS n_total FROM band_tot),
    terms AS (
      SELECT s.c_nationkey, s.c_mktsegment, s.n_c, t.n_total,
             greatest(s.cnt * t.n_total - gl.g * s.n_c, 0) AS pos
      FROM sized s JOIN band_tot gl USING (band) CROSS JOIN tot t
    ),
    agg AS (
      SELECT c_nationkey, c_mktsegment,
             max(n_c) AS group_size, sum(pos) AS pos_sum, max(n_total) AS n_total
      FROM terms
      GROUP BY 1, 2
    )
    SELECT c_nationkey, c_mktsegment,
           CAST(group_size AS BIGINT) AS group_size,
           CAST((10000 * pos_sum) // (group_size * n_total) AS BIGINT) AS tvd_bp,
           CAST(CASE WHEN (10000 * pos_sum) // (group_size * n_total) > {_T_BP}
                     THEN 1 ELSE 0 END AS BIGINT) AS breach
    FROM agg
    """,
)
def q_tcloseness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """o4 — t-closeness audit (t = 0.20, reported in basis points).

    The strongest of the §2.O gates: even a diverse, non-dominated class
    leaks if its sensitive distribution DIFFERS sharply from the
    corpus-wide one (a class that is 90% band −1 in a corpus that is 5%
    band −1 tells the attacker a lot). Reports each class's total-
    variation distance from the global band distribution as an exact
    integer ``tvd_bp`` plus a ``breach`` flag (> 2000 bp). The one-sided
    TVD identity keeps the computation sparse, and the cross-multiplied
    integer form (decimal(38,0) intermediates) makes the hash compare
    exact — no float division anywhere.

    Scale design: one (QI, band) partial-aggregated groupBy (shuffle
    bounded by classes × bands), a within-class window over ≤ bands
    rows, and two broadcast sides — the per-band global counts (≤ bands
    rows) and the 1-row total. Nothing in the plan scales with corpus
    rows except the first map-side combine. The QI tuple is a parameter
    of :func:`tcloseness_report`."""
    return tcloseness_report(_with_band(load_table(spark, sf_dir, "customer")), _QI)


# The generalization lattice the o5 audit sweeps: the canonical QI pair at
# three nested granularities. GROUPING() masks are spelled per-engine but
# the bit order (the column list below) is identical, so the CASE decode
# matches bit-for-bit.
_GEN_SQL = f"""
    WITH joined AS (
      SELECT c.c_nationkey, n.n_regionkey, c.c_mktsegment
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    ),
    cls AS (
      SELECT CASE GROUPING(c_nationkey) * 4 + GROUPING(n_regionkey) * 2
                  + GROUPING(c_mktsegment)
               WHEN 0 THEN 'L0_nation_segment'
               WHEN 4 THEN 'L1_region_segment'
               WHEN 6 THEN 'L2_segment'
             END AS level,
             count(*) AS class_size
      FROM joined
      GROUP BY GROUPING SETS (
        (c_nationkey, n_regionkey, c_mktsegment),
        (n_regionkey, c_mktsegment),
        (c_mktsegment)
      )
    )
    SELECT level,
           count(*) AS n_classes,
           CAST(sum(CASE WHEN class_size < {_K_THRESHOLD} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_risky_classes,
           CAST(coalesce(sum(CASE WHEN class_size < {_K_THRESHOLD}
                                  THEN class_size END), 0) AS BIGINT)
               AS n_suppressed_rows,
           CAST(min(class_size) AS BIGINT) AS min_class_size
    FROM cls
    GROUP BY level
"""


@query("q_qi_generalization_audit", oracle=_GEN_SQL)
def q_qi_generalization_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """o5 — generalization-lattice k-anonymity sweep (k = 5).

    When o1 flags risky classes, the remediation question is "how far up
    the generalization hierarchy must the quasi-identifier climb before
    every class clears k — and what does each rung cost in suppression?".
    This audit answers it in one pass: the QI pair at three nested
    granularities — (nation, segment) → (region, segment) → (segment) —
    each reported with its class count, risky-class count, rows a
    suppress-the-risky-classes release would drop, and the minimum class
    size (the k the level actually achieves). The release gate picks the
    FIRST level whose n_risky_classes is 0; the n_suppressed_rows column
    is the price of stopping a level earlier. All quantities are integer
    counts — exact hash match.

    Scale design: the nation→region generalization joins a 25-row
    broadcast dim; the lattice is ONE GROUPING SETS aggregation (Spark
    expands to a single Expand + partial/final aggregate — one shuffle
    whose volume is bounded by Σ per-level class counts, ≤155 here, per
    map task), then a 3-key census over the class table. Adding a rung
    (e.g. banded acctbal in the QI) is one more grouping set in the same
    single pass — the lattice sweep never rescans the corpus per level,
    which is what makes a release-gate retry loop affordable at 100 TB.
    GROUPING() bit order is pinned by the shared column list, so the
    level decode is engine-portable."""
    register_views(spark, sf_dir)
    return spark.sql(_GEN_SQL)
