"""Deterministic sketch set algebra (SURVEY.md §2.AH, round 9).

Set-overlap analytics over the event stream's user sets, with two
complementary exactness regimes — both fully deterministic, so unlike
HLL/CountMin (§2.D's rows-only sketches) every result here HASH-CHECKS
against the DuckDB oracle:

- KMV (k-minimum-values) sketches built on ``md5(user_id)`` — the same
  public bottom-k-by-hash construction as b9's deterministic sample.
  A KMV sketch of a set is its k lexicographically-smallest member
  hashes; sketches MERGE by taking the bottom-k of a union of bottoms,
  and the classic estimators need no hash-to-number conversion when
  phrased as MEMBERSHIP COUNTS: among the bottom-k of A∪B, the fraction
  belonging to both sides estimates Jaccard(A, B); the fraction of
  bottom-k(A) belonging to B estimates containment(A ⊆ B). Counting is
  integer, md5 is engine-identical, so the ESTIMATE ITSELF is exact-
  reproducible (and each query also carries the true value, so the
  artifact doubles as an estimator-quality record).
- Exact bitmap words: user/customer ids packed 62 per BIGINT
  (``word = id div 62``, ``mask = 1 << (id % 62)`` — 62 keeps the sign
  bit and bit 62 clear, so no negative-BIGINT hazards in either
  engine), OR-aggregated per (set, word); intersections are ``bit_and``
  of aligned words and cardinalities ``sum(bit_count(word))``. The
  bitmap algebra a warehouse runs for exact audience overlap.

Spark-first shape, sized for 100 TB:
- Membership is ONE groupBy over the fact (user → 5 boolean flags);
  every pairwise statistic derives from that bounded user relation.
- KMV bottom-k per pair runs as a row_number window over the ≤10-pair
  fan-out of the user relation — at corpus scale the documented lever
  is a hash-prefix prefilter (md5 < threshold keeps the bottom-k
  intact while shrinking the sort 16×–256×), exactly b9's TakeOrdered
  lowering generalized per group.
- Bitmap words shuffle |ids| / 62 rows per set — a 62× compression of
  the id stream — and the pair join is an equi-join on word index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query

_K = 64  # KMV sketch size

_TYPES = ("click", "error", "purchase", "signup", "view")

# per-user membership flags across the five event types — the one fact
# pass every query here starts from
_MEMBERS_SQL = """
members AS (
  SELECT user_id AS uid, md5(CAST(user_id AS VARCHAR)) AS h,
         max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) = 1 AS m_click,
         max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) = 1 AS m_error,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 1 AS m_purchase,
         max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) = 1 AS m_signup,
         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) = 1 AS m_view
  FROM events GROUP BY 1, 2
)
"""

_PAIRS = [
    (a, b) for i, a in enumerate(_TYPES) for b in _TYPES[i + 1 :]
]
_ORDERED_PAIRS = [(a, b) for a in _TYPES for b in _TYPES if a != b]


def _members(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    aggs = [
        (F.max(F.when(F.col("event_type") == t, 1).otherwise(0)) == 1).alias(f"m_{t}")
        for t in _TYPES
    ]
    return ev.groupBy(
        F.col("user_id").alias("uid"),
        F.md5(F.col("user_id").cast("string")).alias("h"),
    ).agg(*aggs)


def _pair_grid_sql(pairs: list[tuple[str, str]]) -> str:
    rows = ", ".join(f"('{a}', '{b}')" for a, b in pairs)
    return f"(VALUES {rows}) AS g(ta, tb)"


@query(
    "q_kmv_jaccard_matrix",
    oracle=f"""
    WITH {_MEMBERS_SQL},
    fan AS (
      SELECT g.ta, g.tb, m.uid, m.h,
             CASE g.ta WHEN 'click' THEN m_click WHEN 'error' THEN m_error
                       WHEN 'purchase' THEN m_purchase WHEN 'signup' THEN m_signup
                       ELSE m_view END AS in_a,
             CASE g.tb WHEN 'click' THEN m_click WHEN 'error' THEN m_error
                       WHEN 'purchase' THEN m_purchase WHEN 'signup' THEN m_signup
                       ELSE m_view END AS in_b
      FROM members m CROSS JOIN {_pair_grid_sql(_PAIRS)}
    ),
    u AS (
      SELECT ta, tb, in_a, in_b,
             row_number() OVER (PARTITION BY ta, tb ORDER BY h, uid) AS rn
      FROM fan WHERE in_a OR in_b
    ),
    est AS (
      SELECT ta, tb,
             CAST(sum(CASE WHEN rn <= {_K} AND in_a AND in_b THEN 1 ELSE 0 END)
                  AS BIGINT) AS k_both,
             CAST(least(count(*), {_K}) AS BIGINT) AS k_eff,
             CAST(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) AS BIGINT)
               AS n_intersect,
             CAST(count(*) AS BIGINT) AS n_union
      FROM u GROUP BY 1, 2
    )
    SELECT ta, tb, k_eff, n_union, n_intersect,
           (10000 * k_both) // k_eff AS jaccard_est_bp,
           (10000 * n_intersect) // n_union AS jaccard_exact_bp
    FROM est ORDER BY ta, tb
    """,
)
def q_kmv_jaccard_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AH ah1 — KMV Jaccard matrix: for all 10 unordered event-type
    pairs, the Jaccard similarity of their user sets ESTIMATED from the
    k=64 minimum md5 hashes of the union (the fraction of those minima
    belonging to both sides), next to the exact value — both in bp, both
    deterministic, so the whole matrix hash-checks and doubles as an
    estimator-quality record. Mergeability is the point at 100 TB: each
    shard's bottom-k union-merges into the global bottom-k, the same
    property b9 pins for the deterministic sample.

    Scale: ONE fact pass builds per-user membership flags; the ≤10×
    pair fan-out runs over the bounded user relation, and the per-pair
    bottom-k window sorts union members only (lever at corpus scale: an
    md5-prefix prefilter shrinks the sorted set without touching the
    bottom-k)."""
    members = _members(spark, sf_dir)
    grid = F.broadcast(
        spark.createDataFrame(_PAIRS, ["ta", "tb"])
    )
    fan = members.join(grid)
    # CASE-decode the membership flag named by ta/tb (no per-pair columns)
    decode = lambda side: (  # noqa: E731
        F.when(F.col(side) == "click", F.col("m_click"))
        .when(F.col(side) == "error", F.col("m_error"))
        .when(F.col(side) == "purchase", F.col("m_purchase"))
        .when(F.col(side) == "signup", F.col("m_signup"))
        .otherwise(F.col("m_view"))
    )
    fan = fan.select(
        "ta", "tb", "uid", "h", decode("ta").alias("in_a"), decode("tb").alias("in_b")
    ).where(F.col("in_a") | F.col("in_b"))
    w = Window.partitionBy("ta", "tb").orderBy("h", "uid")
    u = fan.withColumn("rn", F.row_number().over(w))
    est = u.groupBy("ta", "tb").agg(
        F.sum(F.when((F.col("rn") <= _K) & F.col("in_a") & F.col("in_b"), 1).otherwise(0))
        .cast("long")
        .alias("k_both"),
        F.least(F.count(F.lit(1)), F.lit(_K)).cast("long").alias("k_eff"),
        F.sum(F.when(F.col("in_a") & F.col("in_b"), 1).otherwise(0))
        .cast("long")
        .alias("n_intersect"),
        F.count(F.lit(1)).cast("long").alias("n_union"),
    )
    return est.select(
        "ta",
        "tb",
        "k_eff",
        "n_union",
        "n_intersect",
        F.expr("(10000 * k_both) div k_eff").alias("jaccard_est_bp"),
        F.expr("(10000 * n_intersect) div n_union").alias("jaccard_exact_bp"),
    ).orderBy("ta", "tb")


@query(
    "q_kmv_containment_matrix",
    oracle=f"""
    WITH {_MEMBERS_SQL},
    fan AS (
      SELECT g.ta, g.tb, m.uid, m.h,
             CASE g.ta WHEN 'click' THEN m_click WHEN 'error' THEN m_error
                       WHEN 'purchase' THEN m_purchase WHEN 'signup' THEN m_signup
                       ELSE m_view END AS in_a,
             CASE g.tb WHEN 'click' THEN m_click WHEN 'error' THEN m_error
                       WHEN 'purchase' THEN m_purchase WHEN 'signup' THEN m_signup
                       ELSE m_view END AS in_b
      FROM members m CROSS JOIN {_pair_grid_sql(_ORDERED_PAIRS)}
    ),
    a_side AS (
      SELECT ta, tb, in_b,
             row_number() OVER (PARTITION BY ta, tb ORDER BY h, uid) AS rn
      FROM fan WHERE in_a
    ),
    est AS (
      SELECT ta, tb,
             CAST(sum(CASE WHEN rn <= {_K} AND in_b THEN 1 ELSE 0 END) AS BIGINT)
               AS k_in_b,
             CAST(least(count(*), {_K}) AS BIGINT) AS k_eff,
             CAST(sum(CASE WHEN in_b THEN 1 ELSE 0 END) AS BIGINT) AS n_in_b,
             CAST(count(*) AS BIGINT) AS n_a
      FROM a_side GROUP BY 1, 2
    )
    SELECT ta, tb, k_eff, n_a, n_in_b,
           (10000 * k_in_b) // k_eff AS containment_est_bp,
           (10000 * n_in_b) // n_a AS containment_exact_bp
    FROM est ORDER BY ta, tb
    """,
)
def q_kmv_containment_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AH ah2 — KMV containment matrix: for all 20 ordered event-type
    pairs (A, B), how much of A's user set lies inside B's — estimated
    as the B-membership rate among the k=64 minimum hashes OF A, next to
    the exact rate, both bp. Containment is the asymmetric statistic
    Jaccard hides (a small funnel stage can be 100% contained in a big
    one at near-zero Jaccard); on sketches it needs only A's bottom-k
    plus a membership probe, which is why audience systems ship it.

    Scale: same one-pass membership base; the per-pair window sorts
    A-members only. The B-membership probe is a flag lookup on the same
    row — no join back to the fact."""
    members = _members(spark, sf_dir)
    grid = F.broadcast(spark.createDataFrame(_ORDERED_PAIRS, ["ta", "tb"]))
    decode = lambda side: (  # noqa: E731
        F.when(F.col(side) == "click", F.col("m_click"))
        .when(F.col(side) == "error", F.col("m_error"))
        .when(F.col(side) == "purchase", F.col("m_purchase"))
        .when(F.col(side) == "signup", F.col("m_signup"))
        .otherwise(F.col("m_view"))
    )
    fan = (
        members.join(grid)
        .select(
            "ta", "tb", "uid", "h",
            decode("ta").alias("in_a"), decode("tb").alias("in_b"),
        )
        .where(F.col("in_a"))
    )
    w = Window.partitionBy("ta", "tb").orderBy("h", "uid")
    a_side = fan.withColumn("rn", F.row_number().over(w))
    est = a_side.groupBy("ta", "tb").agg(
        F.sum(F.when((F.col("rn") <= _K) & F.col("in_b"), 1).otherwise(0))
        .cast("long")
        .alias("k_in_b"),
        F.least(F.count(F.lit(1)), F.lit(_K)).cast("long").alias("k_eff"),
        F.sum(F.when(F.col("in_b"), 1).otherwise(0)).cast("long").alias("n_in_b"),
        F.count(F.lit(1)).cast("long").alias("n_a"),
    )
    return est.select(
        "ta",
        "tb",
        "k_eff",
        "n_a",
        "n_in_b",
        F.expr("(10000 * k_in_b) div k_eff").alias("containment_est_bp"),
        F.expr("(10000 * n_in_b) div n_a").alias("containment_exact_bp"),
    ).orderBy("ta", "tb")


@query(
    "q_bitmap_overlap_matrix",
    oracle=f"""
    WITH buyers AS (
      SELECT DISTINCT c.c_mktsegment AS seg, o.o_custkey AS ck
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    words AS (
      SELECT seg, ck // 62 AS wid,
             bit_or(1::BIGINT << CAST(ck % 62 AS INTEGER)) AS w
      FROM buyers GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.seg AS seg_a, b.seg AS seg_b,
             CAST(sum(bit_count(a.w & b.w)) AS BIGINT) AS n_both
      FROM words a JOIN words b ON a.wid = b.wid AND a.seg < b.seg
      GROUP BY 1, 2
    ),
    sizes AS (
      SELECT seg, CAST(sum(bit_count(w)) AS BIGINT) AS n FROM words GROUP BY 1
    )
    SELECT p.seg_a, p.seg_b, sa.n AS n_a, sb.n AS n_b, p.n_both,
           (10000 * p.n_both) // (sa.n + sb.n - p.n_both) AS jaccard_bp
    FROM pairs p
    JOIN sizes sa ON sa.seg = p.seg_a
    JOIN sizes sb ON sb.seg = p.seg_b
    ORDER BY seg_a, seg_b
    """,
)
def q_bitmap_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AH ah3 — exact bitmap audience overlap: buying customers per
    market segment packed into 62-bit BIGINT words (`wid = ck div 62`,
    OR-aggregated masks), pairwise segment overlaps via word-aligned
    `bit_and` + `bit_count`, exact Jaccard in bp for all 10 segment
    pairs. The roaring-bitmap pattern in its portable fixed-word form:
    set algebra becomes integer ops on a 62×-compressed relation, and
    the words are themselves OR-mergeable across shards/days.

    Scale: the distinct (segment, customer) projection is the only
    fact-sized stage; words shuffle |customers|/62 rows per segment,
    the pair join is an equi-join on word index, and sizes/pairs are
    bounded by |segments|². (A customer appears in one segment here,
    but nothing in the algebra assumes disjointness.)"""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    buyers = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .select(F.col("c_mktsegment").alias("seg"), F.col("o_custkey").alias("ck"))
        .distinct()
    )
    words = buyers.groupBy(
        "seg", F.expr("ck div 62").alias("wid")
    ).agg(
        F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(ck % 62 AS INT))")).alias(
            "w"
        )
    )
    a, b = words.alias("a"), words.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.wid") == F.col("b.wid")) & (F.col("a.seg") < F.col("b.seg")),
        )
        .groupBy(F.col("a.seg").alias("seg_a"), F.col("b.seg").alias("seg_b"))
        .agg(
            F.sum(F.bit_count(F.col("a.w").bitwiseAND(F.col("b.w"))))
            .cast("long")
            .alias("n_both")
        )
    )
    sizes = words.groupBy("seg").agg(F.sum(F.bit_count("w")).cast("long").alias("n"))
    return (
        pairs.join(sizes.withColumnRenamed("seg", "seg_a").withColumnRenamed("n", "n_a"), "seg_a")
        .join(sizes.withColumnRenamed("seg", "seg_b").withColumnRenamed("n", "n_b"), "seg_b")
        .select(
            "seg_a",
            "seg_b",
            "n_a",
            "n_b",
            "n_both",
            F.expr("(10000 * n_both) div (n_a + n_b - n_both)").alias("jaccard_bp"),
        )
        .orderBy("seg_a", "seg_b")
    )
