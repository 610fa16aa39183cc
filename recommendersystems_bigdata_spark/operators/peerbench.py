"""Peer benchmarking — entity-vs-peer-group order statistics
(SURVEY.md §2.BU, round 10).

"How does this supplier compare to its in-nation peers" — the
benchmark report family (rank, percentile, gap-to-median, quartile
bands, leadership margin) that §2.E's global windows and §2.Y's
two-sample tests bracket but never publish per entity:

- bu1: rank & percentile — each supplier's revenue rank among its
  nation's peers and the exact percentile in bp.
- bu2: gap to the peer median — signed cents against the nation's
  LOWER MEDIAN and the ratio to it in bp.
- bu3: the quartile-band census — per nation, Q1/Q3 (published
  order-statistic convention below) and how many suppliers sit below /
  inside / above the band.
- bu4: leadership margin — per nation, the top supplier, the
  runner-up, and the lead in cents and bp (single-supplier nations
  publish NULL runner-up columns in BOTH engines).

PUBLISHED ORDER-STATISTIC CONVENTIONS (deterministic, engine-free):
revenue is the exact per-supplier cent sum (the _REV_E4 per-row fold
div 100); rank orders by (revenue asc, s_suppkey asc);
``percentile_bp = (10⁴·(rank−1)) div (n−1)`` (0 when n = 1); the
median/Q1/Q3 are the VALUES at ranks ``(n+1) div 2``,
``greatest((n+1) div 4, 1)`` and ``least((3·(n+1)) div 4, n)`` — lower
order statistics, never interpolated, so every published number is a
revenue that actually occurred. Ratios are truncating divisions of
non-negative cents (revenue > 0 for every supplier that appears).

Spark-first shape, sized for 100 TB: ONE fact pass partial-aggregates
lineitem to the per-supplier revenue census (|suppliers| rows —
dim-sized, ~10M at sf1000, never fact-sized); the 25-row nation dim
broadcasts onto supplier EXPLICITLY, but the resulting supplier-level
(suppkey, nation) dim attaches to the revenue census UNHINTED — AQE
broadcasts it while it fits and shuffle-joins beyond (a forced
broadcast of a ~10M-row dim is the anova._census 36×-measured trap);
every ranking is a window PARTITIONED BY NATION over that census
(≤|suppliers|/|nations| rows per task — no global sort, no
single-partition exchange); the per-nation quartile / median / leader
relations are ≤|nations|-row reductions that rejoin by broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_tables
from recommendersystems_bigdata_spark.registry import query

_PRICE_E2 = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
_DISC_E2 = "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)"
_REV_E4 = f"{_PRICE_E2} * (100 - {_DISC_E2})"
_DEC = "decimal(38,0)"

# DuckDB: the per-supplier revenue census with nation attached, ranked
# within nation.
_CENSUS_DUCK = f"""
srev AS (
  SELECT l_suppkey,
         CAST(sum(CAST({_REV_E4} AS HUGEINT)) // 100 AS BIGINT) AS rev_cents
  FROM lineitem GROUP BY l_suppkey
),
census AS (
  SELECT n.n_name, s.s_suppkey, r.rev_cents
  FROM srev r
  JOIN supplier s ON r.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
),
ranked AS (
  SELECT n_name, s_suppkey, rev_cents,
         row_number() OVER (PARTITION BY n_name
                            ORDER BY rev_cents, s_suppkey) AS rnk,
         count(*) OVER (PARTITION BY n_name) AS n
  FROM census
)
"""


def _ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, supplier, nation = load_tables(
        spark, sf_dir, "lineitem", "supplier", "nation"
    )
    srev = li.groupBy("l_suppkey").agg(
        F.expr(
            f"CAST(sum(CAST({_REV_E4} AS {_DEC})) div 100 AS BIGINT)"
        ).alias("rev_cents")
    )
    dim = supplier.select("s_suppkey", "s_nationkey").join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "n_name")
    # The supplier-level dim attach is deliberately UNHINTED (same
    # adjudication as anova._census): at test SF AQE broadcasts the
    # 2-column dim, while at sf1000 a ~10M-row supplier dim must
    # shuffle-join — a forced broadcast is a hint AQE cannot override.
    # Only the 25-row nation dim above carries an explicit hint.
    census = srev.join(
        dim, srev.l_suppkey == F.col("s_suppkey")
    ).select("n_name", "s_suppkey", "rev_cents")
    w = Window.partitionBy("n_name").orderBy("rev_cents", "s_suppkey")
    wn = Window.partitionBy("n_name")
    return census.select(
        "n_name",
        "s_suppkey",
        "rev_cents",
        F.row_number().over(w).cast("long").alias("rnk"),
        F.count(F.lit(1)).over(wn).cast("long").alias("n"),
    )


@query(
    "q_peer_rank_percentile",
    oracle=f"""
    WITH {_CENSUS_DUCK}
    SELECT n_name, s_suppkey, rev_cents, CAST(rnk AS BIGINT) AS peer_rank,
           CAST(n AS BIGINT) AS peers,
           CAST(CASE WHEN n = 1 THEN 0
                ELSE (10000 * (rnk - 1)) // (n - 1) END AS BIGINT)
             AS percentile_bp
    FROM ranked ORDER BY n_name, peer_rank
    """,
)
def q_peer_rank_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BU bu1 — rank & percentile against in-nation peers: exact
    revenue cents, the (revenue asc, suppkey) rank, peer count, and
    ``(10⁴·(rank−1)) div (n−1)`` percentile bp (0 for a lone peer —
    guarded identically in both engines).

    Scale: one fact pass to the supplier census; nation windows over
    dim-sized data; the nation dim broadcasts."""
    return (
        _ranked(spark, sf_dir)
        .select(
            "n_name",
            "s_suppkey",
            "rev_cents",
            F.col("rnk").alias("peer_rank"),
            F.col("n").alias("peers"),
            F.expr(
                "CAST(CASE WHEN n = 1 THEN 0"
                " ELSE (10000 * (rnk - 1)) div (n - 1) END AS BIGINT)"
            ).alias("percentile_bp"),
        )
        .orderBy("n_name", "peer_rank")
    )


@query(
    "q_peer_median_gap",
    oracle=f"""
    WITH {_CENSUS_DUCK},
    med AS (
      SELECT n_name, rev_cents AS median_cents
      FROM ranked WHERE rnk = (n + 1) // 2
    )
    SELECT r.n_name, r.s_suppkey, r.rev_cents, m.median_cents,
           CAST(r.rev_cents - m.median_cents AS BIGINT) AS gap_cents,
           CAST((10000 * r.rev_cents) // m.median_cents AS BIGINT)
             AS ratio_bp
    FROM ranked r JOIN med m ON r.n_name = m.n_name
    ORDER BY r.n_name, r.rev_cents, r.s_suppkey
    """,
)
def q_peer_median_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BU bu2 — gap to the peer median: each supplier against its
    nation's LOWER MEDIAN revenue (the value at rank (n+1) div 2 — an
    order statistic, so ties in revenue cannot perturb it), signed gap
    cents and the ratio bp (median > 0: only suppliers with sales
    appear in the census).

    Scale: the median relation is one row per nation, rejoined by
    broadcast against the census."""
    ranked = _ranked(spark, sf_dir).localCheckpoint()
    med = ranked.filter(F.expr("rnk = (n + 1) div 2")).select(
        "n_name", F.col("rev_cents").alias("median_cents")
    )
    return (
        ranked.join(F.broadcast(med), "n_name")
        .select(
            "n_name",
            "s_suppkey",
            "rev_cents",
            "median_cents",
            (F.col("rev_cents") - F.col("median_cents"))
            .cast("long")
            .alias("gap_cents"),
            F.expr(
                "CAST((10000 * rev_cents) div median_cents AS BIGINT)"
            ).alias("ratio_bp"),
        )
        .orderBy("n_name", "rev_cents", "s_suppkey")
    )


@query(
    "q_peer_quartile_bands",
    oracle=f"""
    WITH {_CENSUS_DUCK},
    qs AS (
      SELECT n_name,
             CAST(max(n) AS BIGINT) AS peers,
             CAST(max(CASE WHEN rnk = greatest((n + 1) // 4, 1)
                      THEN rev_cents END) AS BIGINT) AS q1_cents,
             CAST(max(CASE WHEN rnk = least((3 * (n + 1)) // 4, n)
                      THEN rev_cents END) AS BIGINT) AS q3_cents
      FROM ranked GROUP BY n_name
    )
    SELECT q.n_name, q.peers, q.q1_cents, q.q3_cents,
           CAST(sum(CASE WHEN r.rev_cents < q.q1_cents THEN 1 ELSE 0 END)
                AS BIGINT) AS below_q1,
           CAST(sum(CASE WHEN r.rev_cents >= q.q1_cents
                          AND r.rev_cents <= q.q3_cents THEN 1 ELSE 0 END)
                AS BIGINT) AS in_band,
           CAST(sum(CASE WHEN r.rev_cents > q.q3_cents THEN 1 ELSE 0 END)
                AS BIGINT) AS above_q3
    FROM qs q JOIN ranked r ON q.n_name = r.n_name
    GROUP BY q.n_name, q.peers, q.q1_cents, q.q3_cents
    ORDER BY q.n_name
    """,
)
def q_peer_quartile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BU bu3 — the quartile-band census: per nation, Q1/Q3 as the
    published LOWER order statistics (ranks greatest((n+1) div 4, 1)
    and least((3(n+1)) div 4, n) — actual revenues, never
    interpolations) and the below/inside/above membership counts
    (which sum to the peer count by construction —
    tests/test_peerbench.py pins the conservation).

    Scale: the quartile relation is one row per nation; the band count
    is one broadcast join + a |nations|-row rollup."""
    ranked = _ranked(spark, sf_dir).localCheckpoint()
    qs = ranked.groupBy("n_name").agg(
        F.max("n").cast("long").alias("peers"),
        F.max(
            F.when(
                F.expr("rnk = greatest((n + 1) div 4, 1)"),
                F.col("rev_cents"),
            )
        )
        .cast("long")
        .alias("q1_cents"),
        F.max(
            F.when(
                F.expr("rnk = least((3 * (n + 1)) div 4, n)"),
                F.col("rev_cents"),
            )
        )
        .cast("long")
        .alias("q3_cents"),
    )
    return (
        ranked.join(F.broadcast(qs), "n_name")
        .groupBy("n_name", "peers", "q1_cents", "q3_cents")
        .agg(
            F.sum(
                F.when(F.col("rev_cents") < F.col("q1_cents"), 1).otherwise(0)
            )
            .cast("long")
            .alias("below_q1"),
            F.sum(
                F.when(
                    (F.col("rev_cents") >= F.col("q1_cents"))
                    & (F.col("rev_cents") <= F.col("q3_cents")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("in_band"),
            F.sum(
                F.when(F.col("rev_cents") > F.col("q3_cents"), 1).otherwise(0)
            )
            .cast("long")
            .alias("above_q3"),
        )
        .orderBy("n_name")
    )


@query(
    "q_peer_leader_margin",
    oracle=f"""
    WITH {_CENSUS_DUCK}
    SELECT l.n_name,
           l.s_suppkey AS leader_suppkey,
           l.rev_cents AS leader_cents,
           u.s_suppkey AS runner_up_suppkey,
           u.rev_cents AS runner_up_cents,
           CAST(l.rev_cents - u.rev_cents AS BIGINT) AS margin_cents,
           CAST((10000 * l.rev_cents) // u.rev_cents AS BIGINT)
             AS lead_ratio_bp
    FROM (SELECT * FROM ranked WHERE rnk = n) l
    LEFT JOIN (SELECT * FROM ranked WHERE rnk = n - 1) u
      ON l.n_name = u.n_name
    ORDER BY l.n_name
    """,
)
def q_peer_leader_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BU bu4 — leadership margin: per nation, the top supplier
    (rank n in the ascending order — the deterministic (revenue,
    suppkey) maximum), the runner-up (rank n−1), and the lead in cents
    and bp. Single-supplier nations LEFT-join no runner-up and publish
    NULL margin columns in both engines (NULL arithmetic, not a
    division guard).

    Scale: two one-row-per-nation relations joined — bounded."""
    ranked = _ranked(spark, sf_dir).localCheckpoint()
    leader = ranked.filter(F.expr("rnk = n")).select(
        "n_name",
        F.col("s_suppkey").alias("leader_suppkey"),
        F.col("rev_cents").alias("leader_cents"),
    )
    runner = ranked.filter(F.expr("rnk = n - 1")).select(
        "n_name",
        F.col("s_suppkey").alias("runner_up_suppkey"),
        F.col("rev_cents").alias("runner_up_cents"),
    )
    return (
        leader.join(runner, "n_name", "left")
        .select(
            "n_name",
            "leader_suppkey",
            "leader_cents",
            "runner_up_suppkey",
            "runner_up_cents",
            (F.col("leader_cents") - F.col("runner_up_cents"))
            .cast("long")
            .alias("margin_cents"),
            F.expr(
                "CAST((10000 * leader_cents) div runner_up_cents AS BIGINT)"
            ).alias("lead_ratio_bp"),
        )
        .orderBy("n_name")
    )
