"""Ranked report shapes (SURVEY.md §2.BC, round 9).

The report shapes every BI layer renders from a ranked relation, each
with a deliberate distributed lowering:

- bc1: top-k WITH TIES (ANSI ``FETCH FIRST 10 ROWS WITH TIES``) over
  the per-part revenue census — WITHOUT a global rank window. The
  identity: a row has ``rank() <= k`` iff its value ≥ the k-th
  row_number value, so the threshold comes from a 10-row TakeOrdered
  broadcast and membership is a map-side filter. The tie-inclusive
  result is a deterministic SET (no tiebreak needed for membership —
  that is WITH TIES' whole point), ordered here by (revenue DESC,
  partkey) for a stable render.
- bc2: top-N + OTHER — the report that shows the 10 heaviest brands
  and folds the tail into one labeled remainder row whose share
  closes the census to exactly 10000 bp-of-total accounting (cents
  conserve exactly; the test pins Σ rows == corpus revenue).
- bc3: the cut-semantics audit — how many rows survive a
  ``row_number <= k`` vs ``rank <= k`` vs ``dense_rank <= k`` cut of
  the same ranked relation, plus whether ties straddle the boundary.
  One audit row; the three counts differ exactly when ties exist at
  the cut (the property the test pins).
- bc4: grouped top-N + remainder — per nation, the top-3 customers by
  spend and the folded remainder, via a KEYED rank window (the
  canonical per-group top-k that needs no global exchange).

Exactness: revenue in exact cents, shares in truncated bp (128-bit on
census totals per the repo convention).

Spark-first shape, sized for 100 TB:
- bc1/bc3 never plan a global rank window over the census: the
  threshold/cut statistics derive from ``TakeOrderedAndProject`` +
  1-row/10-row broadcasts (plan-asserted). At 2 B parts the census is
  fact-sized — exactly where an ``Exchange SinglePartition`` would
  die and this spelling does not.
- bc2's OTHER row is arithmetic between the TakeOrdered head and the
  1-row census total.
- bc4's window partitions by nation — bounded per-key state, no
  global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query

_CENTS = "CAST(floor({col} * 100 + 0.5) AS BIGINT)"

# DuckDB: per-part revenue census.
_PART_SQL = f"""
per_part AS (
  SELECT l_partkey AS p,
         CAST(sum({_CENTS.format(col="l_extendedprice")}) AS BIGINT)
           AS rev_cents
  FROM lineitem GROUP BY 1
)
"""


def _per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_partkey").alias("p")).agg(
        F.sum(F.expr(_CENTS.format(col="l_extendedprice")))
        .cast("long")
        .alias("rev_cents")
    )


@query(
    "q_top_parts_with_ties",
    oracle=f"""
    WITH {_PART_SQL}
    , ranked AS (
      SELECT p, rev_cents,
             CAST(rank() OVER (ORDER BY rev_cents DESC) AS BIGINT) AS rnk
      FROM per_part
    )
    SELECT p AS l_partkey, rev_cents, rnk
    FROM ranked WHERE rnk <= 10
    ORDER BY rev_cents DESC, l_partkey
    """,
)
def q_top_parts_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BC bc1 — FETCH FIRST 10 ROWS WITH TIES over per-part revenue:
    every part whose revenue reaches the 10th row_number value, with
    its ANSI rank. The oracle spells the global rank window; this side
    spells the DISTRIBUTED identity — threshold from a 10-row
    TakeOrdered broadcast, membership a map filter, and the rank
    recomputed inside the tie-inclusive head (≤ 10 + ties rows) — so
    no SinglePartition exchange ever sees the census (plan-asserted).

    Scale: one fact shuffle to the per-part census (pinned: threshold
    + filter branch from it), a 10-row TakeOrdered, a broadcast 1-row
    threshold, and a window over the bounded surviving head."""
    per_part = _per_part(spark, sf_dir).localCheckpoint()
    thresh = (
        per_part.orderBy(F.col("rev_cents").desc(), "p")
        .limit(10)
        .agg(F.min("rev_cents").cast("long").alias("t10"))
    )
    head = per_part.crossJoin(F.broadcast(thresh)).where(
        F.col("rev_cents") >= F.col("t10")
    )
    # the surviving head is ≤ 10 + ties rows — the rank window runs there
    w = Window.orderBy(F.col("rev_cents").desc())
    return (
        head.select("p", "rev_cents")
        .withColumn("rnk", F.rank().over(w).cast("long"))
        .where(F.col("rnk") <= 10)
        .select(F.col("p").alias("l_partkey"), "rev_cents", "rnk")
        .orderBy(F.col("rev_cents").desc(), "l_partkey")
    )


@query(
    "q_top_brands_plus_other",
    oracle=f"""
    WITH per_brand AS (
      SELECT p.p_brand,
             CAST(sum({_CENTS.format(col="l.l_extendedprice")}) AS BIGINT)
               AS rev_cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(rev_cents) AS BIGINT) AS t FROM per_brand),
    top AS (
      SELECT p_brand, rev_cents,
             CAST(row_number() OVER (ORDER BY rev_cents DESC, p_brand)
                  AS BIGINT) AS pos
      FROM per_brand
      ORDER BY rev_cents DESC, p_brand LIMIT 10
    )
    SELECT p_brand AS label, pos, rev_cents,
           CAST((10000 * CAST(rev_cents AS HUGEINT)) // t AS BIGINT)
             AS rev_share_bp
    FROM top, tot
    UNION ALL
    SELECT 'OTHER', CAST(11 AS BIGINT),
           t - (SELECT CAST(sum(rev_cents) AS BIGINT) FROM top),
           CAST((10000 * CAST(t - (SELECT CAST(sum(rev_cents) AS BIGINT)
                                   FROM top) AS HUGEINT)) // t AS BIGINT)
    FROM tot
    ORDER BY pos
    """,
)
def q_top_brands_plus_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BC bc2 — the top-10-plus-OTHER report: the ten heaviest
    brands by exact revenue cents with their share, and a folded
    'OTHER' remainder row — cents conserve exactly (Σ label rows ==
    corpus revenue, test-pinned), shares in truncated bp.

    Scale: one broadcast-dim fact rollup to the brand census (pinned),
    TakeOrdered head, 1-row total; the OTHER row is subtraction."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    per_brand = (
        li.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            F.sum(F.expr(_CENTS.format(col="l_extendedprice")))
            .cast("long")
            .alias("rev_cents")
        )
        .localCheckpoint()  # head + total branch from it
    )
    tot = per_brand.agg(F.sum("rev_cents").cast("long").alias("t"))
    w = Window.orderBy(F.col("rev_cents").desc(), "p_brand")
    top = (
        per_brand.orderBy(F.col("rev_cents").desc(), "p_brand")
        .limit(10)
        .withColumn("pos", F.row_number().over(w).cast("long"))
    )
    top_rows = top.crossJoin(F.broadcast(tot)).select(
        F.col("p_brand").alias("label"),
        "pos",
        "rev_cents",
        F.expr(
            "CAST((CAST(10000 AS DECIMAL(38,0)) * rev_cents) div t"
            " AS BIGINT)"
        ).alias("rev_share_bp"),
    )
    top_sum = top.agg(F.sum("rev_cents").cast("long").alias("head"))
    other = (
        tot.crossJoin(F.broadcast(top_sum))
        .select(
            F.lit("OTHER").alias("label"),
            F.lit(11).cast("long").alias("pos"),
            (F.col("t") - F.col("head")).alias("rev_cents"),
            F.expr(
                "CAST((CAST(10000 AS DECIMAL(38,0)) * (t - head)) div t"
                " AS BIGINT)"
            ).alias("rev_share_bp"),
        )
    )
    return top_rows.unionByName(other).orderBy("pos")


@query(
    "q_rank_cut_semantics",
    oracle=f"""
    WITH {_PART_SQL}
    , ranked AS (
      SELECT rev_cents,
             CAST(row_number() OVER (ORDER BY rev_cents DESC, p)
                  AS BIGINT) AS rn,
             CAST(rank() OVER (ORDER BY rev_cents DESC) AS BIGINT) AS rnk,
             CAST(dense_rank() OVER (ORDER BY rev_cents DESC) AS BIGINT)
               AS drnk
      FROM per_part
    )
    SELECT CAST(sum(CASE WHEN rn <= 10 THEN 1 ELSE 0 END) AS BIGINT)
             AS rownum_cut_rows,
           CAST(sum(CASE WHEN rnk <= 10 THEN 1 ELSE 0 END) AS BIGINT)
             AS rank_cut_rows,
           CAST(sum(CASE WHEN drnk <= 10 THEN 1 ELSE 0 END) AS BIGINT)
             AS dense_cut_rows,
           CASE WHEN sum(CASE WHEN rnk <= 10 THEN 1 ELSE 0 END)
                     > sum(CASE WHEN rn <= 10 THEN 1 ELSE 0 END)
                THEN 'ties_at_cut' ELSE 'no_ties_at_cut' END AS boundary
    FROM ranked
    """,
)
def q_rank_cut_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BC bc3 — the cut-semantics audit: how many per-part census
    rows survive ``row_number <= 10`` vs ``rank <= 10`` vs
    ``dense_rank <= 10``, and whether ties straddle the boundary.
    rownum ≤ rank ≤ dense counts always (test-pinned). The oracle
    spells three global windows; this side derives all three counts
    from DISTRIBUTED primitives: rownum-cut is constantly
    min(10, census rows); rank-cut counts rows ≥ the 10th row_number
    value (the bc1 threshold); dense-cut counts rows whose value is in
    the top-10 DISTINCT values (a 10-row distinct TakeOrdered
    broadcast + semi-join filter). No SinglePartition over the census.

    Scale: the census is pinned; three bounded broadcasts; one
    conditional 1-row rollup."""
    per_part = _per_part(spark, sf_dir).localCheckpoint()
    n_total = per_part.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    thresh = (
        per_part.orderBy(F.col("rev_cents").desc(), "p")
        .limit(10)
        .agg(F.min("rev_cents").cast("long").alias("t10"))
    )
    dvals = (
        per_part.select("rev_cents")
        .distinct()
        .orderBy(F.col("rev_cents").desc())
        .limit(10)
        .agg(F.min("rev_cents").cast("long").alias("d10"))
    )
    counts = (
        per_part.crossJoin(F.broadcast(thresh))
        .crossJoin(F.broadcast(dvals))
        .agg(
            F.sum(F.when(F.col("rev_cents") >= F.col("t10"), 1).otherwise(0))
            .cast("long")
            .alias("rank_cut_rows"),
            F.sum(F.when(F.col("rev_cents") >= F.col("d10"), 1).otherwise(0))
            .cast("long")
            .alias("dense_cut_rows"),
        )
    )
    return (
        counts.crossJoin(F.broadcast(n_total))
        .select(
            F.least(F.lit(10).cast("long"), F.col("n_rows")).alias(
                "rownum_cut_rows"
            ),
            "rank_cut_rows",
            "dense_cut_rows",
            F.when(
                F.col("rank_cut_rows")
                > F.least(F.lit(10).cast("long"), F.col("n_rows")),
                "ties_at_cut",
            )
            .otherwise("no_ties_at_cut")
            .alias("boundary"),
        )
    )


@query(
    "q_nation_top3_customers",
    oracle=f"""
    WITH spend AS (
      SELECT n.n_name AS nation, c.c_custkey AS ck,
             CAST(sum({_CENTS.format(col="o.o_totalprice")}) AS BIGINT)
               AS spend_cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT nation, ck, spend_cents,
             CAST(row_number() OVER (PARTITION BY nation
               ORDER BY spend_cents DESC, ck) AS BIGINT) AS pos
      FROM spend
    ),
    tot AS (
      SELECT nation, CAST(sum(spend_cents) AS BIGINT) AS nation_cents
      FROM spend GROUP BY 1
    )
    SELECT r.nation, r.pos,
           CAST(r.ck AS BIGINT) AS c_custkey, r.spend_cents,
           CAST((10000 * CAST(r.spend_cents AS HUGEINT)) // t.nation_cents
                AS BIGINT) AS nation_share_bp
    FROM ranked r JOIN tot t ON r.nation = t.nation
    WHERE r.pos <= 3
    ORDER BY r.nation, r.pos
    """,
)
def q_nation_top3_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BC bc4 — grouped top-N: each nation's three biggest customers
    by exact spend with their share of the nation's revenue — the
    canonical per-group top-k, spelled as a KEYED rank window
    (partitioned by nation: bounded per-key state, no global sort) over
    the pinned per-(nation, customer) census.

    Scale: one orders⋈customer shuffle + broadcast nation dim to the
    census (pinned — the rank and the nation totals branch from it);
    the window partitions on nation; ≤75 output rows."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    spend = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"), F.col("c_custkey").alias("ck")
        )
        .agg(
            F.sum(F.expr(_CENTS.format(col="o_totalprice")))
            .cast("long")
            .alias("spend_cents")
        )
        .localCheckpoint()  # rank + totals branch from it
    )
    w = Window.partitionBy("nation").orderBy(
        F.col("spend_cents").desc(), "ck"
    )
    ranked = spend.withColumn(
        "pos", F.row_number().over(w).cast("long")
    ).where(F.col("pos") <= 3)
    tot = spend.groupBy("nation").agg(
        F.sum("spend_cents").cast("long").alias("nation_cents")
    )
    return (
        ranked.join(tot, "nation")
        .select(
            "nation",
            "pos",
            F.col("ck").cast("long").alias("c_custkey"),
            "spend_cents",
            F.expr(
                "CAST((CAST(10000 AS DECIMAL(38,0)) * spend_cents)"
                " div nation_cents AS BIGINT)"
            ).alias("nation_share_bp"),
        )
        .orderBy("nation", "pos")
    )
