"""Revenue-retention bridges — NRR/GRR accounting (SURVEY.md §2.BQ,
round 9).

The customer-revenue retention decomposition (the SaaS "net revenue
retention" machinery applied to the order warehouse), beside §2.AB's
new-vs-returning split (one coarse cut) and §2.AV's price/volume/mix
bridge (per-brand, not per-customer): for each adjacent year pair,
every cent of revenue movement is attributed to exactly one of five
legs — churned (customers gone), contraction (retained, spending
less), expansion (retained, spending more), new (customers arrived) —
and the decomposition CLOSES BY IDENTITY:

    rev1 = rev0 − churned − contraction + expansion + new

(exact cents, pinned per year pair in `tests/test_revretention.py`).

- bq1: the five-leg bridge per adjacent year pair.
- bq2: GRR/NRR in bp per pair — gross retention keeps only the
  surviving base (``rev0 − churned − contraction``), net retention
  adds expansion; both are truncating divisions of exact cents.
- bq3: the top-10 expansion accounts of the LATEST pair, ranked by
  exact delta with a deterministic key tie-break (TakeOrdered — no
  global sort).
- bq4: the latest pair's retention mix by market segment — retained /
  churned customer counts, retention bp, and per-segment NRR bp (the
  segment attaches UNHINTED, the §2.BO adjudication).

Exactness: cents exact; every leg is a sum of ``greatest``/
conditional cents; every rate is a truncating division of
non-negative integers.

Spark-first shape, sized for 100 TB: ONE orders pass builds the
(customer, year) revenue census (shuffle keyed on the customer — the
natural key); the pair alignment is a customer-keyed FULL OUTER
self-join of that census against itself shifted one year (both sides
customer-sized, co-partitioned on the join key); everything after is
a ≤|year-pairs|-row census. The census is localCheckpoint-pinned so
the self-join's two sides and the year-span lookup read ONE
materialization instead of three fact scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from recommendersystems_bigdata_spark.catalog import load_tables
from recommendersystems_bigdata_spark.registry import query

_CENTS = "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
_DEC = "decimal(38,0)"

# DuckDB: the (customer, year) census and the pair-aligned legs.
_PAIR_SQL = f"""
cy AS (
  SELECT o_custkey, year(o_orderdate) AS yr,
         CAST(sum({_CENTS}) AS BIGINT) AS rev
  FROM orders GROUP BY 1, 2
),
pairs AS (
  SELECT coalesce(a.o_custkey, b.o_custkey) AS o_custkey,
         coalesce(a.yr, b.yr - 1) AS y0,
         a.rev AS rev0, b.rev AS rev1
  FROM cy a FULL OUTER JOIN cy b
    ON a.o_custkey = b.o_custkey AND a.yr = b.yr - 1
),
legs AS (
  SELECT y0,
         CAST(sum(coalesce(rev0, 0)) AS HUGEINT) AS rev0,
         CAST(sum(CASE WHEN rev1 IS NULL THEN rev0 ELSE 0 END) AS HUGEINT)
           AS churned,
         CAST(sum(CASE WHEN rev0 IS NOT NULL AND rev1 IS NOT NULL
                       THEN greatest(rev0 - rev1, 0) ELSE 0 END) AS HUGEINT)
           AS contraction,
         CAST(sum(CASE WHEN rev0 IS NOT NULL AND rev1 IS NOT NULL
                       THEN greatest(rev1 - rev0, 0) ELSE 0 END) AS HUGEINT)
           AS expansion,
         CAST(sum(CASE WHEN rev0 IS NULL THEN rev1 ELSE 0 END) AS HUGEINT)
           AS new_rev,
         CAST(sum(coalesce(rev1, 0)) AS HUGEINT) AS rev1
  FROM pairs GROUP BY y0
),
bounded AS (
  SELECT * FROM legs
  WHERE y0 >= (SELECT min(yr) FROM cy) AND y0 < (SELECT max(yr) FROM cy)
)
"""


def _cy_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_custkey, yr, rev): the customer-year revenue census, pinned
    once so the pair self-join reads one materialization."""
    (orders,) = load_tables(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            "o_custkey", F.year("o_orderdate").alias("yr")
        )
        .agg(F.expr(f"CAST(sum({_CENTS}) AS BIGINT)").alias("rev"))
        .localCheckpoint()
    )


def _legs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(y0, rev0, churned, contraction, expansion, new_rev, rev1) per
    adjacent year pair, bounded to pairs inside the corpus's span."""
    cy = _cy_census(spark, sf_dir)
    a = cy.alias("a")
    b = cy.alias("b")
    pairs = a.join(
        b,
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.col("a.yr") == F.col("b.yr") - 1),
        "full_outer",
    ).select(
        F.coalesce(F.col("a.yr"), F.col("b.yr") - 1).alias("y0"),
        F.col("a.rev").alias("rev0"),
        F.col("b.rev").alias("rev1"),
    )
    legs = pairs.groupBy("y0").agg(
        F.expr(f"CAST(sum(coalesce(rev0, 0)) AS {_DEC})").alias("rev0"),
        F.expr(
            f"CAST(sum(CASE WHEN rev1 IS NULL THEN rev0 ELSE 0 END)"
            f" AS {_DEC})"
        ).alias("churned"),
        F.expr(
            f"CAST(sum(CASE WHEN rev0 IS NOT NULL AND rev1 IS NOT NULL"
            f" THEN greatest(rev0 - rev1, 0) ELSE 0 END) AS {_DEC})"
        ).alias("contraction"),
        F.expr(
            f"CAST(sum(CASE WHEN rev0 IS NOT NULL AND rev1 IS NOT NULL"
            f" THEN greatest(rev1 - rev0, 0) ELSE 0 END) AS {_DEC})"
        ).alias("expansion"),
        F.expr(
            f"CAST(sum(CASE WHEN rev0 IS NULL THEN rev1 ELSE 0 END)"
            f" AS {_DEC})"
        ).alias("new_rev"),
        F.expr(f"CAST(sum(coalesce(rev1, 0)) AS {_DEC})").alias("rev1"),
    )
    span = cy.agg(
        F.min("yr").alias("min_yr"), F.max("yr").alias("max_yr")
    )
    return (
        legs.crossJoin(F.broadcast(span))
        .where((F.col("y0") >= F.col("min_yr")) & (F.col("y0") < F.col("max_yr")))
        .drop("min_yr", "max_yr")
    )


@query(
    "q_revenue_retention_bridge",
    oracle=f"""
    WITH {_PAIR_SQL}
    SELECT y0, CAST(rev0 AS BIGINT) AS rev0_cents,
           CAST(churned AS BIGINT) AS churned_cents,
           CAST(contraction AS BIGINT) AS contraction_cents,
           CAST(expansion AS BIGINT) AS expansion_cents,
           CAST(new_rev AS BIGINT) AS new_cents,
           CAST(rev1 AS BIGINT) AS rev1_cents
    FROM bounded ORDER BY y0
    """,
)
def q_revenue_retention_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BQ bq1 — the five-leg revenue-retention bridge per adjacent
    year pair: base revenue, churned, contraction, expansion, new, and
    the next year's revenue — closing by the exact identity
    ``rev1 = rev0 − churned − contraction + expansion + new`` (every
    customer lands in exactly one leg per pair, so the attribution is
    a partition of the delta, not an approximation).

    Scale: one orders pass to the pinned (customer, year) census; the
    pair alignment is a customer-keyed full-outer self-join of two
    customer-sized sides; the bridge is a ≤|years|-row census."""
    legs = _legs(spark, sf_dir)
    return legs.select(
        "y0",
        F.expr("CAST(rev0 AS BIGINT)").alias("rev0_cents"),
        F.expr("CAST(churned AS BIGINT)").alias("churned_cents"),
        F.expr("CAST(contraction AS BIGINT)").alias("contraction_cents"),
        F.expr("CAST(expansion AS BIGINT)").alias("expansion_cents"),
        F.expr("CAST(new_rev AS BIGINT)").alias("new_cents"),
        F.expr("CAST(rev1 AS BIGINT)").alias("rev1_cents"),
    ).orderBy("y0")


@query(
    "q_nrr_grr_by_year",
    oracle=f"""
    WITH {_PAIR_SQL}
    SELECT y0,
           CAST((10000 * (rev0 - churned - contraction)) // rev0 AS BIGINT)
             AS grr_bp,
           CAST((10000 * (rev0 - churned - contraction + expansion)) // rev0
                AS BIGINT) AS nrr_bp
    FROM bounded ORDER BY y0
    """,
)
def q_nrr_grr_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BQ bq2 — gross and net revenue retention per year pair in
    bp: GRR keeps the surviving base only, NRR adds expansion — both
    truncating divisions of bq1's exact legs, so the table recomposes
    from the bridge.

    Scale: census-side arithmetic on bq1's ≤|years|-row relation."""
    legs = _legs(spark, sf_dir)
    return legs.select(
        "y0",
        F.expr(
            f"CAST((CAST(10000 AS {_DEC}) * (rev0 - churned - contraction))"
            f" div rev0 AS BIGINT)"
        ).alias("grr_bp"),
        F.expr(
            f"CAST((CAST(10000 AS {_DEC})"
            f" * (rev0 - churned - contraction + expansion))"
            f" div rev0 AS BIGINT)"
        ).alias("nrr_bp"),
    ).orderBy("y0")


@query(
    "q_expansion_accounts_topk",
    oracle=f"""
    WITH cy AS (
      SELECT o_custkey, year(o_orderdate) AS yr,
             CAST(sum({_CENTS}) AS BIGINT) AS rev
      FROM orders GROUP BY 1, 2
    ),
    span AS (SELECT max(yr) AS y1 FROM cy),
    latest AS (
      SELECT a.o_custkey, a.rev AS rev0, b.rev AS rev1,
             b.rev - a.rev AS delta_cents
      FROM cy a JOIN cy b ON a.o_custkey = b.o_custkey
                         AND a.yr = b.yr - 1, span
      WHERE b.yr = y1 AND b.rev > a.rev
    )
    SELECT o_custkey, rev0, rev1, delta_cents
    FROM latest ORDER BY delta_cents DESC, o_custkey LIMIT 10
    """,
)
def q_expansion_accounts_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BQ bq3 — the latest year pair's top-10 expansion accounts by
    exact revenue delta (ties broken by the customer key, so the list
    is deterministic). ORDER BY + LIMIT lowers to
    TakeOrderedAndProject — a per-partition top-k combine, never a
    global sort.

    Scale: the pair join is customer-keyed on the pinned census; the
    top-k is mergeable across partitions."""
    cy = _cy_census(spark, sf_dir)
    span = cy.agg(F.max("yr").alias("y1"))
    a = cy.alias("a")
    b = cy.alias("b")
    latest = (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.yr") == F.col("b.yr") - 1),
        )
        .crossJoin(F.broadcast(span))
        .where(
            (F.col("b.yr") == F.col("y1"))
            & (F.col("b.rev") > F.col("a.rev"))
        )
        .select(
            F.col("a.o_custkey").alias("o_custkey"),
            F.col("a.rev").alias("rev0"),
            F.col("b.rev").alias("rev1"),
            (F.col("b.rev") - F.col("a.rev")).alias("delta_cents"),
        )
    )
    return latest.orderBy(
        F.col("delta_cents").desc(), F.col("o_custkey")
    ).limit(10)


@query(
    "q_retention_mix_by_segment",
    oracle=f"""
    WITH cy AS (
      SELECT o_custkey, year(o_orderdate) AS yr,
             CAST(sum({_CENTS}) AS BIGINT) AS rev
      FROM orders GROUP BY 1, 2
    ),
    span AS (SELECT max(yr) AS y1 FROM cy),
    base AS (
      SELECT a.o_custkey, a.rev AS rev0, b.rev AS rev1
      FROM cy a LEFT JOIN cy b ON a.o_custkey = b.o_custkey
                              AND b.yr = a.yr + 1, span
      WHERE a.yr = y1 - 1
    ),
    seg AS (
      SELECT c.c_mktsegment AS segment,
             CAST(count(*) FILTER (WHERE rev1 IS NOT NULL) AS BIGINT)
               AS retained,
             CAST(count(*) FILTER (WHERE rev1 IS NULL) AS BIGINT) AS churned,
             CAST(sum(rev0) AS HUGEINT) AS rev0,
             CAST(sum(CASE WHEN rev1 IS NOT NULL THEN least(rev0, rev1)
                           ELSE 0 END) AS HUGEINT) AS kept,
             CAST(sum(CASE WHEN rev1 IS NOT NULL
                           THEN greatest(rev1 - rev0, 0) ELSE 0 END)
                  AS HUGEINT) AS expansion
      FROM base JOIN customer c ON base.o_custkey = c.c_custkey
      GROUP BY 1
    )
    SELECT segment, retained, churned,
           CAST((10000 * retained) // (retained + churned) AS BIGINT)
             AS retention_bp,
           CAST((10000 * (kept + expansion)) // rev0 AS BIGINT) AS nrr_bp
    FROM seg ORDER BY segment
    """,
)
def q_retention_mix_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BQ bq4 — the latest pair's retention mix by market segment:
    retained/churned customer counts, the retention rate in bp, and
    per-segment NRR (kept = min(rev0, rev1) per retained customer,
    i.e. rev0 − contraction, plus expansion — the same legs as bq1 at
    segment grain). The segment attaches UNHINTED (§2.BO
    adjudication).

    Scale: the pair join is customer-keyed; the segment reduction is
    a 5-row census."""
    cy = _cy_census(spark, sf_dir)
    span = cy.agg(F.max("yr").alias("y1"))
    a = cy.alias("a")
    b = cy.alias("b")
    base = (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("b.yr") == F.col("a.yr") + 1),
            "left",
        )
        .crossJoin(F.broadcast(span))
        .where(F.col("a.yr") == F.col("y1") - 1)
        .select(
            F.col("a.o_custkey").alias("o_custkey"),
            F.col("a.rev").alias("rev0"),
            F.col("b.rev").alias("rev1"),
        )
    )
    (customer,) = load_tables(spark, sf_dir, "customer")
    seg = (
        base.join(
            customer.select("c_custkey", "c_mktsegment"),
            base.o_custkey == F.col("c_custkey"),
        )
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count_if(F.col("rev1").isNotNull())
            .cast("long")
            .alias("retained"),
            F.count_if(F.col("rev1").isNull()).cast("long").alias("churned"),
            F.expr(f"CAST(sum(rev0) AS {_DEC})").alias("rev0"),
            F.expr(
                f"CAST(sum(CASE WHEN rev1 IS NOT NULL THEN least(rev0, rev1)"
                f" ELSE 0 END) AS {_DEC})"
            ).alias("kept"),
            F.expr(
                f"CAST(sum(CASE WHEN rev1 IS NOT NULL"
                f" THEN greatest(rev1 - rev0, 0) ELSE 0 END) AS {_DEC})"
            ).alias("expansion"),
        )
    )
    return seg.select(
        "segment",
        "retained",
        "churned",
        F.expr(
            "CAST((10000 * retained) div (retained + churned) AS BIGINT)"
        ).alias("retention_bp"),
        F.expr(
            f"CAST((CAST(10000 AS {_DEC}) * (kept + expansion)) div rev0"
            f" AS BIGINT)"
        ).alias("nrr_bp"),
    ).orderBy("segment")
