"""Skyline / Pareto-dominance queries (SURVEY.md §2.BS, round 10).

The "best tradeoff" operator family most engines lack as a primitive:
given offerings scored on conflicting criteria (cheaper is better,
bigger is better), return the maximal elements under the Pareto
dominance order — beside §2.E's single-criterion Pareto/ABC cut and
§2.BK's classification grids:

- bs1: the 2D price-size skyline — the non-dominated (price, size)
  offerings of the part catalog.
- bs2: dominance counts — for every offering, how many distinct
  offerings it dominates and is dominated by (the "dominance depth"
  feature pair), computed WITHOUT a quadratic pair join via a dense
  grid of 2D prefix counts.
- bs3: the first three skyline LAYERS (onion peeling) — layer 2 is
  "best after the frontier sells out".
- bs4: a 3D skyline over the (brand, type) assortment census with
  RATIONAL dimensions (average price, average size, offering count)
  compared by cross-multiplication — no float division enters the
  dominance test.

DOMINANCE (bs1-bs3): offering a dominates b iff a.price_usd ≤
b.price_usd ∧ a.size ≥ b.size ∧ (a ≠ b); on a DISTINCT census the
inequality pair being non-strict in both coordinates would force
a = b, so no separate strictness clause is needed.

THE ALGORITHM-DIVERSITY DEVICE: the Spark side computes the 2D skyline
with the O(census) sorted prefix-maximum sweep — sort by (price asc,
size desc); a row is dominated iff the EXCLUSIVE prefix max of size
reaches its size — while every DuckDB oracle evaluates the quadratic
NOT EXISTS definition directly. Two independent algorithms, identical
rows, hash-checked; `tests/test_skyline.py` additionally
hypothesis-fuzzes the sweep against brute force on random censuses.

Exactness: the offering grid is (whole retail dollars, integer size) —
cents div 100 — so census keys are exact integers; bs4's rational
dominance compares s_a·n_b vs s_b·n_a in decimal(38,0)/HUGEINT
(cell sums ~10¹¹ cents × 10⁷ counts ≈ 10¹⁸ at sf1000 — 10²⁰ of
headroom), and its published averages are truncating divisions.

Spark-first shape, sized for 100 TB: every skyline runs on a census
BOUNDED BY CONSTRUCTION — |retail dollar levels| × |sizes| (≤ ~60k at
any SF: TPC-H retail prices span ~1200 whole dollars, sizes 50) for
bs1-bs3, |brands| × |types| (~150) for bs4 — reached by ONE
partial-aggregated fact pass. The prefix-max sweep is the DISTRIBUTED
two-pass device (functions/ranks.py `global_running_max` — per-range
local cummax + broadcast per-partition maxima), never an
`Exchange SinglePartition` window over the census; bs2's counts are
two PARTITIONED window cumulations over the dense grid + one
equi-join; bs4's quadratic anti-join is O(150²) forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.functions.ranks import global_running_max
from recommendersystems_bigdata_spark.registry import query

_DEC = "decimal(38,0)"
_PRICE_USD = "CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) div 100"
_PRICE_USD_DUCK = "CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) // 100"

# DuckDB: the distinct offering census and the quadratic dominance
# predicate (the oracle always evaluates the DEFINITION).
_CENSUS_DUCK = f"""
census AS (
  SELECT {_PRICE_USD_DUCK} AS price_usd,
         CAST(p_size AS BIGINT) AS size,
         CAST(count(*) AS BIGINT) AS parts
  FROM part GROUP BY 1, 2
)
"""

_DOMINATES = (  # d dominates c (both from the distinct census)
    "d.price_usd <= c.price_usd AND d.size >= c.size"
    " AND (d.price_usd < c.price_usd OR d.size > c.size)"
)


def _census(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.groupBy(
        F.expr(_PRICE_USD).alias("price_usd"),
        F.col("p_size").cast("long").alias("size"),
    ).agg(F.count(F.lit(1)).cast("long").alias("parts"))


def _mark_dominated(census: DataFrame) -> DataFrame:
    """census + boolean `dominated` via the distributed prefix-max sweep.

    Sorted by (price asc, size desc), every strictly-preceding offering
    q has q.price < p.price, or q.price = p.price ∧ q.size > p.size
    (distinct census) — exactly the dominators of p among the prefix —
    so p is dominated iff the exclusive prefix max of size ≥ p.size."""
    swept = global_running_max(
        census,
        [F.col("price_usd").asc(), F.col("size").desc()],
        "size",
        "_pmax",
    )
    return swept.withColumn(
        "dominated",
        F.col("_pmax").isNotNull() & (F.col("_pmax") >= F.col("size")),
    ).drop("_pmax")


@query(
    "q_skyline_price_size",
    oracle=f"""
    WITH {_CENSUS_DUCK}
    SELECT price_usd, size, parts FROM census c
    WHERE NOT EXISTS (
      SELECT 1 FROM census d WHERE {_DOMINATES})
    ORDER BY price_usd
    """,
)
def q_skyline_price_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BS bs1 — the 2D skyline: the Pareto-optimal (whole-dollar
    price, size) offerings of the part catalog (cheaper AND at least as
    big, or bigger AND at least as cheap, beats). Spark computes the
    sorted prefix-max sweep; the oracle evaluates the quadratic NOT
    EXISTS definition — algorithm-diverse, hash-identical. The skyline
    is strictly decreasing in size along increasing price, so price
    alone is a total order on the output.

    Scale: one fact pass to the ≤|dollar levels|×|sizes| census, then
    the distributed two-pass prefix-max (ranks.py) — no quadratic join,
    no single-partition census exchange."""
    return (
        _mark_dominated(_census(spark, sf_dir))
        .filter(~F.col("dominated"))
        .select("price_usd", "size", "parts")
        .orderBy("price_usd")
    )


@query(
    "q_skyline_dominance_counts",
    oracle=f"""
    WITH {_CENSUS_DUCK}
    SELECT c.price_usd, c.size, c.parts,
           CAST((SELECT count(*) FROM census d
                 WHERE d.price_usd >= c.price_usd AND d.size <= c.size)
                - 1 AS BIGINT) AS dominates_n,
           CAST((SELECT count(*) FROM census d
                 WHERE d.price_usd <= c.price_usd AND d.size >= c.size)
                - 1 AS BIGINT) AS dominated_by_n
    FROM census c ORDER BY price_usd, size
    """,
)
def q_skyline_dominance_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BS bs2 — dominance counts: per distinct offering, how many
    offerings it dominates / is dominated by. On the distinct census,
    |{q ≠ p: q ⪯-dominates p}| = |{q: q.price ≤ p.price ∧ q.size ≥
    p.size}| − 1 (the rectangle count minus p itself — non-strict ties
    in BOTH coordinates force q = p), so both columns are 2D prefix
    counts, not pair joins.

    Scale: densify the census onto the |prices|×|sizes| grid (two
    bounded distinct lists cross-joined), run TWO PARTITIONED window
    cumulations (over price within size, then over size within price —
    each key-partitioned, skew-free), and equi-join the census back to
    its grid cell. O(grid), never O(census²); the oracle runs the
    quadratic definition."""
    census = _census(spark, sf_dir)
    prices = census.select("price_usd").distinct()
    sizes = census.select("size").distinct()
    grid = prices.crossJoin(sizes).join(
        census.withColumnRenamed("parts", "offer"),
        ["price_usd", "size"],
        "left",
    )
    grid = grid.withColumn(
        "offer", F.when(F.col("offer").isNotNull(), 1).otherwise(0)
    )
    # cum_le_price(s, p) = #offerings with size = s, price ≤ p
    w_price = (
        Window.partitionBy("size")
        .orderBy("price_usd")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_price_desc = (
        Window.partitionBy("size")
        .orderBy(F.col("price_usd").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    grid = grid.withColumn("c_le_p", F.sum("offer").over(w_price)).withColumn(
        "c_ge_p", F.sum("offer").over(w_price_desc)
    )
    # dominated_by(p,s) + 1 = Σ_{s' ≥ s} c_le_p(s', p): cum over size desc
    w_size_desc = (
        Window.partitionBy("price_usd")
        .orderBy(F.col("size").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_size = (
        Window.partitionBy("price_usd")
        .orderBy("size")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    grid = grid.withColumn(
        "dom_by", F.sum("c_le_p").over(w_size_desc).cast("long") - 1
    ).withColumn("doms", F.sum("c_ge_p").over(w_size).cast("long") - 1)
    return (
        census.join(grid.select("price_usd", "size", "doms", "dom_by"),
                    ["price_usd", "size"])
        .select(
            "price_usd",
            "size",
            "parts",
            F.col("doms").alias("dominates_n"),
            F.col("dom_by").alias("dominated_by_n"),
        )
        .orderBy("price_usd", "size")
    )


@query(
    "q_skyline_layers",
    oracle=f"""
    WITH {_CENSUS_DUCK},
    l1 AS (SELECT * FROM census c WHERE NOT EXISTS (
      SELECT 1 FROM census d WHERE {_DOMINATES})),
    r1 AS (SELECT * FROM census EXCEPT SELECT * FROM l1),
    l2 AS (SELECT * FROM r1 c WHERE NOT EXISTS (
      SELECT 1 FROM r1 d WHERE {_DOMINATES})),
    r2 AS (SELECT * FROM r1 EXCEPT SELECT * FROM l2),
    l3 AS (SELECT * FROM r2 c WHERE NOT EXISTS (
      SELECT 1 FROM r2 d WHERE {_DOMINATES}))
    SELECT CAST(1 AS BIGINT) AS layer, price_usd, size, parts FROM l1
    UNION ALL
    SELECT CAST(2 AS BIGINT), price_usd, size, parts FROM l2
    UNION ALL
    SELECT CAST(3 AS BIGINT), price_usd, size, parts FROM l3
    ORDER BY layer, price_usd
    """,
)
def q_skyline_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BS bs3 — the first three skyline layers (onion peeling):
    layer k is the skyline of what remains after layers < k are
    removed — the ranked shortlist when the frontier is exhausted.
    Spark peels with three prefix-max sweeps; the oracle peels with
    three nested NOT EXISTS blocks.

    Scale: three passes over the bounded census (each the distributed
    two-pass sweep); remaining-set lineage is cut by the sweep's
    internal localCheckpoint each round."""
    remaining = _census(spark, sf_dir)
    out = None
    for layer in (1, 2, 3):
        marked = _mark_dominated(remaining)
        sky = (
            marked.filter(~F.col("dominated"))
            .select(
                F.lit(layer).cast("long").alias("layer"),
                "price_usd",
                "size",
                "parts",
            )
        )
        out = sky if out is None else out.unionAll(sky)
        remaining = marked.filter(F.col("dominated")).select(
            "price_usd", "size", "parts"
        )
    return out.orderBy("layer", "price_usd")


@query(
    "q_skyline_brand_type",
    oracle="""
    WITH cells AS (
      SELECT p_brand, p_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(floor(p_retailprice * 100 + 0.5) AS HUGEINT))
                  AS HUGEINT) AS s,
             CAST(sum(CAST(p_size AS HUGEINT)) AS HUGEINT) AS z
      FROM part GROUP BY 1, 2
    )
    SELECT p_brand, p_type, n AS parts,
           CAST((10 * s) // n AS BIGINT) AS avg_price_milli,
           CAST((1000 * z) // n AS BIGINT) AS avg_size_milli
    FROM cells c
    WHERE NOT EXISTS (
      SELECT 1 FROM cells d
      WHERE d.s * c.n <= c.s * d.n
        AND d.z * c.n >= c.z * d.n
        AND d.n >= c.n
        AND (d.s * c.n < c.s * d.n OR d.z * c.n > c.z * d.n
             OR d.n > c.n))
    ORDER BY p_brand, p_type
    """,
)
def q_skyline_brand_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BS bs4 — the 3D assortment skyline over the (brand, type)
    census: minimize average retail price, maximize average size,
    maximize offering count. Averages are RATIONALS s/n compared by
    cross-multiplication (s_d·n_c vs s_c·n_d in 128-bit), so the
    dominance test never divides; the published averages are the
    truncated milli spellings. Both engines evaluate the same
    quadratic NOT EXISTS — at |brands|×|types| ≈ 150 cells the O(n²)
    join is 22.5k pairs at ANY scale factor.

    Scale: one fact pass to the 150-cell census; the anti-join's
    nested loop is bounded by construction (adjudicated in
    tests/test_plans.py)."""
    part = load_table(spark, sf_dir, "part")
    cells = part.groupBy("p_brand", "p_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(
            f"CAST(sum(CAST(floor(p_retailprice * 100 + 0.5) AS {_DEC}))"
            f" AS {_DEC})"
        ).alias("s"),
        F.expr(f"CAST(sum(CAST(p_size AS {_DEC})) AS {_DEC})").alias("z"),
    ).localCheckpoint()
    c, d = cells.alias("c"), cells.alias("d")
    dominates = (
        (F.expr("d.s * c.n") <= F.expr("c.s * d.n"))
        & (F.expr("d.z * c.n") >= F.expr("c.z * d.n"))
        & (F.col("d.n") >= F.col("c.n"))
        & (
            (F.expr("d.s * c.n") < F.expr("c.s * d.n"))
            | (F.expr("d.z * c.n") > F.expr("c.z * d.n"))
            | (F.col("d.n") > F.col("c.n"))
        )
    )
    return (
        c.join(d, dominates, "left_anti")
        .select(
            "p_brand",
            "p_type",
            F.col("n").alias("parts"),
            F.expr(f"CAST((CAST(10 AS {_DEC}) * s) div n AS BIGINT)").alias(
                "avg_price_milli"
            ),
            F.expr(
                f"CAST((CAST(1000 AS {_DEC}) * z) div n AS BIGINT)"
            ).alias("avg_size_milli"),
        )
        .orderBy("p_brand", "p_type")
    )
