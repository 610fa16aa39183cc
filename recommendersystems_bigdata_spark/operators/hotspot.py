"""Spatial hotspot clustering (SURVEY.md §2.BG, round 9).

The grid-DBSCAN-flavored composite over §2.AF's deterministic planar
layout: find grid cells whose customer density is strictly ABOVE the
nonempty-cell mean (a scale-invariant threshold — no magic absolute
count), then cluster adjacent hotspot cells (8-neighborhood) into
contiguous hot REGIONS with exact mass accounting. The composition is
the point: the cell census comes from §2.AF's coordinate kernel, the
clustering reuses ml/graph.py's min-label connected-components kernel,
and the DuckDB oracle proves the whole pipeline with a recursive-CTE
reachability closure — three existing engine pieces certified
end-to-end as one operator.

- bg1: hotspot cells — the above-mean cells with exact counts, balance
  cents, and each cell's share of ALL customers in truncated bp. The
  threshold compare is cross-multiplied integers (``n·nonempty >
  total``), never a float mean.
- bg2: hotspot clusters — 8-neighbor connected components over the
  hotspot cells (labels = min cell id), per-cluster cell count,
  customers, and balance mass.
- bg3: the dominant cluster — bounding box, mass, and its share of the
  whole customer base (one row; deterministic tie-break by label).
- bg4: the cluster size-class census — how much hotspot mass sits in
  singleton cells vs small runs vs 4+-cell regions (the "is the heat
  contiguous or speckled" diagnostic).

Exactness: coordinates/cells are §2.AF's pure-BIGINT quadratic hash;
thresholds are cross-multiplied integer compares; shares are
truncating-bp divisions. Cluster labels are integer min-ids from an
exact fixpoint (stopping rule: no label decreased), so every output
hash-matches the oracle's recursive closure bit-for-bit.

Spark-first shape, sized for 100 TB:
- ONE customer pass partial-aggregates to the ≤648-cell census (10°
  grid); the (total, nonempty) stats are an unpartitioned window over
  that bounded census (round 11 — the former 1-row broadcast re-ran the
  customer pass).
- Adjacency is the 3×3 stencil EXPLODE + equi-join on the neighbor
  cell id (§2.AF's avoid-all-pairs device) — never an inequality
  nested loop; self-pairs ride along so singleton cells label
  themselves.
- The star-contraction loop (ml/graph.py, round 11 — one observe-fused
  job per round, ~log₂(diameter) rounds) runs on the ≤648-node cell
  graph. The grid caps the graph no matter the fact size: 100 TB of
  customers changes cell WEIGHTS, not the clustering cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.ml.graph import star_components
from recommendersystems_bigdata_spark.operators.spatial import (
    _CELL,
    _CUST_SQL,
    _cust,
)
from recommendersystems_bigdata_spark.registry import query

# DuckDB: cell census → above-mean hotspot cells → 8-neighbor closure.
_HOT_SQL = f"""
{_CUST_SQL},
cells AS (
  SELECT lat // {_CELL} AS cell_x, lon // {_CELL} AS cell_y,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(bal_cents) AS BIGINT) AS bal_cents
  FROM cust GROUP BY 1, 2
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS nonempty, CAST(sum(n) AS BIGINT) AS total
  FROM cells
),
hot AS (
  SELECT cell_x, cell_y, cell_x * 1000 + cell_y AS id, n, bal_cents
  FROM cells, stats WHERE n * nonempty > total
)
"""

_CLOSURE_SQL = """
, edges AS (
  SELECT a.id AS src, b.id AS dst
  FROM hot a JOIN hot b
    ON abs(a.cell_x - b.cell_x) <= 1 AND abs(a.cell_y - b.cell_y) <= 1
),
reach(id, r) AS (
  SELECT id, id FROM hot
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.id = e.dst
),
labels AS (SELECT id, min(r) AS label FROM reach GROUP BY 1),
clus AS (
  SELECT l.label AS cluster_id,
         CAST(count(*) AS BIGINT) AS n_cells,
         CAST(sum(h.n) AS BIGINT) AS customers,
         CAST(sum(h.bal_cents) AS BIGINT) AS bal_cents,
         CAST(min(h.cell_x) AS BIGINT) AS min_x,
         CAST(max(h.cell_x) AS BIGINT) AS max_x,
         CAST(min(h.cell_y) AS BIGINT) AS min_y,
         CAST(max(h.cell_y) AS BIGINT) AS max_y
  FROM hot h JOIN labels l ON l.id = h.id
  GROUP BY 1
)
"""


def _cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _cust(spark, sf_dir)
        .groupBy(
            F.expr(f"lat div {_CELL}").alias("cell_x"),
            F.expr(f"lon div {_CELL}").alias("cell_y"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("bal_cents").cast("long").alias("bal_cents"),
        )
    )


def _hot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-mean cells with their integer cell id. The corpus stats
    (nonempty-cell count, customer total) are an unpartitioned window
    over the BOUNDED ≤648-cell census (round 11 — the former 1-row
    broadcast re-aggregated the census subtree, and Catalyst gave the
    duplicate no exchange reuse, so the customer fact was scanned and
    cell-shuffled twice; same fix as §2.BN's norm census)."""
    cells = _cells(spark, sf_dir)
    w = Window.partitionBy()
    return (
        cells.withColumn("nonempty", F.count(F.lit(1)).over(w).cast("long"))
        .withColumn("total", F.sum("n").over(w).cast("long"))
        .where(F.col("n") * F.col("nonempty") > F.col("total"))
        .select(
            "cell_x",
            "cell_y",
            (F.col("cell_x") * 1000 + F.col("cell_y")).alias("id"),
            "n",
            "bal_cents",
            "total",
        )
    )


def _clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster rollup: connected components over the 8-neighbor cell
    graph, labels = min cell id per component. Round 11: the kernel is
    the shared large-star/small-star contraction (ml/graph.py
    star_components — observe-fused ONE job per round, ~log(diameter)
    rounds) instead of the min-label propagator, whose rounds ~ cluster
    diameter at TWO jobs each dominated this suite's wall time on the
    ≤648-cell graph. Both kernels label a component by its min id
    (pinned label-identical in tests/test_graph.py); singleton hotspot
    cells — self-loops, which the contraction canonicalizes away — come
    back via the same left-join + coalesce(label, id) device
    q_dedup_clusters uses."""
    hot = _hot(spark, sf_dir).localCheckpoint()
    stencil = hot.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ).alias("d"),
        "cell_x",
        "cell_y",
    ).select(
        F.col("id").alias("pa"),
        (
            (F.col("cell_x") + F.col("d.dx")) * 1000
            + (F.col("cell_y") + F.col("d.dy"))
        ).alias("nbr_id"),
    )
    edges = stencil.join(
        hot.select(F.col("id").alias("pb")),
        stencil.nbr_id == F.col("pb"),
    ).select("pa", "pb")
    labels = star_components(edges.selectExpr("pa AS src", "pb AS dst")).withColumnRenamed("part", "id")
    return (
        hot.join(labels, "id", "left")
        .withColumn("label", F.coalesce("label", "id"))
        .groupBy(F.col("label").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum("n").cast("long").alias("customers"),
            F.sum("bal_cents").cast("long").alias("bal_cents"),
            F.min("cell_x").cast("long").alias("min_x"),
            F.max("cell_x").cast("long").alias("max_x"),
            F.min("cell_y").cast("long").alias("min_y"),
            F.max("cell_y").cast("long").alias("max_y"),
            F.max("total").cast("long").alias("total"),
        )
    )


@query(
    "q_hotspot_cells",
    oracle=f"""
    WITH {_HOT_SQL}
    SELECT cell_x, cell_y, n, bal_cents,
           CAST((10000 * n) // (SELECT total FROM stats) AS BIGINT) AS share_bp
    FROM hot ORDER BY n DESC, cell_x, cell_y
    """,
)
def q_hotspot_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BG bg1 — the hotspot cell table: every 10° grid cell whose
    customer count is STRICTLY above the nonempty-cell mean
    (cross-multiplied integer compare, scale-invariant), with exact
    balance mass and the cell's share of all customers in truncated
    bp. The input heatmap for bg2's clustering.

    Scale: one partial-aggregated customer pass to ≤648 cells; the
    1-row stats attach is a broadcast."""
    return (
        _hot(spark, sf_dir)
        .select(
            "cell_x",
            "cell_y",
            "n",
            "bal_cents",
            F.expr("(10000 * n) div total").alias("share_bp"),
        )
        .orderBy(F.col("n").desc(), "cell_x", "cell_y")
    )


@query(
    "q_hotspot_clusters",
    oracle=f"""
    WITH RECURSIVE {_HOT_SQL} {_CLOSURE_SQL}
    SELECT cluster_id, n_cells, customers, bal_cents
    FROM clus ORDER BY customers DESC, cluster_id
    """,
)
def q_hotspot_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BG bg2 — contiguous hot regions: 8-neighbor connected
    components over the hotspot cells (ml/graph.py's min-label kernel;
    labels = min cell id — exact integer fixpoint), rolled up to
    per-cluster cell counts, customers, and balance cents. The oracle
    computes the same closure with a recursive CTE, certifying the
    iterative kernel against declarative reachability.

    Scale: the stencil explode + equi-join and the CC loop all run on
    the ≤648-cell census — the fact only ever feeds cell weights."""
    return (
        _clusters(spark, sf_dir)
        .select("cluster_id", "n_cells", "customers", "bal_cents")
        .orderBy(F.col("customers").desc(), "cluster_id")
    )


@query(
    "q_hotspot_largest_cluster",
    oracle=f"""
    WITH RECURSIVE {_HOT_SQL} {_CLOSURE_SQL}
    SELECT cluster_id, n_cells, customers, bal_cents,
           min_x, max_x, min_y, max_y,
           CAST((10000 * customers) // (SELECT total FROM stats) AS BIGINT)
             AS customer_share_bp
    FROM clus ORDER BY customers DESC, cluster_id LIMIT 1
    """,
)
def q_hotspot_largest_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BG bg3 — the dominant hot region: the cluster holding the
    most customers (ties broken by label), with its cell-grid bounding
    box and its truncated-bp share of the ENTIRE customer base — the
    "how concentrated is the market, spatially" headline number.

    Scale: a LIMIT 1 over the bounded cluster rollup."""
    return (
        _clusters(spark, sf_dir)
        .select(
            "cluster_id",
            "n_cells",
            "customers",
            "bal_cents",
            "min_x",
            "max_x",
            "min_y",
            "max_y",
            F.expr("(10000 * customers) div total").alias("customer_share_bp"),
        )
        .orderBy(F.col("customers").desc(), "cluster_id")
        .limit(1)
    )


@query(
    "q_hotspot_size_classes",
    oracle=f"""
    WITH RECURSIVE {_HOT_SQL} {_CLOSURE_SQL}
    SELECT CASE WHEN n_cells = 1 THEN 'singleton'
                WHEN n_cells <= 3 THEN 'small'
                ELSE 'region' END AS size_class,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(n_cells) AS BIGINT) AS cells,
           CAST(sum(customers) AS BIGINT) AS customers
    FROM clus GROUP BY 1 ORDER BY size_class
    """,
)
def q_hotspot_size_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BG bg4 — the contiguity diagnostic: hotspot clusters bucketed
    into singleton cells / small runs (2–3 cells) / 4+-cell regions,
    with cluster counts and customer mass per class. Speckled heat
    (all singletons) vs contiguous corridors read directly off this
    3-row census.

    Scale: a CASE rollup over the bounded cluster table."""
    return (
        _clusters(spark, sf_dir)
        .groupBy(
            F.expr(
                "CASE WHEN n_cells = 1 THEN 'singleton'"
                " WHEN n_cells <= 3 THEN 'small'"
                " ELSE 'region' END"
            ).alias("size_class")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clusters"),
            F.sum("n_cells").cast("long").alias("cells"),
            F.sum("customers").cast("long").alias("customers"),
        )
        .orderBy("size_class")
    )
