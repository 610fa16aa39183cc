"""Spatial grid analytics (SURVEY.md §2.AF, round 9).

Geo-shaped workloads over the corpus: entities get DETERMINISTIC planar
coordinates derived from their keys, in integer micro-degrees on a
[0, 180e6) × [0, 360e6) plane. The derivation is QUADRATIC modular
hashing — ``((k² + salt·P₀) mod ext) · A + k·B + C (mod ext)`` with the
classic public constants (Knuth's 2654435761, xxHash's 2246822519, the
LCG multipliers 40503/69069) — chosen over plain multiplicative hashing
deliberately: with DENSE keys a linear map ``k·A mod M`` puts all points
on a 1-D lattice (every pair at key-distance d shares ONE displacement
vector, so a radius query finds either nothing or everything), while the
quadratic term makes pair displacements key-dependent and the layout
2-D-uniform in practice. Pure BIGINT arithmetic with every intermediate
bounded by ext²·~7 < 2⁶³ (the key is reduced mod ext before squaring),
so both engines compute bit-identical coordinates from the SAME
expression string and every distance below is an exact integer — no
trig, no floats, no engine-specific geo library.

The suite is the standard spatial-index playbook re-expressed as grid
bucketing: cell density, within-radius PAIR finding via the 3×3
neighbor-cell equi-join (the avoid-all-pairs kernel — candidates come
from a grid-cell join, never a cross product), nearest-hub assignment
(broadcast the small hub set, window argmin), a Morton-free tile
pyramid (multi-resolution rollup), and bipartite radius coverage.

Spark-first shape, sized for 100 TB:
- af2/af5 NEVER enumerate all pairs: one side is exploded to neighbor
  cells (af2 the 5-cell FORWARD half-stencil on radius-sized cells so
  each unordered pair is generated once; af5 the full 3×3 on the small
  hub side) and the match is an equi-join on the cell id — candidate
  count is bounded by grid occupancy, and the exact-distance residual
  runs post-join. Radii are ≤ the cell edge so the stencils are
  provably complete.
- af3 broadcasts the hub dimension (hubs are small by definition); the
  per-entity argmin is a partial-aggregable min(struct(dist2, hk)), so
  the fan-out collapses map-side, deterministically tie-broken.
- af1/af4 are single partial-aggregated groupBys to grid cardinality;
  ordered output only ever sees bounded tile relations.

The DuckDB oracles compute the same coordinates arithmetically and, for
the pair/coverage queries, use the naive quadratic join — certifying
that the grid-bucketed candidate generation LOSES NOTHING at the tested
radii (the completeness argument, hash-checked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query

_CENTS = "CAST(floor({col} * 100 + 0.5) AS BIGINT)"

# planar extents in micro-degrees; coordinates land in [0, extent).
_LAT_EXTENT = 180_000_001
_LON_EXTENT = 360_000_001
_CELL = 10_000_000  # 10° grid cells (density display + coverage stencil)
_CELL_PAIRS = 5_000_000  # radius-sized 5° cells for the pair join (af2)
_R2_PAIRS = 25_000_000_000_000  # (5e6 µdeg)² — pair radius, ≤ _CELL_PAIRS
_R2_COVER = 64_000_000_000_000  # (8e6 µdeg)² — coverage radius, ≤ _CELL


def _axis_sql(key: str, salt: int, ext: int, a: int, b: int, c: int) -> str:
    """One coordinate axis: quadratic modular hash of a non-negative
    BIGINT key. Uses only ``* + %`` so the SAME string is a valid Spark
    and DuckDB expression; the key is reduced mod ``ext`` before squaring
    so every intermediate fits in a BIGINT for the full key range."""
    km = f"({key} % {ext})"
    return f"((({km} * {km} + {salt} * 999983) % {ext}) * {a} + {km} * {b} + {c}) % {ext}"


def _coords_sql(key: str, salt: int) -> str:
    """`lat, lon` micro-degree columns for a BIGINT key (both engines)."""
    lat = _axis_sql(key, salt, _LAT_EXTENT, 2_654_435_761, 40_503, 2_531_011)
    lon = _axis_sql(key, salt, _LON_EXTENT, 2_246_822_519, 69_069, 12_345)
    return f"{lat} AS lat, {lon} AS lon"


def _with_coords(df: DataFrame, key: str, salt: int) -> DataFrame:
    """Attach (lat, lon) micro-degree coordinates derived from ``key`` —
    the exact expression strings the oracle uses, via ``F.expr``."""
    lat = _axis_sql(key, salt, _LAT_EXTENT, 2_654_435_761, 40_503, 2_531_011)
    lon = _axis_sql(key, salt, _LON_EXTENT, 2_246_822_519, 69_069, 12_345)
    return df.withColumn("lat", F.expr(lat)).withColumn("lon", F.expr(lon))


# customers carry salt 0, supplier hubs salt 7 — distinct layouts so the
# bipartite queries aren't degenerate (hub exactly on a customer).
_CUST_SQL = f"""
cust AS (
  SELECT c_custkey AS ck, {_CENTS.format(col="c_acctbal")} AS bal_cents,
         {_coords_sql("c_custkey", 0)}
  FROM customer
)
"""
_HUB_SQL = f"""
hub AS (
  SELECT s_suppkey AS hk, {_coords_sql("s_suppkey", 7)}
  FROM supplier
)
"""


def _cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return _with_coords(
        c.select(
            F.col("c_custkey").alias("ck"),
            F.expr(_CENTS.format(col="c_acctbal")).alias("bal_cents"),
        ),
        "ck",
        0,
    )


def _hubs(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    return _with_coords(s.select(F.col("s_suppkey").alias("hk")), "hk", 7)


@query(
    "q_geo_grid_density",
    oracle=f"""
    WITH {_CUST_SQL}
    SELECT lat // {_CELL} AS cell_x, lon // {_CELL} AS cell_y,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(bal_cents) AS BIGINT) AS bal_cents
    FROM cust GROUP BY 1, 2
    ORDER BY n DESC, cell_x, cell_y LIMIT 20
    """,
)
def q_geo_grid_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AF af1 — grid-cell density: customers bucketed into 10° grid
    cells (truncated div of non-negative micro-degrees — identical in
    both engines), top-20 densest cells with exact balance mass. The
    heatmap primitive every spatial dashboard starts from.

    Scale: one map-side-combined groupBy to grid cardinality (≤ 648
    cells at this resolution); TakeOrdered over the bounded cell set."""
    cust = _cust(spark, sf_dir)
    return (
        cust.groupBy(
            F.expr(f"lat div {_CELL}").alias("cell_x"),
            F.expr(f"lon div {_CELL}").alias("cell_y"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("bal_cents").cast("long").alias("bal_cents"),
        )
        .orderBy(F.desc("n"), "cell_x", "cell_y")
        .limit(20)
    )


@query(
    "q_geo_nearest_pairs",
    oracle=f"""
    WITH {_CUST_SQL}
    SELECT a.ck AS ck_a, b.ck AS ck_b,
           (a.lat - b.lat) * (a.lat - b.lat)
             + (a.lon - b.lon) * (a.lon - b.lon) AS dist2
    FROM cust a JOIN cust b ON a.ck < b.ck
    WHERE (a.lat - b.lat) * (a.lat - b.lat)
            + (a.lon - b.lon) * (a.lon - b.lon) <= {_R2_PAIRS}
    ORDER BY dist2, ck_a, ck_b LIMIT 20
    """,
)
def q_geo_nearest_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AF af2 — within-radius nearest pairs: the 20 closest customer
    pairs within 5° planar distance. Candidates come from the grid: side
    A fans out to its FORWARD half-stencil (5 cells, map-side explode)
    and pairs form by EQUI-JOIN on the cell id, then the exact integer
    distance residual runs post-join; every unordered pair is generated
    exactly once (cross-cell by the one forward direction that matches
    its cell difference, same-cell by key order). Radius ≤ cell edge
    proves the stencil complete — the ORACLE runs the naive quadratic
    join, so the hash match certifies the grid candidate set loses no
    pair.

    Scale: the avoid-all-pairs kernel, tuned twice after measurement.
    (a) The pair grid uses RADIUS-SIZED cells (5°, not the display
    grid's 10°): completeness needs only radius ≤ cell edge, and
    quartering the cell area cuts stencil occupancy ~4×. (b) Side A
    fans out to the FORWARD half-stencil only — {(0,0),(0,1),(1,−1),
    (1,0),(1,1)}, one of ±(dx,dy) per direction — so every unordered
    cross-cell pair is generated exactly once and same-cell pairs are
    ordered by key; vs the naive 3×3 both-sided join this is ~3.6×
    fewer candidates. Candidate count is Σ_cell n·m over 5 stencils,
    never |n|²; with density-proportional growth the remaining lever is
    shrinking the radius or the cell. TakeOrdered keeps only 20."""
    cust = _cust(spark, sf_dir).withColumn(
        "cx", F.expr(f"lat div {_CELL_PAIRS}")
    ).withColumn("cy", F.expr(f"lon div {_CELL_PAIRS}"))
    fwd = F.expr(
        "explode(array(named_struct('dx', 0, 'dy', 0),"
        " named_struct('dx', 0, 'dy', 1), named_struct('dx', 1, 'dy', -1),"
        " named_struct('dx', 1, 'dy', 0), named_struct('dx', 1, 'dy', 1)))"
    )
    a = cust.withColumn("o", fwd).select(
        F.col("ck").alias("ck_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        (F.col("cx") + F.col("o.dx")).alias("cell_x"),
        (F.col("cy") + F.col("o.dy")).alias("cell_y"),
        ((F.col("o.dx") == 0) & (F.col("o.dy") == 0)).alias("same_cell"),
    )
    b = cust.select(
        F.col("ck").alias("ck_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        F.col("cx").alias("cell_x"),
        F.col("cy").alias("cell_y"),
    )
    d2 = (F.col("lat_a") - F.col("lat_b")) * (F.col("lat_a") - F.col("lat_b")) + (
        F.col("lon_a") - F.col("lon_b")
    ) * (F.col("lon_a") - F.col("lon_b"))
    pairs = (
        a.join(b, ["cell_x", "cell_y"])
        .where(
            (~F.col("same_cell")) | (F.col("ck_a") < F.col("ck_b"))
        )
        .select(
            F.least("ck_a", "ck_b").alias("ck_lo"),
            F.greatest("ck_a", "ck_b").alias("ck_hi"),
            d2.alias("dist2"),
        )
        .where(F.col("dist2") <= _R2_PAIRS)
    )
    return (
        pairs.select(
            F.col("ck_lo").alias("ck_a"), F.col("ck_hi").alias("ck_b"), "dist2"
        )
        .orderBy("dist2", "ck_a", "ck_b")
        .limit(20)
    )


@query(
    "q_geo_nearest_hub",
    oracle=f"""
    WITH {_CUST_SQL}, {_HUB_SQL},
    cand AS (
      SELECT c.ck, c.bal_cents, h.hk,
             (c.lat - h.lat) * (c.lat - h.lat)
               + (c.lon - h.lon) * (c.lon - h.lon) AS dist2
      FROM cust c CROSS JOIN hub h
    ),
    best AS (
      SELECT ck, bal_cents, hk, dist2,
             row_number() OVER (PARTITION BY ck ORDER BY dist2, hk) AS rn
      FROM cand
    )
    SELECT hk AS hub_key, CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(bal_cents) AS BIGINT) AS bal_cents,
           CAST(min(dist2) AS BIGINT) AS closest_dist2,
           CAST(max(dist2) AS BIGINT) AS farthest_dist2
    FROM best WHERE rn = 1
    GROUP BY 1 ORDER BY hub_key
    """,
)
def q_geo_nearest_hub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AF af3 — nearest-hub assignment: every customer assigned to its
    closest supplier hub (exact integer distance, ties broken by hub
    key), then the per-hub census: customer count, balance mass, closest
    and farthest assigned distance. The territory/fulfillment-zone
    design query.

    Scale: exact NN with GRID PRUNING and a guaranteed fallback. Phase
    1 joins customers to the broadcast 3×3 hub stencil of their cell
    and takes the per-customer ``min(struct(dist2, hk))`` — a
    partial-aggregable argmin (no Window, no fan-out shuffle). A
    stencil winner within the CELL EDGE is provably the global nearest:
    any hub outside the 3×3 stencil is at axis distance > one cell
    edge. Phase 2 fans ONLY the unresolved customers (empty stencil, or
    winner beyond the edge) out to all |hubs| — on a uniform layout
    that's a vanishing fraction, so total work is ~|customers| × (hubs
    per stencil) instead of |customers| × |hubs|. The first two
    spellings measured their way here: a window argmin over the full
    fan-out (1.5 B-row shuffle sort at the 10× probe), then a map-side
    argmin over the full fan-out (still |customers| × |hubs| compares).
    The oracle stays the naive quadratic row_number, so the hash match
    certifies the pruning loses no assignment."""
    cust = _cust(spark, sf_dir)
    hubs = _hubs(spark, sf_dir).select(
        F.col("hk"), F.col("lat").alias("hlat"), F.col("lon").alias("hlon")
    )
    d2 = (F.col("lat") - F.col("hlat")) * (F.col("lat") - F.col("hlat")) + (
        F.col("lon") - F.col("hlon")
    ) * (F.col("lon") - F.col("hlon"))
    off = F.expr("explode(sequence(-1, 1))")
    hub9 = F.broadcast(
        hubs.withColumn("dx", off)
        .withColumn("dy", off)
        .select(
            "hk",
            "hlat",
            "hlon",
            (F.expr(f"hlat div {_CELL}") + F.col("dx")).alias("cell_x"),
            (F.expr(f"hlon div {_CELL}") + F.col("dy")).alias("cell_y"),
        )
    )
    cell = [
        F.expr(f"lat div {_CELL}").alias("cell_x"),
        F.expr(f"lon div {_CELL}").alias("cell_y"),
    ]
    stencil_best = (
        cust.select("ck", "bal_cents", "lat", "lon", *cell)
        .join(hub9, ["cell_x", "cell_y"])
        .groupBy("ck", "bal_cents")
        .agg(F.min(F.struct(d2.alias("dist2"), F.col("hk"))).alias("b"))
    )
    resolved = stencil_best.where(F.col("b.dist2") <= F.lit(_CELL * _CELL))
    # customers with no stencil hub, or whose stencil winner sits beyond
    # the cell edge (an outside hub could still beat it): full fan-out
    unresolved = (
        cust.join(resolved.select("ck"), "ck", "left_anti")
        .join(F.broadcast(hubs))
        .groupBy("ck", "bal_cents")
        .agg(F.min(F.struct(d2.alias("dist2"), F.col("hk"))).alias("b"))
    )
    best = resolved.unionByName(unresolved)
    return (
        best.groupBy(F.col("b.hk").alias("hub_key"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("bal_cents").cast("long").alias("bal_cents"),
            F.min("b.dist2").cast("long").alias("closest_dist2"),
            F.max("b.dist2").cast("long").alias("farthest_dist2"),
        )
        .orderBy("hub_key")
    )


# tile pyramid levels: cell edge per level, coarse → fine.
_LEVELS = ((0, 45_000_000), (1, 15_000_000), (2, 5_000_000))


@query(
    "q_geo_tile_pyramid",
    oracle=f"""
    WITH {_CUST_SQL},
    tiles AS (
      {" UNION ALL ".join(
        f"SELECT {lvl} AS level, lat // {edge} AS tile_x, "
        f"lon // {edge} AS tile_y, bal_cents FROM cust"
        for lvl, edge in _LEVELS
      )}
    ),
    agg AS (
      SELECT level, tile_x, tile_y, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(bal_cents) AS BIGINT) AS bal_cents
      FROM tiles GROUP BY 1, 2, 3
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY level
                                   ORDER BY n DESC, tile_x, tile_y) AS rn
      FROM agg
    )
    SELECT level, tile_x, tile_y, n, bal_cents
    FROM ranked WHERE rn <= 10
    ORDER BY level, n DESC, tile_x, tile_y
    """,
)
def q_geo_tile_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AF af4 — tile-pyramid rollup: customers aggregated at three
    grid resolutions (45° / 15° / 5° tiles — the zoom levels of a map
    service), top-10 tiles per level by count with exact balance mass.
    The multi-resolution pre-aggregation a tile server materializes.

    Scale: one scan, a 3× map-side fan-out (one row per level — a
    posexplode over the level table, no self-union re-scan), one
    partial-aggregated groupBy to tile cardinality, and a per-level
    top-10 window over the bounded tile relation."""
    cust = _cust(spark, sf_dir)
    level_expr = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(lvl).alias("level"),
                    F.expr(f"lat div {edge}").alias("tile_x"),
                    F.expr(f"lon div {edge}").alias("tile_y"),
                )
                for lvl, edge in _LEVELS
            ]
        )
    )
    tiles = cust.select(level_expr.alias("t"), "bal_cents").select(
        "t.level", "t.tile_x", "t.tile_y", "bal_cents"
    )
    agg = tiles.groupBy("level", "tile_x", "tile_y").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("bal_cents").cast("long").alias("bal_cents"),
    )
    w = Window.partitionBy("level").orderBy(F.desc("n"), "tile_x", "tile_y")
    return (
        agg.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 10)
        .select("level", "tile_x", "tile_y", "n", "bal_cents")
        .orderBy("level", F.desc("n"), "tile_x", "tile_y")
    )


@query(
    "q_geo_coverage",
    oracle=f"""
    WITH {_CUST_SQL}, {_HUB_SQL},
    cov AS (
      SELECT h.hk, CAST(count(c.ck) AS BIGINT) AS n_cov,
             CAST(coalesce(sum(c.bal_cents), 0) AS BIGINT) AS bal_cents
      FROM hub h LEFT JOIN cust c
        ON (c.lat - h.lat) * (c.lat - h.lat)
             + (c.lon - h.lon) * (c.lon - h.lon) <= {_R2_COVER}
      GROUP BY 1
    )
    SELECT hk AS hub_key, n_cov, bal_cents
    FROM cov ORDER BY n_cov DESC, hub_key
    """,
)
def q_geo_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AF af5 — service-area coverage: per hub, how many customers
    (and how much balance mass) sit within the 8° coverage radius —
    including ZERO-coverage hubs, which is exactly what a network
    planner needs to see. Bipartite radius join: hubs fan out to their
    3×3 neighbor cells (the hub side is small, so the 9× explode is
    broadcast), customers join by cell id, the exact residual filters,
    and a left join from the hub dimension restores uncovered hubs. The
    oracle's naive quadratic LEFT JOIN certifies stencil completeness
    (radius ≤ cell size).

    Scale: broadcast(9·|hubs|) equi-join on cell ids — per-customer work
    is its cell's hub stencil, never |hubs|; the census groupBy is
    partial-aggregated; output |hubs| rows."""
    cust = _cust(spark, sf_dir).withColumn(
        "cell_x", F.expr(f"lat div {_CELL}")
    ).withColumn("cell_y", F.expr(f"lon div {_CELL}"))
    hubs = _hubs(spark, sf_dir)
    off = F.expr("explode(sequence(-1, 1))")
    hub9 = (
        hubs.withColumn("dx", off)
        .withColumn("dy", off)
        .select(
            "hk",
            F.col("lat").alias("hlat"),
            F.col("lon").alias("hlon"),
            (F.expr(f"lat div {_CELL}") + F.col("dx")).alias("cell_x"),
            (F.expr(f"lon div {_CELL}") + F.col("dy")).alias("cell_y"),
        )
    )
    d2 = (F.col("lat") - F.col("hlat")) * (F.col("lat") - F.col("hlat")) + (
        F.col("lon") - F.col("hlon")
    ) * (F.col("lon") - F.col("hlon"))
    hits = (
        cust.join(F.broadcast(hub9), ["cell_x", "cell_y"])
        .where(d2 <= _R2_COVER)
        .groupBy("hk")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hit"),
            F.sum("bal_cents").cast("long").alias("bal_hit"),
        )
    )
    return (
        hubs.select("hk")
        .join(hits, "hk", "left")
        .select(
            F.col("hk").alias("hub_key"),
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_cov"),
            F.coalesce(F.col("bal_hit"), F.lit(0)).cast("long").alias("bal_cents"),
        )
        .orderBy(F.desc("n_cov"), "hub_key")
    )
