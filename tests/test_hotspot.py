"""Semantic gates for §2.BG (spatial hotspot clustering).

Oracle parity hash-checks every key (the oracle's recursive-CTE closure
vs the engine's iterative min-label kernel); these rebuild the whole
pipeline in Python — coordinates via the SAME arithmetic strings
evaluated in DuckDB, threshold, 8-neighbor union-find — pinning:

1. bg1's hotspot set and shares against the rebuild, plus the
   strictly-above-mean threshold semantics (every hotspot cell clears
   it; every excluded nonempty cell does not).
2. bg2's cluster partition against union-find (labels = min member id,
   exact rollups), plus the adjacency soundness of every multi-cell
   cluster (each member touches another member).
3. bg3 = the customers-max row of bg2's table with the exact bbox.
4. bg4's recomposition from bg2.
"""

from __future__ import annotations

import duckdb

from recommendersystems_bigdata_spark import registry
from recommendersystems_bigdata_spark.operators.spatial import (
    _CELL,
    _coords_sql,
)

registry.load_all()


def _tdiv(a, b):
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _cells_py(sf_dir):
    """cell (x, y) → (n, bal_cents) via the engine's coordinate strings."""
    rows = duckdb.sql(
        f"""
        WITH cust AS (
          SELECT CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents,
                 {_coords_sql("c_custkey", 0)}
          FROM '{sf_dir}/customer.parquet'
        )
        SELECT lat // {_CELL}, lon // {_CELL},
               CAST(count(*) AS BIGINT), CAST(sum(bal_cents) AS BIGINT)
        FROM cust GROUP BY 1, 2
        """
    ).fetchall()
    return {(x, y): (n, b) for x, y, n, b in rows}


def _hot_py(cells):
    total = sum(n for n, _ in cells.values())
    nonempty = len(cells)
    return (
        {xy: nb for xy, nb in cells.items() if nb[0] * nonempty > total},
        total,
    )


def _clusters_py(hot):
    """union-find over the 8-neighborhood; label = min member cell id."""
    parent = {xy: xy for xy in hot}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for (x, y) in hot:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nb = (x + dx, y + dy)
                if nb in hot:
                    ra, rb = find((x, y)), find(nb)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    clusters = {}
    for xy in hot:
        root = find(xy)
        clusters.setdefault(root, []).append(xy)
    return {
        min(x * 1000 + y for x, y in members): members
        for members in clusters.values()
    }


def test_hotspot_cells_threshold_and_shares(spark, sf_dir):
    cells = _cells_py(sf_dir)
    hot, total = _hot_py(cells)
    rows = registry.QUERIES["q_hotspot_cells"](spark, sf_dir).collect()
    assert {(r["cell_x"], r["cell_y"]) for r in rows} == set(hot)
    nonempty = len(cells)
    for r in rows:
        n, b = hot[(r["cell_x"], r["cell_y"])]
        assert (r["n"], r["bal_cents"]) == (n, b)
        assert r["share_bp"] == _tdiv(10000 * n, total)
        assert n * nonempty > total  # strictly above the mean
    for xy, (n, _b) in cells.items():
        if xy not in hot:
            assert n * nonempty <= total


def test_clusters_match_union_find(spark, sf_dir):
    cells = _cells_py(sf_dir)
    hot, _total = _hot_py(cells)
    expect = _clusters_py(hot)
    rows = registry.QUERIES["q_hotspot_clusters"](spark, sf_dir).collect()
    assert {r["cluster_id"] for r in rows} == set(expect)
    for r in rows:
        members = expect[r["cluster_id"]]
        assert r["n_cells"] == len(members)
        assert r["customers"] == sum(hot[xy][0] for xy in members)
        assert r["bal_cents"] == sum(hot[xy][1] for xy in members)
        # adjacency soundness: in a multi-cell cluster every member
        # touches at least one other member (Chebyshev distance 1)
        if len(members) > 1:
            for x, y in members:
                assert any(
                    (a, b) != (x, y) and abs(a - x) <= 1 and abs(b - y) <= 1
                    for a, b in members
                )


def test_largest_cluster_is_the_max_row(spark, sf_dir):
    cells = _cells_py(sf_dir)
    hot, total = _hot_py(cells)
    expect = _clusters_py(hot)
    best = min(
        expect,
        key=lambda cid: (-sum(hot[xy][0] for xy in expect[cid]), cid),
    )
    [r] = registry.QUERIES["q_hotspot_largest_cluster"](
        spark, sf_dir
    ).collect()
    members = expect[best]
    assert r["cluster_id"] == best
    assert r["customers"] == sum(hot[xy][0] for xy in members)
    assert (r["min_x"], r["max_x"]) == (
        min(x for x, _ in members), max(x for x, _ in members),
    )
    assert (r["min_y"], r["max_y"]) == (
        min(y for _, y in members), max(y for _, y in members),
    )
    assert r["customer_share_bp"] == _tdiv(10000 * r["customers"], total)


def test_size_classes_recompose_from_clusters(spark, sf_dir):
    crows = registry.QUERIES["q_hotspot_clusters"](spark, sf_dir).collect()
    def cls(n):
        return "singleton" if n == 1 else ("small" if n <= 3 else "region")
    expect = {}
    for r in crows:
        k = cls(r["n_cells"])
        a, b, c = expect.get(k, (0, 0, 0))
        expect[k] = (a + 1, b + r["n_cells"], c + r["customers"])
    rows = registry.QUERIES["q_hotspot_size_classes"](spark, sf_dir).collect()
    assert {r["size_class"] for r in rows} == set(expect)
    for r in rows:
        assert (r["n_clusters"], r["cells"], r["customers"]) == expect[
            r["size_class"]
        ]
