"""Semantic gates for §2.AE (inventory flows) and §2.AF (spatial grid).

The oracle-parity layer already hash-checks every key against DuckDB;
these tests pin the two claims the SQL twin can't certify on its own:

1. ae2's cumulative-interval-overlap join IS sequential FIFO — proved
   against a literal queue-walk reference, both on the corpus (per-part,
   exact) and under hypothesis fuzz over arbitrary lot/demand streams.
2. af2/af5's 3×3 grid stencil loses no in-radius pair — proved as a
   pure-arithmetic property over fuzzed point sets (the corpus oracles
   certify it too, but only for the corpus layout), plus a regression
   guard for the dense-key lattice failure the first coordinate
   derivation actually hit (linear multiplicative hash ⇒ 0 in-radius
   pairs at sf0.01).
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from recommendersystems_bigdata_spark import registry

registry.load_all()


# --- FIFO reference ---------------------------------------------------------


def _fifo_queue_walk(supplies: list[int], demands: list[int]) -> list[int]:
    """Literal sequential FIFO: walk both queues in order, allocate
    greedily. Returns the per-match allocation list (every entry > 0)."""
    allocs: list[int] = []
    si, di = 0, 0
    s_left = supplies[0] if supplies else 0
    d_left = demands[0] if demands else 0
    while si < len(supplies) and di < len(demands):
        a = min(s_left, d_left)
        allocs.append(a)
        s_left -= a
        d_left -= a
        if s_left == 0:
            si += 1
            s_left = supplies[si] if si < len(supplies) else 0
        if d_left == 0:
            di += 1
            d_left = demands[di] if di < len(demands) else 0
    return allocs


def _fifo_interval_overlap(supplies: list[int], demands: list[int]) -> list[int]:
    """ae2's spelling: cumulative [cum − qty, cum) intervals on both
    sides; strict overlap pairs allocate least(his) − greatest(los)."""
    def intervals(qtys: list[int]) -> list[tuple[int, int]]:
        out, cum = [], 0
        for q in qtys:
            out.append((cum, cum + q))
            cum += q
        return out

    allocs = []
    for slo, shi in intervals(supplies):
        for dlo, dhi in intervals(demands):
            if slo < dhi and dlo < shi:
                allocs.append(min(shi, dhi) - max(slo, dlo))
    return allocs


@settings(max_examples=300, deadline=None)
@given(
    supplies=st.lists(st.integers(min_value=1, max_value=50), max_size=12),
    demands=st.lists(st.integers(min_value=1, max_value=50), max_size=12),
)
def test_interval_overlap_is_sequential_fifo(supplies, demands):
    """The overlap join emits exactly the sequential walk's allocations
    (same multiset — the walk emits them in FIFO order, the join emits
    one row per overlapping pair; every allocation is positive, totals
    equal min(Σsupply, Σdemand))."""
    walk = _fifo_queue_walk(supplies, demands)
    overlap = _fifo_interval_overlap(supplies, demands)
    assert sorted(walk) == sorted(overlap)
    assert sum(overlap) == min(sum(supplies), sum(demands))
    assert all(a > 0 for a in overlap)


def test_fifo_allocation_matches_queue_walk_on_corpus(spark, sf_dir):
    """q_inv_fifo_allocation per-part pair counts and allocated units
    equal a literal per-part queue walk over the same flow order."""
    import duckdb

    rows = duckdb.sql(
        f"""
        SELECT l_partkey, l_returnflag = 'R' AS is_supply,
               CAST(l_quantity AS BIGINT) AS qty
        FROM '{sf_dir}/lineitem.parquet'
        ORDER BY l_partkey, l_shipdate, l_orderkey, l_linenumber
        """
    ).fetchall()
    supplies: dict[int, list[int]] = {}
    demands: dict[int, list[int]] = {}
    for p, is_supply, qty in rows:
        (supplies if is_supply else demands).setdefault(p, []).append(qty)
    expected = {}
    for p in set(supplies) & set(demands):
        allocs = _fifo_queue_walk(supplies[p], demands[p])
        if allocs:
            expected[p] = (len(allocs), sum(allocs))
    got = {
        r["l_partkey"]: (r["n_pairs"], r["alloc_qty"])
        for r in registry.QUERIES["q_inv_fifo_allocation"](spark, sf_dir)
        .collect()
    }
    assert got == expected


# --- grid stencil completeness ----------------------------------------------

_CELL = 64  # small grid for the fuzz — the property is scale-free


_FORWARD = ((0, 0), (0, 1), (1, -1), (1, 0), (1, 1))  # af2's half-stencil


@settings(max_examples=300, deadline=None)
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1023),
            st.integers(min_value=0, max_value=1023),
        ),
        max_size=24,
        unique=True,
    ),
    r=st.integers(min_value=0, max_value=_CELL),
)
def test_grid_stencil_covers_all_in_radius_pairs(pts, r):
    """For any radius ≤ the cell edge: (a) every in-radius pair falls in
    the 3×3 neighbor stencil of either point's cell (af5's completeness);
    (b) af2's FORWARD half-stencil generates every unordered distinct
    pair in the stencil EXACTLY once — cross-cell pairs by the single
    forward direction matching their cell difference, same-cell pairs by
    index order. Pure arithmetic, scale-free."""
    r2 = r * r
    for ax, ay in pts:
        for bx, by in pts:
            if (ax - bx) ** 2 + (ay - by) ** 2 <= r2:
                assert abs(ax // _CELL - bx // _CELL) <= 1
                assert abs(ay // _CELL - by // _CELL) <= 1
    # forward-stencil exactly-once: replicate af2's candidate generation
    cells = [(x // _CELL, y // _CELL) for x, y in pts]
    generated: list[tuple[int, int]] = []
    for i, (cx, cy) in enumerate(cells):  # side A fans forward
        for dx, dy in _FORWARD:
            for j, cb in enumerate(cells):  # side B stays put
                if cb == (cx + dx, cy + dy) and not (
                    (dx, dy) == (0, 0) and not i < j
                ):
                    generated.append((min(i, j), max(i, j)))
    in_stencil = [
        (i, j)
        for i in range(len(pts))
        for j in range(i + 1, len(pts))
        if abs(cells[i][0] - cells[j][0]) <= 1 and abs(cells[i][1] - cells[j][1]) <= 1
    ]
    assert sorted(generated) == in_stencil


def test_coordinate_derivation_is_not_a_lattice(spark, sf_dir):
    """Regression for the dense-key lattice: a LINEAR multiplicative hash
    on sequential keys puts every pair at key-distance d on one
    displacement vector — the radius join found 0 pairs at sf0.01. The
    quadratic derivation must (a) yield in-radius pairs even on the
    smallest corpus and (b) spread customers over many grid cells."""
    pairs = registry.QUERIES["q_geo_nearest_pairs"](spark, sf_dir)
    assert pairs.count() > 0
    from pyspark.sql import functions as F

    from recommendersystems_bigdata_spark.operators.spatial import _CELL as CELL, _cust

    cells = (
        _cust(spark, sf_dir)
        .select(
            F.expr(f"lat div {CELL}").alias("x"), F.expr(f"lon div {CELL}").alias("y")
        )
        .distinct()
        .count()
    )
    assert cells > 50  # 150 customers over 648 cells: measured 134
