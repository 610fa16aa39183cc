"""Semantic gates for §2.BS (skyline / Pareto dominance).

Oracle parity hash-checks every key against the quadratic NOT EXISTS
definition; these pin the math independently:

1. The prefix-max SWEEP (the Spark-side algorithm) equals brute-force
   dominance on the real census AND on hypothesis-fuzzed random
   censuses — the algorithm-equivalence theorem the suite rests on.
2. bs2's rectangle-count identity (dominated_by + 1 = the ⪯-rectangle
   cardinality) against brute force.
3. bs3's layers partition correctly: each layer is the skyline of the
   census minus earlier layers, layers are disjoint, and layer k+1
   rows are dominated by something in layer k.
4. bs4's rational dominance against Fraction arithmetic.
"""

from __future__ import annotations

from fractions import Fraction

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from recommendersystems_bigdata_spark import registry

registry.load_all()


def _census_py(sf_dir):
    rows = duckdb.sql(
        f"""
        SELECT CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) // 100,
               CAST(p_size AS BIGINT), CAST(count(*) AS BIGINT)
        FROM '{sf_dir}/part.parquet' GROUP BY 1, 2
        """
    ).fetchall()
    return {(int(p), int(s)): int(n) for p, s, n in rows}


def _dominates(a, b):
    return a[0] <= b[0] and a[1] >= b[1] and a != b


def _skyline_brute(points):
    return {p for p in points if not any(_dominates(q, p) for q in points)}


def _skyline_sweep(points):
    """The Spark-side algorithm in Python: sort (price asc, size desc),
    a point is dominated iff the exclusive prefix max of size ≥ size."""
    out, pmax = set(), None
    for p, s in sorted(points, key=lambda t: (t[0], -t[1])):
        if pmax is None or pmax < s:
            out.add((p, s))
        pmax = s if pmax is None else max(pmax, s)
    return out


def test_sweep_equals_brute_force_on_real_census(spark, sf_dir):
    census = _census_py(sf_dir)
    want = _skyline_brute(set(census))
    assert _skyline_sweep(set(census)) == want
    rows = registry.QUERIES["q_skyline_price_size"](spark, sf_dir).collect()
    got = {(r["price_usd"], r["size"]) for r in rows}
    assert got == want
    for r in rows:
        assert r["parts"] == census[(r["price_usd"], r["size"])]


@settings(max_examples=300, deadline=None)
@given(
    st.sets(
        st.tuples(st.integers(0, 30), st.integers(0, 30)), min_size=1,
        max_size=60,
    )
)
def test_sweep_equals_brute_force_for_any_census(points):
    """Property: on ANY distinct 2D census, the sorted prefix-max sweep
    returns exactly the brute-force skyline."""
    assert _skyline_sweep(points) == _skyline_brute(points)


def test_dominance_counts_rectangle_identity(spark, sf_dir):
    census = set(_census_py(sf_dir))
    rows = registry.QUERIES["q_skyline_dominance_counts"](
        spark, sf_dir
    ).collect()
    assert len(rows) == len(census)
    by_key = {(r["price_usd"], r["size"]): r for r in rows}
    for p in census:
        r = by_key[p]
        assert r["dominated_by_n"] == sum(
            1 for q in census if _dominates(q, p)
        )
        assert r["dominates_n"] == sum(1 for q in census if _dominates(p, q))
        # the rectangle identity the grid plan computes
        assert r["dominated_by_n"] + 1 == sum(
            1 for q in census if q[0] <= p[0] and q[1] >= p[1]
        )


def test_layers_peel_correctly(spark, sf_dir):
    census = set(_census_py(sf_dir))
    rows = registry.QUERIES["q_skyline_layers"](spark, sf_dir).collect()
    layers = {}
    for r in rows:
        layers.setdefault(r["layer"], set()).add((r["price_usd"], r["size"]))
    remaining = census
    for k in (1, 2, 3):
        want = _skyline_brute(remaining)
        assert layers.get(k, set()) == want
        remaining = remaining - want
    # disjoint, and every layer-(k+1) point is dominated by layer k
    assert not (layers[1] & layers[2]) and not (layers[2] & layers[3])
    for p in layers[2]:
        assert any(_dominates(q, p) for q in layers[1])
    for p in layers[3]:
        assert any(_dominates(q, p) for q in layers[2])


def test_brand_type_rational_dominance(spark, sf_dir):
    cells = {}
    for b, t, n, s, z in duckdb.sql(
        f"""
        SELECT p_brand, p_type, count(*),
               sum(CAST(floor(p_retailprice * 100 + 0.5) AS HUGEINT)),
               sum(CAST(p_size AS HUGEINT))
        FROM '{sf_dir}/part.parquet' GROUP BY 1, 2
        """
    ).fetchall():
        cells[(b, t)] = (int(n), int(s), int(z))

    def dom(a, b):
        na, sa, za = cells[a]
        nb, sb, zb = cells[b]
        price = Fraction(sa, na) <= Fraction(sb, nb)
        size = Fraction(za, na) >= Fraction(zb, nb)
        cnt = na >= nb
        strict = (
            Fraction(sa, na) < Fraction(sb, nb)
            or Fraction(za, na) > Fraction(zb, nb)
            or na > nb
        )
        return price and size and cnt and strict

    want = {c for c in cells if not any(dom(d, c) for d in cells if d != c)}
    rows = registry.QUERIES["q_skyline_brand_type"](spark, sf_dir).collect()
    assert {(r["p_brand"], r["p_type"]) for r in rows} == want
    for r in rows:
        n, s, z = cells[(r["p_brand"], r["p_type"])]
        assert r["parts"] == n
        assert r["avg_price_milli"] == (10 * s) // n
        assert r["avg_size_milli"] == (1000 * z) // n
