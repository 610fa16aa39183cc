"""Semantic gates for §2.BD (exact least-squares & correlation).

Oracle parity hash-checks every key; these rebuild the closed forms
from raw parquet in Python (Fraction arithmetic — no float anywhere),
pinning:

1. bd1's slope against the exact rational S_xy/S_xx, the intercept
   RECOMPOSITION identity from the published slope, and the documented
   truncation direction.
2. bd2's r² against the exact rational, the Cauchy-Schwarz bound, and
   sign coherence with bd1's slope (same S_xy).
3. bd3's band unit prices and elasticity against a per-band rebuild,
   plus the midpoint formula's direction anti-symmetry.
4. bd4's residuals against bd1's PUBLISHED parameters (the docstring's
   reproducibility claim, made checkable) and its top-3 membership
   against a full Python re-rank.
"""

from __future__ import annotations

from collections import defaultdict
from fractions import Fraction

import duckdb

from recommendersystems_bigdata_spark import registry

registry.load_all()

_QTY = "CAST(floor(l_quantity + 0.5) AS BIGINT)"
_P_E2 = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
_D_E2 = "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)"


def _tdiv(a, b):
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _moments_py(sf_dir, dollars=False):
    y = f"({_P_E2} // 100)" if dollars else _P_E2
    rows = duckdb.sql(
        f"""
        SELECT p.p_brand, CAST(count(*) AS BIGINT),
               CAST(sum({_QTY}) AS BIGINT), CAST(sum({y}) AS BIGINT),
               sum(CAST({_QTY} AS HUGEINT) * {_QTY}),
               sum(CAST({y} AS HUGEINT) * {y}),
               sum(CAST({_QTY} AS HUGEINT) * {y})
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/part.parquet' p ON l.l_partkey = p.p_partkey
        GROUP BY 1
        """
    ).fetchall()
    out = {}
    for brand, n, sx, sy, sxx, syy, sxy in rows:
        out[brand] = (
            n,
            sx,
            sy,
            n * sxx - sx * sx,
            n * syy - sy * sy,
            n * sxy - sx * sy,
        )
    return out


def test_ols_matches_fraction_rebuild(spark, sf_dir):
    mom = _moments_py(sf_dir)
    rows = registry.QUERIES["q_ols_brand_price_curve"](spark, sf_dir).collect()
    assert {r["brand"] for r in rows} == set(mom)
    for r in rows:
        n, sx, sy, s_xx, _s_yy, s_xy = mom[r["brand"]]
        assert r["n_lines"] == n
        slope = _tdiv(1000 * s_xy, s_xx)
        assert r["slope_milli"] == slope
        # recomposition identity: intercept from the PUBLISHED slope
        assert r["intercept_milli"] == _tdiv(1000 * sy - slope * sx, n)
        # the truncated slope brackets the exact rational from below in
        # magnitude (truncation toward zero)
        exact = Fraction(1000 * s_xy, s_xx)
        assert abs(r["slope_milli"]) <= abs(exact) < abs(r["slope_milli"]) + 1


def test_r2_matches_fraction_and_bounds(spark, sf_dir):
    mom = _moments_py(sf_dir, dollars=True)
    ols = {
        r["brand"]: r["slope_milli"]
        for r in registry.QUERIES["q_ols_brand_price_curve"](
            spark, sf_dir
        ).collect()
    }
    rows = registry.QUERIES["q_corr_quantity_price"](spark, sf_dir).collect()
    assert {r["brand"] for r in rows} == set(mom)
    for r in rows:
        n, _sx, _sy, s_xx, s_yy, s_xy = mom[r["brand"]]
        assert r["n_lines"] == n
        assert r["r2_bp"] == _tdiv(10000 * s_xy * s_xy, s_xx * s_yy)
        assert 0 <= r["r2_bp"] <= 10000  # Cauchy-Schwarz
        assert r["corr_sign"] == (0 if s_xy == 0 else (1 if s_xy > 0 else -1))
        # same-sign coherence with bd1's slope: both carry sign(S_xy)
        # (whole-dollar truncation of y cannot flip the cross-moment
        # sign far from zero; allow the zero-slope boundary)
        if ols[r["brand"]] != 0 and r["corr_sign"] != 0:
            assert (ols[r["brand"]] > 0) == (r["corr_sign"] > 0)


def _bands_py(sf_dir):
    rows = duckdb.sql(
        f"""
        SELECT p.p_brand, {_D_E2},
               CAST(sum({_QTY}) AS BIGINT),
               sum(CAST({_P_E2} * (100 - {_D_E2}) AS HUGEINT))
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/part.parquet' p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2
        """
    ).fetchall()
    return {
        (brand, band): (qty, _tdiv(100 * rev_e4, qty))
        for brand, band, qty, rev_e4 in rows
    }


def test_elasticity_matches_rebuild_and_antisymmetry(spark, sf_dir):
    bands = _bands_py(sf_dir)
    rows = registry.QUERIES["q_elasticity_discount_arc"](
        spark, sf_dir
    ).collect()
    seen = set()
    for r in rows:
        q1, p1 = bands[(r["brand"], r["band_from"])]
        q2, p2 = bands[(r["brand"], r["band_to"])]
        assert (r["qty_from"], r["pu_from_micro"]) == (q1, p1)
        assert (r["qty_to"], r["pu_to_micro"]) == (q2, p2)
        assert p1 != p2  # zero-denominator pairs are excluded
        assert r["elasticity_milli"] == _tdiv(
            1000 * (q2 - q1) * (p1 + p2), (q1 + q2) * (p2 - p1)
        )
        # midpoint-formula anti-symmetry: swapping direction flips both
        # differences, leaving the exact rational value unchanged
        fwd = Fraction((q2 - q1) * (p1 + p2), (q1 + q2) * (p2 - p1))
        rev = Fraction((q1 - q2) * (p2 + p1), (q2 + q1) * (p1 - p2))
        assert fwd == rev
        seen.add((r["brand"], r["band_from"]))
    # every adjacent pair with distinct unit prices is present
    expect = {
        (b, band)
        for (b, band), (_q, p) in bands.items()
        if (b, band + 1) in bands and bands[(b, band + 1)][1] != p
    }
    assert seen == expect


def test_residual_outliers_reproduce_from_published_fit(spark, sf_dir):
    params = {
        r["brand"]: (r["slope_milli"], r["intercept_milli"])
        for r in registry.QUERIES["q_ols_brand_price_curve"](
            spark, sf_dir
        ).collect()
    }
    lines = duckdb.sql(
        f"""
        SELECT p.p_brand, l.l_orderkey, l.l_linenumber, {_QTY}, {_P_E2}
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/part.parquet' p ON l.l_partkey = p.p_partkey
        """
    ).fetchall()
    top = defaultdict(list)
    for brand, ok, ln, qty, cents in lines:
        slope, icept = params[brand]
        res = 1000 * cents - slope * qty - icept
        top[brand].append((-abs(res), ok, ln, qty, cents, res))
    for brand in top:
        top[brand] = sorted(top[brand])[:3]
    rows = registry.QUERIES["q_ols_residual_outliers"](
        spark, sf_dir
    ).collect()
    assert len(rows) == 3 * len(params)
    for r in rows:
        neg_abs, ok, ln, qty, cents, res = top[r["brand"]][r["rnk"] - 1]
        assert (r["l_orderkey"], r["l_linenumber"]) == (ok, ln)
        assert (r["qty"], r["price_cents"]) == (qty, cents)
        assert r["residual_milli"] == res
