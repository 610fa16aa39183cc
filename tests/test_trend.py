"""Semantic gates for §2.BT (Theil–Sen / Mann–Kendall robust trend).

Oracle parity hash-checks every key; these pin the math:

1. bt1's census matches an independent DuckDB recompute.
2. bt2's published Theil–Sen milli equals the Python recompute of the
   sign-explicit truncated spelling, and sits within 1 milli of the
   EXACT rational median (lower median of Fractions) — plus a
   hypothesis property for the sign-explicit truncation itself.
3. bt3's S, var18 and verdict against exact integer recomputes, and
   the cleared 95% compare against the float z-test it encodes.
4. bt4's per-season rows against the same recompute restricted to the
   season.
"""

from __future__ import annotations

from collections import Counter
from fractions import Fraction

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from recommendersystems_bigdata_spark import registry

registry.load_all()

_REV = (
    "CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS HUGEINT)"
    " * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))"
    " // 100 AS BIGINT)"
)


def _series(sf_dir):
    rows = duckdb.sql(
        f"""
        SELECT year(l_shipdate) * 12 + month(l_shipdate),
               month(l_shipdate), {_REV}, count(*)
        FROM '{sf_dir}/lineitem.parquet' GROUP BY 1, 2 ORDER BY 1
        """
    ).fetchall()
    return [(int(t), int(mo), int(y), int(c)) for t, mo, y, c in rows]


def _slope_milli(dy, dx):
    return (1000 * dy) // dx if dy >= 0 else -((1000 * (-dy)) // dx)


def _mk(series):
    """(s_stat, var18) over [(t, y)] with tie correction."""
    s = 0
    for i in range(len(series)):
        for j in range(i + 1, len(series)):
            d = series[j][1] - series[i][1]
            s += (d > 0) - (d < 0)
    n = len(series)
    tie = sum(
        t * (t - 1) * (2 * t + 5)
        for t in Counter(y for _, y in series).values()
        if t > 1
    )
    return s, n * (n - 1) * (2 * n + 5) - tie


def _verdict(s, var18):
    if s > 0 and 180000 * (s - 1) ** 2 > 38416 * var18:
        return "increasing"
    if s < 0 and 180000 * (s + 1) ** 2 > 38416 * var18:
        return "decreasing"
    return "no_trend"


def test_census_matches_recompute(spark, sf_dir):
    series = _series(sf_dir)
    rows = registry.QUERIES["q_trend_monthly_revenue"](
        spark, sf_dir
    ).collect()
    assert [(r["t"], r["rev_cents"], r["lines"]) for r in rows] == [
        (t, y, c) for t, mo, y, c in series
    ]
    # t indexes are dense month numbers: consecutive calendar months
    # differ by exactly their month gap
    assert all(r["ym"] // 100 * 12 + r["ym"] % 100 == r["t"] for r in rows)


def test_theil_sen_spelling_and_exact_bound(spark, sf_dir):
    series = [(t, y) for t, mo, y, _ in _series(sf_dir)]
    slopes = sorted(
        _slope_milli(series[j][1] - series[i][1], series[j][0] - series[i][0])
        for i in range(len(series))
        for j in range(i + 1, len(series))
    )
    k = (len(slopes) + 1) // 2
    (row,) = registry.QUERIES["q_theil_sen_trend"](spark, sf_dir).collect()
    assert row["n_pairs"] == len(slopes)
    assert row["theil_sen_milli"] == slopes[k - 1]
    assert row["slope_min_milli"] == slopes[0]
    assert row["slope_max_milli"] == slopes[-1]
    # within 1 milli of the exact rational lower median
    exact = sorted(
        Fraction(series[j][1] - series[i][1], series[j][0] - series[i][0])
        for i in range(len(series))
        for j in range(i + 1, len(series))
    )[k - 1]
    assert abs(row["theil_sen_milli"] - (1000 * exact.numerator)
               // exact.denominator) <= 1


@settings(max_examples=300, deadline=None)
@given(st.integers(-(10**9), 10**9), st.integers(1, 1200))
def test_sign_explicit_truncation_is_toward_zero(dy, dx):
    """The published slope spelling is truncation TOWARD ZERO of
    1000·dy/dx — the semantics both engines share only on non-negative
    operands, which the |dy| rewrite guarantees."""
    got = _slope_milli(dy, dx)
    exact = Fraction(1000 * dy, dx)
    import math

    want = math.floor(exact) if exact >= 0 else -math.floor(-exact)
    assert got == want
    assert abs(got) <= abs(exact)


def test_mann_kendall_exact(spark, sf_dir):
    series = [(t, y) for t, mo, y, _ in _series(sf_dir)]
    s, var18 = _mk(series)
    (row,) = registry.QUERIES["q_mann_kendall_trend"](spark, sf_dir).collect()
    assert (row["n_months"], row["s_stat"], row["var18"]) == (
        len(series),
        s,
        var18,
    )
    assert row["trend"] == _verdict(s, var18)
    # the cleared compare IS the float z-test at 1.96 (away from the
    # measure-zero boundary): |S|-1 / sqrt(var18/18) vs 1.96
    if s != 0 and var18 > 0:
        z2 = 18 * (abs(s) - 1) ** 2 / var18
        assert (z2 > 1.96**2) == (row["trend"] != "no_trend") or abs(
            z2 - 1.96**2
        ) < 1e-9


def test_seasonal_mann_kendall_exact(spark, sf_dir):
    full = _series(sf_dir)
    rows = registry.QUERIES["q_seasonal_mann_kendall"](
        spark, sf_dir
    ).collect()
    months = sorted({mo for _, mo, _, _ in full})
    assert [r["mo"] for r in rows] == months
    for r in rows:
        season = [(t, y) for t, mo, y, _ in full if mo == r["mo"]]
        s, var18 = _mk(season)
        assert (r["n_years"], r["s_stat"], r["var18"]) == (
            len(season),
            s,
            var18,
        )
        assert r["trend"] == _verdict(s, var18)
