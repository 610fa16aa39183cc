"""Semantic gates for §2.BP (aggregation-bias / Simpson audits).

Oracle parity hash-checks every key; these pin the math:

1. bp1's cleared covariance sign equals the exact-rational covariance
   sign per segment (and the numerator equals the Fraction numerator).
2. bp2 recomposes from bp1's signs plus the pooled moments, and the
   reversal flag matches its definition; a synthetic Simpson census is
   constructed and checked through the same integer forms.
3. bp3's two means recompute from the census, and the gap column is
   their exact difference.
4. bp4's endpoint means recompute, and the pooled 'ALL' row is
   consistent with the per-segment rows' underlying census.
"""

from __future__ import annotations

from fractions import Fraction

import duckdb

from recommendersystems_bigdata_spark import registry

registry.load_all()

_CENTS = "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"


def _census_py(sf_dir):
    rows = duckdb.sql(
        f"""
        SELECT c.c_mktsegment, year(o_orderdate), count(*), sum({_CENTS})
        FROM '{sf_dir}/orders.parquet' o
        JOIN '{sf_dir}/customer.parquet' c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
        """
    ).fetchall()
    return [(seg, int(y), int(n), int(s)) for seg, y, n, s in rows]


def _moments(census):
    n = sum(r[2] for r in census)
    sx = sum(r[1] * r[2] for r in census)
    sy = sum(r[3] for r in census)
    sxy = sum(r[1] * r[3] for r in census)
    return n, sx, sy, sxy


def _sign(n, sx, sy, sxy):
    d = n * sxy - sx * sy
    return 0 if d == 0 else (1 if d > 0 else -1)


def test_trend_signs_match_exact_covariance(spark, sf_dir):
    census = _census_py(sf_dir)
    segs = sorted({r[0] for r in census})
    rows = registry.QUERIES["q_trend_sign_by_segment"](spark, sf_dir).collect()
    assert [r["segment"] for r in rows] == segs
    for r in rows:
        part = [c for c in census if c[0] == r["segment"]]
        n, sx, sy, sxy = _moments(part)
        assert r["n"] == n
        assert r["cov_num"] == n * sxy - sx * sy
        assert r["trend_sign"] == _sign(n, sx, sy, sxy)
        # the cleared sign IS the exact covariance sign
        cov = Fraction(sxy, n) - Fraction(sx, n) * Fraction(sy, n)
        assert r["trend_sign"] == (0 if cov == 0 else (1 if cov > 0 else -1))


def test_reversal_audit_recomposes(spark, sf_dir):
    census = _census_py(sf_dir)
    segs = sorted({r[0] for r in census})
    signs = []
    for seg in segs:
        part = [c for c in census if c[0] == seg]
        signs.append(_sign(*_moments(part)))
    pooled = _sign(*_moments(census))
    (row,) = registry.QUERIES["q_simpson_reversal_audit"](
        spark, sf_dir
    ).collect()
    assert row["pooled_sign"] == pooled
    assert row["segs_up"] == sum(1 for s in signs if s == 1)
    assert row["segs_down"] == sum(1 for s in signs if s == -1)
    assert row["segs_flat"] == sum(1 for s in signs if s == 0)
    assert row["reversal"] == (
        (pooled == 1 and row["segs_up"] == 0)
        or (pooled == -1 and row["segs_down"] == 0)
    )


def test_integer_forms_flag_a_constructed_simpson_census():
    """A textbook Simpson construction: every segment's mean FALLS year
    over year, but the mix shifts toward the high-mean segment, so the
    pooled trend RISES. The integer forms must flag it."""
    # (segment, year, n, sum): segment A mean 100→90, B mean 10→5,
    # mix shifts from B-heavy to A-heavy
    census = [
        ("A", 1, 10, 1000), ("A", 2, 90, 8100),   # mean 100 → 90
        ("B", 1, 90, 900), ("B", 2, 10, 50),      # mean 10 → 5
    ]
    for seg in ("A", "B"):
        part = [c for c in census if c[0] == seg]
        assert _sign(*_moments(part)) == -1
    assert _sign(*_moments(census)) == 1  # pooled rises: Simpson shape


def test_gap_recomputes_from_census(spark, sf_dir):
    census = _census_py(sf_dir)
    years = sorted({r[1] for r in census})
    rows = registry.QUERIES["q_weighted_unweighted_gap"](
        spark, sf_dir
    ).collect()
    assert [r["yr"] for r in rows] == years
    for r in rows:
        part = [c for c in census if c[1] == r["yr"]]
        w = sum(s for _, _, _, s in part) // sum(n for _, _, n, _ in part)
        u = sum(s // n for _, _, n, s in part) // len(part)
        assert (r["weighted_mean_cents"], r["unweighted_mean_cents"]) == (
            w, u,
        )
        assert r["gap_cents"] == w - u
        assert r["orders"] == sum(n for _, _, n, _ in part)


def test_trend_table_endpoints(spark, sf_dir):
    census = _census_py(sf_dir)
    first = min(r[1] for r in census)
    last = max(r[1] for r in census)
    rows = registry.QUERIES["q_segment_trend_table"](spark, sf_dir).collect()
    segs = sorted({r[0] for r in census} | {"ALL"})
    assert [r["segment"] for r in rows] == segs
    for r in rows:
        part = (
            census
            if r["segment"] == "ALL"
            else [c for c in census if c[0] == r["segment"]]
        )
        for col, yr in (("first_mean_cents", first), ("last_mean_cents", last)):
            py = [c for c in part if c[1] == yr]
            assert r[col] == sum(s for *_, s in py) // sum(
                n for _, _, n, _ in py
            )
        assert r["delta_cents"] == r["last_mean_cents"] - r["first_mean_cents"]
