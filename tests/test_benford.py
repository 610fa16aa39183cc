"""Semantic gates for §2.BJ (forensic digit analytics / Benford screens).

Oracle parity hash-checks every key; these pin the math:

1. The ppm lookup IS Benford's law: each constant equals
   ⌊log10(1 + 1/d)·10⁶⌋.
2. bj2's spine-free MAD rewrite equals the textbook 9-digit-spine
   definition (missing digits contribute their full expected mass),
   recomputed per supplier in Python integers.
3. bj3's cleared χ² flag equals the textbook Pearson statistic
   evaluated in exact rationals, and chi2_centi is its floor at centi
   precision; hypothesis-fuzzed over random censuses as well.
4. bj4's bands partition the part catalog and shares recompose.
"""

from __future__ import annotations

import math
from fractions import Fraction

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from recommendersystems_bigdata_spark import registry
from recommendersystems_bigdata_spark.operators.benford import (
    _BENFORD_PPM,
    _SUM_E,
)

registry.load_all()

_CENTS = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"


def test_ppm_lookup_is_benfords_law():
    assert sum(_BENFORD_PPM.values()) == _SUM_E == 999995
    for d, ppm in _BENFORD_PPM.items():
        exact = math.log10(1 + 1 / d) * 1_000_000
        # constants sit >0.01 ppm away from integer boundaries, so the
        # float evaluation decides the floor unambiguously
        assert ppm == int(exact)
        assert abs(exact - ppm) > 0.01


def _digit_census(sf_dir, by_supp=False):
    key = "l_suppkey, " if by_supp else ""
    rows = duckdb.sql(
        f"""
        SELECT {key}
               CAST(substr(CAST({_CENTS} AS VARCHAR), 1, 1) AS INTEGER),
               CAST(count(*) AS BIGINT)
        FROM '{sf_dir}/lineitem.parquet' GROUP BY ALL
        """
    ).fetchall()
    return rows


def test_first_digit_census_exact(spark, sf_dir):
    census = {d: c for d, c in _digit_census(sf_dir)}
    n = sum(census.values())
    rows = registry.QUERIES["q_benford_first_digit"](spark, sf_dir).collect()
    assert [r["digit"] for r in rows] == sorted(census)
    for r in rows:
        cnt = census[r["digit"]]
        obs = (1_000_000 * cnt) // n
        exp = _BENFORD_PPM[r["digit"]]
        assert (r["cnt"], r["obs_ppm"], r["exp_ppm"], r["dev_ppm"]) == (
            cnt, obs, exp, obs - exp,
        )


def test_mad_screen_matches_textbook_spine(spark, sf_dir):
    """The spine-free MAD (observed-digit deviations + the missing
    digits' full expected mass) must equal the textbook definition: the
    mean over ALL NINE digits of |obs_ppm − exp_ppm| with obs_ppm = 0
    for digits the supplier never produced."""
    per_supp: dict[int, dict[int, int]] = {}
    for s, d, c in _digit_census(sf_dir, by_supp=True):
        per_supp.setdefault(s, {})[d] = c
    rows = registry.QUERIES["q_benford_mad_screen"](spark, sf_dir).collect()
    assert [r["l_suppkey"] for r in rows] == sorted(per_supp)
    for r in rows:
        census = per_supp[r["l_suppkey"]]
        n = sum(census.values())
        dev_total = sum(
            abs((1_000_000 * census.get(d, 0)) // n - _BENFORD_PPM[d])
            for d in range(1, 10)
        )
        mad = dev_total // 9
        assert r["n"] == n
        assert r["digits_observed"] == len(census)
        assert r["mad_ppm"] == mad
        band = (
            "close" if mad < 6000
            else "acceptable" if mad < 12000
            else "marginal" if mad < 15000
            else "nonconforming"
        )
        assert r["conformity"] == band


def test_pair_uniformity_matches_pearson_rationals(spark, sf_dir):
    census = dict(
        duckdb.sql(
            f"""
            SELECT {_CENTS} % 100, CAST(count(*) AS BIGINT)
            FROM '{sf_dir}/lineitem.parquet' GROUP BY 1
            """
        ).fetchall()
    )
    n = sum(census.values())
    expected = Fraction(n, 100)
    chi2 = sum(
        (Fraction(census.get(p, 0)) - expected) ** 2 / expected
        for p in range(100)
    )
    (row,) = registry.QUERIES["q_digit_pair_uniformity"](
        spark, sf_dir
    ).collect()
    assert row["n"] == n
    assert row["pairs_observed"] == len(census)
    assert row["chi2_centi"] == math.floor(100 * chi2)
    assert row["uniform_rejected"] == (chi2 > Fraction(12322, 100))
    top_dev = max(100 * c - n for c in census.values())
    assert row["top_dev_n"] == top_dev
    assert row["top_pair"] == min(
        p for p, c in census.items() if 100 * c - n == top_dev
    )


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 99), st.integers(1, 10_000)),
        min_size=1,
        max_size=100,
        unique_by=lambda t: t[0],
    )
)
def test_cleared_chi2_is_pearson_for_any_census(cells):
    """Property: for ANY 100-cell census, the cleared integer statistic
    Σ(100·O − N)² (+ N² per empty cell) over 100·N IS the Pearson χ²
    against uniform — proven in exact rationals, including the missing-
    cell term and the 12322 threshold compare."""
    census = dict(cells)
    n = sum(census.values())
    stat = sum((100 * census.get(p, 0) - n) ** 2 for p in range(100))
    chi2 = sum(
        (Fraction(census.get(p, 0)) - Fraction(n, 100)) ** 2
        / Fraction(n, 100)
        for p in range(100)
    )
    assert Fraction(stat, 100 * n) == chi2
    assert (stat > 12322 * n) == (chi2 > Fraction(12322, 100))
    assert stat // n == math.floor(100 * chi2)


def test_price_endings_partition_and_shares(spark, sf_dir):
    rows = registry.QUERIES["q_price_endings"](spark, sf_dir).collect()
    raw = duckdb.sql(
        f"""
        SELECT CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) % 100,
               count(*)
        FROM '{sf_dir}/part.parquet' GROUP BY 1
        """
    ).fetchall()
    band_parts: dict[str, int] = {}
    for ending, c in raw:
        band = {0: "00", 50: "50", 95: "95", 99: "99"}.get(ending, "other")
        band_parts[band] = band_parts.get(band, 0) + c
    total = sum(band_parts.values())
    assert {r["ending"]: r["parts"] for r in rows} == band_parts
    assert sum(r["parts"] for r in rows) == total
    for r in rows:
        assert r["parts_share_bp"] == (10_000 * r["parts"]) // total
        assert 0 <= r["rev_share_bp"] <= 10_000
    # revenue conserves across bands up to the per-band cents truncation
    rev_total = duckdb.sql(
        f"""
        SELECT sum(CAST({_CENTS}
                   * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                   AS HUGEINT))
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/part.parquet' p ON l.l_partkey = p.p_partkey
        """
    ).fetchone()[0]
    got = sum(r["rev_cents"] for r in rows)
    assert 0 <= rev_total // 100 - got < len(rows)
