"""Semantic gates for §2.BY (probability-calibration audits).

Oracle parity hash-checks every key; these pin the math:

1. by1's reliability rows match a pure-Python recompute of the
   train/score censuses and published bp truncations.
2. by2's brier_e8 is EXACT (equals the row-level Σ(p−y)² recomposed
   in Python integers), the published Murphy terms match the spelled
   model, and the identity gap obeys the documented (5·10⁴+2)·N
   bound — Hypothesis-fuzzed over arbitrary bin censuses as well,
   against the exact-rational identity.
3. by3's skill score recomposes from the two published Briers with
   the sign-explicit truncated division.
4. by4's yearly rows match the exposure-weighted recompute.
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
        SELECT CAST(year(l_shipdate) AS BIGINT),
               (CAST(floor(l_quantity + 0.5) AS BIGINT) - 1) // 10,
               count(*),
               sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        FROM '{sf_dir}/lineitem.parquet' GROUP BY 1, 2
        """
    ).fetchall()
    return [(int(y), int(b), int(n), int(k)) for y, b, n, k in rows]


def _split(census):
    tr, sc = {}, {}
    for y, b, n, k in census:
        side = tr if y <= 1997 else sc
        pn, pk = side.get(b, (0, 0))
        side[b] = (pn + n, pk + k)
    return tr, sc


def _spelled(tr, sc):
    """The published spelling over a (train, score) bin census pair."""
    bins = sorted(set(tr) & set(sc))
    p = {b: (10_000 * tr[b][1]) // tr[b][0] for b in bins}
    o = {b: (10_000 * sc[b][1]) // sc[b][0] for b in bins}
    big_n = sum(sc[b][0] for b in bins)
    big_k = sum(sc[b][1] for b in bins)
    obar = (10_000 * big_k) // big_n
    brier = sum(
        sc[b][1] * (p[b] - 10_000) ** 2
        + (sc[b][0] - sc[b][1]) * p[b] ** 2
        for b in bins
    )
    rel = sum(sc[b][0] * (p[b] - o[b]) ** 2 for b in bins)
    res = sum(sc[b][0] * (o[b] - obar) ** 2 for b in bins)
    unc = big_n * obar * (10_000 - obar)
    return {
        "bins": bins,
        "p": p,
        "o": o,
        "n_score": big_n,
        "base_bp": obar,
        "brier_e8": brier,
        "rel_e8": rel,
        "res_e8": res,
        "unc_e8": unc,
        "identity_gap_e8": brier - (rel - res + unc),
    }


def test_reliability_matches_recompute(spark, sf_dir):
    tr, sc = _split(_census_py(sf_dir))
    rows = registry.QUERIES["q_calib_reliability"](spark, sf_dir).collect()
    bins = sorted(set(tr) & set(sc))
    assert [r["qbin"] for r in rows] == bins
    for r in rows:
        b = r["qbin"]
        p = (10_000 * tr[b][1]) // tr[b][0]
        o = (10_000 * sc[b][1]) // sc[b][0]
        assert (r["n_train"], r["n_score"]) == (tr[b][0], sc[b][0])
        assert (r["predicted_bp"], r["observed_bp"]) == (p, o)
        assert r["gap_bp"] == p - o


def test_brier_decomposition_exact_and_identity(spark, sf_dir):
    tr, sc = _split(_census_py(sf_dir))
    want = _spelled(tr, sc)
    (row,) = registry.QUERIES["q_calib_brier_decomp"](
        spark, sf_dir
    ).collect()
    for col in (
        "n_score",
        "base_bp",
        "brier_e8",
        "rel_e8",
        "res_e8",
        "unc_e8",
        "identity_gap_e8",
    ):
        assert row[col] == want[col], col
    # brier_e8 is the exact row-level sum (p_bp is the model's exact
    # published value; y is 0/1)
    brier_rows = sum(
        sc[b][1] * (want["p"][b] - 10_000) ** 2
        + (sc[b][0] - sc[b][1]) * want["p"][b] ** 2
        for b in want["bins"]
    )
    assert row["brier_e8"] == brier_rows
    assert abs(row["identity_gap_e8"]) <= (5 * 10_000 + 2) * want["n_score"]


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(1, 500),  # n_train
            st.integers(0, 500),  # k_train seed (clamped below)
            st.integers(1, 500),  # n_score
            st.integers(0, 500),  # k_score seed
        ),
        min_size=1,
        max_size=8,
    )
)
def test_murphy_identity_gap_bound_for_any_census(bins):
    """Property: over ANY bin census, (a) the exact-rational Murphy
    identity holds, (b) the published spelling's gap_e8 obeys the
    documented (5·10⁴+2)·N bound."""
    tr = {i: (n, min(k, n)) for i, (n, k, _, _) in enumerate(bins)}
    sc = {i: (n, min(k, n)) for i, (_, _, n, k) in enumerate(bins)}
    want = _spelled(tr, sc)
    # exact-rational identity: brier == rel − res + unc with rational
    # o rates and the exact p_bp model values
    n_tot = sum(sc[b][0] for b in want["bins"])
    k_tot = sum(sc[b][1] for b in want["bins"])
    obar = Fraction(10_000 * k_tot, n_tot)
    rel = sum(
        sc[b][0]
        * (Fraction(want["p"][b]) - Fraction(10_000 * sc[b][1], sc[b][0]))
        ** 2
        for b in want["bins"]
    )
    res = sum(
        sc[b][0] * (Fraction(10_000 * sc[b][1], sc[b][0]) - obar) ** 2
        for b in want["bins"]
    )
    unc = n_tot * obar * (10_000 - obar)
    assert Fraction(want["brier_e8"]) == rel - res + unc
    assert abs(want["identity_gap_e8"]) <= (5 * 10_000 + 2) * n_tot


def test_skill_score_recomposes(spark, sf_dir):
    (row,) = registry.QUERIES["q_calib_skill_score"](
        spark, sf_dir
    ).collect()
    m, r = row["brier_model_e8"], row["brier_ref_e8"]
    if r == 0:
        assert row["bss_bp"] is None
    else:
        d = r - m
        want = (
            (10_000 * d) // r if d >= 0 else -((10_000 * -d) // r)
        )
        assert row["bss_bp"] == want
    assert row["verdict"] == (
        "model_better" if m < r else "tie" if m == r else "reference_better"
    )


def test_drift_rows_recompose(spark, sf_dir):
    census = _census_py(sf_dir)
    tr, _ = _split(census)
    p = {b: (10_000 * k) // n for b, (n, k) in tr.items()}
    yearly = {}
    for y, b, n, k in census:
        if y >= 1998 and b in p:
            pn, pk, ps = yearly.get(y, (0, 0, 0))
            yearly[y] = (pn + n, pk + k, ps + p[b] * n)
    rows = registry.QUERIES["q_calib_drift_by_year"](
        spark, sf_dir
    ).collect()
    assert [r["yr"] for r in rows] == sorted(yearly)
    for r in rows:
        n, k, ps = yearly[r["yr"]]
        assert r["n"] == n
        assert r["avg_predicted_bp"] == ps // n
        assert r["observed_bp"] == (10_000 * k) // n
        assert r["gap_bp"] == ps // n - (10_000 * k) // n
