"""Semantic gates for §2.CD (sequential A/B monitoring).

Oracle parity hash-checks every key; these pin the math:

1. cd2's cumulative look rows match a Python recompute of the month
   censuses, and every crossing verdict EQUALS the exact-rational
   Haybittle–Peto decision (z² > 9 interim, > 1.96² final) — the
   division-free compare is exact, not approximate.
2. The `a·c > b ⇔ a > b div c` device is Hypothesis-proved for
   arbitrary non-negative integers.
3. cd2's display z2_milli sits within the reduced-spelling bound of
   the exact z²·1000.
4. cd3 recomposes from cd2 (first cross, direction, SRM).
5. cd4's lift columns recompose from the arm census.
"""

from __future__ import annotations

from fractions import Fraction

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from recommendersystems_bigdata_spark import registry

registry.load_all()

_CONV = (
    "CASE WHEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
    " >= 15000000 THEN 1 ELSE 0 END"
)


def _looks_py(sf_dir):
    rows = duckdb.sql(
        f"""
        SELECT year(o_orderdate) * 12 + month(o_orderdate),
               o_custkey % 2, count(*), sum({_CONV})
        FROM '{sf_dir}/orders.parquet' GROUP BY 1, 2
        """
    ).fetchall()
    t0 = min(int(t) for t, _, _, _ in rows)
    out = []
    for look in range(1, 13):
        na = ka = nb = kb = 0
        for t, arm, n, k in rows:
            if 0 <= int(t) - t0 < look:
                if int(arm) == 0:
                    na += int(n)
                    ka += int(k)
                else:
                    nb += int(n)
                    kb += int(k)
        out.append((look, na, ka, nb, kb))
    return out


def _exact_z2(na, ka, nb, kb):
    n, kt = na + nb, ka + kb
    if na == 0 or nb == 0 or kt == 0 or kt == n:
        return None
    d = ka * nb - kb * na
    return Fraction(d * d * n, na * nb * kt * (n - kt))


def test_look_table_and_exact_haybittle(spark, sf_dir):
    want = _looks_py(sf_dir)
    rows = registry.QUERIES["q_seqab_look_table"](
        spark, sf_dir
    ).collect()
    assert [
        (r["look"], r["n_a"], r["k_a"], r["n_b"], r["k_b"])
        for r in rows
    ] == want
    for r in rows:
        na, ka, nb, kb = r["n_a"], r["k_a"], r["n_b"], r["k_b"]
        assert r["d"] == ka * nb - kb * na
        z2 = _exact_z2(na, ka, nb, kb)
        if z2 is None:
            assert r["verdict"] == "continue"
            assert r["z2_milli"] is None
            continue
        # the cleared verdict IS the exact-rational decision
        if r["look"] < 12:
            assert (r["verdict"] == "cross") == (z2 > 9)
            assert r["boundary"] == "peto_interim_z3"
        else:
            assert (r["verdict"] == "cross") == (
                z2 > Fraction(38416, 10_000)
            )
            assert r["boundary"] == "final_z196"
        # display z² bound: two |D| div n truncations + final div
        d = abs(r["d"])
        if d >= max(na, nb):
            got = Fraction(r["z2_milli"])
            exact_milli = 1000 * z2
            bound = exact_milli * (
                Fraction(na, d) + Fraction(nb, d) + Fraction(na * nb, d * d)
            ) + 1
            assert abs(got - exact_milli) <= bound


@settings(max_examples=500, deadline=None)
@given(
    st.integers(0, 10**30),
    st.integers(0, 10**30),
    st.integers(1, 10**18),
)
def test_division_free_compare_device(a, b, c):
    """a·c > b  ⇔  a > b div c, for non-negative a, b and positive c
    — the device every crossing verdict rests on."""
    assert (a * c > b) == (a > b // c)


def test_stop_summary_recomposes(spark, sf_dir):
    tab = registry.QUERIES["q_seqab_look_table"](spark, sf_dir).collect()
    crossed = [r for r in tab if r["verdict"] == "cross"]
    (row,) = registry.QUERIES["q_seqab_stop_summary"](
        spark, sf_dir
    ).collect()
    assert row["planned_looks"] == 12
    if crossed:
        first = min(crossed, key=lambda r: r["look"])
        assert row["stop_look"] == first["look"]
        assert row["direction"] == (
            "control_higher" if first["d"] > 0 else "treatment_higher"
        )
        assert row["outcome"] == "stopped_early_or_final_reject"
    else:
        assert row["stop_look"] is None
        assert row["outcome"] == "no_rejection"
    fin = next(r for r in tab if r["look"] == 12)
    na, nb = fin["n_a"], fin["n_b"]
    assert row["srm_check"] == (
        "mismatch"
        if 10_000 * (na - nb) ** 2 > 38_416 * (na + nb)
        else "ok"
    )


def test_final_effect_recomposes(spark, sf_dir):
    arms = {
        int(a): (int(n), int(k))
        for a, n, k in duckdb.sql(
            f"""SELECT o_custkey % 2, count(*), sum({_CONV})
            FROM '{sf_dir}/orders.parquet' GROUP BY 1"""
        ).fetchall()
    }
    (na, ka), (nb, kb) = arms[0], arms[1]
    (row,) = registry.QUERIES["q_seqab_final_effect"](
        spark, sf_dir
    ).collect()
    ra, rb = (10_000 * ka) // na, (10_000 * kb) // nb
    assert (row["rate_a_bp"], row["rate_b_bp"]) == (ra, rb)
    assert row["diff_bp"] == rb - ra
    if ka * nb == 0:
        assert row["rel_lift_bp"] is None
    else:
        d = kb * na - ka * nb
        want = (
            (10_000 * d) // (ka * nb)
            if d >= 0
            else -((10_000 * -d) // (ka * nb))
        )
        assert row["rel_lift_bp"] == want
