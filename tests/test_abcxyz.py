"""Semantic gates for §2.BK (ABC-XYZ demand-variability classification).

Oracle parity hash-checks every key; these pin the math:

1. bk1's cleared CV² compares equal the textbook CV thresholds
   (CV ≤ 0.5 / ≤ 1.0) evaluated in exact rationals over the FULL month
   range including zero-demand months, and cv2_milli is the exact
   floor of 1000·CV².
2. bk2's quadrants equal the Syntetos–Boylan rules (ADI 1.32 /
   CV² 0.49) in exact rationals; hypothesis-fuzzed over random demand
   profiles as well.
3. bk3's matrix recomposes from an independent Python ABC ranking ×
   bk1's classes, and its cells partition the part catalog.
4. bk4 recomposes exactly from bk2's published columns.
"""

from __future__ import annotations

from fractions import Fraction

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from recommendersystems_bigdata_spark import registry

registry.load_all()


def _moments_py(sf_dir):
    rows = duckdb.sql(
        f"""
        WITH pmc AS (
          SELECT l_partkey, year(l_shipdate) AS yr, month(l_shipdate) AS mo,
                 sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS q
          FROM '{sf_dir}/lineitem.parquet' GROUP BY 1, 2, 3
        )
        SELECT l_partkey, count(*), sum(q), sum(q * q)
        FROM pmc GROUP BY 1
        """
    ).fetchall()
    m = duckdb.sql(
        f"""
        SELECT count(DISTINCT (year(l_shipdate), month(l_shipdate)))
        FROM '{sf_dir}/lineitem.parquet'
        """
    ).fetchone()[0]
    return {pk: (int(a), int(s), int(q2)) for pk, a, s, q2 in rows}, int(m)


def _cv2(active, s, ssq, m):
    """Population CV² over the full m-month range, zeros included."""
    mean = Fraction(s, m)
    var = Fraction(ssq, m) - mean * mean
    return var / (mean * mean)


def test_xyz_cleared_compares_are_cv_thresholds(spark, sf_dir):
    moments, m = _moments_py(sf_dir)
    rows = registry.QUERIES["q_xyz_cv_classes"](spark, sf_dir).collect()
    assert [r["l_partkey"] for r in rows] == sorted(moments)
    for r in rows:
        active, s, ssq = moments[r["l_partkey"]]
        cv2 = _cv2(active, s, ssq, m)
        assert (r["active"], r["qty_total"]) == (active, s)
        assert r["cv2_milli"] == (1000 * (m * ssq - s * s)) // (s * s)
        assert Fraction(r["cv2_milli"], 1000) <= cv2 < Fraction(
            r["cv2_milli"] + 1, 1000
        )
        cls = "X" if cv2 <= Fraction(1, 4) else "Y" if cv2 <= 1 else "Z"
        assert r["xyz_class"] == cls


def test_intermittency_matches_syntetos_boylan(spark, sf_dir):
    moments, m = _moments_py(sf_dir)
    rows = registry.QUERIES["q_demand_intermittency"](spark, sf_dir).collect()
    for r in rows:
        active, s, ssq = moments[r["l_partkey"]]
        adi = Fraction(m, active)
        cv2 = _cv2(active, s, ssq, m)
        assert r["adi_milli"] == (1000 * m) // active
        lo_adi = adi < Fraction(132, 100)
        lo_cv2 = cv2 < Fraction(49, 100)
        cls = (
            "smooth" if lo_adi and lo_cv2
            else "intermittent" if not lo_adi and lo_cv2
            else "erratic" if lo_adi
            else "lumpy"
        )
        assert r["demand_class"] == cls


@settings(max_examples=300, deadline=None)
@given(
    st.integers(2, 120).flatmap(
        lambda m: st.tuples(
            st.just(m),
            st.lists(
                st.tuples(st.integers(0, m - 1), st.integers(1, 500)),
                min_size=1,
                max_size=24,
                unique_by=lambda t: t[0],
            ),
        )
    )
)
def test_cleared_forms_for_any_demand_profile(profile):
    """Property: for ANY monthly demand profile (m months, arbitrary
    nonzero-demand subset), the cleared integer compares reproduce the
    exact-rational CV/ADI thresholds and cv2_milli/adi_milli are the
    exact floors."""
    m, cells = profile
    qs = [q for _, q in cells]
    active, s, ssq = len(qs), sum(qs), sum(q * q for q in qs)
    var_num = m * ssq - s * s
    assert var_num >= 0  # Cauchy–Schwarz over the m slots
    cv2 = _cv2(active, s, ssq, m)
    assert Fraction(var_num, s * s) == cv2
    assert (1000 * var_num) // (s * s) == 1000 * cv2.numerator // cv2.denominator
    assert (4 * var_num <= s * s) == (cv2 <= Fraction(1, 4))
    assert (var_num <= s * s) == (cv2 <= 1)
    assert (100 * m < 132 * active) == (Fraction(m, active) < Fraction(132, 100))
    assert (100 * var_num < 49 * s * s) == (cv2 < Fraction(49, 100))
    assert (1000 * m) // active == (1000 * Fraction(m, active)).numerator // (
        1000 * Fraction(m, active)
    ).denominator


def test_matrix_recomposes_from_independent_ranking(spark, sf_dir):
    micros = dict(
        duckdb.sql(
            f"""
            SELECT l_partkey,
                   CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS HUGEINT)
                            * (100 - floor(l_discount * 100 + 0.5)))
                        AS BIGINT)
            FROM '{sf_dir}/lineitem.parquet' GROUP BY 1
            """
        ).fetchall()
    )
    total = sum(micros.values())
    cum = 0
    abc = {}
    for pk in sorted(micros, key=lambda k: (-micros[k], k)):
        cum += micros[pk]
        abc[pk] = "A" if cum * 2 <= total else "B" if cum * 5 <= 4 * total else "C"
    xyz = {
        r["l_partkey"]: r["xyz_class"]
        for r in registry.QUERIES["q_xyz_cv_classes"](spark, sf_dir).collect()
    }
    expected: dict[tuple[str, str], list[int]] = {}
    for pk in micros:
        expected.setdefault((abc[pk], xyz[pk]), []).append(pk)
    rows = registry.QUERIES["q_abc_xyz_matrix"](spark, sf_dir).collect()
    assert {(r["abc_class"], r["xyz_class"]) for r in rows} == set(expected)
    assert sum(r["parts"] for r in rows) == len(micros)
    for r in rows:
        pks = expected[(r["abc_class"], r["xyz_class"])]
        assert r["parts"] == len(pks)
        cell = sum(micros[pk] for pk in pks)
        assert r["rev_micros"] == cell
        assert r["rev_share_bp"] == (10_000 * cell) // total


def test_summary_recomposes_from_bk2(spark, sf_dir):
    inter = registry.QUERIES["q_demand_intermittency"](spark, sf_dir).collect()
    qty = {
        r["l_partkey"]: r["qty_total"]
        for r in registry.QUERIES["q_xyz_cv_classes"](spark, sf_dir).collect()
    }
    groups: dict[str, list] = {}
    for r in inter:
        groups.setdefault(r["demand_class"], []).append(r)
    tot_qty = sum(qty.values())
    rows = registry.QUERIES["q_demand_class_summary"](spark, sf_dir).collect()
    assert [r["demand_class"] for r in rows] == sorted(groups)
    for r in rows:
        members = groups[r["demand_class"]]
        q = sum(qty[x["l_partkey"]] for x in members)
        assert r["parts"] == len(members)
        assert r["qty_total"] == q
        assert r["qty_share_bp"] == (10_000 * q) // tot_qty
        assert r["avg_adi_milli"] == sum(x["adi_milli"] for x in members) // len(members)
        assert r["avg_cv2_milli"] == sum(x["cv2_milli"] for x in members) // len(members)
