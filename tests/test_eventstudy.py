"""Semantic gates for §2.BE (event-study / difference-in-differences).

Oracle parity hash-checks every key; these rebuild the cells from raw
parquet in Python integer arithmetic, pinning:

1. be1's cell census exactly (counts, truncated cents, truncated
   milli-cent means) and its 8-row scenario×cohort×period shape —
   including that 1997 lines appear in BOTH the actual-pre and
   placebo-post cells (the year-overlap the scenario-map join exists
   for).
2. be2's RECOMPOSITION identity: every delta and did_mc reproduces
   from be1's published truncated means, and both scenario rows exist.
3. be3's share closure: each year's shares sum to 10⁴ within the
   25-truncation envelope, abnormal nets to ~0, and the ranked order
   is (abnormal desc, brand).
4. be4's did_bp identity from its own published means and its exact
   BIGINT bp arithmetic against the Python rebuild.
"""

from __future__ import annotations

import duckdb

from recommendersystems_bigdata_spark import registry

registry.load_all()

_P_E2 = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
_D_E2 = "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)"
_SCEN = {
    ("actual", "pre"): 1997,
    ("actual", "post"): 1998,
    ("placebo", "pre"): 1996,
    ("placebo", "post"): 1997,
}


def _tdiv(a, b):
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _year_cohort_py(sf_dir):
    rows = duckdb.sql(
        f"""
        SELECT year(l.l_shipdate),
               CASE WHEN p.p_type LIKE 'PROMO%' THEN 'treat'
                    ELSE 'control' END,
               CAST(count(*) AS BIGINT),
               sum(CAST({_P_E2} * (100 - {_D_E2}) AS HUGEINT)),
               CAST(sum({_D_E2}) AS BIGINT)
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/part.parquet' p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2
        """
    ).fetchall()
    return {(yr, co): (n, rev, disc) for yr, co, n, rev, disc in rows}


def test_did_cells_exact_and_year_overlap(spark, sf_dir):
    base = _year_cohort_py(sf_dir)
    rows = registry.QUERIES["q_did_cells"](spark, sf_dir).collect()
    assert len(rows) == 8
    by_cell = {(r["scenario"], r["cohort"], r["period"]): r for r in rows}
    for (scen, period), yr in _SCEN.items():
        for cohort in ("treat", "control"):
            n, rev, _disc = base[(yr, cohort)]
            r = by_cell[(scen, cohort, period)]
            assert r["n_lines"] == n
            assert r["rev_cents"] == _tdiv(rev, 100)
            assert r["mean_millicents"] == _tdiv(10 * rev, n)
    # the 1997 overlap: actual-pre and placebo-post are THE SAME cells
    for cohort in ("treat", "control"):
        a = by_cell[("actual", cohort, "pre")]
        p = by_cell[("placebo", cohort, "post")]
        assert (a["n_lines"], a["rev_cents"]) == (p["n_lines"], p["rev_cents"])


def test_did_effect_recomposes_from_cells(spark, sf_dir):
    cells = {
        (r["scenario"], r["cohort"], r["period"]): r["mean_millicents"]
        for r in registry.QUERIES["q_did_cells"](spark, sf_dir).collect()
    }
    rows = registry.QUERIES["q_did_effect"](spark, sf_dir).collect()
    assert [r["scenario"] for r in rows] == ["actual", "placebo"]
    for r in rows:
        s = r["scenario"]
        assert r["treat_pre_mc"] == cells[(s, "treat", "pre")]
        assert r["treat_post_mc"] == cells[(s, "treat", "post")]
        assert r["control_pre_mc"] == cells[(s, "control", "pre")]
        assert r["control_post_mc"] == cells[(s, "control", "post")]
        td = r["treat_post_mc"] - r["treat_pre_mc"]
        cd = r["control_post_mc"] - r["control_pre_mc"]
        assert r["treat_delta_mc"] == td
        assert r["control_delta_mc"] == cd
        assert r["did_mc"] == td - cd


def test_abnormal_share_closure_and_order(spark, sf_dir):
    rows = registry.QUERIES["q_event_abnormal_brand_share"](
        spark, sf_dir
    ).collect()
    n_brands = len(rows)
    pre = sum(r["pre_share_bp"] for r in rows)
    post = sum(r["post_share_bp"] for r in rows)
    # Σ truncated shares: one sub-bp truncation per brand row
    assert 10000 - n_brands < pre <= 10000
    assert 10000 - n_brands < post <= 10000
    assert abs(sum(r["abnormal_bp"] for r in rows)) < n_brands
    for r in rows:
        assert r["abnormal_bp"] == r["post_share_bp"] - r["pre_share_bp"]
    keys = [(-r["abnormal_bp"], r["brand"]) for r in rows]
    assert keys == sorted(keys)


def test_discount_depth_exact_and_identity(spark, sf_dir):
    base = _year_cohort_py(sf_dir)
    rows = registry.QUERIES["q_did_discount_depth"](spark, sf_dir).collect()
    assert [r["scenario"] for r in rows] == ["actual", "placebo"]
    for r in rows:
        s = r["scenario"]
        for cohort in ("treat", "control"):
            for period in ("pre", "post"):
                n, _rev, disc = base[(_SCEN[(s, period)], cohort)]
                assert r[f"{cohort}_{period}_bp"] == _tdiv(100 * disc, n)
        assert r["did_bp"] == (r["treat_post_bp"] - r["treat_pre_bp"]) - (
            r["control_post_bp"] - r["control_pre_bp"]
        )
