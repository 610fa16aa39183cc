"""Semantic gates for the §2.AB growth-accounting family (beyond oracle
parity): brute-force Python references over the collected sf0.001
orders table — a cohort/tenure definition slip that happened to agree
with an equally-wrong oracle spelling still fails here.
"""

from __future__ import annotations

import math

from recommendersystems_bigdata_spark import registry
from recommendersystems_bigdata_spark.catalog import load_table

registry.load_all()


def _orders(spark, sf_dir):
    """[(custkey, yidx, cents)] with yidx = yr*12 + (mo-1)."""
    rows = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).collect()
    return [
        (
            r["o_custkey"],
            r["o_orderdate"].year * 12 + r["o_orderdate"].month - 1,
            math.floor(r["o_totalprice"] * 100 + 0.5),
        )
        for r in rows
    ]


def _ym(idx: int) -> str:
    return f"{idx // 12:04d}-{idx % 12 + 1:02d}"


def test_ltv_cohort_curve_matches_reference(spark, sf_dir):
    data = _orders(spark, sf_dir)
    cohort = {}
    for ck, yidx, _ in data:
        cohort[ck] = min(cohort.get(ck, yidx), yidx)
    cells: dict[tuple[int, int], list] = {}
    for ck, yidx, cents in data:
        key = (cohort[ck], yidx - cohort[ck])
        actives, rev = cells.get(key, (set(), 0))
        actives.add(ck)
        cells[key] = (actives, rev + cents)
    sizes = {c: len(cells[(c, 0)][0]) for c, a in cells if a == 0}
    rows = registry.QUERIES["q_ltv_cohort_curve"](spark, sf_dir).collect()
    assert len(rows) == len(cells)
    cum: dict[int, int] = {}
    # rows are ordered (cohort_ym, age) so the running total accumulates
    for r in rows:
        cidx = next(c for c in sizes if _ym(c) == r["cohort_ym"])
        actives, rev = cells[(cidx, r["age_months"])]
        cum[cidx] = cum.get(cidx, 0) + rev
        assert r["n_active"] == len(actives)
        assert r["revenue_cents"] == rev
        assert r["cum_revenue_cents"] == cum[cidx]
        assert r["cum_per_acquired_cents"] == cum[cidx] // sizes[cidx]


def test_churn_hazard_matches_reference(spark, sf_dir):
    data = _orders(spark, sf_dir)
    first, last = {}, {}
    for ck, yidx, _ in data:
        first[ck] = min(first.get(ck, yidx), yidx)
        last[ck] = max(last.get(ck, yidx), yidx)
    hist: dict[int, int] = {}
    for ck in first:
        t = last[ck] - first[ck]
        hist[t] = hist.get(t, 0) + 1
    total = sum(hist.values())
    rows = registry.QUERIES["q_churn_hazard"](spark, sf_dir).collect()
    assert [r["tenure_months"] for r in rows] == sorted(hist)
    cum = 0
    for r in rows:
        t = r["tenure_months"]
        at_risk = sum(n for tt, n in hist.items() if tt >= t)
        cum += hist[t]
        assert r["n_churned"] == hist[t]
        assert r["n_at_risk"] == at_risk
        assert r["hazard_bp"] == (10000 * hist[t]) // at_risk
        assert r["cum_churned_bp"] == (10000 * cum) // total
    assert rows[-1]["cum_churned_bp"] == 10000


def test_benford_audit_matches_reference(spark, sf_dir):
    data = _orders(spark, sf_dir)
    counts: dict[int, int] = {}
    for _, _, cents in data:
        if cents > 0:
            d = int(str(cents)[0])
            counts[d] = counts.get(d, 0) + 1
    total = sum(counts.values())
    expected = {1: 3010, 2: 1760, 3: 1249, 4: 969, 5: 791, 6: 669, 7: 579, 8: 511, 9: 457}
    rows = registry.QUERIES["q_benford_audit"](spark, sf_dir).collect()
    assert [r["lead_digit"] for r in rows] == sorted(counts)
    for r in rows:
        d = r["lead_digit"]
        share = (10000 * counts[d]) // total
        assert r["n_values"] == counts[d]
        assert r["share_bp"] == share
        assert r["expected_bp"] == expected[d]
        assert r["dev_bp"] == share - expected[d]


def test_seasonal_residual_outliers_match_reference(spark, sf_dir):
    data = _orders(spark, sf_dir)
    monthly: dict[int, int] = {}
    for _, yidx, cents in data:
        monthly[yidx] = monthly.get(yidx, 0) + cents
    by_mo: dict[int, list[int]] = {}
    for yidx, x in monthly.items():
        by_mo.setdefault(yidx % 12, []).append(yidx)
    scored = []
    for yidx, x in monthly.items():
        sibs = by_mo[yidx % 12]
        k, s = len(sibs), sum(monthly[i] for i in sibs)
        num = 10000 * (k * x - s)
        q = abs(num) // s
        rel = q if num >= 0 else -q
        scored.append((abs(rel), _ym(yidx), x, k, s, rel))
    top5 = sorted(scored, key=lambda t: (-t[0], t[1]))[:5]
    rows = registry.QUERIES["q_seasonal_residual_outliers"](spark, sf_dir).collect()
    got = [
        (abs(r["rel_dev_bp"]), r["ym"], r["revenue_cents"], r["n_years"],
         r["month_total_cents"], r["rel_dev_bp"])
        for r in rows
    ]
    assert got == top5


def test_new_vs_returning_matches_reference(spark, sf_dir):
    data = _orders(spark, sf_dir)
    cohort = {}
    for ck, yidx, _ in data:
        cohort[ck] = min(cohort.get(ck, yidx), yidx)
    agg: dict[int, list[int]] = {}
    for ck, yidx, cents in data:
        new = yidx == cohort[ck]
        nr, rr, no, ro = agg.get(yidx, (0, 0, 0, 0))
        if new:
            nr, no = nr + cents, no + 1
        else:
            rr, ro = rr + cents, ro + 1
        agg[yidx] = (nr, rr, no, ro)
    rows = registry.QUERIES["q_new_vs_returning"](spark, sf_dir).collect()
    assert [r["ym"] for r in rows] == [_ym(i) for i in sorted(agg)]
    for r, yidx in zip(rows, sorted(agg)):
        nr, rr, no, ro = agg[yidx]
        assert r["new_revenue_cents"] == nr
        assert r["returning_revenue_cents"] == rr
        assert r["new_orders"] == no
        assert r["returning_orders"] == ro
        assert r["new_share_bp"] == (10000 * nr) // (nr + rr)
    # the first month is all-new by construction
    assert rows[0]["returning_orders"] == 0 and rows[0]["new_share_bp"] == 10000
