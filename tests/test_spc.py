"""Semantic gates for §2.BI (statistical process control charts).

Oracle parity hash-checks every key; these rebuild the censuses in
Python integer arithmetic, pinning:

1. bi1's denominator-cleared 3σ test against a Fraction evaluation of
   the TEXTBOOK inequality |p−p̄| > 3·√(p̄(1−p̄)/n) (squared in exact
   rationals) — proving the cleared form IS the chart rule, not an
   approximation — plus side coherence.
2. bi2's limits/breaches recomposition from its own published columns
   and the exact moving ranges.
3. bi3's runs partition (lengths sum to the month count, alternating
   sides, correct year-boundary start labels).
4. bi4's recomposition from bi1/bi2/bi3.
"""

from __future__ import annotations

from fractions import Fraction

import duckdb

from recommendersystems_bigdata_spark import registry

registry.load_all()

_REV = (
    "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
    " * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))"
)


def _tdiv(a, b):
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _pm_py(sf_dir):
    rows = duckdb.sql(
        f"""
        SELECT year(l_shipdate), month(l_shipdate),
               CAST(count(*) AS BIGINT),
               CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT)
        FROM '{sf_dir}/lineitem.parquet' GROUP BY 1, 2
        """
    ).fetchall()
    return {(y, m): (n, r) for y, m, n, r in rows}


def _xm_py(sf_dir):
    rows = duckdb.sql(
        f"""
        SELECT year(l_shipdate), month(l_shipdate),
               sum(CAST({_REV} AS HUGEINT))
        FROM '{sf_dir}/lineitem.parquet' GROUP BY 1, 2
        """
    ).fetchall()
    return {(y, m): _tdiv(e4, 100) for y, m, e4 in rows}


def test_pchart_cleared_form_is_the_textbook_rule(spark, sf_dir):
    pm = _pm_py(sf_dir)
    big_n = sum(n for n, _ in pm.values())
    big_r = sum(r for _, r in pm.values())
    rows = registry.QUERIES["q_spc_pchart_returns"](spark, sf_dir).collect()
    assert {(r["yr"], r["mo"]) for r in rows} == set(pm)
    pbar = Fraction(big_r, big_n)
    for row in rows:
        n, r = pm[(row["yr"], row["mo"])]
        assert (row["n"], row["r"]) == (n, r)
        assert row["rate_bp"] == _tdiv(10000 * r, n)
        assert row["center_bp"] == _tdiv(10000 * big_r, big_n)
        # the textbook rule in exact rationals
        lhs = (Fraction(r, n) - pbar) ** 2
        rhs = Fraction(9) * pbar * (1 - pbar) / n
        assert row["breach"] == (lhs > rhs)
        dev = r * big_n - big_r * n
        assert row["side"] == (0 if dev == 0 else (1 if dev > 0 else -1))
        if row["breach"]:
            assert row["side"] != 0


def test_xmr_recomposes_from_published_columns(spark, sf_dir):
    xm = _xm_py(sf_dir)
    months = sorted(xm)
    mrs = {
        months[i]: abs(xm[months[i]] - xm[months[i - 1]])
        for i in range(1, len(months))
    }
    xbar = _tdiv(1000 * sum(xm.values()), len(xm))
    mrbar = _tdiv(1000 * sum(mrs.values()), len(mrs))
    ucl = xbar + _tdiv(2660 * mrbar, 1000)
    lcl = xbar - _tdiv(2660 * mrbar, 1000)
    rows = registry.QUERIES["q_spc_xmr_revenue"](spark, sf_dir).collect()
    assert [(r["yr"], r["mo"]) for r in rows] == months
    for r in rows:
        key = (r["yr"], r["mo"])
        assert r["x_cents"] == xm[key]
        assert r["mr_cents"] == mrs.get(key)
        assert (r["xbar_milli"], r["ucl_milli"], r["lcl_milli"]) == (
            xbar, ucl, lcl,
        )
        assert r["breach_high"] == (1000 * r["x_cents"] > r["ucl_milli"])
        assert r["breach_low"] == (1000 * r["x_cents"] < r["lcl_milli"])


def test_runs_partition_the_series(spark, sf_dir):
    xm = _xm_py(sf_dir)
    months = sorted(xm)
    xbar = _tdiv(1000 * sum(xm.values()), len(xm))
    sides = [
        (m, 1 if 1000 * xm[m] > xbar else (-1 if 1000 * xm[m] < xbar else 0))
        for m in months
    ]
    expect = []
    for m, s in sides:
        if expect and expect[-1][2] == s:
            expect[-1][1] += 1
        else:
            expect.append([m, 1, s])
    rows = registry.QUERIES["q_spc_runs_rules"](spark, sf_dir).collect()
    got = [
        [(r["start_yr"], r["start_mo"]), r["run_len"], r["side"]] for r in rows
    ]
    assert got == expect
    assert sum(r["run_len"] for r in rows) == len(months)
    for r in rows:
        assert r["rule8_breach"] == (r["run_len"] >= 8)


def test_summary_recomposes(spark, sf_dir):
    p = registry.QUERIES["q_spc_pchart_returns"](spark, sf_dir).collect()
    x = registry.QUERIES["q_spc_xmr_revenue"](spark, sf_dir).collect()
    runs = registry.QUERIES["q_spc_runs_rules"](spark, sf_dir).collect()
    rows = registry.QUERIES["q_spc_summary"](spark, sf_dir).collect()
    assert [r["series"] for r in rows] == ["returns_p", "revenue_x"]
    pr, xr = rows
    assert pr["n_points"] == len(p)
    assert pr["n_breaches"] == sum(1 for r in p if r["breach"])
    # longest same-side run of the p series
    longest, cur, prev = 0, 0, None
    for r in sorted(p, key=lambda r: (r["yr"], r["mo"])):
        cur = cur + 1 if r["side"] == prev else 1
        prev = r["side"]
        longest = max(longest, cur)
    assert pr["longest_run"] == longest
    assert xr["n_points"] == len(x)
    assert xr["n_breaches"] == sum(
        1 for r in x if r["breach_high"] or r["breach_low"]
    )
    assert xr["longest_run"] == max(r["run_len"] for r in runs)
