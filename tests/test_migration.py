"""Semantic gates for §2.AR (segment migration).

Oracle parity hash-checks every key; these rebuild the tiling and every
report from raw parquet in Python (ANSI ntile sizing re-implemented
directly), pinning:

1. the quintile assignment itself — (revenue DESC, custkey) order,
   first n mod 5 buckets one row larger, era-inactive customers 'none';
2. ar1's matrix counts and row shares;
3. ar2's four disjoint outcome shares (sum ≤ 10000, < 4 bp loss);
4. ar3's revenue-flow cells conserve total period-B revenue;
5. ar4's bounds table, with floors weakly decreasing by tier rank.
"""

from __future__ import annotations

from collections import defaultdict

import duckdb

from recommendersystems_bigdata_spark import registry

registry.load_all()


def _ansi_ntile(ordered_keys, k=5):
    n = len(ordered_keys)
    q, r = divmod(n, k)
    out = {}
    pos = 0
    for b in range(1, k + 1):
        size = q + 1 if b <= r else q
        for key in ordered_keys[pos : pos + size]:
            out[key] = b
        pos += size
    return out


def _tiered_py(sf_dir):
    rows = duckdb.sql(
        f"""
        SELECT o_custkey,
               sum(CASE WHEN year(o_orderdate) BETWEEN 1995 AND 1997
                   THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                   ELSE 0 END),
               sum(CASE WHEN year(o_orderdate) BETWEEN 1998 AND 2000
                   THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                   ELSE 0 END)
        FROM '{sf_dir}/orders.parquet' GROUP BY 1
        """
    ).fetchall()
    rev_a = {ck: a for ck, a, _b in rows}
    rev_b = {ck: b for ck, _a, b in rows}
    ta = _ansi_ntile(
        sorted((ck for ck, v in rev_a.items() if v > 0),
               key=lambda ck: (-rev_a[ck], ck))
    )
    tb = _ansi_ntile(
        sorted((ck for ck, v in rev_b.items() if v > 0),
               key=lambda ck: (-rev_b[ck], ck))
    )
    return rev_a, rev_b, ta, tb


def _label(t):
    return f"t{t}" if t is not None else "none"


def test_migration_matrix_matches_python(spark, sf_dir):
    rev_a, rev_b, ta, tb = _tiered_py(sf_dir)
    cells = defaultdict(int)
    for ck in rev_a:
        fr, to = _label(ta.get(ck)), _label(tb.get(ck))
        if fr == to == "none":
            continue
        cells[(fr, to)] += 1
    row_tot = defaultdict(int)
    for (fr, _to), n in cells.items():
        row_tot[fr] += n
    expect = {
        (fr, to): (n, 10000 * n // row_tot[fr])
        for (fr, to), n in cells.items()
    }
    got = {
        (r["from_tier"], r["to_tier"]): (r["n_customers"], r["row_share_bp"])
        for r in registry.QUERIES["q_tier_migration_matrix"](
            spark, sf_dir
        ).collect()
    }
    assert got == expect


def test_stickiness_outcomes_disjoint_and_exact(spark, sf_dir):
    _ra, _rb, ta, tb = _tiered_py(sf_dir)
    per = defaultdict(lambda: [0, 0, 0, 0, 0])  # n, stay, up, down, churn
    for ck, a in ta.items():
        b = tb.get(ck)
        row = per[f"t{a}"]
        row[0] += 1
        if b is None:
            row[4] += 1
        elif b == a:
            row[1] += 1
        elif b < a:
            row[2] += 1
        else:
            row[3] += 1
    expect = {
        fr: (
            n,
            10000 * s // n,
            10000 * u // n,
            10000 * d // n,
            10000 * c // n,
        )
        for fr, (n, s, u, d, c) in per.items()
    }
    rows = registry.QUERIES["q_tier_stickiness"](spark, sf_dir).collect()
    got = {
        r["from_tier"]: (
            r["n_customers"],
            r["stay_bp"],
            r["upgrade_bp"],
            r["downgrade_bp"],
            r["churn_bp"],
        )
        for r in rows
    }
    assert got == expect
    for r in rows:
        total = (
            r["stay_bp"] + r["upgrade_bp"] + r["downgrade_bp"] + r["churn_bp"]
        )
        assert 10000 - 4 <= total <= 10000


def test_value_migration_conserves_period_b_revenue(spark, sf_dir):
    rev_a, rev_b, ta, tb = _tiered_py(sf_dir)
    cells = defaultdict(lambda: [0, 0])
    for ck in rev_a:
        if tb.get(ck) is None:
            continue
        key = (_label(ta.get(ck)), _label(tb.get(ck)))
        cells[key][0] += 1
        cells[key][1] += rev_b[ck]
    total_b = sum(rev_b.values())
    expect = {
        k: (n, rv, 10000 * rv // total_b) for k, (n, rv) in cells.items()
    }
    rows = registry.QUERIES["q_value_migration"](spark, sf_dir).collect()
    got = {
        (r["from_tier"], r["to_tier"]): (
            r["n_customers"],
            r["rev_b_cents"],
            r["rev_b_share_bp"],
        )
        for r in rows
    }
    assert got == expect
    assert sum(rv for _n, rv, _s in got.values()) == total_b


def test_tier_bounds_match_and_floors_decrease(spark, sf_dir):
    rev_a, rev_b, ta, tb = _tiered_py(sf_dir)
    agg = defaultdict(lambda: [0, None, None, 0])
    for ck, t in ta.items():
        row = agg[("a", t)]
        row[0] += 1
        v = rev_a[ck]
        row[1] = v if row[1] is None else min(row[1], v)
        row[2] = v if row[2] is None else max(row[2], v)
        row[3] += v
    for ck, t in tb.items():
        row = agg[("b", t)]
        row[0] += 1
        v = rev_b[ck]
        row[1] = v if row[1] is None else min(row[1], v)
        row[2] = v if row[2] is None else max(row[2], v)
        row[3] += v
    expect = {k: tuple(v) for k, v in agg.items()}
    rows = registry.QUERIES["q_tier_bounds"](spark, sf_dir).collect()
    got = {
        (r["period"], r["tier"]): (
            r["n_customers"],
            r["floor_cents"],
            r["ceil_cents"],
            r["total_cents"],
        )
        for r in rows
    }
    assert got == expect
    for period in ("a", "b"):
        floors = [got[(period, t)][1] for t in range(1, 6)]
        assert floors == sorted(floors, reverse=True)
