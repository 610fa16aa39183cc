"""Semantic gates for §2.AX (customer concentration / inequality).

Oracle parity hash-checks every key; these rebuild the distribution in
pure Python (ANSI ntile sizing included), pinning:

1. ax1's full Lorenz table — decile membership, exact cents, truncated
   shares — plus convexity (ascending tiling ⇒ non-decreasing decile
   shares) and the 10000-bp terminal.
2. ax2's Hoover identity with big-int arithmetic and the n·x > T
   above-mean census.
3. ax3's curve monotonicity, terminal, and value-by-value match.
4. ax4's ratio lookups against the Python percentile census.
"""

from __future__ import annotations

import duckdb

from recommendersystems_bigdata_spark import registry

registry.load_all()


def _spend_py(sf_dir):
    """[(ck, spend_cents)] over the full customer base."""
    return duckdb.sql(
        f"""
        SELECT c.c_custkey, COALESCE(s.cents, 0)
        FROM '{sf_dir}/customer.parquet' c LEFT JOIN (
          SELECT o_custkey,
                 CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                      AS BIGINT) AS cents
          FROM '{sf_dir}/orders.parquet' GROUP BY 1
        ) s ON c.c_custkey = s.o_custkey
        """
    ).fetchall()


def _ntile(rows, k):
    """ANSI ntile over pre-sorted rows: first n%k buckets get one extra."""
    n = len(rows)
    q, r = divmod(n, k)
    out, i = [], 0
    for b in range(1, k + 1):
        size = q + (1 if b <= r else 0)
        out.extend((b, row) for row in rows[i : i + size])
        i += size
    return out


def test_lorenz_matches_python_and_is_convex(spark, sf_dir):
    spend = sorted(_spend_py(sf_dir), key=lambda t: (t[1], t[0]))
    census = {}
    for b, (_ck, cents) in _ntile(spend, 10):
        agg = census.setdefault(b, [0, 0])
        agg[0] += 1
        agg[1] += cents
    t = sum(v[1] for v in census.values())
    rows = sorted(
        registry.QUERIES["q_lorenz_deciles"](spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    cum = 0
    prev_share = -1
    for r in rows:
        n, cents = census[r["decile"]]
        cum += cents
        assert (r["n_customers"], r["spend_cents"]) == (n, cents)
        assert r["spend_share_bp"] == (10000 * cents) // t
        assert r["cum_spend_share_bp"] == (10000 * cum) // t
        # ascending tiling ⇒ non-decreasing decile shares (convex Lorenz)
        assert r["spend_share_bp"] >= prev_share
        prev_share = r["spend_share_bp"]
    assert rows[-1]["cum_spend_share_bp"] == 10000


def test_hoover_identity(spark, sf_dir):
    spend = _spend_py(sf_dir)
    n = len(spend)
    t = sum(c for _ck, c in spend)
    sum_abs = sum(abs(n * c - t) for _ck, c in spend)
    above = sum(1 for _ck, c in spend if n * c > t)
    [r] = registry.QUERIES["q_hoover_index"](spark, sf_dir).collect()
    assert r["n_customers"] == n
    assert r["total_spend_cents"] == t
    assert r["mean_spend_cents"] == t // n
    assert r["hoover_bp"] == (10000 * sum_abs) // (2 * n * t)
    assert 0 <= r["hoover_bp"] <= 10000
    assert r["above_mean_bp"] == (10000 * above) // n


def _top_census_py(sf_dir):
    spend = sorted(_spend_py(sf_dir), key=lambda t: (-t[1], t[0]))
    census = {}
    for b, (_ck, cents) in _ntile(spend, 100):
        agg = census.setdefault(b, [0, 0])
        agg[0] += 1
        agg[1] += cents
    return census


def test_concentration_curve_matches_and_monotone(spark, sf_dir):
    census = _top_census_py(sf_dir)
    t = sum(v[1] for v in census.values())
    rows = sorted(
        registry.QUERIES["q_concentration_curve"](spark, sf_dir).collect(),
        key=lambda r: r["top_pct"],
    )
    assert [r["top_pct"] for r in rows] == sorted(census)
    cum = 0
    prev = -1
    for r in rows:
        n, cents = census[r["top_pct"]]
        cum += cents
        assert (r["n_customers"], r["spend_cents"]) == (n, cents)
        assert r["cum_spend_share_bp"] == (10000 * cum) // t
        assert r["cum_spend_share_bp"] >= prev
        prev = r["cum_spend_share_bp"]
    assert rows[-1]["cum_spend_share_bp"] == 10000


def test_palma_ratios_match_python(spark, sf_dir):
    census = _top_census_py(sf_dir)
    t = sum(v[1] for v in census.values())
    top1 = census[1][1]
    top10 = sum(v[1] for b, v in census.items() if b <= 10)
    bottom50 = sum(v[1] for b, v in census.items() if b > 50)
    bottom40 = sum(v[1] for b, v in census.items() if b > 60)
    [r] = registry.QUERIES["q_palma_ratios"](spark, sf_dir).collect()
    assert r["top1_share_bp"] == (10000 * top1) // t
    assert r["top10_share_bp"] == (10000 * top10) // t
    assert r["bottom50_share_bp"] == (10000 * bottom50) // t
    expect_palma = (
        None if bottom40 == 0 else (1000 * top10) // bottom40
    )
    assert r["palma_milli"] == expect_palma
