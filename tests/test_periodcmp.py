"""Semantic gates for §2.BH (period-over-period calendar comparisons).

Oracle parity hash-checks every key; these rebuild the month census in
Python integer arithmetic from raw parquet, pinning:

1. bh1's SPLY alignment (every month joins exactly its calendar twin
   one year back; first-year months carry NULLs) and the exact bp
   growth.
2. bh2's YTD recomposition — the running sums rebuild from bh1's own
   monthly cents, and December's YTD equals the year total.
3. bh3's lag alignment over the gapless quarter sequence (and that the
   sequence IS gapless, the precondition the docstring claims).
4. bh4's conservation — per-brand deltas sum to the total delta
   exactly, and the signed shares sum to 10⁴ within one truncation per
   brand.
"""

from __future__ import annotations

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


def _monthly_py(sf_dir):
    rows = duckdb.sql(
        f"""
        SELECT year(l_shipdate), month(l_shipdate),
               sum(CAST({_REV} AS HUGEINT))
        FROM '{sf_dir}/lineitem.parquet' GROUP BY 1, 2
        """
    ).fetchall()
    return {(y, m): _tdiv(e4, 100) for y, m, e4 in rows}


def test_sply_alignment_and_growth(spark, sf_dir):
    monthly = _monthly_py(sf_dir)
    rows = registry.QUERIES["q_sply_monthly"](spark, sf_dir).collect()
    assert {(r["yr"], r["mo"]) for r in rows} == set(monthly)
    for r in rows:
        assert r["rev_cents"] == monthly[(r["yr"], r["mo"])]
        prior = monthly.get((r["yr"] - 1, r["mo"]))
        assert r["sply_cents"] == prior
        if prior is None:
            assert r["yoy_bp"] is None
        else:
            assert r["yoy_bp"] == _tdiv(10000 * (r["rev_cents"] - prior), prior)


def test_ytd_recomposes_and_hits_year_total(spark, sf_dir):
    monthly = _monthly_py(sf_dir)
    rows = registry.QUERIES["q_ytd_comparison"](spark, sf_dir).collect()
    for r in rows:
        ytd = sum(
            c for (y, m), c in monthly.items() if y == r["yr"] and m <= r["mo"]
        )
        assert r["ytd_cents"] == ytd
        prior = (
            sum(
                c
                for (y, m), c in monthly.items()
                if y == r["yr"] - 1 and m <= r["mo"]
            )
            if any(y == r["yr"] - 1 for (y, _m) in monthly)
            else None
        )
        assert r["prior_ytd_cents"] == prior
        if prior is not None:
            assert r["ytd_gap_bp"] == _tdiv(10000 * (ytd - prior), prior)
    # December YTD == the year total (full years only)
    for r in rows:
        if r["mo"] == 12:
            assert r["ytd_cents"] == sum(
                c for (y, _m), c in monthly.items() if y == r["yr"]
            )


def test_quarters_gapless_and_lagged(spark, sf_dir):
    monthly = _monthly_py(sf_dir)
    q_py = {}
    for (y, m), c in monthly.items():
        q_py[(y, (m + 2) // 3)] = q_py.get((y, (m + 2) // 3), 0) + c
    rows = registry.QUERIES["q_quarter_census"](spark, sf_dir).collect()
    seq = [(r["yr"], r["qtr"]) for r in rows]
    assert seq == sorted(q_py)
    # gapless: consecutive (yr, qtr) steps — the lag-4 YoY precondition
    for a, b in zip(seq, seq[1:]):
        nxt = (a[0], a[1] + 1) if a[1] < 4 else (a[0] + 1, 1)
        assert b == nxt
    for i, r in enumerate(rows):
        assert r["rev_cents"] == q_py[seq[i]]
        for lag, col in ((1, "qoq_bp"), (4, "yoy_bp")):
            if i - lag >= 0:
                base = q_py[seq[i - lag]]
                assert r[col] == _tdiv(10000 * (r["rev_cents"] - base), base)
            else:
                assert r[col] is None


def test_brand_contribution_conserves(spark, sf_dir):
    by_brand = duckdb.sql(
        f"""
        SELECT p.p_brand,
               sum(CASE WHEN year(l.l_shipdate) = 2000
                        THEN CAST({_REV} AS HUGEINT) ELSE 0 END),
               sum(CASE WHEN year(l.l_shipdate) = 1999
                        THEN CAST({_REV} AS HUGEINT) ELSE 0 END)
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/part.parquet' p ON l.l_partkey = p.p_partkey
        WHERE year(l.l_shipdate) IN (1999, 2000)
        GROUP BY 1
        """
    ).fetchall()
    expect = {
        b: (_tdiv(cur, 100), _tdiv(base, 100)) for b, cur, base in by_brand
    }
    delta_total = sum(c - b for c, b in expect.values())
    rows = registry.QUERIES["q_yoy_brand_contribution"](
        spark, sf_dir
    ).collect()
    assert {r["brand"] for r in rows} == set(expect)
    share_sum = 0
    for r in rows:
        cur, base = expect[r["brand"]]
        assert (r["cur_cents"], r["base_cents"]) == (cur, base)
        assert r["delta_cents"] == cur - base
        assert r["delta_share_bp"] == _tdiv(10000 * (cur - base), delta_total)
        share_sum += r["delta_share_bp"]
    # exact conservation of deltas; shares within one truncation per row
    assert sum(r["delta_cents"] for r in rows) == delta_total
    assert abs(share_sum - 10000) <= len(rows)
