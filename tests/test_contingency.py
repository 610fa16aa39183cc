"""Semantic gates for §2.AS (exact contingency / association).

Oracle parity hash-checks every key; these rebuild the 2×2 tables and
the statistics from raw parquet in Python, pinning:

1. as1's cells against a direct per-customer construction, and the
   conservation identity a+b+c+d = nation customer count.
2. as2's OR/RR milli values against the definitional fractions with
   toward-zero truncation (NULL on degenerate cells).
3. as3's Yule's Q bp, its ±10000 bound, and sign/label consistency.
"""

from __future__ import annotations

from collections import defaultdict

import duckdb

from recommendersystems_bigdata_spark import registry

registry.load_all()


def _tdiv(a, b):
    if b == 0:
        return None
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _cells_py(sf_dir):
    rows = duckdb.sql(
        f"""
        SELECT c.c_nationkey, c.c_mktsegment = 'AUTOMOBILE',
               COALESCE(r.has_return, 0)
        FROM '{sf_dir}/customer.parquet' c
        LEFT JOIN (
          SELECT o.o_custkey AS ck,
                 max(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                   AS has_return
          FROM '{sf_dir}/lineitem.parquet' l
          JOIN '{sf_dir}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
          GROUP BY 1
        ) r ON c.c_custkey = r.ck
        """
    ).fetchall()
    cells = defaultdict(lambda: [0, 0, 0, 0])
    for nk, exposed, outcome in rows:
        idx = (0 if exposed else 2) + (0 if outcome else 1)
        cells[nk][idx] += 1
    return {nk: tuple(v) for nk, v in cells.items()}


def test_cells_match_and_conserve(spark, sf_dir):
    expect = _cells_py(sf_dir)
    per_nation = dict(
        duckdb.sql(
            f"SELECT c_nationkey, count(*) FROM"
            f" '{sf_dir}/customer.parquet' GROUP BY 1"
        ).fetchall()
    )
    got = {}
    for r in registry.QUERIES["q_contingency_2x2"](spark, sf_dir).collect():
        got[r["c_nationkey"]] = (r["a"], r["b"], r["c"], r["d"])
        assert r["n_customers"] == per_nation[r["c_nationkey"]]
    assert got == expect


def test_odds_and_relative_risk_match_python(spark, sf_dir):
    cells = _cells_py(sf_dir)
    got = {
        r["c_nationkey"]: (
            r["exposed_rate_bp"],
            r["unexposed_rate_bp"],
            r["odds_ratio_milli"],
            r["relative_risk_milli"],
        )
        for r in registry.QUERIES["q_assoc_odds_relative_risk"](
            spark, sf_dir
        ).collect()
    }
    expect = {}
    for nk, (a, b, c, d) in cells.items():
        expect[nk] = (
            _tdiv(10000 * a, a + b),
            _tdiv(10000 * c, c + d),
            _tdiv(1000 * a * d, b * c),
            _tdiv(1000 * a * (c + d), c * (a + b)),
        )
    assert got == expect


def test_yule_q_bounded_and_signed(spark, sf_dir):
    cells = _cells_py(sf_dir)
    for r in registry.QUERIES["q_assoc_yule_q"](spark, sf_dir).collect():
        a, b, c, d = cells[r["c_nationkey"]]
        num, den = a * d - b * c, a * d + b * c
        assert r["yule_q_bp"] == _tdiv(10000 * num, den)
        if r["yule_q_bp"] is not None:
            assert -10000 <= r["yule_q_bp"] <= 10000
        want = "positive" if num > 0 else "negative" if num < 0 else "none"
        assert r["association"] == want
