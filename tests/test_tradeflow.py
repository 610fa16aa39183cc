"""Semantic gates for §2.AY (trade-flow matrix).

Oracle parity hash-checks every key; these rebuild the bilateral
ledger from raw parquet in Python, pinning:

1. ay1's matrix against a direct per-line construction, and the ledger
   total == total line revenue (nothing dropped by the star joins on
   this referentially-intact corpus).
2. ay2's balances re-derived from ay1's OUTPUT (view consistency), and
   the zero-sum conservation law Σ balances == 0.
3. ay3's region blocks == the matrix rolled up by the nation→region
   map, labels included.
4. ay4 == the sorted cross-border head of the matrix.
"""

from __future__ import annotations

import duckdb

from recommendersystems_bigdata_spark import registry

registry.load_all()


def _matrix_py(sf_dir):
    """{(cust_nation, supp_nation): [n_lines, cents]} + nation→region."""
    rows = duckdb.sql(
        f"""
        SELECT nc.n_name, ns.n_name,
               CAST(count(*) AS BIGINT),
               CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT)
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
        JOIN '{sf_dir}/customer.parquet' c ON o.o_custkey = c.c_custkey
        JOIN '{sf_dir}/supplier.parquet' s ON l.l_suppkey = s.s_suppkey
        JOIN '{sf_dir}/nation.parquet' nc ON c.c_nationkey = nc.n_nationkey
        JOIN '{sf_dir}/nation.parquet' ns ON s.s_nationkey = ns.n_nationkey
        GROUP BY 1, 2
        """
    ).fetchall()
    n2r = dict(
        duckdb.sql(
            f"""SELECT n.n_name, r.r_name
            FROM '{sf_dir}/nation.parquet' n
            JOIN '{sf_dir}/region.parquet' r
              ON n.n_regionkey = r.r_regionkey"""
        ).fetchall()
    )
    return {(cn, sn): [n, cents] for cn, sn, n, cents in rows}, n2r


def test_matrix_matches_and_total_conserves(spark, sf_dir):
    matrix, _n2r = _matrix_py(sf_dir)
    t = sum(v[1] for v in matrix.values())
    total_line_cents = duckdb.sql(
        f"""SELECT CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
            AS BIGINT)) AS BIGINT) FROM '{sf_dir}/lineitem.parquet'"""
    ).fetchone()[0]
    assert t == total_line_cents  # the star drops nothing
    got = {}
    for r in registry.QUERIES["q_trade_matrix"](spark, sf_dir).collect():
        key = (r["cust_nation"], r["supp_nation"])
        got[key] = [r["n_lines"], r["flow_cents"]]
        assert r["flow_share_bp"] == (10000 * r["flow_cents"]) // t
        want = "domestic" if key[0] == key[1] else "cross_border"
        assert r["flow_kind"] == want
    assert got == matrix


def test_balances_zero_sum_and_view_consistent(spark, sf_dir):
    matrix, _n2r = _matrix_py(sf_dir)
    exp, imp = {}, {}
    for (cn, sn), (_n, cents) in matrix.items():
        if cn == sn:
            continue
        exp[sn] = exp.get(sn, 0) + cents
        imp[cn] = imp.get(cn, 0) + cents
    rows = registry.QUERIES["q_trade_balance"](spark, sf_dir).collect()
    assert sum(r["balance_cents"] for r in rows) == 0  # conservation
    for r in rows:
        e, i = exp.get(r["nation"], 0), imp.get(r["nation"], 0)
        assert (r["export_cents"], r["import_cents"]) == (e, i)
        assert r["balance_cents"] == e - i
        turn = e + i
        if turn == 0:
            assert r["balance_bp"] is None
        else:
            b = e - i
            q = abs(10000 * b) // turn
            assert r["balance_bp"] == (q if b >= 0 else -q)
    assert {r["nation"] for r in rows} == set(exp) | set(imp)


def test_region_blocks_roll_up_matrix(spark, sf_dir):
    matrix, n2r = _matrix_py(sf_dir)
    blocks = {}
    for (cn, sn), (n, cents) in matrix.items():
        key = (n2r[cn], n2r[sn])
        agg = blocks.setdefault(key, [0, 0])
        agg[0] += n
        agg[1] += cents
    t = sum(v[1] for v in blocks.values())
    got = {}
    for r in registry.QUERIES["q_trade_region_blocks"](
        spark, sf_dir
    ).collect():
        key = (r["cust_region"], r["supp_region"])
        got[key] = [r["n_lines"], r["flow_cents"]]
        assert r["flow_share_bp"] == (10000 * r["flow_cents"]) // t
        want = "intra_region" if key[0] == key[1] else "inter_region"
        assert r["block_kind"] == want
    assert got == blocks


def test_top_corridors_are_sorted_head(spark, sf_dir):
    matrix, _n2r = _matrix_py(sf_dir)
    xb = [
        (cn, sn, n, cents)
        for (cn, sn), (n, cents) in matrix.items()
        if cn != sn
    ]
    xb.sort(key=lambda t: (-t[3], t[0], t[1]))
    rows = registry.QUERIES["q_trade_top_corridors"](
        spark, sf_dir
    ).collect()
    got = [
        (r["cust_nation"], r["supp_nation"], r["n_lines"], r["flow_cents"])
        for r in rows
    ]
    assert got == xb[:10]
