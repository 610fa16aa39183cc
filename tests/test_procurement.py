"""Semantic gates for §2.AL (procurement / supply-risk).

Oracle parity hash-checks every key; these pin the statistics against
independent Python constructions and the suite's internal
reconciliation identities:

1. al1's HHI equals a Python build of the same truncated-bp shares.
2. al3's Pareto depth and key-man share equal a Python pass with the
   same (revenue DESC, key) tie-break.
3. al4's two degree censuses both sum to the SAME edge count (the
   bipartite handshake identity), and that count equals the distinct
   pair count in the raw fact.
4. al2/al5 conserve revenue: band/tier cents sum to the corpus total,
   and truncated shares sum to ≤ 10000 bp.
"""

from __future__ import annotations

from collections import defaultdict

import duckdb

from recommendersystems_bigdata_spark import registry

registry.load_all()


def _cents(x: float) -> int:
    import math

    return int(math.floor(x * 100 + 0.5))


def _nation_supplier_cents(sf_dir):
    rows = duckdb.sql(
        f"""
        SELECT s.s_nationkey, l.l_suppkey,
               sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/supplier.parquet' s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2
        """
    ).fetchall()
    by_nation: dict[int, dict[int, int]] = defaultdict(dict)
    for nk, sk, c in rows:
        by_nation[nk][sk] = c
    return by_nation


def test_hhi_matches_python(spark, sf_dir):
    by_nation = _nation_supplier_cents(sf_dir)
    expect = {}
    for nk, supps in by_nation.items():
        total = sum(supps.values())
        expect[nk] = (
            len(supps),
            total,
            sum((10000 * c // total) ** 2 for c in supps.values()),
        )
    got = {
        r["s_nationkey"]: (r["n_suppliers"], r["nation_cents"], r["hhi_bp2"])
        for r in registry.QUERIES["q_supply_hhi_by_nation"](
            spark, sf_dir
        ).collect()
    }
    assert got == expect


def test_pareto_depth_matches_python(spark, sf_dir):
    by_nation = _nation_supplier_cents(sf_dir)
    expect = {}
    for nk, supps in by_nation.items():
        total = sum(supps.values())
        ranked = sorted(supps.items(), key=lambda kv: (-kv[1], kv[0]))
        cum, depth = 0, None
        for i, (_sk, c) in enumerate(ranked, start=1):
            cum += c
            if 10 * cum >= 8 * total:
                depth = i
                break
        expect[nk] = (len(supps), depth, 10000 * ranked[0][1] // total)
    got = {
        r["s_nationkey"]: (
            r["n_suppliers"],
            r["suppliers_to_80"],
            r["top_share_bp"],
        )
        for r in registry.QUERIES["q_supplier_pareto_depth"](
            spark, sf_dir
        ).collect()
    }
    assert got == expect


def test_degree_profile_handshake_identity(spark, sf_dir):
    rows = registry.QUERIES["q_supplier_part_degree"](spark, sf_dir).collect()
    per_side = defaultdict(int)
    for r in rows:
        per_side[r["side"]] += r["total_edges"]
    assert per_side["parts_per_supplier"] == per_side["suppliers_per_part"]
    (n_edges,) = duckdb.sql(
        f"SELECT count(*) FROM (SELECT DISTINCT l_suppkey, l_partkey "
        f"FROM '{sf_dir}/lineitem.parquet')"
    ).fetchone()
    assert per_side["parts_per_supplier"] == n_edges


def test_exposure_and_tiers_conserve_revenue(spark, sf_dir):
    (total,) = duckdb.sql(
        f"SELECT sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) "
        f"FROM '{sf_dir}/lineitem.parquet'"
    ).fetchone()
    for key, cents_col in (
        ("q_single_source_exposure", "revenue_cents"),
        ("q_acctbal_risk_tiers", "revenue_cents"),
    ):
        rows = registry.QUERIES[key](spark, sf_dir).collect()
        assert sum(r[cents_col] for r in rows) == total, key
        share = sum(r["revenue_share_bp"] for r in rows)
        assert share <= 10000, key  # truncated-div shares never overshoot
        assert share >= 10000 - len(rows), key  # and lose < 1bp per row
