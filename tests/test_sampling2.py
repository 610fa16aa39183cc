"""Semantic gates for §2.AT (deterministic sampling completeness).

Oracle parity hash-checks every key; these pin the determinism
contracts directly:

1. at1's membership equals the Python md5-ordered systematic rule, and
   re-running yields the identical set (pure function of keys).
2. at2 contributes exactly min(k, stratum size) rows per nation and
   matches the Python per-stratum bottom-k.
3. at3's coordinated sample conserves the sampled parents' order and
   revenue mass exactly (no orphaned children, none invented).
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

import duckdb

from recommendersystems_bigdata_spark import registry

registry.load_all()


def _md5(v) -> str:
    return hashlib.md5(str(v).encode()).hexdigest()


def test_systematic_membership_and_stability(spark, sf_dir):
    keys = [
        ck
        for (ck,) in duckdb.sql(
            f"SELECT c_custkey FROM '{sf_dir}/customer.parquet'"
        ).fetchall()
    ]
    ordered = sorted(keys, key=lambda ck: (_md5(ck), ck))
    expect = {
        ck: rn
        for rn, ck in enumerate(ordered, start=1)
        if rn % 20 == 7
    }
    run1 = {
        r["c_custkey"]: r["rn"]
        for r in registry.QUERIES["q_sample_systematic"](
            spark, sf_dir
        ).collect()
    }
    run2 = {
        r["c_custkey"]: r["rn"]
        for r in registry.QUERIES["q_sample_systematic"](
            spark, sf_dir
        ).collect()
    }
    assert run1 == expect
    assert run2 == expect  # pure function of the key set


def test_stratified_fixedk_exact_membership(spark, sf_dir):
    rows = duckdb.sql(
        f"SELECT c_nationkey, c_custkey FROM '{sf_dir}/customer.parquet'"
    ).fetchall()
    strata = defaultdict(list)
    for nk, ck in rows:
        strata[nk].append(ck)
    expect = {}
    for nk, cks in strata.items():
        ordered = sorted(cks, key=lambda ck: (_md5(ck), ck))[:8]
        for i, ck in enumerate(ordered, start=1):
            expect[(nk, i)] = ck
    got = {
        (r["c_nationkey"], r["stratum_rank"]): r["c_custkey"]
        for r in registry.QUERIES["q_sample_stratified_fixedk"](
            spark, sf_dir
        ).collect()
    }
    assert got == expect
    per_stratum = defaultdict(int)
    for nk, _i in got:
        per_stratum[nk] += 1
    for nk, n in per_stratum.items():
        assert n == min(8, len(strata[nk]))


def test_coordinated_sample_conserves_children(spark, sf_dir):
    rows = registry.QUERIES["q_sample_coordinated"](spark, sf_dir).collect()
    got_orders = sum(r["n_orders"] for r in rows)
    got_cents = sum(r["revenue_cents"] for r in rows)
    got_cust = sum(r["n_customers"] for r in rows)
    (n_cust, n_orders, cents) = duckdb.sql(
        f"""
        SELECT count(DISTINCT s.c_custkey), count(o.o_orderkey),
               COALESCE(sum(CAST(floor(o.o_totalprice * 100 + 0.5)
                                 AS BIGINT)), 0)
        FROM (SELECT c_custkey FROM '{sf_dir}/customer.parquet'
              WHERE substring(md5(CAST(c_custkey AS VARCHAR)), 1, 1)
                    = '0') s
        LEFT JOIN '{sf_dir}/orders.parquet' o ON s.c_custkey = o.o_custkey
        """
    ).fetchone()
    assert got_cust == n_cust
    assert got_orders == n_orders
    assert got_cents == cents
