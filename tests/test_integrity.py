"""Semantic gates for the §2.AD ledger-integrity audits (beyond oracle
parity): brute-force Python references over the collected sf0.001
orders table.
"""

from __future__ import annotations

import math
from collections import defaultdict

from recommendersystems_bigdata_spark import registry
from recommendersystems_bigdata_spark.catalog import load_table

registry.load_all()


def _orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice", "o_orderpriority"
    ).collect()


def test_round_amounts_match_reference(spark, sf_dir):
    rows_in = _orders(spark, sf_dir)
    agg = defaultdict(int)
    for r in rows_in:
        cents = math.floor(r["o_totalprice"] * 100 + 0.5)
        rem = cents % 100
        ending = "00" if rem == 0 else ("99" if rem == 99 else "other")
        agg[(r["o_orderpriority"], ending)] += 1
    totals = defaultdict(int)
    for (prio, _), n in agg.items():
        totals[prio] += n
    rows = registry.QUERIES["q_audit_round_amounts"](spark, sf_dir).collect()
    got = {(r["o_orderpriority"], r["ending"]): (r["n"], r["share_bp"]) for r in rows}
    assert got == {
        k: (n, (10000 * n) // totals[k[0]]) for k, n in agg.items()
    }
    # shares within each priority must be ~complete (truncation loses < 3 bp)
    for prio in totals:
        s = sum(bp for (p, _), (_, bp) in got.items() if p == prio)
        assert 9997 <= s <= 10000


def test_duplicate_candidates_match_reference(spark, sf_dir):
    rows_in = _orders(spark, sf_dir)
    groups = defaultdict(list)
    for r in rows_in:
        cents = math.floor(r["o_totalprice"] * 100 + 0.5)
        day = str(r["o_orderdate"].date())
        groups[(r["o_custkey"], day)].append((r["o_orderkey"], cents))
    expected = {}
    for k, v in groups.items():
        if len(v) >= 2:
            keys = [ok for ok, _ in v]
            cs = [c for _, c in v]
            expected[k] = (len(v), sum(cs), max(cs) - min(cs), min(keys), max(keys))
    rows = registry.QUERIES["q_audit_duplicate_candidates"](spark, sf_dir).collect()
    got = {
        (r["o_custkey"], r["day"]): (
            r["n_orders"],
            r["total_cents"],
            r["amount_spread_cents"],
            r["first_orderkey"],
            r["last_orderkey"],
        )
        for r in rows
    }
    assert got == expected
    assert got, "no same-day multi-order groups — audit vacuous on this corpus"


def test_keyspace_gaps_match_reference(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey").collect()
    keys = sorted({r["l_orderkey"] for r in li})
    gaps = []
    for a, b in zip(keys, keys[1:]):
        if b - a > 1:
            gaps.append((a + 1, b - 1, b - a - 1))
    top10 = sorted(gaps, key=lambda g: (-g[2], g[0]))[:10]
    rows = registry.QUERIES["q_audit_keyspace_gaps"](spark, sf_dir).collect()
    got = [(r["gap_start"], r["gap_end"], r["gap_len"]) for r in rows]
    assert got == top10
    assert got, "order keyspace has no gaps — audit vacuous on this corpus"
