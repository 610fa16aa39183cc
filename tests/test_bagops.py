"""Semantic gates for §2.AN (multiset / bag semantics).

Oracle parity hash-checks every key; these pin the bag algebra against
Python ``collections.Counter`` (the reference multiset implementation)
and the decomposition identities:

1. an1's EXCEPT ALL multiplicities equal Counter subtraction.
2. an2's INTERSECT ALL multiplicities equal Counter min (&), and
   |A| = |A ∩all B| + |A ∖all B| row-for-row.
3. an3 null-fills exactly the missing side's column and preserves both
   cardinalities.
4. an4's first-shipment rows equal a Python min() over (shipdate,
   linenumber) per order — the struct-min lowering is order-exact.
5. an5's census replays the Counters and Σabs_diff = |A∖B| + |B∖A|.
"""

from __future__ import annotations

from collections import Counter

import duckdb

from recommendersystems_bigdata_spark import registry

registry.load_all()


def _mix_counter(sf_dir: str, year: int) -> Counter:
    rows = duckdb.sql(
        f"""
        SELECT o_orderpriority, o_orderstatus
        FROM '{sf_dir}/orders.parquet'
        WHERE year(o_orderdate) = {year}
        """
    ).fetchall()
    return Counter(rows)


def _bag(df_rows) -> Counter:
    return Counter((r["priority"], r["status"]) for r in df_rows)


def test_except_all_is_counter_subtraction(spark, sf_dir):
    a, b = _mix_counter(sf_dir, 1996), _mix_counter(sf_dir, 1997)
    got = _bag(registry.QUERIES["q_bag_except_all"](spark, sf_dir).collect())
    assert got == a - b


def test_intersect_all_and_bag_decomposition(spark, sf_dir):
    a, b = _mix_counter(sf_dir, 1996), _mix_counter(sf_dir, 1997)
    inter = _bag(
        registry.QUERIES["q_bag_intersect_all"](spark, sf_dir).collect()
    )
    assert inter == (a & b)
    diff = _bag(registry.QUERIES["q_bag_except_all"](spark, sf_dir).collect())
    assert inter + diff == a  # |A| decomposes exactly


def test_union_byname_null_fills_missing_side(spark, sf_dir):
    rows = registry.QUERIES["q_union_byname_missing"](spark, sf_dir).collect()
    (n_cust,) = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/customer.parquet'"
    ).fetchone()
    (n_supp,) = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/supplier.parquet'"
    ).fetchone()
    assert len(rows) == n_cust + n_supp
    for r in rows:
        if r["entity"] == "customer":
            assert r["mktsegment"] is not None and r["nationkey"] is None
        else:
            assert r["mktsegment"] is None and r["nationkey"] is not None


def test_distinct_on_matches_python_min(spark, sf_dir):
    rows = duckdb.sql(
        f"""
        SELECT l_orderkey, l_linenumber,
               strftime(l_shipdate, '%Y-%m-%d'), l_shipdate,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        FROM '{sf_dir}/lineitem.parquet'
        """
    ).fetchall()
    best: dict[int, tuple] = {}
    for ok, ln, day, ts, cents in rows:
        cand = (ts, ln, day, cents)
        if ok not in best or cand < best[ok]:
            best[ok] = cand
    expect = {
        ok: (v[1], v[2], v[3]) for ok, v in best.items()
    }
    got = {
        r["l_orderkey"]: (
            r["first_linenumber"],
            r["first_ship_day"],
            r["first_price_cents"],
        )
        for r in registry.QUERIES["q_distinct_on_first_ship"](
            spark, sf_dir
        ).collect()
    }
    assert {k: (a, b) for k, (a, b, _c) in expect.items()} == {
        k: (a, b) for k, (a, b, _c) in got.items()
    }
    assert expect == got


def test_reconcile_census_replays_counters(spark, sf_dir):
    a, b = _mix_counter(sf_dir, 1996), _mix_counter(sf_dir, 1997)
    rows = registry.QUERIES["q_multiset_reconcile"](spark, sf_dir).collect()
    sum_abs = 0
    for r in rows:
        key = (r["priority"], r["status"])
        assert r["n_1996"] == a.get(key, 0)
        assert r["n_1997"] == b.get(key, 0)
        assert r["abs_diff"] == abs(r["n_1996"] - r["n_1997"])
        want = (
            "a_surplus"
            if r["n_1996"] > r["n_1997"]
            else "b_surplus"
            if r["n_1996"] < r["n_1997"]
            else "equal"
        )
        assert r["side"] == want
        sum_abs += r["abs_diff"]
    assert set((r["priority"], r["status"]) for r in rows) == set(a) | set(b)
    assert sum_abs == sum((a - b).values()) + sum((b - a).values())
