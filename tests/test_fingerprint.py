"""Semantic gates for §2.BW (table fingerprinting / replication
audits).

Oracle parity hash-checks every key; these pin the checksum device:

1. bw1/bw4: bucket checksums equal a direct Python recompute of the
   mod-M row hash, bucket rows sum to the table count, and key ranges
   cover the keyspace.
2. bw2: matched + orphans identities hold per bucket and reconcile
   with the table counts.
3. bw3: month row counts conserve the lineitem count.
4. Sensitivity properties (hypothesis): changing any single field of
   any row changes that row's hash (primes are pairwise distinct mod
   M), and the bucket checksum is invariant under row permutation —
   the property that makes partition-order-free comparison sound.
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from recommendersystems_bigdata_spark import registry

registry.load_all()

M = 2**61 - 1
P1, P2, P3 = 1_000_003, 998_244_353, 754_974_721


def _rh(k1, k2, k3):
    return (k1 * P1 + k2 * P2 + k3 * P3) % M


def _orders_rows(sf_dir):
    return [
        (int(k), int(c), int(d))
        for k, c, d in duckdb.sql(
            f"""
            SELECT o_orderkey,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT),
                   date_diff('day', DATE '1970-01-01',
                             CAST(o_orderdate AS DATE))
            FROM '{sf_dir}/orders.parquet'
            """
        ).fetchall()
    ]


def test_orders_fingerprint_recompute(spark, sf_dir):
    rows = _orders_rows(sf_dir)
    want = {}
    for k, c, d in rows:
        b = k % 64
        n, s, lo, hi = want.get(b, (0, 0, None, None))
        want[b] = (
            n + 1,
            (s + _rh(k, c, d)) % M,
            k if lo is None else min(lo, k),
            k if hi is None else max(hi, k),
        )
    got = registry.QUERIES["q_fingerprint_orders"](spark, sf_dir).collect()
    assert {r["bucket"] for r in got} == set(want)
    for r in got:
        n, s, lo, hi = want[r["bucket"]]
        assert (r["rows_n"], r["checksum"], r["key_min"], r["key_max"]) == (
            n,
            s,
            lo,
            hi,
        )
    assert sum(r["rows_n"] for r in got) == len(rows)


def test_total_probe_recompute(spark, sf_dir):
    rows = _orders_rows(sf_dir)
    got = {
        r["tbl"]: r
        for r in registry.QUERIES["q_fingerprint_total"](
            spark, sf_dir
        ).collect()
    }
    o = got["orders"]
    assert o["rows_n"] == len(rows)
    assert o["checksum"] == sum(_rh(*t) for t in rows) % M
    assert o["key_sum_mod"] == sum(k for k, _, _ in rows) % M
    assert got["lineitem"]["rows_n"] == duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/lineitem.parquet'"
    ).fetchone()[0]


def test_reconcile_identities(spark, sf_dir):
    got = registry.QUERIES["q_fingerprint_reconcile"](
        spark, sf_dir
    ).collect()
    o_total = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/orders.parquet'"
    ).fetchone()[0]
    l_total = duckdb.sql(
        f"SELECT count(DISTINCT l_orderkey) FROM '{sf_dir}/lineitem.parquet'"
    ).fetchone()[0]
    for r in got:
        assert r["orders_keys"] == r["matched"] + r["orders_orphans"]
        assert r["lineitem_keys"] == r["matched"] + r["lineitem_orphans"]
    assert sum(r["orders_keys"] for r in got) == o_total
    assert sum(r["lineitem_keys"] for r in got) == l_total


def test_month_fingerprint_conserves(spark, sf_dir):
    got = registry.QUERIES["q_fingerprint_by_month"](
        spark, sf_dir
    ).collect()
    l_total = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/lineitem.parquet'"
    ).fetchone()[0]
    assert sum(r["rows_n"] for r in got) == l_total
    assert [r["ym"] for r in got] == sorted(r["ym"] for r in got)
    assert all(0 <= r["checksum"] < M for r in got)


@settings(max_examples=300, deadline=None)
@given(
    st.tuples(
        st.integers(0, 10**13), st.integers(0, 10**10), st.integers(0, 10**5)
    ),
    st.integers(0, 2),
    st.integers(1, 10**9),
)
def test_single_field_change_flips_hash(row, field, delta):
    """Changing one field by any delta < M/P changes the row hash:
    P_i·delta mod M ≠ 0 because M = 2⁶¹−1 is prime and P_i < M."""
    mutated = list(row)
    mutated[field] += delta
    assert _rh(*row) != _rh(*mutated)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 10**13),
            st.integers(0, 10**10),
            st.integers(0, 10**5),
        ),
        min_size=1,
        max_size=30,
    ),
    st.randoms(),
)
def test_checksum_is_permutation_invariant(rows, rnd):
    base = sum(_rh(*t) for t in rows) % M
    shuffled = list(rows)
    rnd.shuffle(shuffled)
    assert sum(_rh(*t) for t in shuffled) % M == base