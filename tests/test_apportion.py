"""Semantic gates for §2.AU (exact apportionment / proration).

Oracle parity hash-checks every key; these pin the allocation math:

1. au1 conserves every order EXACTLY (Σ allocated == header total) and
   matches a Python largest-remainder implementation line-for-line.
2. au2's Hamilton seats sum to exactly 100 and match Python.
3. au3's D'Hondt seats sum to exactly 100, match the documented
   scaled-quotient closed form, AND agree with a seat-by-seat
   exact-rational D'Hondt simulation (cross-multiplication compare, no
   floats) — the closed form and the sequential definition coincide.
4. Hamilton vs D'Hondt divergence is bounded: per nation the two
   methods differ by a few seats at most (both are proportional).
"""

from __future__ import annotations

import heapq
from collections import defaultdict

import duckdb

from recommendersystems_bigdata_spark import registry

registry.load_all()

SEATS = 100


def _largest_remainder(total: int, weights: list) -> list:
    """weights: [(tiebreak..., w)] tuples, w LAST -> [alloc] in order."""
    W = sum(t[-1] for t in weights)
    floors = [(total * t[-1]) // W for t in weights]
    rems = [(total * t[-1]) % W for t in weights]
    leftover = total - sum(floors)
    order = sorted(
        range(len(weights)), key=lambda i: (-rems[i], weights[i])
    )
    out = list(floors)
    for i in order[:leftover]:
        out[i] += 1
    return out


def test_proration_conserves_and_matches_python(spark, sf_dir):
    rows = duckdb.sql(
        f"""
        SELECT l.l_orderkey, l.l_linenumber,
               CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT),
               CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
        """
    ).fetchall()
    per_order = defaultdict(list)
    totals = {}
    for ok, ln, w, total in rows:
        per_order[ok].append((ln, w))
        totals[ok] = total
    # l_linenumber is NOT unique within an order on this corpus, so
    # compare per-order MULTISETS of (ln, w, allocation) — the same
    # equivalence the driver's order-insensitive hash checks
    from collections import Counter

    expect: dict[int, Counter] = {}
    for ok, lines in per_order.items():
        lines.sort()  # (ln, w) — the query's tiebreak order
        allocs = _largest_remainder(totals[ok], lines)
        expect[ok] = Counter(
            (ln, w, a) for (ln, w), a in zip(lines, allocs)
        )
    got: dict[int, Counter] = defaultdict(Counter)
    for r in registry.QUERIES["q_prorate_largest_remainder"](
        spark, sf_dir
    ).collect():
        got[r["l_orderkey"]][
            (r["l_linenumber"], r["line_cents"], r["allocated_cents"])
        ] += 1
    assert dict(got) == expect
    by_order = {
        ok: sum(a * n for (_ln, _w, a), n in c.items())
        for ok, c in got.items()
    }
    assert by_order == totals  # exact conservation, every order


def _census(sf_dir):
    return dict(
        duckdb.sql(
            f"SELECT c_nationkey, count(*) FROM"
            f" '{sf_dir}/customer.parquet' GROUP BY 1"
        ).fetchall()
    )


def test_hamilton_sums_to_100_and_matches_python(spark, sf_dir):
    pop = _census(sf_dir)
    items = sorted(pop.items())
    allocs = _largest_remainder(SEATS, items)
    expect = {nk: s for (nk, _v), s in zip(items, allocs)}
    got = {
        r["c_nationkey"]: r["seats"]
        for r in registry.QUERIES["q_apportion_hamilton"](
            spark, sf_dir
        ).collect()
    }
    assert got == expect
    assert sum(got.values()) == SEATS


def _dhondt_sequential(pop: dict) -> dict:
    """Seat-by-seat exact-rational D'Hondt; ties by (nation, divisor)."""
    seats = {nk: 0 for nk in pop}
    # heap of (-quotient) emulated by comparing fractions exactly:
    # pick argmax v/(s+1) via linear scan with cross-multiplication
    for _ in range(SEATS):
        best = None
        for nk, v in sorted(pop.items()):
            d = seats[nk] + 1
            if best is None:
                best = (nk, v, d)
                continue
            bnk, bv, bd = best
            # v/d > bv/bd  <=>  v*bd > bv*d  (all positive)
            if v * bd > bv * d:
                best = (nk, v, d)
        seats[best[0]] += 1
    return seats


def test_dhondt_sums_matches_scaled_and_rational(spark, sf_dir):
    pop = _census(sf_dir)
    got = {
        r["c_nationkey"]: r["seats"]
        for r in registry.QUERIES["q_apportion_dhondt"](
            spark, sf_dir
        ).collect()
    }
    assert sum(got.values()) == SEATS
    # documented scaled-quotient closed form
    quotients = sorted(
        (
            (-(v * 1000000 // d), nk, d)
            for nk, v in pop.items()
            for d in range(1, SEATS + 1)
        )
    )
    scaled = defaultdict(int)
    for _q, nk, _d in quotients[:SEATS]:
        scaled[nk] += 1
    assert got == {nk: scaled.get(nk, 0) for nk in pop}
    # and the sequential exact-rational definition agrees on this census
    assert got == _dhondt_sequential(pop)


def test_methods_are_both_proportional(spark, sf_dir):
    ham = {
        r["c_nationkey"]: r["seats"]
        for r in registry.QUERIES["q_apportion_hamilton"](
            spark, sf_dir
        ).collect()
    }
    dh = {
        r["c_nationkey"]: r["seats"]
        for r in registry.QUERIES["q_apportion_dhondt"](
            spark, sf_dir
        ).collect()
    }
    assert set(ham) == set(dh)
    for nk in ham:
        assert abs(ham[nk] - dh[nk]) <= 2  # proportional methods stay close
