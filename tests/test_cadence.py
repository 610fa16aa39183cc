"""Semantic gates for §2.AZ (purchase cadence).

Oracle parity hash-checks every key; these rebuild the per-customer
order sequences in Python (sorted by the same (orderdate, orderkey)
total order), pinning:

1. az1's bucket census against directly recomputed gaps.
2. az2's exact quartile ranks against a sorted-list index pick.
3. az3's telescoping identity (Σ gaps == last − first order date per
   customer) and the full class census.
4. az4's first/last-gap trend labels per customer.
"""

from __future__ import annotations

from collections import defaultdict

import duckdb

from recommendersystems_bigdata_spark import registry

registry.load_all()


def _sequences(sf_dir):
    """{ck: [orderdate sorted by (od, orderkey)]} + {ck: segment}."""
    rows = duckdb.sql(
        f"""SELECT o_custkey, o_orderdate, o_orderkey
        FROM '{sf_dir}/orders.parquet'
        ORDER BY o_custkey, o_orderdate, o_orderkey"""
    ).fetchall()
    seqs = defaultdict(list)
    for ck, od, _ok in rows:
        seqs[ck].append(od)
    seg = dict(
        duckdb.sql(
            f"SELECT c_custkey, c_mktsegment FROM '{sf_dir}/customer.parquet'"
        ).fetchall()
    )
    return seqs, seg


def _gaps_py(seqs):
    """{ck: [gap days in temporal order]}."""
    return {
        ck: [(b - a).days for a, b in zip(ods, ods[1:])]
        for ck, ods in seqs.items()
        if len(ods) >= 2
    }


def _bucket(gap):
    if gap == 0:
        return "000", 0
    if gap <= 7:
        return "001-007", 1
    if gap <= 30:
        return "008-030", 8
    if gap <= 90:
        return "031-090", 31
    if gap <= 365:
        return "091-365", 91
    return "366+", 366


def test_gap_census_matches_python(spark, sf_dir):
    seqs, _seg = _sequences(sf_dir)
    gaps = _gaps_py(seqs)
    census = {}
    for gs in gaps.values():
        for g in gs:
            key = _bucket(g)
            agg = census.setdefault(key, [0, g, g])
            agg[0] += 1
            agg[1] = min(agg[1], g)
            agg[2] = max(agg[2], g)
    t = sum(v[0] for v in census.values())
    got = {}
    for r in registry.QUERIES["q_interpurchase_gaps"](spark, sf_dir).collect():
        key = (r["gap_bucket"], r["bucket_lo_days"])
        got[key] = [r["n_gaps"], r["min_gap_days"], r["max_gap_days"]]
        assert r["gap_share_bp"] == (10000 * r["n_gaps"]) // t
    assert got == {k: list(v) for k, v in census.items()}


def test_quartiles_exact_rank_picks(spark, sf_dir):
    seqs, seg = _sequences(sf_dir)
    gaps = _gaps_py(seqs)
    by_seg = defaultdict(list)
    for ck, gs in gaps.items():
        by_seg[seg[ck]].extend(gs)
    for r in registry.QUERIES["q_cadence_quartiles_by_segment"](
        spark, sf_dir
    ).collect():
        gs = sorted(by_seg[r["c_mktsegment"]])
        n = len(gs)
        assert r["n_gaps"] == n
        assert r["min_gap_days"] == gs[0]
        assert r["max_gap_days"] == gs[-1]
        # rank r -> 1-based index; the CDF pick is the value at that rank
        assert r["q1_gap_days"] == gs[max(0, (n + 1) // 4 - 1)]
        assert r["median_gap_days"] == gs[max(0, (n + 1) // 2 - 1)]
        assert r["q3_gap_days"] == gs[max(0, (3 * (n + 1)) // 4 - 1)]


def test_regularity_census_and_telescoping(spark, sf_dir):
    seqs, _seg = _sequences(sf_dir)
    gaps = _gaps_py(seqs)
    census = {}
    for ck, gs in gaps.items():
        # telescoping: the gap sum IS the first-to-last span
        assert sum(gs) == (seqs[ck][-1] - seqs[ck][0]).days
        rng = max(gs) - min(gs)
        if rng <= 7:
            key = ("metronome", 0)
        elif rng <= 30:
            key = ("steady", 8)
        elif rng <= 90:
            key = ("loose", 31)
        else:
            key = ("erratic", 91)
        agg = census.setdefault(key, [0, 0, 0])
        agg[0] += 1
        agg[1] += len(gs)
        agg[2] += sum(gs)
    t = sum(v[0] for v in census.values())
    got = {}
    for r in registry.QUERIES["q_cadence_regularity"](spark, sf_dir).collect():
        key = (r["regularity_class"], r["class_lo_days"])
        n_cust, total_gaps, total_span = census[key]
        got[key] = r["n_customers"]
        assert r["n_customers"] == n_cust
        assert r["customer_share_bp"] == (10000 * n_cust) // t
        assert r["mean_gap_days_milli"] == (1000 * total_span) // total_gaps
    assert set(got) == set(census)


def test_trend_labels_match_python(spark, sf_dir):
    seqs, seg = _sequences(sf_dir)
    gaps = _gaps_py(seqs)
    census = {}
    for ck, gs in gaps.items():
        if len(gs) < 2:
            continue
        agg = census.setdefault(seg[ck], [0, 0, 0, 0])
        agg[0] += 1
        if gs[-1] < gs[0]:
            agg[1] += 1
        elif gs[-1] > gs[0]:
            agg[2] += 1
        else:
            agg[3] += 1
    for r in registry.QUERIES["q_cadence_trend"](spark, sf_dir).collect():
        n, acc, dec, stab = census[r["c_mktsegment"]]
        assert (
            r["n_customers"],
            r["n_accelerating"],
            r["n_decelerating"],
            r["n_stable"],
        ) == (n, acc, dec, stab)
        assert r["accelerating_bp"] == (10000 * acc) // n
    assert {r["c_mktsegment"] for r in
            registry.QUERIES["q_cadence_trend"](spark, sf_dir).collect()} \
        == set(census)
