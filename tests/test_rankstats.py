"""Semantic gates for the §2.Y rank-statistics family (beyond oracle
parity): brute-force Python references over the collected sf0.001 tables,
so a rank/tie-handling slip that happened to agree with an equally-wrong
oracle SQL spelling still fails. Every reference recomputes ranks the
textbook way (sort, tie-group average) rather than echoing the queries'
distinct-grid spelling.
"""

from __future__ import annotations

import math

import pytest

from recommendersystems_bigdata_spark import registry
from recommendersystems_bigdata_spark.catalog import load_table

registry.load_all()


def _cents(v: float) -> int:
    return math.floor(v * 100 + 0.5)


def _trunc_div(num: int, den: int) -> int:
    """Truncate-toward-zero integer division (Spark `div` / DuckDB `//`)."""
    q = abs(num) // abs(den)
    return q if (num >= 0) == (den >= 0) else -q


def _rank2(values):
    """Doubled tie-averaged ranks: {value: 2*avg_rank} the textbook way."""
    s = sorted(values)
    out = {}
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        # positions i+1..j (1-based); doubled average = (i+1) + j
        out[s[i]] = (i + 1) + j
        i = j
    return out


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .collect()
    )
    return [(r["event_type"], _cents(r["value"])) for r in rows if r["value"] is not None]


def test_mannwhitney_matches_textbook_reference(spark, sf_dir, events):
    r2 = _rank2([v for _, v in events])
    big_n = len(events)
    got = {
        r["event_type"]: r
        for r in registry.QUERIES["q_ranks_mannwhitney"](spark, sf_dir).collect()
    }
    types = {t for t, _ in events}
    assert set(got) == types
    for t in types:
        grp = [v for ty, v in events if ty == t]
        n = len(grp)
        rank2_sum = sum(r2[v] for v in grp)
        u2 = rank2_sum - n * (n + 1)
        assert got[t]["n"] == n
        assert got[t]["rank2_sum"] == rank2_sum
        assert got[t]["u2"] == u2
        assert got[t]["auc_bp"] == (u2 * 10000) // (2 * n * (big_n - n))
        assert got[t]["rb_bp"] == 2 * got[t]["auc_bp"] - 10000
        assert 0 < got[t]["auc_bp"] < 10000  # sane, non-degenerate


def test_ks_distance_matches_brute_force_ecdf(spark, sf_dir, events):
    a = sorted(v for t, v in events if t == "click")
    b = sorted(v for t, v in events if t == "purchase")
    na, nb = len(a), len(b)
    best = 0
    for v in sorted(set(a) | set(b)):
        ca = sum(1 for x in a if x <= v)
        cb = sum(1 for x in b if x <= v)
        best = max(best, abs(ca * nb - cb * na))
    row = registry.QUERIES["q_ranks_ks_distance"](spark, sf_dir).collect()[0]
    assert row["n_click"] == na and row["n_purchase"] == nb
    assert row["d_num"] == best
    assert row["ks_bp"] == best * 10000 // (na * nb)
    assert row["d_num"] > 0


def test_median_test_matches_reference(spark, sf_dir, events):
    vals = sorted(v for _, v in events)
    n = len(vals)
    med = vals[(n + 1) // 2 - 1]  # lower median: cum count reaches ceil(N/2)
    rows = registry.QUERIES["q_ranks_median_test"](spark, sf_dir).collect()
    assert all(r["median_cents"] == med for r in rows)
    for r in rows:
        grp = [v for t, v in events if t == r["event_type"]]
        assert r["n_le"] == sum(1 for v in grp if v <= med)
        assert r["n_gt"] == sum(1 for v in grp if v > med)
        assert r["n_le"] > 0 and r["n_gt"] > 0  # both sides populated
    # chi2 recomputed per drift_chi2's floored-term spelling
    cells = [(r["event_type"], "le", r["n_le"]) for r in rows] + [
        (r["event_type"], "gt", r["n_gt"]) for r in rows
    ]
    grand = sum(o for _, _, o in cells)
    chi = 0
    for t, s, o in cells:
        row_t = sum(o2 for t2, _, o2 in cells if t2 == t)
        col_t = sum(o2 for _, s2, o2 in cells if s2 == s)
        e = (row_t * col_t) / grand
        chi += math.floor((o - e) * (o - e) / e * 1_000_000)
    assert rows[0]["chi2_x1e6"] == chi


def test_wilcoxon_matches_textbook_reference(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderdate", "o_totalprice")
        .collect()
    )
    per = {}
    for r in rows:
        y = r["o_orderdate"].year
        if y in (1996, 1997):
            d = per.setdefault(r["o_custkey"], {1996: [0, 0], 1997: [0, 0]})
            d[y][0] += _cents(r["o_totalprice"])
            d[y][1] += 1
    diffs = [
        v[1997][0] - v[1996][0]
        for v in per.values()
        if v[1996][1] > 0 and v[1997][1] > 0 and v[1997][0] != v[1996][0]
    ]
    r2 = _rank2([abs(d) for d in diffs])
    w2p = sum(r2[abs(d)] for d in diffs if d > 0)
    w2m = sum(r2[abs(d)] for d in diffs if d < 0)
    row = registry.QUERIES["q_ranks_wilcoxon"](spark, sf_dir).collect()[0]
    assert row["n_pairs"] == len(diffs) > 0
    assert row["n_pos"] == sum(1 for d in diffs if d > 0)
    assert row["n_neg"] == sum(1 for d in diffs if d < 0)
    assert row["w2_plus"] == w2p
    assert row["w2_minus"] == w2m
    assert row["rb_bp"] == _trunc_div((w2p - w2m) * 10000, w2p + w2m)


def test_kendall_binned_matches_reference_ntile(spark, sf_dir):
    cust = {
        r["c_custkey"]: _cents(r["c_acctbal"])
        for r in load_table(spark, sf_dir, "customer").collect()
    }
    spend = {}
    for r in load_table(spark, sf_dir, "orders").collect():
        if r["o_custkey"] in cust:
            spend[r["o_custkey"]] = spend.get(r["o_custkey"], 0) + _cents(
                r["o_totalprice"]
            )
    pairs = [(k, cust[k], y) for k, y in spend.items()]

    def ntile(keyed, k=10):
        n = len(keyed)
        q, r = divmod(n, k)
        out, pos = {}, 0
        for b in range(1, k + 1):
            size = q + 1 if b <= r else q
            for key in keyed[pos : pos + size]:
                out[key] = b
            pos += size
        return out

    bx = ntile([k for k, x, _ in sorted(pairs, key=lambda p: (p[1], p[0]))])
    by = ntile([k for k, _, y in sorted(pairs, key=lambda p: (p[2], p[0]))])
    cells = {}
    for k, _, _ in pairs:
        cells[(bx[k], by[k])] = cells.get((bx[k], by[k]), 0) + 1
    c = d = 0
    items = list(cells.items())
    for (i1, j1), n1 in items:
        for (i2, j2), n2 in items:
            if i2 > i1 and j2 > j1:
                c += n1 * n2
            elif i2 > i1 and j2 < j1:
                d += n1 * n2
    row = registry.QUERIES["q_ranks_kendall_binned"](spark, sf_dir).collect()[0]
    assert row["n_pairs"] == len(pairs)
    assert row["concordant"] == c
    assert row["discordant"] == d
    assert row["gamma_bp"] == _trunc_div((c - d) * 10000, c + d)
    assert c + d > 0
