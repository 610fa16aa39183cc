"""Semantic gates for §2.BB (priority SLA fairness).

Oracle parity hash-checks every key; these rebuild the latency
relation in Python (clamp included), pinning:

1. bb1's quartile rank picks, mean milli, and the pre-ship anomaly
   census.
2. bb2's attainment bp plus the 7d ≤ 30d ≤ 90d monotonicity.
3. bb3's month census.
4. bb4's 128-bit share arithmetic and premium ratio.
"""

from __future__ import annotations

from collections import defaultdict

import duckdb

from recommendersystems_bigdata_spark import registry

registry.load_all()


def _lat_py(sf_dir):
    """{prio: [(latency_days, preship)]} over shipped orders."""
    rows = duckdb.sql(
        f"""
        SELECT o.o_orderpriority, o.o_orderdate, x.fs
        FROM '{sf_dir}/orders.parquet' o JOIN (
          SELECT l_orderkey, min(CAST(l_shipdate AS TIMESTAMP)) AS fs
          FROM '{sf_dir}/lineitem.parquet' GROUP BY 1
        ) x ON o.o_orderkey = x.l_orderkey
        """
    ).fetchall()
    out = defaultdict(list)
    for prio, od, fs in rows:
        out[prio].append((max(0, (fs - od).days), 1 if fs < od else 0))
    return out


def test_latency_quartiles_match_python(spark, sf_dir):
    lat = _lat_py(sf_dir)
    for r in registry.QUERIES["q_priority_latency_quartiles"](
        spark, sf_dir
    ).collect():
        rows = lat[r["o_orderpriority"]]
        days = sorted(d for d, _p in rows)
        n = len(days)
        assert r["n_orders"] == n
        assert r["n_preship"] == sum(p for _d, p in rows)
        assert r["q1_days"] == days[max(0, (n + 1) // 4 - 1)]
        assert r["median_days"] == days[max(0, (n + 1) // 2 - 1)]
        assert r["q3_days"] == days[max(0, (3 * (n + 1)) // 4 - 1)]
        assert r["mean_days_milli"] == (1000 * sum(days)) // n


def test_attainment_matches_and_monotone(spark, sf_dir):
    lat = _lat_py(sf_dir)
    for r in registry.QUERIES["q_priority_sla_attainment"](
        spark, sf_dir
    ).collect():
        days = [d for d, _p in lat[r["o_orderpriority"]]]
        n = len(days)
        assert r["n_orders"] == n
        for col, cut in (
            ("within_7d_bp", 7),
            ("within_30d_bp", 30),
            ("within_90d_bp", 90),
        ):
            assert r[col] == (10000 * sum(1 for d in days if d <= cut)) // n
        assert r["within_7d_bp"] <= r["within_30d_bp"] <= r["within_90d_bp"]


def test_monthly_mix_matches_python(spark, sf_dir):
    rows = duckdb.sql(
        f"""SELECT year(o_orderdate) * 100 + month(o_orderdate),
            o_orderpriority FROM '{sf_dir}/orders.parquet'"""
    ).fetchall()
    census = defaultdict(lambda: [0, 0])
    for ym, prio in rows:
        census[ym][0] += 1
        if prio in ("1-URGENT", "2-HIGH"):
            census[ym][1] += 1
    got = {
        r["ym"]: (r["n_orders"], r["n_expedite"], r["expedite_share_bp"])
        for r in registry.QUERIES["q_priority_mix_monthly"](
            spark, sf_dir
        ).collect()
    }
    assert got == {
        ym: (n, e, (10000 * e) // n) for ym, (n, e) in census.items()
    }


def test_value_premium_matches_python(spark, sf_dir):
    rows = duckdb.sql(
        f"""SELECT o_orderpriority,
            CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
            FROM '{sf_dir}/orders.parquet'"""
    ).fetchall()
    census = defaultdict(lambda: [0, 0])
    for prio, cents in rows:
        census[prio][0] += 1
        census[prio][1] += cents
    n_tot = sum(v[0] for v in census.values())
    t = sum(v[1] for v in census.values())
    for r in registry.QUERIES["q_priority_value_premium"](
        spark, sf_dir
    ).collect():
        n, v = census[r["o_orderpriority"]]
        cs = (10000 * n) // n_tot
        assert (r["n_orders"], r["value_cents"]) == (n, v)
        assert r["count_share_bp"] == cs
        assert r["value_share_bp"] == (10000 * v) // t
        want = None if cs == 0 else ((1000 * 10000 * v) // t) // cs
        assert r["value_premium_milli"] == want
