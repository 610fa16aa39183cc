"""Semantic gates for §2.BU (peer benchmarking).

Oracle parity hash-checks every key; these pin the published
order-statistic conventions against a direct Python recompute of the
per-supplier revenue census:

1. bu1's rank/percentile arithmetic and its 0..10⁴ endpoints.
2. bu2's median IS the lower median and gaps recompose.
3. bu3's band counts conserve the peer count and Q1 ≤ Q3.
4. bu4's leader/runner-up equal the two deterministic extremes and the
   margin recomposes; lone-peer nations publish NULLs.
"""

from __future__ import annotations

import duckdb

from recommendersystems_bigdata_spark import registry

registry.load_all()


def _census(sf_dir):
    """{nation: sorted [(rev_cents, suppkey)]} recomputed independently."""
    rows = duckdb.sql(
        f"""
        SELECT n.n_name, s.s_suppkey,
               CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS HUGEINT)
                        * (100 - CAST(floor(l.l_discount * 100 + 0.5)
                                      AS BIGINT))) // 100 AS BIGINT)
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/supplier.parquet' s ON l.l_suppkey = s.s_suppkey
        JOIN '{sf_dir}/nation.parquet' n ON s.s_nationkey = n.n_nationkey
        GROUP BY 1, 2
        """
    ).fetchall()
    out = {}
    for nn, sk, rev in rows:
        out.setdefault(nn, []).append((int(rev), int(sk)))
    for nn in out:
        out[nn].sort()
    return out


def test_rank_percentile_convention(spark, sf_dir):
    census = _census(sf_dir)
    rows = registry.QUERIES["q_peer_rank_percentile"](
        spark, sf_dir
    ).collect()
    assert len(rows) == sum(len(v) for v in census.values())
    for r in rows:
        peers = census[r["n_name"]]
        assert peers[r["peer_rank"] - 1] == (r["rev_cents"], r["s_suppkey"])
        assert r["peers"] == len(peers)
        want = (
            0
            if len(peers) == 1
            else (10_000 * (r["peer_rank"] - 1)) // (len(peers) - 1)
        )
        assert r["percentile_bp"] == want
    # endpoints: every multi-peer nation has a 0 and a 10000
    by_nation = {}
    for r in rows:
        by_nation.setdefault(r["n_name"], []).append(r["percentile_bp"])
    for nn, bps in by_nation.items():
        if len(bps) > 1:
            assert min(bps) == 0 and max(bps) == 10_000


def test_median_gap_recomposes(spark, sf_dir):
    census = _census(sf_dir)
    rows = registry.QUERIES["q_peer_median_gap"](spark, sf_dir).collect()
    for r in rows:
        peers = census[r["n_name"]]
        med = peers[(len(peers) + 1) // 2 - 1][0]
        assert r["median_cents"] == med
        assert r["gap_cents"] == r["rev_cents"] - med
        assert r["ratio_bp"] == (10_000 * r["rev_cents"]) // med


def test_quartile_bands_conserve(spark, sf_dir):
    census = _census(sf_dir)
    rows = registry.QUERIES["q_peer_quartile_bands"](spark, sf_dir).collect()
    assert {r["n_name"] for r in rows} == set(census)
    for r in rows:
        peers = census[r["n_name"]]
        n = len(peers)
        q1 = peers[max((n + 1) // 4, 1) - 1][0]
        q3 = peers[min((3 * (n + 1)) // 4, n) - 1][0]
        assert (r["q1_cents"], r["q3_cents"]) == (q1, q3)
        assert q1 <= q3
        assert r["below_q1"] + r["in_band"] + r["above_q3"] == n == r["peers"]
        assert r["below_q1"] == sum(1 for rev, _ in peers if rev < q1)
        assert r["above_q3"] == sum(1 for rev, _ in peers if rev > q3)


def test_leader_margin_extremes(spark, sf_dir):
    census = _census(sf_dir)
    rows = registry.QUERIES["q_peer_leader_margin"](spark, sf_dir).collect()
    for r in rows:
        peers = census[r["n_name"]]
        assert (r["leader_cents"], r["leader_suppkey"]) == peers[-1]
        if len(peers) == 1:
            assert r["runner_up_suppkey"] is None
            assert r["margin_cents"] is None and r["lead_ratio_bp"] is None
        else:
            assert (r["runner_up_cents"], r["runner_up_suppkey"]) == peers[-2]
            assert r["margin_cents"] == r["leader_cents"] - r["runner_up_cents"]
            assert (
                r["lead_ratio_bp"]
                == (10_000 * r["leader_cents"]) // r["runner_up_cents"]
            )
