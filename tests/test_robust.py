"""Semantic gates for §2.AP (robust / order-statistics aggregation).

Oracle parity hash-checks every key; these rebuild each statistic from
the raw per-segment SORTED value list in Python — the definitional
spelling the CDF-over-distinct-values lowering must reproduce exactly,
including partial multiplicities at every rank cutoff:

1. ap1's trimmed mean == mean of sorted[k : n-k], k = n // 10.
2. ap2's winsorized stats == clamped-list sum/mean with the exact
   rank-(k+1) / rank-(n−k) clamp values.
3. ap3's quartiles == sorted[ceil(q·n) − 1] (type-1), and the derived
   midhinge/IQR/QCD.
4. ap4's tail shares == top-k slice sums over the sorted list.
5. ap5's decile means == exact rank-slice means, and decile counts
   reconcile to n.
"""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb

from recommendersystems_bigdata_spark import registry

registry.load_all()


def _sorted_cents(sf_dir):
    rows = duckdb.sql(
        f"""
        SELECT c.c_mktsegment,
               CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
        FROM '{sf_dir}/orders.parquet' o
        JOIN '{sf_dir}/customer.parquet' c ON o.o_custkey = c.c_custkey
        """
    ).fetchall()
    by_seg: dict[str, list[int]] = defaultdict(list)
    for seg, cents in rows:
        by_seg[seg].append(cents)
    for v in by_seg.values():
        v.sort()
    return by_seg


def test_trimmed_mean_matches_sorted_slice(spark, sf_dir):
    expect = {}
    for seg, v in _sorted_cents(sf_dir).items():
        n = len(v)
        k = n // 10
        mid = v[k : n - k]
        plain = sum(v) // n
        trimmed = sum(mid) // (n - 2 * k)
        gap = None
        if trimmed:
            d = 10000 * (plain - trimmed)
            gap = abs(d) // trimmed * (1 if d >= 0 else -1)
        expect[seg] = (n, k, plain, trimmed, gap)
    got = {
        r["seg"]: (
            r["n_orders"],
            r["k_trim"],
            r["plain_mean_cents"],
            r["trimmed_mean_cents"],
            r["outlier_gap_bp"],
        )
        for r in registry.QUERIES["q_trimmed_mean"](spark, sf_dir).collect()
    }
    assert got == expect


def test_winsorized_stats_match_clamped_list(spark, sf_dir):
    expect = {}
    for seg, v in _sorted_cents(sf_dir).items():
        n = len(v)
        k = n // 20
        p05, p95 = v[k], v[n - k - 1]
        clamped = [min(max(x, p05), p95) for x in v]
        expect[seg] = (n, p05, p95, sum(clamped), sum(clamped) // n)
    got = {
        r["seg"]: (
            r["n_orders"],
            r["p05_cents"],
            r["p95_cents"],
            r["winsorized_sum_cents"],
            r["winsorized_mean_cents"],
        )
        for r in registry.QUERIES["q_winsorized_stats"](
            spark, sf_dir
        ).collect()
    }
    assert got == expect


def test_quartiles_are_type1_exact(spark, sf_dir):
    expect = {}
    for seg, v in _sorted_cents(sf_dir).items():
        n = len(v)
        q1 = v[math.ceil(0.25 * n) - 1]
        med = v[math.ceil(0.5 * n) - 1]
        q3 = v[math.ceil(0.75 * n) - 1]
        expect[seg] = (
            n,
            q1,
            med,
            q3,
            (q1 + q3) // 2,
            q3 - q1,
            10000 * (q3 - q1) // (q3 + q1) if q3 + q1 else None,
        )
    got = {
        r["seg"]: (
            r["n_orders"],
            r["q1_cents"],
            r["median_cents"],
            r["q3_cents"],
            r["midhinge_cents"],
            r["iqr_cents"],
            r["qcd_bp"],
        )
        for r in registry.QUERIES["q_quartile_dispersion"](
            spark, sf_dir
        ).collect()
    }
    assert got == expect


def test_tail_dominance_matches_topk_slices(spark, sf_dir):
    expect = {}
    for seg, v in _sorted_cents(sf_dir).items():
        n, total = len(v), sum(v)
        k1, k5 = max(1, n // 100), max(1, n // 20)
        expect[seg] = (
            n,
            total,
            10000 * sum(v[n - k1 :]) // total,
            10000 * sum(v[n - k5 :]) // total,
            10000 * v[-1] // total,
        )
    got = {
        r["seg"]: (
            r["n_orders"],
            r["total_cents"],
            r["top1pct_share_bp"],
            r["top5pct_share_bp"],
            r["max_order_share_bp"],
        )
        for r in registry.QUERIES["q_tail_dominance"](spark, sf_dir).collect()
    }
    assert got == expect


def test_decile_means_match_rank_slices(spark, sf_dir):
    by_seg = _sorted_cents(sf_dir)
    expect = {}
    for seg, v in by_seg.items():
        n = len(v)
        for d in range(1, 11):
            r_lo = (d - 1) * n // 10 + 1
            r_hi = d * n // 10
            sl = v[r_lo - 1 : r_hi]
            expect[(seg, d)] = (
                r_hi - r_lo + 1,
                sum(sl),
                sum(sl) // (r_hi - r_lo + 1) if r_hi >= r_lo else None,
            )
    rows = registry.QUERIES["q_decile_means"](spark, sf_dir).collect()
    got = {
        (r["seg"], r["decile"]): (
            r["n_orders"],
            r["decile_cents"],
            r["mean_cents"],
        )
        for r in rows
    }
    assert got == expect
    # decile counts reconcile to n per segment
    per_seg = defaultdict(int)
    for (seg, _d), (cnt, _s, _m) in got.items():
        per_seg[seg] += cnt
    assert per_seg == {seg: len(v) for seg, v in by_seg.items()}
