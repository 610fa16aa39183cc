"""Semantic gates for the §2.AA time-series diagnostics (beyond oracle
parity): brute-force Python references over the collected sf0.001
orders/lineitem tables, computed with plain loops — a spelling slip
that happened to agree with an equally-wrong oracle still fails here.
"""

from __future__ import annotations

import math

from recommendersystems_bigdata_spark import registry
from recommendersystems_bigdata_spark.catalog import load_table

registry.load_all()


def _monthly_counts(spark, sf_dir) -> list[tuple[int, int, int]]:
    """[(yr, mo, count)] in time order."""
    rows = load_table(spark, sf_dir, "orders").select("o_orderdate").collect()
    counts: dict[tuple[int, int], int] = {}
    for r in rows:
        ym = (r["o_orderdate"].year, r["o_orderdate"].month)
        counts[ym] = counts.get(ym, 0) + 1
    return [(y, m, counts[(y, m)]) for y, m in sorted(counts)]


def test_autocorr_matches_reference(spark, sf_dir):
    series = [c for _, _, c in _monthly_counts(spark, sf_dir)]
    n, s = len(series), sum(series)
    d = [n * c - s for c in series]
    den = sum(x * x for x in d)
    rows = registry.QUERIES["q_ts_autocorr"](spark, sf_dir).collect()
    assert [r["lag_m"] for r in rows] == [1, 2, 3, 4, 5, 6]
    for r in rows:
        k = r["lag_m"]
        num = sum(d[t] * d[t + k] for t in range(n - k))
        assert r["n_pairs"] == n - k
        assert r["acf_num"] == num
        assert r["acf_den"] == den
        # truncation toward zero, matching Spark div / DuckDB //
        q = abs(10000 * num) // den
        assert r["acf_bp"] == (q if num >= 0 else -q)


def test_cusum_changepoint_matches_reference(spark, sf_dir):
    series = _monthly_counts(spark, sf_dir)
    n = len(series)
    s_n = sum(c for _, _, c in series)
    best = None  # (abs_stat, t) with earliest-t tie-break via max on (-abs, t)
    st = 0
    for t, (_, _, c) in enumerate(series, start=1):
        st += c
        stat = abs(n * st - t * s_n)
        if best is None or stat > best[0]:
            best = (stat, t)
    row = registry.QUERIES["q_ts_cusum_changepoint"](spark, sf_dir).collect()
    assert len(row) == 1
    r = row[0]
    yr, mo, _ = series[best[1] - 1]
    assert r["cp_t"] == best[1]
    assert r["cp_ym"] == f"{yr:04d}-{mo:02d}"
    assert r["cusum_abs"] == best[0]
    assert r["n_months"] == n
    assert r["pre_orders"] + r["post_orders"] == s_n


def test_seasonality_matches_reference(spark, sf_dir):
    rows_in = load_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    ).collect()
    agg: dict[int, list[int]] = {}
    for r in rows_in:
        mo = r["o_orderdate"].month
        cents = math.floor(r["o_totalprice"] * 100 + 0.5)
        n, c = agg.get(mo, (0, 0))
        agg[mo] = (n + 1, c + cents)
    total = sum(n for n, _ in agg.values())
    ranks = {
        mo: i + 1
        for i, mo in enumerate(sorted(agg, key=lambda m: (-agg[m][0], m)))
    }
    rows = registry.QUERIES["q_ts_seasonality"](spark, sf_dir).collect()
    assert [r["mo"] for r in rows] == sorted(agg)
    for r in rows:
        n, cents = agg[r["mo"]]
        assert r["n_orders"] == n
        assert r["revenue_cents"] == cents
        assert r["share_bp"] == (10000 * n) // total
        assert r["rnk"] == ranks[r["mo"]]


def test_drawdown_matches_reference(spark, sf_dir):
    rows_in = load_table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_returnflag", "l_extendedprice"
    ).collect()
    daily: dict[str, int] = {}
    for r in rows_in:
        day = str(r["l_shipdate"].date())
        cents = math.floor(r["l_extendedprice"] * 100 + 0.5)
        signed = -cents if r["l_returnflag"] == "R" else cents
        daily[day] = daily.get(day, 0) + signed
    cum, peak = 0, -(10**30)
    best = None  # (drawdown, day)
    for day in sorted(daily):
        cum += daily[day]
        peak = max(peak, cum)
        dd = peak - cum
        if best is None or dd > best[0]:
            best = (dd, day, peak, cum)
    row = registry.QUERIES["q_ts_drawdown"](spark, sf_dir).collect()
    assert len(row) == 1
    r = row[0]
    assert r["drawdown_cents"] == best[0]
    assert r["trough_day"] == best[1]
    assert r["peak_cents"] == best[2]
    assert r["cum_cents"] == best[3]
    assert r["n_days"] == len(daily)
    # the returns-signed series must actually dip, else the query is vacuous
    assert best[0] > 0


def test_growth_streaks_match_reference(spark, sf_dir):
    series = _monthly_counts(spark, sf_dir)
    streaks = []  # (len, start_ym, end_ym, gain)
    cur = None
    for i in range(1, len(series)):
        diff = series[i][2] - series[i - 1][2]
        ym = f"{series[i][0]:04d}-{series[i][1]:02d}"
        if diff > 0:
            if cur is None:
                cur = [1, ym, ym, diff]
            else:
                cur[0] += 1
                cur[2] = ym
                cur[3] += diff
        elif cur is not None:
            streaks.append(tuple(cur))
            cur = None
    if cur is not None:
        streaks.append(tuple(cur))
    top5 = sorted(streaks, key=lambda s: (-s[0], s[1]))[:5]
    rows = registry.QUERIES["q_ts_growth_streaks"](spark, sf_dir).collect()
    got = [
        (r["streak_len"], r["start_ym"], r["end_ym"], r["total_gain"]) for r in rows
    ]
    assert got == top5
    assert got, "no growth streaks found — series degenerate"
