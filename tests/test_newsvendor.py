"""Semantic gates for §2.CE (newsvendor service levels).

Oracle parity hash-checks every key; these pin the math:

1. ce1's order-statistic levels equal quantiles of the DENSE series
   materialized in Python (zeros included) — proving the zero-offset
   closed form against the definition it replaces.
2. Hypothesis: the closed form (0 if k ≤ z else the (k−z)-th
   observed) equals the k-th smallest of the dense multiset for ANY
   sparse series and any rank.
3. ce2's backtest recomposes (fill, bp, stockouts) from the series.
4. ce3's rank is the exact rational ceiling and its stock matches
   the dense quantile; fractile_bp recomposes from (cu, co).
5. ce4 recomposes from ce1's p95 column and the pooled series.
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from recommendersystems_bigdata_spark import registry

registry.load_all()

_LEVELS = (5000, 8000, 9000, 9500, 9900)


def _base_py(sf_dir):
    rows = duckdb.sql(
        f"""
        SELECT p.p_brand,
               year(l.l_shipdate) * 12 + month(l.l_shipdate),
               sum(CAST(floor(l.l_quantity + 0.5) AS BIGINT))
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/part.parquet' p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2
        """
    ).fetchall()
    base = {}
    for b, t, q in rows:
        base.setdefault(b, {})[int(t)] = int(q)
    months = sorted({int(t) for _, t, _ in rows})
    return base, months


def _dense_kth(xs, months, k):
    dense = sorted(xs.get(t, 0) for t in months)
    return dense[k - 1]


def test_quantile_census_equals_dense_definition(spark, sf_dir):
    base, months = _base_py(sf_dir)
    T = len(months)
    rows = registry.QUERIES["q_news_demand_quantiles"](
        spark, sf_dir
    ).collect()
    assert [r["brand"] for r in rows] == sorted(base)
    for r in rows:
        xs = base[r["brand"]]
        assert r["months"] == T
        assert r["observed_months"] == len(xs)
        for lv in _LEVELS:
            k = (T * lv + 9999) // 10_000
            assert r[f"stock_p{lv // 100}"] == _dense_kth(
                xs, months, k
            ), (r["brand"], lv)


@settings(max_examples=300, deadline=None)
@given(
    st.dictionaries(
        st.integers(0, 19), st.integers(1, 10**6), min_size=1
    ),
    st.integers(1, 20),
)
def test_zero_offset_closed_form_for_any_series(xs, k):
    """Property: over a 20-month calendar, the closed form equals the
    k-th smallest of the dense multiset."""
    months = list(range(20))
    z = len(months) - len(xs)
    if k <= z:
        want = 0
    else:
        want = sorted(xs.values())[k - z - 1]
    assert want == _dense_kth(xs, months, k)


def test_fill_backtest_recomposes(spark, sf_dir):
    base, months = _base_py(sf_dir)
    T = len(months)
    k95 = (T * 9500 + 9999) // 10_000
    rows = registry.QUERIES["q_news_fill_rate_backtest"](
        spark, sf_dir
    ).collect()
    for r in rows:
        xs = base[r["brand"]]
        s = _dense_kth(xs, months, k95)
        demand = sum(xs.values())
        filled = sum(min(v, s) for v in xs.values())
        assert r["stock_p95"] == s
        assert (r["demand_total"], r["filled_total"]) == (demand, filled)
        assert r["fill_bp"] == (10_000 * filled) // demand
        assert r["stockout_months"] == sum(
            1 for v in xs.values() if v > s
        )


def test_critical_fractile_exact_ceiling(spark, sf_dir):
    base, months = _base_py(sf_dir)
    T = len(months)
    rows = registry.QUERIES["q_news_critical_fractile"](
        spark, sf_dir
    ).collect()
    assert len(rows) == len(base) * 4
    for r in rows:
        cu, co = r["cost_underage"], r["cost_overage"]
        k = (T * cu + cu + co - 1) // (cu + co)
        assert r["service_rank"] == k
        assert r["fractile_bp"] == (10_000 * cu) // (cu + co)
        assert r["stock"] == _dense_kth(base[r["brand"]], months, k)


def test_pool_saving_recomposes(spark, sf_dir):
    base, months = _base_py(sf_dir)
    T = len(months)
    k95 = (T * 9500 + 9999) // 10_000
    sum_stock = sum(
        _dense_kth(xs, months, k95) for xs in base.values()
    )
    pooled = {}
    for xs in base.values():
        for t, q in xs.items():
            pooled[t] = pooled.get(t, 0) + q
    pooled_stock = _dense_kth(pooled, months, k95)
    (row,) = registry.QUERIES["q_news_pool_stock_saving"](
        spark, sf_dir
    ).collect()
    assert row["brands"] == len(base)
    assert (row["sum_stock"], row["pooled_stock"]) == (
        sum_stock,
        pooled_stock,
    )
    d = sum_stock - pooled_stock
    assert row["saving"] == d
    want_bp = (
        (10_000 * d) // sum_stock
        if d >= 0
        else -((10_000 * -d) // sum_stock)
    )
    assert row["saving_bp"] == want_bp
