"""Semantic gates for §2.AW (order backlog / queueing).

Oracle parity hash-checks every key; these rebuild the pipeline from
raw parquet in Python — including the two data-hygiene rules (the
completion clamp and never-completed orders) — pinning:

1. aw1's conservation: backlog never negative, arrivals sum to the
   order count, and the final month's backlog equals exactly the
   never-completed order count (every clamped completion lands inside
   the observed month range).
2. aw2's bucket census against a direct Python snapshot rebuild.
3. aw3's four scalars and the truncated ratio arithmetic.
4. aw4 by BRUTE FORCE: for each of the 36 report month-ends, evaluate
   "open at month-end" directly per order (a different algorithm than
   the query's month-range explode) and compare the census.
"""

from __future__ import annotations

import datetime as dt

import duckdb

from recommendersystems_bigdata_spark import registry

registry.load_all()


def _pipe_py(sf_dir):
    """[(od, comp_or_None, totalprice_cents)] with the clamp applied."""
    rows = duckdb.sql(
        f"""
        SELECT o.o_orderdate, x.ls,
               CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
        FROM '{sf_dir}/orders.parquet' o LEFT JOIN (
          SELECT l_orderkey, max(CAST(l_shipdate AS TIMESTAMP)) AS ls
          FROM '{sf_dir}/lineitem.parquet' GROUP BY 1
        ) x ON o.o_orderkey = x.l_orderkey
        """
    ).fetchall()
    return [
        (od, None if ls is None else max(ls, od), cents)
        for od, ls, cents in rows
    ]


def _tdiv(a, b):
    if b == 0:
        return None
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _ym(ts):
    return ts.year * 100 + ts.month


def test_monthly_ledger_conserves(spark, sf_dir):
    pipe = _pipe_py(sf_dir)
    arr, done = {}, {}
    for od, comp, _c in pipe:
        arr[_ym(od)] = arr.get(_ym(od), 0) + 1
        if comp is not None:
            done[_ym(comp)] = done.get(_ym(comp), 0) + 1
    rows = registry.QUERIES["q_backlog_monthly"](spark, sf_dir).collect()
    got_arr = sum(r["arrivals"] for r in rows)
    got_done = sum(r["completions"] for r in rows)
    assert got_arr == len(pipe)
    assert got_done == sum(1 for _od, comp, _c in pipe if comp is not None)
    cum = 0
    for r in sorted(rows, key=lambda r: r["ym"]):
        assert r["arrivals"] == arr.get(r["ym"], 0)
        assert r["completions"] == done.get(r["ym"], 0)
        cum += r["arrivals"] - r["completions"]
        assert r["backlog_end"] == cum
        assert r["backlog_end"] >= 0  # the clamp guarantees it
        assert r["book_to_bill_milli"] == _tdiv(
            1000 * r["arrivals"], r["completions"]
        )
    # terminal backlog = orders that never complete
    assert cum == sum(1 for _od, comp, _c in pipe if comp is None)


def test_wip_snapshot_matches_python(spark, sf_dir):
    snap = dt.datetime(1998, 12, 31)
    pipe = _pipe_py(sf_dir)
    buckets = {}
    for od, comp, cents in pipe:
        if od > snap or (comp is not None and comp <= snap):
            continue
        age = (snap - od).days
        if age <= 90:
            key, lo = "000-090", 0
        elif age <= 365:
            key, lo = "091-365", 91
        elif age <= 730:
            key, lo = "366-730", 366
        else:
            key, lo = "731+", 731
        agg = buckets.setdefault((key, lo), [0, 0, 0])
        agg[0] += 1
        agg[1] += cents
        agg[2] = max(agg[2], age)
    got = {
        (r["age_bucket"], r["bucket_lo_days"]): [
            r["n_orders"],
            r["value_cents"],
            r["oldest_age_days"],
        ]
        for r in registry.QUERIES["q_wip_aging_snapshot"](
            spark, sf_dir
        ).collect()
    }
    assert got == {k: list(v) for k, v in buckets.items()}


def test_littles_law_scalars_match_python(spark, sf_dir):
    start, end = dt.datetime(1997, 1, 1), dt.datetime(1998, 1, 1)
    pipe = _pipe_py(sf_dir)
    n_arr = n_done = sum_cycle = sum_open = 0
    for od, comp, _c in pipe:
        if start <= od < end:
            n_arr += 1
            if comp is not None:
                n_done += 1
                sum_cycle += (comp - od).days
        ov = (min(comp or end, end) - max(od, start)).days
        sum_open += max(0, ov)
    [r] = registry.QUERIES["q_littles_law_check"](spark, sf_dir).collect()
    assert r["n_arrivals"] == n_arr
    assert r["n_completed"] == n_done
    assert r["sum_cycle_days"] == sum_cycle
    assert r["sum_open_days"] == sum_open
    assert r["lambda_milli_per_day"] == _tdiv(1000 * n_arr, 365)
    assert r["w_cycle_days_milli"] == _tdiv(1000 * sum_cycle, n_done)
    assert r["l_avg_open_milli"] == _tdiv(1000 * sum_open, 365)
    assert r["littles_ratio_bp"] == _tdiv(
        10000 * sum_open * n_done, n_arr * sum_cycle
    )


def test_oldest_open_brute_force(spark, sf_dir):
    """Direct per-month-end evaluation (no month-range arithmetic) —
    independent of the query's explode formulation."""
    pipe = _pipe_py(sf_dir)
    expect = {}
    for year in (1997, 1998, 1999):
        for month in range(1, 13):
            if month == 12:
                eom = dt.datetime(year, 12, 31)
            else:
                eom = dt.datetime(year, month + 1, 1) - dt.timedelta(days=1)
            ym = year * 100 + month
            for od, comp, _c in pipe:
                if od <= eom and (comp is None or comp > eom):
                    age = (eom - od).days
                    agg = expect.setdefault(ym, [0, 0, 0])
                    agg[0] += 1
                    agg[1] = max(agg[1], age)
                    agg[2] += 1 if age > 180 else 0
    got = {
        r["ym"]: [r["n_open"], r["oldest_age_days"], r["n_open_gt180d"]]
        for r in registry.QUERIES["q_backlog_oldest_open"](
            spark, sf_dir
        ).collect()
    }
    assert got == {k: list(v) for k, v in expect.items()}
