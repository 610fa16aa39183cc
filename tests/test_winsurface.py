"""Semantic gates for §2.AQ (window-frame surface completeness).

Oracle parity hash-checks every key (against DuckDB's NATIVE frame
clauses where Spark needed an emulation); these additionally rebuild
each result from per-key sorted Python lists, pinning:

1. aq1's nth_value slots against the sorted order sequence.
2. aq2's IGNORE NULLS lookahead against a forward scan.
3. aq3's GROUPS frame against day-group sums + previous-group lookup.
4. aq4's leave-one-out mean against explicit neighborhood slices.
5. aq5's FILTER running aggregates against a running conditional scan.
"""

from __future__ import annotations

from collections import defaultdict

import duckdb

from recommendersystems_bigdata_spark import registry

registry.load_all()


def _orders(sf_dir):
    rows = duckdb.sql(
        f"""
        SELECT o_custkey, o_orderkey, o_orderstatus,
               CAST(date_diff('day', DATE '1970-01-01',
                              CAST(o_orderdate AS DATE)) AS BIGINT),
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        FROM '{sf_dir}/orders.parquet'
        """
    ).fetchall()
    by_ck = defaultdict(list)
    for ck, ok, st, day, cents in rows:
        by_ck[ck].append((day, ok, st, cents))
    for v in by_ck.values():
        v.sort()
    return by_ck


def test_nth_values_match_sorted_sequence(spark, sf_dir):
    by_ck = _orders(sf_dir)
    expect = {}
    for ck, seq in by_ck.items():
        cents = [c for _d, _o, _s, c in seq]
        expect[ck] = (
            len(cents),
            cents[-1],
            cents[1] if len(cents) >= 2 else None,
            cents[2] if len(cents) >= 3 else None,
        )
    got = {
        r["o_custkey"]: (
            r["n_orders"],
            r["last_cents"],
            r["second_cents"],
            r["third_cents"],
        )
        for r in registry.QUERIES["q_win_nth_values"](spark, sf_dir).collect()
    }
    assert got == expect


def test_lead_ignore_nulls_is_next_purchase(spark, sf_dir):
    rows = duckdb.sql(
        f"""
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN event_type = 'purchase'
                    THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END
        FROM '{sf_dir}/events.parquet'
        """
    ).fetchall()
    by_user = defaultdict(list)
    for u, eid, ts, et, pc in rows:
        by_user[u].append((ts, eid, pc))
    expect = {}
    for u, seq in by_user.items():
        seq.sort()
        nxt = None
        out = []
        for ts, eid, pc in reversed(seq):
            out.append((eid, nxt))
            if pc is not None:
                nxt = pc
        for eid, val in out:
            expect[eid] = val
    got = {
        r["event_id"]: r["next_purchase_cents"]
        for r in registry.QUERIES["q_win_lead_ignore_nulls"](
            spark, sf_dir
        ).collect()
    }
    assert got == expect


def test_groups_frame_is_two_day_group_sum(spark, sf_dir):
    by_ck = _orders(sf_dir)
    expect = {}
    for ck, seq in by_ck.items():
        day_sum: dict[int, int] = defaultdict(int)
        for day, _ok, _st, cents in seq:
            day_sum[day] += cents
        days = sorted(day_sum)
        prev = {d: (days[i - 1] if i else None) for i, d in enumerate(days)}
        for day, ok, _st, _c in seq:
            p = prev[day]
            expect[ok] = day_sum[day] + (day_sum[p] if p is not None else 0)
    got = {
        r["o_orderkey"]: r["two_day_group_cents"]
        for r in registry.QUERIES["q_win_groups_frame"](
            spark, sf_dir
        ).collect()
    }
    assert got == expect


def test_exclude_current_is_loo_neighborhood_mean(spark, sf_dir):
    by_ck = _orders(sf_dir)
    expect = {}
    for ck, seq in by_ck.items():
        cents = [c for _d, _o, _s, c in seq]
        for i, (_d, ok, _s, c) in enumerate(seq):
            lo, hi = max(0, i - 3), min(len(seq), i + 4)
            neigh = cents[lo:i] + cents[i + 1 : hi]
            mean = sum(neigh) // len(neigh) if neigh else None
            expect[ok] = (len(neigh), mean)
    got = {
        r["o_orderkey"]: (r["n_neighbors"], r["loo_mean_cents"])
        for r in registry.QUERIES["q_win_exclude_current"](
            spark, sf_dir
        ).collect()
    }
    assert got == expect


def test_filter_clause_running_conditionals(spark, sf_dir):
    by_ck = _orders(sf_dir)
    expect = {}
    for ck, seq in by_ck.items():
        n = s = 0
        for _d, ok, st, c in seq:
            if st == "F":
                n += 1
                s += c
            expect[ok] = (n, s)
    got = {
        r["o_orderkey"]: (r["f_orders_so_far"], r["f_cents_so_far"])
        for r in registry.QUERIES["q_win_filter_clause"](
            spark, sf_dir
        ).collect()
    }
    assert got == expect
