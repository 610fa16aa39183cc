"""Semantic gates for §2.AI (pricing/margin) and §2.AJ (fulfillment).

Oracle parity hash-checks every key; these pin the claims the SQL twin
SHARES with the Spark spelling (and so cannot falsify):

1. aj5's contiguity identity — ``distinct ∧ count = max ∧ sum =
   max(max+1)/2 ⟺ line numbers are exactly 1..n`` — hypothesis-fuzzed
   against the literal set comparison over arbitrary multisets.
2. ai4's matched-sample Laspeyres index equals an independent Python
   construction (exact integer arithmetic end-to-end) on the corpus.
3. The billing rounding chain ties out ACROSS suites: ai5's cell totals
   and aj4's priority totals decompose the same per-line cent-grid
   arithmetic, so their corpus-wide gross/discount/tax sums must be
   identical integers.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from recommendersystems_bigdata_spark import registry

registry.load_all()


def _classify(lines: list[int]) -> str:
    n, mx, s, nd = len(lines), max(lines), sum(lines), len(set(lines))
    if nd < n:
        return "c_duplicate"
    if n == mx and s == mx * (mx + 1) // 2:
        return "a_contiguous"
    return "b_gapped"


@settings(max_examples=500, deadline=None)
@given(
    lines=st.lists(
        st.integers(min_value=1, max_value=12), min_size=1, max_size=10
    )
)
def test_contiguity_identity_matches_set_comparison(lines):
    """aj5's arithmetic rule == the literal 'is it exactly {1..n}'
    check, for every multiset of candidate line numbers (duplicates
    routed to their own class first, as the query does)."""
    want = (
        "c_duplicate"
        if len(set(lines)) < len(lines)
        else (
            "a_contiguous"
            if sorted(lines) == list(range(1, len(lines) + 1))
            else "b_gapped"
        )
    )
    assert _classify(lines) == want


def test_laspeyres_matches_python_reference(spark, sf_dir):
    """ai4's per-year (n_parts, index_bp) equals an independent Python
    construction of the matched-sample Laspeyres index with the same
    integer bases (micro-cent prices via truncated div, bp index)."""
    import duckdb

    rows = duckdb.sql(
        f"""
        SELECT l_partkey, year(CAST(l_shipdate AS TIMESTAMP)) AS yr,
               sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS cents,
               sum(CAST(l_quantity AS BIGINT)) AS qty
        FROM '{sf_dir}/lineitem.parquet' GROUP BY 1, 2
        """
    ).fetchall()
    py = {(p, y): ((c * 10000) // q, q) for p, y, c, q in rows}
    y0 = min(y for _, y in py)
    base = {p: py[(p, y)] for (p, y) in py if y == y0}
    expect = {}
    for yr in sorted({y for _, y in py}):
        num = den = n = 0
        for (p, y), (price, _qty) in py.items():
            if y != yr or p not in base:
                continue
            p0, q0 = base[p]
            num += price * q0
            den += p0 * q0
            n += 1
        expect[yr] = (n, 10000 * num // den)
    got = {
        r["yr"]: (r["n_parts"], r["index_bp"])
        for r in registry.QUERIES["q_price_index_laspeyres"](
            spark, sf_dir
        ).collect()
    }
    assert got == expect


def test_tax_profile_ties_out_with_order_waterfall(spark, sf_dir):
    """ai5 (flag/status cells) and aj4 (priority cells through per-order
    subtotals) decompose the SAME per-line billing arithmetic — their
    corpus totals must be identical integers (the reconciliation claim
    both docstrings make)."""
    prof = registry.QUERIES["q_tax_burden_profile"](spark, sf_dir).collect()
    wf = registry.QUERIES["q_order_value_waterfall"](spark, sf_dir).collect()
    gross_p = sum(r["gross_cents"] for r in prof)
    disc_p = sum(r["gross_cents"] - r["net_cents"] for r in prof)
    tax_p = sum(r["tax_cents"] for r in prof)
    assert gross_p == sum(r["gross_cents"] for r in wf)
    assert disc_p == sum(r["discount_cents"] for r in wf)
    assert tax_p == sum(r["tax_cents"] for r in wf)
    for r in wf:  # and the waterfall's own identity
        assert (
            r["billed_cents"]
            == r["gross_cents"] - r["discount_cents"] + r["tax_cents"]
        )


def test_fill_span_split_flags_match_python(spark, sf_dir):
    """aj1's split-order counts and spans equal an independent Python
    pass over the raw (order, shipdate) pairs — pins the distinct-ship-
    day and epoch-span semantics the two SQL engines share."""
    import duckdb
    from collections import defaultdict

    rows = duckdb.sql(
        f"""
        SELECT l.l_orderkey, o.o_orderpriority,
               CAST(date_diff('day', DATE '1970-01-01',
                              CAST(l.l_shipdate AS DATE)) AS BIGINT)
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
        """
    ).fetchall()
    days: dict[int, set[int]] = defaultdict(set)
    prio: dict[int, str] = {}
    for ok, pr, d in rows:
        days[ok].add(d)
        prio[ok] = pr
    agg: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0, 0])  # n, split, max, sum
    for ok, ds in days.items():
        a = agg[prio[ok]]
        span = max(ds) - min(ds)
        a[0] += 1
        a[1] += 1 if len(ds) > 1 else 0
        a[2] = max(a[2], span)
        a[3] += span
    got = {
        r["o_orderpriority"]: (
            r["n_orders"],
            r["n_split"],
            r["split_share_bp"],
            r["max_span_days"],
            r["avg_span_days"],
        )
        for r in registry.QUERIES["q_order_fill_span"](spark, sf_dir).collect()
    }
    for pr, (n, split, mx, s) in agg.items():
        assert got[pr] == (n, split, 10000 * split // n, mx, s // n), pr
