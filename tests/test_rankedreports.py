"""Semantic gates for §2.BC (ranked report shapes).

Oracle parity hash-checks every key; these rebuild the rankings in
Python, pinning:

1. bc1's WITH-TIES set semantics: membership == {rank ≤ 10} under a
   direct Python ranking, and the threshold identity (every included
   revenue ≥ the 10th row_number value, every excluded one below).
2. bc2's exact conservation: the 11 rows sum to corpus revenue, OTHER
   is the exact complement, positions render in order.
3. bc3's count ordering rownum ≤ rank ≤ dense and exact counts.
4. bc4 against a per-nation Python top-3 with share arithmetic.
"""

from __future__ import annotations

from collections import defaultdict

import duckdb

from recommendersystems_bigdata_spark import registry

registry.load_all()


def _per_part(sf_dir):
    return dict(
        duckdb.sql(
            f"""SELECT l_partkey,
            CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                 AS BIGINT)
            FROM '{sf_dir}/lineitem.parquet' GROUP BY 1"""
        ).fetchall()
    )


def test_with_ties_membership_and_ranks(spark, sf_dir):
    per_part = _per_part(sf_dir)
    vals = sorted(per_part.values(), reverse=True)
    # rank(r) = 1 + #{v > r}; WITH TIES keeps rank <= 10
    expect = {
        p: 1 + sum(1 for v in vals if v > r)
        for p, r in per_part.items()
        if 1 + sum(1 for v in vals if v > r) <= 10
    }
    rows = registry.QUERIES["q_top_parts_with_ties"](spark, sf_dir).collect()
    got = {r["l_partkey"]: r["rnk"] for r in rows}
    assert got == expect
    t10 = vals[9] if len(vals) >= 10 else vals[-1]
    for r in rows:
        assert r["rev_cents"] >= t10
    assert all(
        per_part[p] < t10 for p in set(per_part) - set(got)
    ) or len(vals) < 10


def test_top_plus_other_conserves(spark, sf_dir):
    per_brand = defaultdict(int)
    for pb, cents in duckdb.sql(
        f"""SELECT p.p_brand,
        CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
             AS BIGINT)
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/part.parquet' p ON l.l_partkey = p.p_partkey
        GROUP BY 1"""
    ).fetchall():
        per_brand[pb] += cents
    t = sum(per_brand.values())
    ordered = sorted(per_brand.items(), key=lambda kv: (-kv[1], kv[0]))
    rows = registry.QUERIES["q_top_brands_plus_other"](
        spark, sf_dir
    ).collect()
    assert [r["pos"] for r in rows] == list(range(1, 12))
    head_sum = 0
    for r, (brand, cents) in zip(rows[:10], ordered[:10]):
        assert (r["label"], r["rev_cents"]) == (brand, cents)
        assert r["rev_share_bp"] == (10000 * cents) // t
        head_sum += cents
    other = rows[10]
    assert other["label"] == "OTHER"
    assert other["rev_cents"] == t - head_sum
    assert sum(r["rev_cents"] for r in rows) == t  # exact conservation


def test_cut_semantics_counts(spark, sf_dir):
    per_part = _per_part(sf_dir)
    vals = sorted(per_part.values(), reverse=True)
    n = len(vals)
    rn_cut = min(10, n)
    t10 = vals[9] if n >= 10 else vals[-1]
    rank_cut = sum(1 for v in vals if v >= t10)
    dvals = sorted(set(vals), reverse=True)
    d10 = dvals[9] if len(dvals) >= 10 else dvals[-1]
    dense_cut = sum(1 for v in vals if v >= d10)
    [r] = registry.QUERIES["q_rank_cut_semantics"](spark, sf_dir).collect()
    assert r["rownum_cut_rows"] == rn_cut
    assert r["rank_cut_rows"] == rank_cut
    assert r["dense_cut_rows"] == dense_cut
    assert rn_cut <= rank_cut <= dense_cut
    want = "ties_at_cut" if rank_cut > rn_cut else "no_ties_at_cut"
    assert r["boundary"] == want


def test_nation_top3_matches_python(spark, sf_dir):
    spend = defaultdict(lambda: defaultdict(int))
    for nat, ck, cents in duckdb.sql(
        f"""SELECT n.n_name, c.c_custkey,
        CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
             AS BIGINT)
        FROM '{sf_dir}/orders.parquet' o
        JOIN '{sf_dir}/customer.parquet' c ON o.o_custkey = c.c_custkey
        JOIN '{sf_dir}/nation.parquet' n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2"""
    ).fetchall():
        spend[nat][ck] += cents
    expect = {}
    for nat, d in spend.items():
        tot = sum(d.values())
        top3 = sorted(d.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        for pos, (ck, cents) in enumerate(top3, start=1):
            expect[(nat, pos)] = (ck, cents, (10000 * cents) // tot)
    got = {
        (r["nation"], r["pos"]): (
            r["c_custkey"],
            r["spend_cents"],
            r["nation_share_bp"],
        )
        for r in registry.QUERIES["q_nation_top3_customers"](
            spark, sf_dir
        ).collect()
    }
    assert got == expect
