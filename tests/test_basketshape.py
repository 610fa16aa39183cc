"""Semantic gates for §2.BR (basket-shape censuses).

Oracle parity hash-checks every key; these pin the structure:

1. br1's census partitions the order population and conserves revenue
   against an independent per-order recomputation.
2. br2's breadth means are exact integer means of exact per-order
   distinct-brand counts, and breadth never exceeds size.
3. br3's bands partition br1's census and both share columns sum to
   ≤10000 with truncation slack < rows.
4. br4's position profile recomputes per line number.
"""

from __future__ import annotations

import duckdb

from recommendersystems_bigdata_spark import registry

registry.load_all()

_REV = (
    "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
    " * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))"
)


def _per_order(sf_dir):
    return {
        int(o): (int(n), int(rc))
        for o, n, rc in duckdb.sql(
            f"""
            SELECT l_orderkey, count(*),
                   sum(CAST({_REV} AS HUGEINT)) // 100
            FROM '{sf_dir}/lineitem.parquet' GROUP BY 1
            """
        ).fetchall()
    }


def test_size_census_partitions_and_conserves(spark, sf_dir):
    per = _per_order(sf_dir)
    census: dict[int, list[int]] = {}
    for n, rc in per.values():
        census.setdefault(n, []).append(rc)
    rows = registry.QUERIES["q_order_size_census"](spark, sf_dir).collect()
    assert {r["n_lines"]: r["orders"] for r in rows} == {
        k: len(v) for k, v in census.items()
    }
    assert sum(r["orders"] for r in rows) == len(per)
    for r in rows:
        revs = census[r["n_lines"]]
        assert r["rev_cents"] == sum(revs)
        assert r["aov_cents"] == sum(revs) // len(revs)
        assert r["order_share_bp"] == (10_000 * len(revs)) // len(per)


def test_breadth_bounded_by_size(spark, sf_dir):
    rows = registry.QUERIES["q_basket_breadth_profile"](
        spark, sf_dir
    ).collect()
    brands = {
        int(o): int(b)
        for o, b in duckdb.sql(
            f"""
            SELECT l.l_orderkey, count(DISTINCT p.p_brand)
            FROM '{sf_dir}/lineitem.parquet' l
            JOIN '{sf_dir}/part.parquet' p ON l.l_partkey = p.p_partkey
            GROUP BY 1
            """
        ).fetchall()
    }
    per = _per_order(sf_dir)
    for r in rows:
        members = [o for o, (n, _) in per.items() if n == r["n_lines"]]
        bt = sum(brands[o] for o in members)
        multi = sum(1 for o in members if brands[o] > 1)
        assert r["orders"] == len(members)
        assert r["brands_total"] == bt
        assert r["avg_brands_milli"] == (1000 * bt) // len(members)
        assert (r["multi_brand_orders"], r["multi_brand_share_bp"]) == (
            multi, (10_000 * multi) // len(members),
        )
        # breadth ≤ size: distinct brands can't exceed lines
        assert r["avg_brands_milli"] <= 1000 * r["n_lines"]


def test_size_value_mix_partitions(spark, sf_dir):
    per = _per_order(sf_dir)

    def band(n):
        return "1" if n == 1 else "2-3" if n <= 3 else "4-5" if n <= 5 else "6-7"

    census: dict[str, list[int]] = {}
    for n, rc in per.values():
        census.setdefault(band(n), []).append(rc)
    total_rev = sum(rc for _, rc in per.values())
    rows = registry.QUERIES["q_size_value_mix"](spark, sf_dir).collect()
    assert {r["size_band"] for r in rows} == set(census)
    assert sum(r["orders"] for r in rows) == len(per)
    assert sum(r["rev_cents"] for r in rows) == total_rev
    for r in rows:
        revs = census[r["size_band"]]
        assert r["rev_cents"] == sum(revs)
        assert r["order_share_bp"] == (10_000 * len(revs)) // len(per)
        assert r["rev_share_bp"] == (10_000 * sum(revs)) // total_rev
    for col in ("order_share_bp", "rev_share_bp"):
        s = sum(r[col] for r in rows)
        assert 10_000 - len(rows) < s <= 10_000


def test_line_position_recomputes(spark, sf_dir):
    raw = duckdb.sql(
        f"""
        SELECT l_linenumber, count(*),
               sum(CAST(floor(l_quantity + 0.5) AS BIGINT)),
               sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)),
               count(*) FILTER (WHERE l_returnflag = 'R')
        FROM '{sf_dir}/lineitem.parquet' GROUP BY 1
        """
    ).fetchall()
    by_pos = {int(p): tuple(map(int, rest)) for p, *rest in raw}
    rows = registry.QUERIES["q_line_position_profile"](
        spark, sf_dir
    ).collect()
    assert [r["l_linenumber"] for r in rows] == sorted(by_pos)
    for r in rows:
        n, qty, price_sum, rets = by_pos[r["l_linenumber"]]
        assert (r["lines"], r["qty_total"]) == (n, qty)
        assert r["avg_qty_milli"] == (1000 * qty) // n
        assert r["avg_price_cents"] == price_sum // n
        assert r["return_rate_bp"] == (10_000 * rets) // n
    # (no monotonicity invariant: this corpus assigns line numbers
    # randomly within an order rather than densely from 1 — br4 is a
    # census of the column as it exists; §2.AJ's contiguity audit
    # measures that property explicitly rather than assuming it)
