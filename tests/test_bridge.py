"""Semantic gates for §2.AV (revenue bridge / price-volume-mix).

Oracle parity hash-checks every key; these rebuild the decomposition
from raw parquet in Python, pinning:

1. av1's exact closure — price + volume + residual == delta per brand —
   and the matched census against a direct DuckDB construction.
2. av2's partition of each brand's part census into new/lost/common
   (counts AND revenue legs).
3. av3's waterfall: base == raw 1996 revenue, terminal == raw 1997
   revenue, step-6 running == step-7 amount (no leaked cents), and the
   component legs equal av1/av2 aggregates.
4. av4's shares against a pure-Python truncated-bp recomputation with
   label consistency.
"""

from __future__ import annotations

import duckdb

from recommendersystems_bigdata_spark import registry

registry.load_all()

_CENTS = "CAST(floor({col} * 100 + 0.5) AS BIGINT)"


def _py_census(sf_dir):
    """{(partkey, year): (rev_cents, qty)} for 1996/1997, plus brand map."""
    rows = duckdb.sql(
        f"""
        SELECT l_partkey, year(CAST(l_shipdate AS TIMESTAMP)),
               CAST(sum({_CENTS.format(col="l_extendedprice")}) AS BIGINT),
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
        FROM '{sf_dir}/lineitem.parquet'
        WHERE year(CAST(l_shipdate AS TIMESTAMP)) IN (1996, 1997)
        GROUP BY 1, 2
        """
    ).fetchall()
    brand = dict(
        duckdb.sql(
            f"SELECT p_partkey, p_brand FROM '{sf_dir}/part.parquet'"
        ).fetchall()
    )
    census = {(p, y): (r, q) for p, y, r, q in rows}
    return census, brand


def _tdiv(a, b):
    if b == 0:
        return None
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _effects_py(census):
    """{part: (rev0, rev1, qty0, qty1, price, vol, resid)} on matched parts."""
    parts0 = {p for (p, y) in census if y == 1996}
    parts1 = {p for (p, y) in census if y == 1997}
    out = {}
    for p in parts0 & parts1:
        rev0, qty0 = census[(p, 1996)]
        rev1, qty1 = census[(p, 1997)]
        p0 = (rev0 * 10000) // qty0  # positive, so // == div
        price = rev1 - _tdiv(qty1 * p0, 10000)
        vol = _tdiv((qty1 - qty0) * p0, 10000)
        resid = (rev1 - rev0) - price - vol
        out[p] = (rev0, rev1, qty0, qty1, price, vol, resid)
    return out


def test_pvm_brand_closure_and_census(spark, sf_dir):
    census, brand = _py_census(sf_dir)
    eff = _effects_py(census)
    expect = {}
    for p, (rev0, rev1, _q0, _q1, price, vol, resid) in eff.items():
        b = brand[p]
        agg = expect.setdefault(b, [0, 0, 0, 0, 0, 0, 0])
        agg[0] += 1
        agg[1] += rev0
        agg[2] += rev1
        agg[3] += rev1 - rev0
        agg[4] += price
        agg[5] += vol
        agg[6] += resid
    got = {}
    for r in registry.QUERIES["q_bridge_pvm_brand"](spark, sf_dir).collect():
        got[r["p_brand"]] = [
            r["n_common_parts"],
            r["rev0_cents"],
            r["rev1_cents"],
            r["delta_cents"],
            r["price_effect_cents"],
            r["volume_effect_cents"],
            r["mix_residual_cents"],
        ]
        # exact closure: the three effects sum to the delta
        assert (
            r["price_effect_cents"]
            + r["volume_effect_cents"]
            + r["mix_residual_cents"]
            == r["delta_cents"]
        )
    assert got == {k: list(v) for k, v in expect.items()}


def test_new_lost_partitions_brand_census(spark, sf_dir):
    census, brand = _py_census(sf_dir)
    parts0 = {p for (p, y) in census if y == 1996}
    parts1 = {p for (p, y) in census if y == 1997}
    expect = {}
    for p in parts0 | parts1:
        b = brand[p]
        agg = expect.setdefault(b, [0, 0, 0, 0, 0])
        if p in parts1 and p not in parts0:
            agg[0] += 1
            agg[1] += census[(p, 1997)][0]
        elif p in parts0 and p not in parts1:
            agg[2] += 1
            agg[3] += census[(p, 1996)][0]
        else:
            agg[4] += 1
    got = {}
    for r in registry.QUERIES["q_bridge_new_lost"](spark, sf_dir).collect():
        got[r["p_brand"]] = [
            r["new_parts"],
            r["new_rev_cents"],
            r["lost_parts"],
            r["lost_rev_cents"],
            r["common_parts"],
        ]
        # the three statuses partition the brand's traded-part census
        traded = {
            p for p in (parts0 | parts1) if brand[p] == r["p_brand"]
        }
        assert r["new_parts"] + r["lost_parts"] + r["common_parts"] == len(
            traded
        )
    assert got == {k: list(v) for k, v in expect.items()}


def test_waterfall_closure_to_raw_revenue(spark, sf_dir):
    census, _brand = _py_census(sf_dir)
    rev0_total = sum(r for (p, y), (r, q) in census.items() if y == 1996)
    rev1_total = sum(r for (p, y), (r, q) in census.items() if y == 1997)
    rows = {
        r["step"]: r
        for r in registry.QUERIES["q_bridge_waterfall"](
            spark, sf_dir
        ).collect()
    }
    assert sorted(rows) == [1, 2, 3, 4, 5, 6, 7]
    assert rows[1]["component"] == "base_1996"
    assert rows[1]["amount_cents"] == rev0_total
    assert rows[7]["amount_cents"] == rev1_total
    # no leaked cents: the running total after the last leg IS the 1997
    # revenue, and each running step accumulates exactly
    assert rows[6]["running_cents"] == rev1_total
    run = 0
    for step in (1, 2, 3, 4, 5, 6):
        run += rows[step]["amount_cents"]
        assert rows[step]["running_cents"] == run
    # the matched legs equal the av1 effects summed over brands
    eff = _effects_py(census)
    assert rows[2]["amount_cents"] == sum(v[5] for v in eff.values())
    assert rows[3]["amount_cents"] == sum(v[4] for v in eff.values())
    assert rows[4]["amount_cents"] == sum(v[6] for v in eff.values())


def test_mix_shift_matches_python(spark, sf_dir):
    census, brand = _py_census(sf_dir)
    qty = {}
    for (p, y), (_r, q) in census.items():
        agg = qty.setdefault(brand[p], [0, 0])
        agg[0 if y == 1996 else 1] += q
    t0 = sum(v[0] for v in qty.values())
    t1 = sum(v[1] for v in qty.values())
    for r in registry.QUERIES["q_bridge_mix_shift"](spark, sf_dir).collect():
        q0, q1 = qty[r["p_brand"]]
        s0, s1 = (10000 * q0) // t0, (10000 * q1) // t1
        assert (r["qty0"], r["qty1"]) == (q0, q1)
        assert (r["share0_bp"], r["share1_bp"]) == (s0, s1)
        assert r["share_delta_bp"] == s1 - s0
        want = "gainer" if s1 > s0 else "loser" if s1 < s0 else "flat"
        assert r["direction"] == want
