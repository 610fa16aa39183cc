"""Semantic gates for §2.BQ (revenue-retention bridges / NRR).

Oracle parity hash-checks every key; these pin the accounting:

1. bq1's five legs CLOSE BY IDENTITY per year pair:
   rev1 = rev0 − churned − contraction + expansion + new — asserted
   on the real data AND on a constructed census with known legs.
2. bq2 recomposes from bq1's published legs.
3. bq3 equals an independent Python top-10 with the key tie-break.
4. bq4's per-segment legs partition the latest pair's base customers.
"""

from __future__ import annotations

import duckdb

from recommendersystems_bigdata_spark import registry

registry.load_all()

_CENTS = "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"


def _cy(sf_dir):
    rows = duckdb.sql(
        f"""
        SELECT o_custkey, year(o_orderdate), sum({_CENTS})
        FROM '{sf_dir}/orders.parquet' GROUP BY 1, 2
        """
    ).fetchall()
    out: dict[int, dict[int, int]] = {}
    for c, y, r in rows:
        out.setdefault(int(y), {})[int(c)] = int(r)
    return out


def _legs_py(cy, y0):
    r0, r1 = cy[y0], cy.get(y0 + 1, {})
    rev0 = sum(r0.values())
    churned = sum(v for c, v in r0.items() if c not in r1)
    contraction = sum(
        max(v - r1[c], 0) for c, v in r0.items() if c in r1
    )
    expansion = sum(
        max(r1[c] - v, 0) for c, v in r0.items() if c in r1
    )
    new = sum(v for c, v in r1.items() if c not in r0)
    rev1 = sum(r1.values())
    return rev0, churned, contraction, expansion, new, rev1


def test_bridge_closes_by_identity(spark, sf_dir):
    cy = _cy(sf_dir)
    years = sorted(cy)
    rows = registry.QUERIES["q_revenue_retention_bridge"](
        spark, sf_dir
    ).collect()
    assert [r["y0"] for r in rows] == years[:-1]
    for r in rows:
        rev0, ch, co, ex, new, rev1 = _legs_py(cy, r["y0"])
        assert (
            r["rev0_cents"], r["churned_cents"], r["contraction_cents"],
            r["expansion_cents"], r["new_cents"], r["rev1_cents"],
        ) == (rev0, ch, co, ex, new, rev1)
        # the conservation identity
        assert r["rev1_cents"] == (
            r["rev0_cents"] - r["churned_cents"] - r["contraction_cents"]
            + r["expansion_cents"] + r["new_cents"]
        )


def test_identity_on_constructed_census():
    """A hand-built census with every leg exercised: one churner, one
    contractor, one expander, one flat, one newcomer."""
    cy = {
        1: {1: 100, 2: 200, 3: 300, 4: 400},
        2: {2: 150, 3: 350, 4: 400, 5: 500},  # 1 churns, 5 is new
    }
    rev0, ch, co, ex, new, rev1 = _legs_py(cy, 1)
    assert (rev0, ch, co, ex, new, rev1) == (1000, 100, 50, 50, 500, 1400)
    assert rev1 == rev0 - ch - co + ex + new


def test_nrr_grr_recompose_from_bridge(spark, sf_dir):
    bridge = {
        r["y0"]: r
        for r in registry.QUERIES["q_revenue_retention_bridge"](
            spark, sf_dir
        ).collect()
    }
    for r in registry.QUERIES["q_nrr_grr_by_year"](spark, sf_dir).collect():
        b = bridge[r["y0"]]
        surv = b["rev0_cents"] - b["churned_cents"] - b["contraction_cents"]
        assert r["grr_bp"] == (10_000 * surv) // b["rev0_cents"]
        assert r["nrr_bp"] == (
            10_000 * (surv + b["expansion_cents"])
        ) // b["rev0_cents"]


def test_expansion_topk_deterministic(spark, sf_dir):
    cy = _cy(sf_dir)
    y1 = max(cy)
    r0, r1 = cy[y1 - 1], cy[y1]
    cand = [
        (c, r0[c], r1[c], r1[c] - r0[c])
        for c in r0
        if c in r1 and r1[c] > r0[c]
    ]
    cand.sort(key=lambda t: (-t[3], t[0]))
    rows = registry.QUERIES["q_expansion_accounts_topk"](
        spark, sf_dir
    ).collect()
    assert [
        (r["o_custkey"], r["rev0"], r["rev1"], r["delta_cents"])
        for r in rows
    ] == cand[:10]


def test_segment_mix_partitions_base(spark, sf_dir):
    cy = _cy(sf_dir)
    y1 = max(cy)
    base = cy[y1 - 1]
    seg_of = dict(
        duckdb.sql(
            f"SELECT c_custkey, c_mktsegment FROM '{sf_dir}/customer.parquet'"
        ).fetchall()
    )
    rows = registry.QUERIES["q_retention_mix_by_segment"](
        spark, sf_dir
    ).collect()
    assert sum(r["retained"] + r["churned"] for r in rows) == len(base)
    for r in rows:
        custs = [c for c in base if seg_of[c] == r["segment"]]
        retained = [c for c in custs if c in cy[y1]]
        assert r["retained"] == len(retained)
        assert r["churned"] == len(custs) - len(retained)
        assert r["retention_bp"] == (10_000 * len(retained)) // len(custs)
        rev0 = sum(base[c] for c in custs)
        kept = sum(min(base[c], cy[y1][c]) for c in retained)
        exp = sum(max(cy[y1][c] - base[c], 0) for c in retained)
        assert r["nrr_bp"] == (10_000 * (kept + exp)) // rev0
