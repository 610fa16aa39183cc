"""Semantic gates for §2.BX (dependence audits).

Oracle parity hash-checks every key; these pin the math against a
direct Python recompute (per-customer metrics → ANSI ntile deciles →
dense 10×10 grid):

1. bx1: observed counts, margins, and dev = N·obs − r·c per cell;
   Σ dev = 0 per row and per column (an exact identity).
2. bx2: chi2_milli equals the truncated-term recompute and sits
   within 0.1 of 1000·χ²_exact (≤100 cells × <1 milli loss); the
   verdict matches the cleared compare.
3. bx3: modal and diagonal shares recompose from the grid.
4. bx4: lift_bp is the exact truncation, and the obs-weighted lift
   sum equals 10⁴·(χ² + N) within truncation loss (the χ² bridge
   identity Σ obs²·N/(r·c) = χ² + N).
5. The ANSI-ntile Python model matches Spark's published deciles
   (hypothesis over random census sizes, pure-Python closed form).
"""

from __future__ import annotations

from fractions import Fraction

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from recommendersystems_bigdata_spark import registry

registry.load_all()


def _ntile(vals, k=10):
    """ANSI NTILE bucket per sorted position (1-based ranks)."""
    n = len(vals)
    q, r = divmod(n, k)
    out = {}
    pos = 0
    for b in range(1, k + 1):
        size = q + 1 if b <= r else q
        for _ in range(size):
            out[vals[pos]] = b
            pos += 1
    return out


def _grid_py(sf_dir):
    rows = duckdb.sql(
        f"""
        SELECT o_custkey,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT),
               CAST(count(*) AS BIGINT)
        FROM '{sf_dir}/orders.parquet' GROUP BY 1
        """
    ).fetchall()
    cust = [(int(c), int(s), int(n)) for c, s, n in rows]
    by_spend = _ntile([c for c, _, _ in sorted(cust, key=lambda t: (t[1], t[0]))])
    by_orders = _ntile([c for c, _, _ in sorted(cust, key=lambda t: (t[2], t[0]))])
    grid = {(i, j): 0 for i in range(1, 11) for j in range(1, 11)}
    for c, _, _ in cust:
        grid[(by_spend[c], by_orders[c])] += 1
    return grid, len(cust)


def test_grid_and_margin_identities(spark, sf_dir):
    grid, n = _grid_py(sf_dir)
    rt = {i: sum(grid[(i, j)] for j in range(1, 11)) for i in range(1, 11)}
    ct = {j: sum(grid[(i, j)] for i in range(1, 11)) for j in range(1, 11)}
    rows = registry.QUERIES["q_dependence_grid"](spark, sf_dir).collect()
    assert len(rows) == 100
    for r in rows:
        key = (r["spend_d"], r["orders_d"])
        assert r["obs"] == grid[key]
        assert (r["row_tot"], r["col_tot"]) == (rt[key[0]], ct[key[1]])
        assert r["dev"] == n * grid[key] - rt[key[0]] * ct[key[1]]
    # dev sums to zero along every row and column (margins are exact)
    for i in range(1, 11):
        assert sum(r["dev"] for r in rows if r["spend_d"] == i) == 0
        assert sum(r["dev"] for r in rows if r["orders_d"] == i) == 0


def test_chi2_spelling_and_bound(spark, sf_dir):
    grid, n = _grid_py(sf_dir)
    rt = {i: sum(grid[(i, j)] for j in range(1, 11)) for i in range(1, 11)}
    ct = {j: sum(grid[(i, j)] for i in range(1, 11)) for j in range(1, 11)}
    spelled = exact = 0
    for (i, j), obs in grid.items():
        dev = n * obs - rt[i] * ct[j]
        spelled += (1000 * dev * dev) // (n * rt[i] * ct[j])
        exact += Fraction(1000 * dev * dev, n * rt[i] * ct[j])
    (row,) = registry.QUERIES["q_dependence_chi2"](spark, sf_dir).collect()
    assert row["n_customers"] == n
    assert row["cells"] == 100
    assert row["chi2_milli"] == spelled
    assert 0 <= exact - spelled < 100  # ≤100 truncations of < 1 milli
    assert row["dof"] == 81
    assert row["verdict"] == (
        "dependent" if spelled > 103_010 else "independent"
    )


def test_tiny_census_derives_dof_and_nulls_verdict(spark, tmp_path):
    """N < 10 customers: ntile realizes fewer than 10 deciles per
    axis, so dof must be the REALIZED (rows−1)·(cols−1) — not the
    nominal 81 — and the 81-dof-calibrated verdict publishes NULL
    (the advisor's degenerate-input finding)."""
    rows = [(c, 1 + c, float(100 * (1 + c)) ) for c in range(4)]
    spark.createDataFrame(
        [(c, p) for c, _, p in rows] * 1,
        schema="o_custkey bigint, o_totalprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    (row,) = registry.QUERIES["q_dependence_chi2"](
        spark, str(tmp_path)
    ).collect()
    # 4 customers → 4 realized deciles per axis → dof = 3·3 = 9
    assert row["n_customers"] == 4
    assert row["dof"] == 9
    assert row["verdict"] is None


def test_row_profiles_recompose(spark, sf_dir):
    grid, _ = _grid_py(sf_dir)
    rt = {i: sum(grid[(i, j)] for j in range(1, 11)) for i in range(1, 11)}
    rows = registry.QUERIES["q_dependence_row_profiles"](
        spark, sf_dir
    ).collect()
    assert [r["spend_d"] for r in rows] == list(range(1, 11))
    for r in rows:
        i = r["spend_d"]
        top = sorted(
            ((grid[(i, j)], j) for j in range(1, 11)),
            key=lambda t: (-t[0], t[1]),
        )[0]
        assert (r["modal_orders_d"], r["modal_obs"]) == (top[1], top[0])
        assert r["row_tot"] == rt[i]
        assert r["modal_share_bp"] == (10_000 * top[0]) // rt[i]
        assert r["diagonal_share_bp"] == (10_000 * grid[(i, i)]) // rt[i]


def test_lift_map_mixture_identity(spark, sf_dir):
    grid, n = _grid_py(sf_dir)
    rt = {i: sum(grid[(i, j)] for j in range(1, 11)) for i in range(1, 11)}
    ct = {j: sum(grid[(i, j)] for i in range(1, 11)) for j in range(1, 11)}
    rows = registry.QUERIES["q_dependence_lift_map"](spark, sf_dir).collect()
    wsum = 0
    for r in rows:
        i, j = r["spend_d"], r["orders_d"]
        want = (10_000 * n * grid[(i, j)]) // (rt[i] * ct[j])
        assert r["lift_bp"] == want
        wsum += r["obs"] * r["lift_bp"]
    # the χ² bridge identity: Σ obs²·N/(r·c) = χ² + N exactly, so the
    # exact obs-weighted lift sum is 10⁴·(χ² + N); the truncated
    # spelling loses < 1 bp per unit of obs weight (≤ N total)
    chi2 = sum(
        Fraction((n * grid[(i, j)] - rt[i] * ct[j]) ** 2,
                 n * rt[i] * ct[j])
        for (i, j) in grid
    )
    exact_sum = 10_000 * (chi2 + n)
    assert 0 <= exact_sum - wsum <= n


@settings(max_examples=200, deadline=None)
@given(st.integers(10, 400))
def test_ansi_ntile_model_sizes(n):
    """The Python ntile model used above IS ANSI: first (n mod 10)
    buckets get one extra row, all buckets non-empty for n ≥ 10."""
    buckets = _ntile(list(range(n)))
    sizes = [0] * 11
    for b in buckets.values():
        sizes[b] += 1
    q, r = divmod(n, 10)
    assert sizes[1:] == [q + 1] * r + [q] * (10 - r)
    assert all(s > 0 for s in sizes[1:])