"""Semantic gates for §2.BA (mix standardization).

Oracle parity hash-checks every key; these rebuild the censuses from
raw parquet in Python, pinning:

1. ba1's weights and the calibration identity: the weighted census
   reproduces 1000·N within the truncation envelope (< N milli-units,
   one sub-milli truncation per segment row).
2. ba2's exact milli arithmetic.
3. ba3 against a per-cell Python rebuild, plus crude-rate consistency
   and the matched-weight renormalization over present cells.
4. ba4 against Python, plus the Oaxaca closure against the RATIONAL
   ΔAOV within a numerically derived truncation envelope (the
   docstring's honesty claim, made checkable).
"""

from __future__ import annotations

from collections import defaultdict
from fractions import Fraction

import duckdb

from recommendersystems_bigdata_spark import registry

registry.load_all()


def _tdiv(a, b):
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _seg_py(sf_dir, years=None):
    cond = (
        ""
        if years is None
        else f"WHERE year(o.o_orderdate) IN ({years[0]}, {years[1]})"
    )
    rows = duckdb.sql(
        f"""
        SELECT c.c_mktsegment, year(o.o_orderdate),
               CAST(count(*) AS BIGINT),
               CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT)
        FROM '{sf_dir}/orders.parquet' o
        JOIN '{sf_dir}/customer.parquet' c ON o.o_custkey = c.c_custkey
        {cond}
        GROUP BY 1, 2
        """
    ).fetchall()
    return rows


def test_weights_calibrate_within_envelope(spark, sf_dir):
    per_seg = defaultdict(lambda: [0, 0])
    for seg, _y, n, rev in _seg_py(sf_dir):
        per_seg[seg][0] += n
        per_seg[seg][1] += rev
    n_total = sum(v[0] for v in per_seg.values())
    s = len(per_seg)
    weighted_sum = 0
    for r in registry.QUERIES["q_segment_mix_weights"](
        spark, sf_dir
    ).collect():
        n = per_seg[r["segment"]][0]
        assert r["n_orders"] == n
        assert r["obs_share_bp"] == (10000 * n) // n_total
        assert r["ref_share_bp"] == 10000 // s
        assert r["weight_milli"] == (1000 * n_total) // (s * n)
        weighted_sum += n * r["weight_milli"]
    # calibration: Σ n_s·w_s == 1000·N up to one sub-milli truncation
    # per segment row, each scaled by at most n_s
    assert 0 <= 1000 * n_total - weighted_sum < n_total


def test_mix_adjusted_aov_exact(spark, sf_dir):
    per_seg = defaultdict(lambda: [0, 0])
    for seg, _y, n, rev in _seg_py(sf_dir):
        per_seg[seg][0] += n
        per_seg[seg][1] += rev
    n_total = sum(v[0] for v in per_seg.values())
    t = sum(v[1] for v in per_seg.values())
    s = len(per_seg)
    sum_aov = sum((1000 * rev) // n for n, rev in per_seg.values())
    [r] = registry.QUERIES["q_mix_adjusted_aov"](spark, sf_dir).collect()
    assert r["n_orders"] == n_total
    assert r["total_cents"] == t
    assert r["raw_aov_milli"] == (1000 * t) // n_total
    assert r["mix_adjusted_aov_milli"] == sum_aov // s
    assert r["mix_effect_milli"] == (1000 * t) // n_total - sum_aov // s


def _cells_py(sf_dir):
    return duckdb.sql(
        f"""
        SELECT n.n_name, c.c_mktsegment,
               CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
        JOIN '{sf_dir}/customer.parquet' c ON o.o_custkey = c.c_custkey
        JOIN '{sf_dir}/nation.parquet' n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2
        """
    ).fetchall()


def test_standardized_rates_match_python(spark, sf_dir):
    cells = _cells_py(sf_dir)
    seg_lines = defaultdict(int)
    for _nat, seg, n, _ret in cells:
        seg_lines[seg] += n
    by_nation = defaultdict(list)
    for nat, seg, n, ret in cells:
        by_nation[nat].append((seg, n, ret))
    for r in registry.QUERIES["q_standardized_return_rate"](
        spark, sf_dir
    ).collect():
        rows = by_nation[r["nation"]]
        n_lines = sum(n for _s, n, _r in rows)
        n_ret = sum(ret for _s, _n, ret in rows)
        assert r["n_lines"] == n_lines
        assert r["crude_rate_bp"] == (10000 * n_ret) // n_lines
        wsum = sum(
            ((10000 * ret) // n) * seg_lines[seg] for seg, n, ret in rows
        )
        wtot = sum(seg_lines[seg] for seg, _n, _r in rows)
        assert r["std_rate_bp"] == wsum // wtot
        assert r["composition_gap_bp"] == wsum // wtot - r["crude_rate_bp"]


def test_oaxaca_decomposition_and_closure(spark, sf_dir):
    rows = _seg_py(sf_dir, years=(1996, 1997))
    seg0, seg1 = defaultdict(lambda: [0, 0]), defaultdict(lambda: [0, 0])
    for seg, y, n, rev in rows:
        d = seg0 if y == 1996 else seg1
        d[seg][0] += n
        d[seg][1] += rev
    nn0 = sum(v[0] for v in seg0.values())
    nn1 = sum(v[0] for v in seg1.values())
    got = {
        r["segment"]: r
        for r in registry.QUERIES["q_aov_mix_decomposition"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(seg0) | set(seg1)
    contrib_sum = 0
    envelope = 0
    for seg, r in got.items():
        n0, rev0 = seg0[seg]
        n1, rev1 = seg1[seg]
        s0 = (10000 * n0) // nn0
        s1 = (10000 * n1) // nn1
        a0 = (1000 * rev0) // n0
        a1 = (1000 * rev1) // n1
        assert (r["share0_bp"], r["share1_bp"]) == (s0, s1)
        assert (r["aov0_milli"], r["aov1_milli"]) == (a0, a1)
        # signed terms truncate TOWARD ZERO in both engines (div / //)
        assert r["within_contrib_milli"] == _tdiv(s0 * (a1 - a0), 10000)
        assert r["mix_contrib_milli"] == _tdiv((s1 - s0) * a1, 10000)
        contrib_sum += r["within_contrib_milli"] + r["mix_contrib_milli"]
        # truncation envelope per segment: share truncations scale by the
        # milli terms /1e4, aov truncations by the shares /1e4, plus the
        # two final div-by-1e4 truncations
        envelope += (abs(a1 - a0) + a1) // 10000 + (s0 + abs(s1 - s0)) // 10000 + 4
    # rational ΔAOV, in milli-cents
    t0 = sum(v[1] for v in seg0.values())
    t1 = sum(v[1] for v in seg1.values())
    delta = Fraction(1000 * t1, nn1) - Fraction(1000 * t0, nn0)
    assert abs(Fraction(contrib_sum) - delta) <= envelope
