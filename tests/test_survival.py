"""Semantic gates for §2.BF (survival / time-to-reorder).

Oracle parity hash-checks every key (and the SQL text is shared between
engines), so these gates attack the MODEL, not the spelling: a pure-
Python rebuild of subjects → life table → actuarial recurrence from raw
parquet, pinning:

1. bf1 against the rebuild, plus the conservation identities — every
   subject exits exactly once (Σ events+censored == subjects) and the
   first month's at-risk count is the whole cohort.
2. bf2's curve against a Python fold of bf1's own hazards (the
   recurrence relation, made checkable), monotonicity, and the ppm
   bounds.
3. bf3's recomposition from bf2's published curve + subject totals.
4. bf4's per-segment partition (segment subjects sum to the cohort)
   and its 12-month survival against per-segment Python folds.
"""

from __future__ import annotations

import duckdb

from recommendersystems_bigdata_spark import registry

registry.load_all()


def _tdiv(a, b):
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _subjects_py(sf_dir):
    """(ck, segment, event, month) for every customer with an order."""
    return duckdb.sql(
        f"""
        WITH firsts AS (
          SELECT o_custkey AS ck, min(o_orderdate) AS t1
          FROM '{sf_dir}/orders.parquet' GROUP BY 1
        ),
        seconds AS (
          SELECT o.o_custkey AS ck, min(o.o_orderdate) AS t2
          FROM '{sf_dir}/orders.parquet' o
          JOIN firsts f ON o.o_custkey = f.ck AND o.o_orderdate > f.t1
          GROUP BY 1
        ),
        maxd AS (SELECT max(o_orderdate) AS dmax FROM '{sf_dir}/orders.parquet')
        SELECT f.ck, c.c_mktsegment,
               CASE WHEN s.t2 IS NOT NULL THEN 1 ELSE 0 END,
               (CASE WHEN s.t2 IS NOT NULL
                     THEN datediff('day', CAST(f.t1 AS DATE), CAST(s.t2 AS DATE))
                     ELSE datediff('day', CAST(f.t1 AS DATE), CAST(dmax AS DATE))
                END) // 30
        FROM firsts f
        LEFT JOIN seconds s ON s.ck = f.ck
        JOIN '{sf_dir}/customer.parquet' c ON c.c_custkey = f.ck
        CROSS JOIN maxd
        """
    ).fetchall()


def _life_table_py(subjects):
    """month → (n_at_risk, events, censored, hazard_bp), observed months."""
    ec = {}
    for _ck, _seg, ev, m in subjects:
        d, c = ec.get(m, (0, 0))
        ec[m] = (d + ev, c + (1 - ev))
    months = sorted(ec)
    out, remaining = {}, sum(d + c for d, c in ec.values())
    for m in months:
        d, c = ec[m]
        out[m] = (remaining, d, c, _tdiv(10000 * d, remaining))
        remaining -= d + c
    return out


def _km_py(lt):
    """month → s_ppm via the actuarial integer recurrence."""
    s, out = 1_000_000, {}
    for m in sorted(lt):
        h = lt[m][3]
        s = _tdiv(s * (10000 - h), 10000)
        out[m] = s
    return out


def test_life_table_matches_rebuild_and_conserves(spark, sf_dir):
    subjects = _subjects_py(sf_dir)
    lt = _life_table_py(subjects)
    rows = registry.QUERIES["q_survival_life_table"](spark, sf_dir).collect()
    assert [r["m"] for r in rows] == sorted(lt)
    for r in rows:
        n, d, c, h = lt[r["m"]]
        assert (r["n_at_risk"], r["events"], r["censored"], r["hazard_bp"]) == (
            n, d, c, h,
        )
    # conservation: every subject exits exactly once, and the first
    # month's risk set is the whole cohort
    assert sum(r["events"] + r["censored"] for r in rows) == len(subjects)
    assert rows[0]["n_at_risk"] == len(subjects)


def test_km_curve_is_the_recurrence(spark, sf_dir):
    lt = _life_table_py(_subjects_py(sf_dir))
    km = _km_py(lt)
    rows = registry.QUERIES["q_survival_km_curve"](spark, sf_dir).collect()
    assert [r["m"] for r in rows] == sorted(km)
    prev = 1_000_000
    for r in rows:
        assert r["s_ppm"] == km[r["m"]]
        assert 0 <= r["s_ppm"] <= prev  # monotone non-increasing from 10^6
        prev = r["s_ppm"]


def test_summary_recomposes_from_curve(spark, sf_dir):
    subjects = _subjects_py(sf_dir)
    curve = {
        r["m"]: r["s_ppm"]
        for r in registry.QUERIES["q_survival_km_curve"](
            spark, sf_dir
        ).collect()
    }
    [r] = registry.QUERIES["q_survival_summary"](spark, sf_dir).collect()
    n, events = len(subjects), sum(s[2] for s in subjects)
    assert r["n_subjects"] == n
    assert r["n_events"] == events
    assert r["event_rate_bp"] == _tdiv(10000 * events, n)
    crossing = [m for m, s in curve.items() if s <= 500_000]
    assert r["median_month"] == (min(crossing) if crossing else None)
    for horizon, col in ((6, "s6_ppm"), (12, "s12_ppm"), (24, "s24_ppm")):
        steps = [m for m in curve if m <= horizon]
        assert r[col] == (curve[max(steps)] if steps else 1_000_000)


def test_by_segment_partitions_and_folds(spark, sf_dir):
    subjects = _subjects_py(sf_dir)
    rows = registry.QUERIES["q_survival_by_segment"](spark, sf_dir).collect()
    assert sum(r["n_subjects"] for r in rows) == len(subjects)
    segs = {s[1] for s in subjects}
    assert {r["segment"] for r in rows} == segs
    for r in rows:
        sub = [s for s in subjects if s[1] == r["segment"]]
        events = sum(s[2] for s in sub)
        assert r["n_events"] == events
        assert r["event_rate_bp"] == _tdiv(10000 * events, len(sub))
        km = _km_py(_life_table_py(sub))
        steps = [m for m in km if m <= 12]
        assert r["s12_ppm"] == (km[max(steps)] if steps else 1_000_000)
