"""Semantic gates for §2.AM (forecast backtesting).

Oracle parity hash-checks every key; these pin the backtest semantics
against an independent Python reference built from the raw parquet:

1. am1's seasonal-naive forecast IS the month-12-earlier actual on the
   zero-filled spine, and the burn-in excludes exactly the first 12
   spine months per segment.
2. am2's MA-3 forecast equals the truncated integer mean of the three
   preceding filled months.
3. am3's MAE/bias/wMAPE reproduce a Python pass over the common
   evaluation window, for both models.
4. am4's tracking signal is the running Σerr/Σ|err| in bp, bounded by
   ±10000, and its cumulative columns replay am1's errors.
5. am5's winner/margin agree with am3's per-model MAE.
"""

from __future__ import annotations

from collections import defaultdict

import duckdb

from recommendersystems_bigdata_spark import registry

registry.load_all()


def _filled_py(sf_dir):
    """Python reference: zero-filled monthly segment revenue cents."""
    rows = duckdb.sql(
        f"""
        SELECT c.c_mktsegment,
               CAST(year(o.o_orderdate) AS BIGINT) * 12
                 + CAST(month(o.o_orderdate) AS BIGINT) - 1,
               sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
        FROM '{sf_dir}/orders.parquet' o
        JOIN '{sf_dir}/customer.parquet' c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
        """
    ).fetchall()
    by_seg: dict[str, dict[int, int]] = defaultdict(dict)
    for seg, yidx, cents in rows:
        by_seg[seg][yidx] = cents
    filled: dict[str, list[tuple[int, int]]] = {}
    for seg, months in by_seg.items():
        lo, hi = min(months), max(months)
        filled[seg] = [(i, months.get(i, 0)) for i in range(lo, hi + 1)]
    return filled


def _ym(i: int) -> str:
    return f"{i // 12:04d}-{i % 12 + 1:02d}"


def _tdiv(a: int, b: int) -> int:
    """Toward-zero integer division (Spark div / DuckDB //)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _backtest_py(sf_dir):
    """(seg, yidx) -> (actual, fc_snaive, fc_ma3) on the common window."""
    out = {}
    for seg, series in _filled_py(sf_dir).items():
        vals = [c for _, c in series]
        for j in range(12, len(series)):
            yidx = series[j][0]
            ma3 = sum(vals[j - 3 : j]) // 3
            out[(seg, yidx)] = (vals[j], vals[j - 12], ma3)
    return out


def test_snaive_is_lag12_on_filled_spine(spark, sf_dir):
    expect = {
        (seg, _ym(yidx)): (a, fs, a - fs, abs(a - fs))
        for (seg, yidx), (a, fs, _m) in _backtest_py(sf_dir).items()
    }
    got = {
        (r["seg"], r["ym"]): (
            r["actual_cents"],
            r["forecast_cents"],
            r["err_cents"],
            r["abs_err_cents"],
        )
        for r in registry.QUERIES["q_fc_snaive_backtest"](
            spark, sf_dir
        ).collect()
    }
    assert got == expect


def test_ma3_is_truncated_trailing_mean(spark, sf_dir):
    filled = _filled_py(sf_dir)
    expect = {}
    for seg, series in filled.items():
        vals = [c for _, c in series]
        for j in range(3, len(series)):
            yidx = series[j][0]
            fc = sum(vals[j - 3 : j]) // 3
            expect[(seg, _ym(yidx))] = (vals[j], fc)
    got = {
        (r["seg"], r["ym"]): (r["actual_cents"], r["forecast_cents"])
        for r in registry.QUERIES["q_fc_ma3_backtest"](spark, sf_dir).collect()
    }
    assert got == expect


def test_accuracy_summary_matches_python(spark, sf_dir):
    per_seg: dict[tuple[str, str], list[tuple[int, int]]] = defaultdict(list)
    for (seg, _yidx), (a, fs, fm) in _backtest_py(sf_dir).items():
        per_seg[(seg, "snaive")].append((a, a - fs))
        per_seg[(seg, "ma3")].append((a, a - fm))
    expect = {}
    for (seg, model), pairs in per_seg.items():
        n = len(pairs)
        sabs = sum(abs(e) for _, e in pairs)
        serr = sum(e for _, e in pairs)
        sact = sum(a for a, _ in pairs)
        expect[(seg, model)] = (
            n,
            _tdiv(sabs, n),
            _tdiv(serr, n),
            _tdiv(10000 * sabs, sact),
        )
    got = {
        (r["seg"], r["model"]): (
            r["n_months"],
            r["mae_cents"],
            r["bias_cents"],
            r["wmape_bp"],
        )
        for r in registry.QUERIES["q_fc_accuracy_summary"](
            spark, sf_dir
        ).collect()
    }
    assert got == expect


def test_tracking_signal_replays_errors_and_is_bounded(spark, sf_dir):
    errs: dict[str, list[tuple[int, int]]] = defaultdict(list)
    for (seg, yidx), (a, fs, _m) in _backtest_py(sf_dir).items():
        errs[seg].append((yidx, a - fs))
    expect = {}
    for seg, pairs in errs.items():
        pairs.sort()
        cum = cab = 0
        for yidx, e in pairs:
            cum += e
            cab += abs(e)
            sig = _tdiv(10000 * cum, cab) if cab else None
            expect[(seg, _ym(yidx))] = (cum, cab, sig)
    got = {}
    for r in registry.QUERIES["q_fc_tracking_signal"](spark, sf_dir).collect():
        got[(r["seg"], r["ym"])] = (
            r["cum_err_cents"],
            r["cum_abs_err_cents"],
            r["signal_bp"],
        )
        if r["signal_bp"] is not None:
            assert abs(r["signal_bp"]) <= 10000
    assert got == expect


def test_model_winner_consistent_with_summary(spark, sf_dir):
    mae = {
        (r["seg"], r["model"]): r["mae_cents"]
        for r in registry.QUERIES["q_fc_accuracy_summary"](
            spark, sf_dir
        ).collect()
    }
    for r in registry.QUERIES["q_fc_model_winner"](spark, sf_dir).collect():
        seg = r["seg"]
        assert r["mae_snaive_cents"] == mae[(seg, "snaive")]
        assert r["mae_ma3_cents"] == mae[(seg, "ma3")]
        want = "ma3" if r["mae_ma3_cents"] < r["mae_snaive_cents"] else "snaive"
        assert r["winner"] == want
        worse = max(r["mae_snaive_cents"], r["mae_ma3_cents"])
        diff = abs(r["mae_snaive_cents"] - r["mae_ma3_cents"])
        assert r["margin_bp"] == (_tdiv(10000 * diff, worse) if worse else None)
