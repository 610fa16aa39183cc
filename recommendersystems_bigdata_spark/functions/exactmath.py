"""Exact fixed-point aggregate builders (no @query registrations — safe
to import from any operator module without touching registration order).

Why this exists: ``round(sum(double), 2)`` is layout-sensitive — the
double partial-sum order differs between engines and between Spark
partition layouts, and when the exact value sits near a rounding
boundary the rounded digit flips (measured: the flagship's sf0.01 R/F
disc-price group is 0.0001 from its boundary, inside the worst-case
summation error of a 15k-row group). And even with identical exact
operands, ``round()`` itself diverges between Spark (shortest-decimal
HALF_UP) and DuckDB (double-space) on exact decimal ties. See SCALE.md
"Deep randomized fuzz sweeps" for the full adjudication.

The discount-revenue measure ``price · (1 − discount)`` is an exact
4-decimal quantity (2-dp price × 2-dp discount), so its sum can run in
integer 1e-4 units (associative → layout-invariant) with the 2-dp
half-up rounding done in INTEGER arithmetic before the one exact float
divide. Both builders produce the same double the naive spelling does
today — they just produce it on every layout and engine.

Rounding at the value's own scale (e.g. ``round(sum(acctbal), 2)`` over
2-dp values) is safe and does NOT need this treatment: the exact sum is
never closer than half a cent to a boundary, orders of magnitude beyond
any float error.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _rev_e4_term(price: str, disc: str, cond: str | None) -> str:
    # floor(x*100 + 0.5), not round(): exact for non-negative 2-dp values
    # (the double error of x*100 is far below 0.5), identical in both
    # engines on the identical stored double, and it stays in plain
    # double math inside codegen — Spark's round() lowers to a per-row
    # BigDecimal HALF_UP, which measured 2× on the flagship's scan stage.
    term = (
        f"CAST(floor({price} * 100 + 0.5) AS BIGINT)"
        f" * CAST(100 - floor({disc} * 100 + 0.5) AS BIGINT)"
    )
    if cond is not None:
        term = f"CASE WHEN {cond} THEN {term} ELSE 0 END"
    return term


def revenue_sum_col(
    price: str = "l_extendedprice",
    disc: str = "l_discount",
    cond: str | None = None,
) -> Column:
    """Spark aggregate Column: half-up-2dp of the exact discount-revenue
    sum, as a double. Integer `div` (never a float floor) so the e4 sum
    may exceed double's exact-integer range without losing the digit.
    (The divisor is CAST to DOUBLE: a bare `100.0` literal is DECIMAL in
    Spark SQL text, which would make the whole expression DecimalType.)"""
    return F.expr(
        f"((sum({_rev_e4_term(price, disc, cond)}) + 50) div 100) / CAST(100 AS DOUBLE)"
    )


def revenue_sum_sql(
    price: str = "l_extendedprice",
    disc: str = "l_discount",
    cond: str | None = None,
) -> str:
    """DuckDB spelling of :func:`revenue_sum_col`. DuckDB's `//` on
    INTEGER operands truncates toward zero exactly like Spark's `div`
    (measured: (-7)//2 = -3 — its "floor division" doc applies to
    floats), so the two spellings agree for any sign; the +50 half-up
    additionally assumes non-negative sums, which revenue satisfies."""
    return f"((sum({_rev_e4_term(price, disc, cond)}) + 50) // 100) / 100.0"
