"""Survival analysis / time-to-reorder suite (SURVEY.md §2.BF, round 9).

The censoring-aware "how long until the customer comes back" family —
the discrete-time actuarial method over the orders fact. Subject =
every customer with a first order; event = the SECOND order; subjects
with no second order are RIGHT-CENSORED at the corpus's last order
date (the standard convention — ignoring censoring would bias
"survival" low for recently acquired customers). Time is measured in
30-day months from the first order.

- bf1: the life table — per month, subjects at risk, events,
  censorings, and the discrete hazard in truncated bp. ``n_at_risk``
  is the suffix sum of exits (every subject exits exactly once), a
  window over the ≤~85-row month census, never over customers.
- bf2: the Kaplan-Meier-style survival CURVE via an INTEGER
  RECURRENCE, not a float product: ``S_m = (S_{m-1}·(10⁴−h_m)) div
  10⁴`` in parts-per-million. The recurrence is a strict left fold
  over the month-ordered life table; the DuckDB oracle spells it as
  a recursive CTE (WITH RECURSIVE), the Spark side as the
  ``aggregate`` higher-order function over the ``array_sort``-packed
  census (bit-identical step algebra — one truncating integer step
  per observed month in both engines; see the lowering note below).
  This is the actuarial truncation convention — each step truncates
  once in integer space, so both engines produce the identical curve
  (a float ``exp(Σln)`` spelling would hang the hash on libm
  differences; adjudicated the same way as exactmath.py's rounding
  discipline).
- bf3: the summary — subjects, events, event rate, median survival
  month (first month the curve crosses 500 000 ppm) and the
  step-function survival at the 6/12/24-month horizons.
- bf4: the per-market-segment comparison — same recurrence keyed by
  segment (the recursive frontier is |segments| rows per iteration),
  with per-segment event rates and the 12-month survival.

Exactness: day counts and month buckets are exact integers; hazards
are truncating-bp divisions; the curve is the integer recurrence
above. Everything after the per-customer first/second-order pass runs
on the bounded month census (gap span ≤ the ~7-year corpus ⇒ ≤ ~85
months ⇒ recursion depth within Spark's default
``spark.sql.cteRecursionLevelLimit`` of 100; a longer-lived corpus
would raise that conf — documented, not binding here).

Spark-first shape, sized for 100 TB:
- ONE orders pass builds the first/second-order probe (round 11):
  ``array_sort(collect_set(o_orderdate))`` per customer — element 1
  is the first order date, element 2 the second DISTINCT date, i.e.
  exactly the old ``firsts``/``seconds`` pair without the orders⋈firsts
  self-join that re-shuffled the fact a second time (bounded
  per-customer state, the §2.V collect discipline; measured 3.7 s →
  1.25 s for bf2 at sf0.1). The 1-row corpus-max date attaches as a
  broadcast. The oracle keeps the join spelling (see Oracle note).
- The life table, hazards, recursion and horizon lookups all run on
  the ≤~85-row (×5 segments for bf4) census — iteration count is the
  TIME SPAN, not the data size, exactly like §2.Z's month spine.
- CRITICAL lowering detail, measured twice (SCALE.md §14; round 11):
  Spark's UnionLoop RE-EVALUATES the static side's plan every
  iteration, so a recursive CTE written directly over the
  fact-derived ``lt2`` costs (iterations × the whole fact pipeline) —
  57 s at sf0.1, 136 s at 10×. Round 9 mitigated that by pinning the
  bounded census (``localCheckpoint``) and recursing over the pinned
  temp view (~0.9 s of loop at sf0.1) — but the loop itself still
  launches ONE SPARK JOB PER OBSERVED MONTH (~85 jobs of fixed
  scheduler overhead for ≤~85 live rows; 7.5 s wall for bf2 at sf0.1,
  and the per-job overhead multiplies on a real cluster where a job
  round-trip is costlier than local[n]). Round 11 removes the loop:
  a left fold over an 85-element array is a single ``aggregate``
  higher-order-function expression, so the engine packs the census
  with ``array_sort(collect_list(struct(i, …)))`` and folds it in ONE
  job (guide §2.4 — remove per-iteration jobs outright when the
  iteration space is bounded and ordered). The step expression is
  textually the same integer algebra as the recursive branch, so the
  curve is bit-identical (verified against the committed sweep hashes
  at sf0.001/sf0.01 and by tests/test_survival.py's Python fold).
  bf2 needs no checkpoint at all anymore (its single statement
  references ``lt2`` once); bf3/bf4 keep the pinned view because the
  census feeds both the fold and the totals branch, and the pin
  guarantees the fact pipeline runs once, not per consumer. The
  oracle keeps the WITH RECURSIVE spelling: DuckDB evaluates each
  CTE once, so the two texts stay semantically identical.

Oracle note: the oracle keeps the round-9 text (``_base`` join
spelling + WITH RECURSIVE fold) while the engine runs the round-11
lowering (``_base_spark`` one-pass probe + ``aggregate``-HOF fold) —
the oracle therefore certifies the published values through an
INDEPENDENT algebra, and the bit-identity of the two lowerings is
additionally pinned by the committed sweep hashes and
tests/test_survival.py's Python folds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from recommendersystems_bigdata_spark.catalog import register_views
from recommendersystems_bigdata_spark.registry import query

# day difference b - a: the two engines spell it differently
_DD_SPARK = "datediff(CAST({b} AS DATE), CAST({a} AS DATE))"
_DD_DUCK = "datediff('day', CAST({a} AS DATE), CAST({b} AS DATE))"


def _base(dd: str, div: str, seg: bool = False) -> str:
    """The shared life-table CTE chain; ``seg`` adds the market-segment
    key to every relation (bf4)."""
    segsel = ", c.c_mktsegment AS seg" if seg else ""
    segcol = ", seg" if seg else ""
    segpart = "PARTITION BY seg " if seg else ""
    segjoin = (
        "JOIN customer c ON c.c_custkey = f.ck " if seg else ""
    )
    dd_t2 = dd.format(a="f.t1", b="s.t2")
    dd_max = dd.format(a="f.t1", b="dmax")
    return f"""
firsts AS (
  SELECT o_custkey AS ck, min(o_orderdate) AS t1 FROM orders GROUP BY 1
),
seconds AS (
  SELECT o.o_custkey AS ck, min(o.o_orderdate) AS t2
  FROM orders o JOIN firsts f ON o.o_custkey = f.ck AND o.o_orderdate > f.t1
  GROUP BY 1
),
maxd AS (SELECT max(o_orderdate) AS dmax FROM orders),
subj AS (
  SELECT f.ck{segsel},
         CASE WHEN s.t2 IS NOT NULL THEN 1 ELSE 0 END AS event,
         (CASE WHEN s.t2 IS NOT NULL THEN {dd_t2}
               ELSE {dd_max} END) {div} 30 AS m
  FROM firsts f
  LEFT JOIN seconds s ON s.ck = f.ck
  {segjoin}CROSS JOIN maxd
),
ec AS (
  SELECT m{segcol}, CAST(sum(event) AS BIGINT) AS events,
         CAST(sum(1 - event) AS BIGINT) AS censored
  FROM subj GROUP BY ALL
),
lt AS (
  SELECT m{segcol}, events, censored,
         sum(events + censored) OVER ({segpart}ORDER BY m
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_at_risk
  FROM ec
),
lt2 AS (
  SELECT m{segcol}, n_at_risk, events, censored,
         (10000 * events) {div} n_at_risk AS hazard_bp,
         row_number() OVER ({segpart}ORDER BY m) AS i
  FROM lt
)
"""


def _km(div: str, seg: bool = False, rel: str = "lt2") -> str:
    """The actuarial fold. ``rel`` is the life-table relation: the in-
    statement ``lt2`` CTE for the oracle, the PINNED temp view for the
    engine (see the module doc's UnionLoop note)."""
    segcol = ", seg" if seg else ""
    segeq = " AND l.seg = km.seg" if seg else ""
    return f"""
 km(i, m{segcol}, s_ppm) AS (
  SELECT i, m{segcol}, (1000000 * (10000 - hazard_bp)) {div} 10000
  FROM {rel} WHERE i = 1
  UNION ALL
  SELECT l.i, l.m{', l.seg' if seg else ''},
         (km.s_ppm * (10000 - l.hazard_bp)) {div} 10000
  FROM {rel} l JOIN km ON l.i = km.i + 1{segeq}
)
"""


def _base_spark(seg: bool = False) -> str:
    """The Spark-side lowering of the life-table chain: identical rows
    to :func:`_base` (the oracle keeps that join spelling), with the
    first/second-order probe computed in ONE orders pass instead of a
    groupBy-min plus an orders⋈firsts self-join plus a second groupBy
    (round 11; guide §2.4 — the join re-shuffled the whole orders fact
    on custkey a second time just to find each customer's second
    distinct date). ``array_sort(collect_set(o_orderdate))`` yields the
    distinct order dates in order: element 1 IS ``min(o_orderdate)``
    and element 2 IS ``min(date) WHERE date > min`` — the exact
    ``firsts``/``seconds`` pair (bounded per-customer state, the same
    collect_list discipline as §2.V's user signatures; measured 3.7 s →
    1.25 s at sf0.1 for bf2). The corpus-max date stays a separate
    column-pruned 1-row aggregate riding a broadcast cross join."""
    segsel = ", c.c_mktsegment AS seg" if seg else ""
    segcol = ", seg" if seg else ""
    segpart = "PARTITION BY seg " if seg else ""
    segjoin = "JOIN customer c ON c.c_custkey = f.ck " if seg else ""
    dd_t2 = _DD_SPARK.format(a="f.t1", b="f.t2")
    dd_max = _DD_SPARK.format(a="f.t1", b="dmax")
    return f"""
fs AS (
  SELECT o_custkey AS ck, array_sort(collect_set(o_orderdate)) AS ds
  FROM orders GROUP BY 1
),
firsts2 AS (
  SELECT ck, element_at(ds, 1) AS t1,
         CASE WHEN size(ds) >= 2 THEN element_at(ds, 2) END AS t2
  FROM fs
),
maxd AS (SELECT max(o_orderdate) AS dmax FROM orders),
subj AS (
  SELECT f.ck{segsel},
         CASE WHEN f.t2 IS NOT NULL THEN 1 ELSE 0 END AS event,
         (CASE WHEN f.t2 IS NOT NULL THEN {dd_t2}
               ELSE {dd_max} END) div 30 AS m
  FROM firsts2 f
  {segjoin}CROSS JOIN maxd
),
ec AS (
  SELECT m{segcol}, CAST(sum(event) AS BIGINT) AS events,
         CAST(sum(1 - event) AS BIGINT) AS censored
  FROM subj GROUP BY ALL
),
lt AS (
  SELECT m{segcol}, events, censored,
         sum(events + censored) OVER ({segpart}ORDER BY m
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_at_risk
  FROM ec
),
lt2 AS (
  SELECT m{segcol}, n_at_risk, events, censored,
         (10000 * events) div n_at_risk AS hazard_bp,
         row_number() OVER ({segpart}ORDER BY m) AS i
  FROM lt
)
"""


def _km_fold(seg: bool = False, rel: str = "lt2") -> str:
    """The Spark-side lowering of the actuarial fold: the SAME integer
    recurrence as :func:`_km`, expressed as one ``aggregate``
    higher-order function over the month-sorted census array instead of
    a recursive CTE. UnionLoop launches one Spark job per iteration
    (fixed scheduler cost × ~85 observed months); the fold is a single
    expression inside one job. The step algebra is textually identical
    — ``(s · (10⁴ − hazard_bp)) div 10⁴`` from ``s = 10⁶`` — so the
    produced rows are bit-identical to the recursive spelling (the
    oracle keeps WITH RECURSIVE; equivalence is pinned by
    tests/test_survival.py's independent Python fold and the sweep
    hashes). ``array_sort`` on ``struct(i, …)`` orders by the unique
    month index ``i``, i.e. exactly the recursion's ``i = km.i + 1``
    visit order; for ``seg=True`` the fold runs per segment (GROUP BY),
    mirroring the segment-keyed recursion frontier."""
    segsel = "seg, " if seg else ""
    group = " GROUP BY seg" if seg else ""
    step = "(acc.s * (10000 - x.hazard_bp)) div 10000"
    return f"""
 packed AS (
  SELECT {segsel}array_sort(collect_list(struct(i, m, hazard_bp))) AS xs
  FROM {rel}{group}
),
km AS (
  SELECT {segsel}f.m, f.hazard_bp, f.s_ppm
  FROM packed
  LATERAL VIEW inline(aggregate(
    xs,
    named_struct('s', CAST(1000000 AS BIGINT),
                 'out', CAST(array() AS ARRAY<STRUCT<m: BIGINT, hazard_bp: BIGINT, s_ppm: BIGINT>>)),
    (acc, x) -> named_struct(
      's', {step},
      'out', concat(acc.out, array(named_struct(
        'm', x.m, 'hazard_bp', x.hazard_bp, 's_ppm', {step})))),
    acc -> acc.out)) f AS m, hazard_bp, s_ppm
)
"""


def _pinned_lt2(spark: SparkSession, sf_dir: str, seg: bool = False) -> str:
    """Materialize the bounded life-table census (localCheckpoint) and
    register it as a temp view for the recursion to iterate over —
    without this, Spark's UnionLoop re-runs the fact pipeline every
    iteration (measured; module doc). Returns the view name."""
    name = "survival_lt2_seg" if seg else "survival_lt2"
    register_views(spark, sf_dir)
    segcol = ", seg" if seg else ""
    df = spark.sql(
        "WITH "
        + _base_spark(seg=seg)
        + f"SELECT m{segcol}, n_at_risk, events, censored, hazard_bp, i"
        f" FROM lt2"
    ).localCheckpoint()
    df.createOrReplaceTempView(name)
    return name


_LT_SELECT = """
SELECT m, CAST(n_at_risk AS BIGINT) AS n_at_risk, events, censored,
       CAST(hazard_bp AS BIGINT) AS hazard_bp
FROM lt2 ORDER BY m
"""


@query(
    "q_survival_life_table",
    oracle="WITH " + _base(_DD_DUCK, "//") + _LT_SELECT,
)
def q_survival_life_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BF bf1 — the discrete life table of time-to-reorder: per
    30-day month since a customer's first order, the subjects still at
    risk, reorder events, right-censorings (no second order before the
    corpus end), and the hazard ``(10⁴·events) div n_at_risk`` in
    truncated bp. ``n_at_risk`` is the suffix sum of exits over the
    bounded month census — every subject exits exactly once, an
    identity the semantic gate pins.

    Scale: one orders groupBy(custkey) min + one custkey equi-join for
    the second-order probe; the census window runs over ≤~85 rows."""
    register_views(spark, sf_dir)
    return spark.sql("WITH " + _base_spark() + _LT_SELECT)


_KM_SELECT = """
SELECT m, CAST(hazard_bp AS BIGINT) AS hazard_bp, CAST(s_ppm AS BIGINT) AS s_ppm
FROM km JOIN {rel} USING (i, m) ORDER BY m
"""


@query(
    "q_survival_km_curve",
    oracle="WITH RECURSIVE "
    + _base(_DD_DUCK, "//")
    + ","
    + _km("//")
    + _KM_SELECT.format(rel="lt2"),
)
def q_survival_km_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BF bf2 — the Kaplan-Meier-style survival curve as an INTEGER
    recurrence: ``S_m = (S_{m-1}·(10⁴−h_m)) div 10⁴`` in ppm from
    ``S=10⁶``, one exact truncation per observed month, identical in
    both engines (the float ``exp(Σ ln(1−h))`` spelling would
    hash-diverge on libm; this is the actuarial-truncation convention,
    stated in the module doc). Monotone non-increasing by construction
    — pinned by the gate. The oracle folds by WITH RECURSIVE; the
    engine folds the same algebra with the ``aggregate`` HOF (module
    doc lowering note) — bit-identical rows, one job instead of one
    job per month.

    Scale: ONE declarative plan — the fact pass (groupBy min + custkey
    equi-join), the ≤~85-row census windows, and the fold expression;
    recursion depth/job count no longer exist, and the curve cost is
    the fact pass, flat in the month span."""
    register_views(spark, sf_dir)
    return spark.sql(
        "WITH "
        + _base_spark()
        + ","
        + _km_fold()
        + "SELECT m, CAST(hazard_bp AS BIGINT) AS hazard_bp,"
        " CAST(s_ppm AS BIGINT) AS s_ppm FROM km ORDER BY m"
    )


_SUMMARY_SELECT = """
, totals AS (
  SELECT CAST(sum(events + censored) AS BIGINT) AS n_subjects,
         CAST(sum(events) AS BIGINT) AS n_events
  FROM {rel}
),
curve AS (
  SELECT min(m) FILTER (WHERE s_ppm <= 500000) AS median_month,
         coalesce(max_by(s_ppm, m) FILTER (WHERE m <= 6), 1000000) AS s6_ppm,
         coalesce(max_by(s_ppm, m) FILTER (WHERE m <= 12), 1000000) AS s12_ppm,
         coalesce(max_by(s_ppm, m) FILTER (WHERE m <= 24), 1000000) AS s24_ppm
  FROM km
)
SELECT t.n_subjects, t.n_events,
       CAST((10000 * t.n_events) {div} t.n_subjects AS BIGINT) AS event_rate_bp,
       CAST(c.median_month AS BIGINT) AS median_month,
       CAST(c.s6_ppm AS BIGINT) AS s6_ppm,
       CAST(c.s12_ppm AS BIGINT) AS s12_ppm,
       CAST(c.s24_ppm AS BIGINT) AS s24_ppm
FROM totals t CROSS JOIN curve c
"""


@query(
    "q_survival_summary",
    oracle="WITH RECURSIVE "
    + _base(_DD_DUCK, "//")
    + ","
    + _km("//")
    + _SUMMARY_SELECT.format(div="//", rel="lt2"),
)
def q_survival_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BF bf3 — the one-row survival summary: subjects, reorder
    events, the event rate in truncated bp, the MEDIAN survival month
    (first month the ppm curve crosses 500 000 — NULL if it never
    does) and the step-function survival at the 6/12/24-month
    horizons (``max_by(s_ppm, m)`` over months ≤ the horizon — the
    last completed step; 10⁶ ppm when no month has completed).

    Scale: the same fact pass as bf1, pinned once (the census feeds
    BOTH the totals branch and the curve fold, so the pin keeps the
    fact pipeline to one run); subject totals are exit sums over the
    pinned census (every subject exits exactly once, so
    Σ(events+censored) IS the cohort); the curve is the one-job
    ``aggregate``-HOF fold (module doc lowering note), the summary is
    census-side FILTER-clause aggregation over the ≤~85-row curve, and
    the final 1-row × 1-row combine is a broadcast nested loop by
    construction."""
    view = _pinned_lt2(spark, sf_dir)
    return spark.sql(
        "WITH"
        + _km_fold(rel=view)
        + _SUMMARY_SELECT.format(div="div", rel=view)
    )


_SEG_SELECT = """
, seg_totals AS (
  SELECT seg, CAST(sum(events + censored) AS BIGINT) AS n_subjects,
         CAST(sum(events) AS BIGINT) AS n_events
  FROM {rel} GROUP BY 1
),
seg_curve AS (
  SELECT seg,
         coalesce(max_by(s_ppm, m) FILTER (WHERE m <= 12), 1000000) AS s12_ppm
  FROM km GROUP BY 1
)
SELECT t.seg AS segment, t.n_subjects, t.n_events,
       CAST((10000 * t.n_events) {div} t.n_subjects AS BIGINT) AS event_rate_bp,
       CAST(c.s12_ppm AS BIGINT) AS s12_ppm
FROM seg_totals t JOIN seg_curve c ON c.seg = t.seg
ORDER BY segment
"""


@query(
    "q_survival_by_segment",
    oracle="WITH RECURSIVE "
    + _base(_DD_DUCK, "//", seg=True)
    + ","
    + _km("//", seg=True)
    + _SEG_SELECT.format(div="//", rel="lt2"),
)
def q_survival_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BF bf4 — the segment-stratified comparison: per market
    segment, subjects, events, the event rate in truncated bp, and the
    12-month survival from a SEGMENT-KEYED actuarial recurrence (the
    oracle's recursive frontier carries one row per segment per
    iteration; the engine folds per segment — GROUP BY seg — so
    stratification multiplies fold width, not job count). The
    cross-segment ordering of reorder propensity falls out directly.

    Scale: the per-customer pass gains one customer-dim join for the
    segment key (SF-scaled, hash join); the stratified census is
    pinned once and the five per-segment folds run in one job over
    its ≤ 5×85 rows."""
    view = _pinned_lt2(spark, sf_dir, seg=True)
    return spark.sql(
        "WITH"
        + _km_fold(seg=True, rel=view)
        + _SEG_SELECT.format(div="div", rel=view)
    )
