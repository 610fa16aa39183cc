"""Forensic digit analytics — Benford screens (SURVEY.md §2.BJ, round 9).

Digit-distribution auditing over the warehouse's own monetary columns —
the fraud/data-entry screen family (Nigrini, *Benford's Law*, Wiley
2012; Benford 1938) that complements §2.T's expectation audits and
§2.AD's ledger-integrity checks:

- bj1: the global first-significant-digit census of line revenue cents
  vs the Benford expectation. The expected mass ``log10(1 + 1/d)`` is
  carried as a 9-entry INTEGER ppm lookup (truncated at the 6th
  decimal: 301029, 176091, ... 45757 — public constants, identical
  literals in both engines), so observed/expected/deviation are all
  exact integers; no engine ever evaluates a logarithm.
- bj2: the per-supplier MAD conformity screen — mean absolute
  deviation between a supplier's observed first-digit profile (ppm)
  and the Benford profile, digits the supplier never produced
  contributing their full expected mass. Conformity bands are
  Nigrini's published MAD cutoffs scaled to ppm (6000 / 12000 /
  15000).
- bj3: the last-two-digits uniformity test (the "invented cents"
  screen): Pearson's χ² against the uniform 1/100 expectation in
  CLEARED integer form — χ² > crit ⟺ ``Σ(100·Oᵢ − N)² > 12322·N``
  (crit = 123.22, the 0.05 critical value for 99 df) — so the flag
  never touches a float, the same denominator-clearing device as
  §2.BI's p-chart.
- bj4: the psychological price-ending census ('00/'50/'95/'99/other
  cents) over the part catalog, with each band's share of parts and
  of line revenue.

Exactness: counts and cents are exact integers; ppm/bp shares are
truncating divisions of non-negative integers (Spark ``div`` ≡ DuckDB
``//`` on non-negatives); the χ² flag is an integer compare. Headroom:
bj3's ``Σ(100·O − N)²`` runs in decimal(38,0)/HUGEINT — with N ≤ 6·10¹²
(sf ~10⁶) the sum stays below 10³⁰, far inside 38 digits.

Spark-first shape, sized for 100 TB: every query is ONE
partial-aggregated fact pass to a bounded census (9 digits, ≤100
pairs, 5 ending bands, or suppliers×9); grand totals ride 1-row
broadcasts; bj2's per-supplier total is a census-side window, never a
second fact pass; bj4 broadcasts the part-side band map into the fact
join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table, load_tables
from recommendersystems_bigdata_spark.registry import query

_PRICE_E2 = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
_DISC_E2 = "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)"
_REV_E4 = f"{_PRICE_E2} * (100 - {_DISC_E2})"
_RETAIL_E2 = "CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)"

# log10(1 + 1/d) truncated to ppm — Benford's first-digit law.
_BENFORD_PPM = {
    1: 301029, 2: 176091, 3: 124938, 4: 96910, 5: 79181,
    6: 66946, 7: 57991, 8: 51152, 9: 45757,
}
_SUM_E = sum(_BENFORD_PPM.values())  # 999995 (truncation leaves 5 ppm)
_EXP_CASE = (
    "CASE digit "
    + " ".join(f"WHEN {d} THEN {p}" for d, p in _BENFORD_PPM.items())
    + " ELSE 0 END"
)
_FIRST_DIGIT = (
    f"CAST(substring(CAST({_PRICE_E2} AS STRING), 1, 1) AS INT)"
)
_FIRST_DIGIT_DUCK = (
    f"CAST(substr(CAST({_PRICE_E2} AS VARCHAR), 1, 1) AS INTEGER)"
)


@query(
    "q_benford_first_digit",
    oracle=f"""
    WITH census AS (
      SELECT {_FIRST_DIGIT_DUCK} AS digit, CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM census)
    SELECT digit, cnt,
           CAST((1000000 * cnt) // n AS BIGINT) AS obs_ppm,
           CAST({_EXP_CASE} AS BIGINT) AS exp_ppm,
           CAST((1000000 * cnt) // n - ({_EXP_CASE}) AS BIGINT) AS dev_ppm
    FROM census, tot ORDER BY digit
    """,
)
def q_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BJ bj1 — the global Benford first-digit census of line
    revenue cents: per digit 1..9, the exact count, the observed share
    in truncated ppm, the expected Benford mass from the integer ppm
    lookup (module doc), and the signed deviation. No logarithm is
    evaluated anywhere — the law's constants are data.

    Scale: one partial-aggregated fact pass to the 9-row census; the
    1-row grand total attaches as a broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    census = li.groupBy(F.expr(_FIRST_DIGIT).alias("digit")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    tot = census.agg(F.sum("cnt").cast("long").alias("n"))
    return (
        census.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "cnt",
            F.expr("CAST((1000000 * cnt) div n AS BIGINT)").alias("obs_ppm"),
            F.expr(f"CAST({_EXP_CASE} AS BIGINT)").alias("exp_ppm"),
            F.expr(
                f"CAST((1000000 * cnt) div n - ({_EXP_CASE}) AS BIGINT)"
            ).alias("dev_ppm"),
        )
        .orderBy("digit")
    )


@query(
    "q_benford_mad_screen",
    oracle=f"""
    WITH census AS (
      SELECT l_suppkey, {_FIRST_DIGIT_DUCK} AS digit,
             CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1, 2
    ),
    sized AS (
      SELECT l_suppkey, digit, cnt,
             sum(cnt) OVER (PARTITION BY l_suppkey) AS n
      FROM census
    )
    SELECT l_suppkey, CAST(max(n) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS digits_observed,
           CAST((sum(abs((1000000 * cnt) // n - ({_EXP_CASE})))
                 + {_SUM_E} - sum({_EXP_CASE})) // 9 AS BIGINT) AS mad_ppm,
           CASE WHEN (sum(abs((1000000 * cnt) // n - ({_EXP_CASE})))
                      + {_SUM_E} - sum({_EXP_CASE})) // 9 < 6000
                THEN 'close'
                WHEN (sum(abs((1000000 * cnt) // n - ({_EXP_CASE})))
                      + {_SUM_E} - sum({_EXP_CASE})) // 9 < 12000
                THEN 'acceptable'
                WHEN (sum(abs((1000000 * cnt) // n - ({_EXP_CASE})))
                      + {_SUM_E} - sum({_EXP_CASE})) // 9 < 15000
                THEN 'marginal'
                ELSE 'nonconforming' END AS conformity
    FROM sized GROUP BY l_suppkey ORDER BY l_suppkey
    """,
)
def q_benford_mad_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BJ bj2 — the per-supplier Benford MAD conformity screen: each
    supplier's observed first-digit profile in ppm vs the Benford
    lookup, summed as mean absolute deviation over all NINE digits —
    a digit the supplier never produced contributes its full expected
    mass (``_SUM_E − Σ e_observed`` adds exactly the missing digits'
    expectation, so no 9-row spine join is needed). Conformity bands
    are Nigrini's published MAD cutoffs in ppm: <6000 close, <12000
    acceptable, <15000 marginal, else nonconforming.

    Scale: one partial-aggregated fact pass to the suppliers×9 census;
    the per-supplier total is a census-side window partitioned on the
    supplier (≤9 rows each), never a second fact aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    census = li.groupBy(
        "l_suppkey", F.expr(_FIRST_DIGIT).alias("digit")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    sized = census.withColumn(
        "n", F.sum("cnt").over(Window.partitionBy("l_suppkey"))
    )
    mad_num = (
        f"(sum(abs((1000000 * cnt) div n - ({_EXP_CASE})))"
        f" + {_SUM_E} - sum({_EXP_CASE}))"
    )
    return (
        sized.groupBy("l_suppkey")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.count(F.lit(1)).cast("long").alias("digits_observed"),
            F.expr(f"CAST({mad_num} div 9 AS BIGINT)").alias("mad_ppm"),
            F.expr(
                f"CASE WHEN {mad_num} div 9 < 6000 THEN 'close'"
                f" WHEN {mad_num} div 9 < 12000 THEN 'acceptable'"
                f" WHEN {mad_num} div 9 < 15000 THEN 'marginal'"
                f" ELSE 'nonconforming' END"
            ).alias("conformity"),
        )
        .orderBy("l_suppkey")
    )


@query(
    "q_digit_pair_uniformity",
    oracle=f"""
    WITH census AS (
      SELECT {_PRICE_E2} % 100 AS pair, CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS pairs_observed
      FROM census
    ),
    stat AS (
      SELECT CAST(sum((100 * CAST(cnt AS HUGEINT) - n)
                      * (100 * CAST(cnt AS HUGEINT) - n))
                  + (100 - pairs_observed)
                    * CAST(n AS HUGEINT) * CAST(n AS HUGEINT)
                  AS HUGEINT) AS stat_num,
             CAST(max(100 * CAST(cnt AS HUGEINT) - n) AS BIGINT) AS top_dev_n
      FROM census, tot GROUP BY n, pairs_observed
    )
    SELECT n, pairs_observed,
           CAST(stat_num // n AS BIGINT) AS chi2_centi,
           stat_num > 12322 * CAST(n AS HUGEINT) AS uniform_rejected,
           CAST((SELECT min(pair) FROM census, tot
                 WHERE 100 * CAST(cnt AS HUGEINT) - n = top_dev_n)
                AS BIGINT) AS top_pair,
           top_dev_n
    FROM tot, stat
    """,
)
def q_digit_pair_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BJ bj3 — the last-two-digits ("invented cents") uniformity
    screen, one summary row: Pearson's χ² of the 100-cell cents census
    against the uniform expectation N/100, evaluated ENTIRELY in
    integers — ``χ² = Σ(100·Oᵢ − N)² / (100·N)``, published as
    truncated centi-χ² (``stat div N``), with the rejection flag as
    the cleared compare ``stat > 12322·N`` (χ² > 123.22, the 0.05
    critical value for 99 df). Cells never observed contribute N²
    each via the ``(100 − pairs_observed)·N²`` term, so no 100-row
    spine is joined. The worst cell is reported with a deterministic
    tie-break (smallest pair among the max-deviation cells — ``max_by``
    would be pick-dependent under ties).

    Scale: one partial-aggregated fact pass to the ≤100-row census;
    the census is re-read (bounded) for the tie-broken argmax; totals
    and the statistic ride 1-row broadcasts. decimal(38,0) clears the
    squared deviations through ~sf10⁶ (module doc)."""
    dec = "decimal(38,0)"
    li = load_table(spark, sf_dir, "lineitem")
    census = li.groupBy(F.expr(f"{_PRICE_E2} % 100").alias("pair")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    tot = census.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("pairs_observed"),
    )
    sized = census.crossJoin(F.broadcast(tot))
    stat = sized.groupBy("n", "pairs_observed").agg(
        F.expr(
            f"CAST(sum((100 * CAST(cnt AS {dec}) - n)"
            f" * (100 * CAST(cnt AS {dec}) - n))"
            f" + (100 - pairs_observed)"
            f" * CAST(n AS {dec}) * CAST(n AS {dec}) AS {dec})"
        ).alias("stat_num"),
        F.expr(
            f"CAST(max(100 * CAST(cnt AS {dec}) - n) AS BIGINT)"
        ).alias("top_dev_n"),
    )
    top = (
        sized.join(F.broadcast(stat), ["n", "pairs_observed"])
        .where(
            F.expr(f"100 * CAST(cnt AS {dec}) - n = CAST(top_dev_n AS {dec})")
        )
        .groupBy("n", "pairs_observed", "stat_num", "top_dev_n")
        .agg(F.min("pair").cast("long").alias("top_pair"))
    )
    return top.select(
        "n",
        "pairs_observed",
        F.expr("CAST(stat_num div CAST(n AS decimal(38,0)) AS BIGINT)").alias(
            "chi2_centi"
        ),
        F.expr(
            f"stat_num > CAST(12322 AS {dec}) * CAST(n AS {dec})"
        ).alias("uniform_rejected"),
        "top_pair",
        "top_dev_n",
    )


@query(
    "q_price_endings",
    oracle=f"""
    WITH banded AS (
      SELECT p_partkey,
             CASE {_RETAIL_E2} % 100
               WHEN 0 THEN '00' WHEN 50 THEN '50'
               WHEN 95 THEN '95' WHEN 99 THEN '99'
               ELSE 'other' END AS ending
      FROM part
    ),
    pcensus AS (
      SELECT ending, CAST(count(*) AS BIGINT) AS parts
      FROM banded GROUP BY ending
    ),
    rcensus AS (
      SELECT b.ending,
             CAST(sum(CAST({_REV_E4} AS HUGEINT)) AS HUGEINT) AS rev_e4
      FROM lineitem l JOIN banded b ON l.l_partkey = b.p_partkey
      GROUP BY b.ending
    ),
    tot AS (
      SELECT CAST(sum(parts) AS BIGINT) AS tot_parts FROM pcensus
    ),
    rtot AS (
      SELECT CAST(sum(rev_e4) AS HUGEINT) AS tot_rev_e4 FROM rcensus
    )
    SELECT p.ending, p.parts,
           CAST((10000 * p.parts) // tot_parts AS BIGINT) AS parts_share_bp,
           CAST(r.rev_e4 // 100 AS BIGINT) AS rev_cents,
           CAST((10000 * r.rev_e4) // tot_rev_e4 AS BIGINT) AS rev_share_bp
    FROM pcensus p JOIN rcensus r ON p.ending = r.ending, tot, rtot
    ORDER BY p.ending
    """,
)
def q_price_endings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BJ bj4 — the psychological price-ending census: part retail
    prices banded by their cents ending ('00, '50, '95, '99, other),
    each band with its part count, share of the catalog in bp, exact
    line-revenue cents, and share of revenue in bp — the "are .99
    prices overrepresented, and do they sell" report.

    Scale: the band map is part-side (dim-sized) and BROADCASTS into
    the single fact pass; both censuses are ≤5 rows; totals ride 1-row
    broadcasts."""
    dec = "decimal(38,0)"
    lineitem, part = load_tables(spark, sf_dir, "lineitem", "part")
    banded = part.select(
        "p_partkey",
        F.expr(
            f"CASE {_RETAIL_E2} % 100 WHEN 0 THEN '00' WHEN 50 THEN '50'"
            f" WHEN 95 THEN '95' WHEN 99 THEN '99' ELSE 'other' END"
        ).alias("ending"),
    )
    pcensus = banded.groupBy("ending").agg(
        F.count(F.lit(1)).cast("long").alias("parts")
    )
    rcensus = (
        lineitem.join(
            F.broadcast(banded), lineitem.l_partkey == banded.p_partkey
        )
        .groupBy("ending")
        .agg(
            F.expr(f"CAST(sum(CAST({_REV_E4} AS {dec})) AS {dec})").alias(
                "rev_e4"
            )
        )
    )
    tot = pcensus.agg(F.sum("parts").cast("long").alias("tot_parts"))
    rtot = rcensus.agg(
        F.expr(f"CAST(sum(rev_e4) AS {dec})").alias("tot_rev_e4")
    )
    return (
        pcensus.join(rcensus, "ending")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(rtot))
        .select(
            "ending",
            "parts",
            F.expr("CAST((10000 * parts) div tot_parts AS BIGINT)").alias(
                "parts_share_bp"
            ),
            F.expr("CAST(rev_e4 div 100 AS BIGINT)").alias("rev_cents"),
            F.expr(
                f"CAST((CAST(10000 AS {dec}) * rev_e4) div tot_rev_e4"
                f" AS BIGINT)"
            ).alias("rev_share_bp"),
        )
        .orderBy("ending")
    )
