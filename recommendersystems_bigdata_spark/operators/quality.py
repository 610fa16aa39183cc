"""Data-quality expectation suite (SURVEY.md §2.T, round 9).

The Deequ/dbt-test-shaped audit layer a 100 TB pipeline runs before
publishing a snapshot: declarative rules (value ranges, accepted
categorical domains, primary-key uniqueness, cross-table consistency,
freshness SLAs) evaluated as ONE aggregate pass per scanned table and
reported as long-format (rule, counts) frames. Spark-first shape: every
conditional count is a partial-aggregated ``sum(CASE WHEN ...)`` that
rides the same scan, the wide 1-row aggregate is pivoted to rule rows
with ``stack`` (a Generate over a 1-row frame — no shuffle), and rates
are exact integer basis points (``n*10000 div total``) so results are
layout- and engine-invariant.

Complements the round-3/4 audits: q_fk_integrity (orphan counts) and
q_profile_columns (null/distinct/min-max profiles) in
``operators/filters.py`` cover the FK edges and column profiles; this
module adds the rule-violation, domain, uniqueness, consistency, and
freshness layers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from recommendersystems_bigdata_spark.catalog import load_table, load_tables
from recommendersystems_bigdata_spark.registry import query

# Freshness SLA: a feed is stale when its newest event lags the newest
# event overall by more than 6 hours (exact integer microseconds).
_STALE_US = 6 * 3600 * 1_000_000


@query(
    "q_expect_ranges",
    oracle="""
    WITH a AS (
      SELECT count(*) AS n,
             sum(CASE WHEN l_quantity < 1 OR l_quantity > 45 THEN 1 ELSE 0 END) AS v_qty,
             sum(CASE WHEN l_discount < 0 OR l_discount > 0.05 THEN 1 ELSE 0 END) AS v_disc,
             sum(CASE WHEN l_tax < 0 OR l_tax > 0.08 THEN 1 ELSE 0 END) AS v_tax,
             sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS v_price,
             sum(CASE WHEN l_shipdate > TIMESTAMP '2001-08-01 00:00:00'
                      THEN 1 ELSE 0 END) AS v_ship
      FROM lineitem
    )
    SELECT rule, CAST(n AS BIGINT) AS n_rows,
           CAST(v AS BIGINT) AS n_violations,
           CAST((v * 10000) // n AS BIGINT) AS violation_bp
    FROM (
      SELECT 'l_quantity_in_1_45' AS rule, n, v_qty AS v FROM a
      UNION ALL SELECT 'l_discount_in_0_005', n, v_disc FROM a
      UNION ALL SELECT 'l_tax_in_0_008', n, v_tax FROM a
      UNION ALL SELECT 'l_extendedprice_positive', n, v_price FROM a
      UNION ALL SELECT 'l_shipdate_before_cutoff', n, v_ship FROM a
    )
    ORDER BY rule
    """,
)
def q_expect_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.T t1 — value-range expectation report: five range rules over
    lineitem (quantity/discount/tax bounds tightened to audit
    thresholds, price positivity, a ship-date cutoff), each reported as
    violation count plus an exact integer-basis-point rate. Thresholds
    are deliberately tighter than the generator's domain so some rules
    fire and some are clean — the report shape covers both.

    Scale: ONE pushed-projection scan of the fact; every rule is a
    conditional partial sum inside the same whole-stage-codegen span;
    the 1-row wide aggregate pivots to 5 rule rows with stack (no
    shuffle beyond the single global aggregate)."""
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("2001-08-01 00:00:00").cast("timestamp_ntz")

    def viol(cond):
        return F.sum(F.when(cond, 1).otherwise(0))

    wide = li.agg(
        F.count(F.lit(1)).alias("n"),
        viol((F.col("l_quantity") < 1) | (F.col("l_quantity") > 45)).alias("v_qty"),
        viol((F.col("l_discount") < 0) | (F.col("l_discount") > 0.05)).alias("v_disc"),
        viol((F.col("l_tax") < 0) | (F.col("l_tax") > 0.08)).alias("v_tax"),
        viol(F.col("l_extendedprice") <= 0).alias("v_price"),
        viol(F.col("l_shipdate") > cutoff).alias("v_ship"),
    )
    return (
        wide.selectExpr(
            "n",
            "stack(5,"
            " 'l_quantity_in_1_45', v_qty,"
            " 'l_discount_in_0_005', v_disc,"
            " 'l_tax_in_0_008', v_tax,"
            " 'l_extendedprice_positive', v_price,"
            " 'l_shipdate_before_cutoff', v_ship) AS (rule, v)",
        )
        .select(
            "rule",
            F.col("n").cast("long").alias("n_rows"),
            F.col("v").cast("long").alias("n_violations"),
            F.expr("CAST((v * 10000) div n AS BIGINT)").alias("violation_bp"),
        )
        .orderBy("rule")
    )


@query(
    "q_dup_key_audit",
    oracle="""
    WITH c AS (SELECT count(*) AS m FROM customer GROUP BY c_custkey),
         o AS (SELECT count(*) AS m FROM orders GROUP BY o_orderkey),
         p AS (SELECT count(*) AS m FROM part GROUP BY p_partkey),
         e AS (SELECT count(*) AS m FROM events GROUP BY event_id)
    SELECT pk, CAST(n_keys AS BIGINT) AS n_keys,
           CAST(n_dup_keys AS BIGINT) AS n_dup_keys,
           CAST(n_extra_rows AS BIGINT) AS n_extra_rows,
           CAST(max_multiplicity AS BIGINT) AS max_multiplicity
    FROM (
      SELECT 'customer.c_custkey' AS pk, count(*) AS n_keys,
             sum(CASE WHEN m > 1 THEN 1 ELSE 0 END) AS n_dup_keys,
             sum(m - 1) AS n_extra_rows, max(m) AS max_multiplicity FROM c
      UNION ALL
      SELECT 'events.event_id', count(*), sum(CASE WHEN m > 1 THEN 1 ELSE 0 END),
             sum(m - 1), max(m) FROM e
      UNION ALL
      SELECT 'orders.o_orderkey', count(*), sum(CASE WHEN m > 1 THEN 1 ELSE 0 END),
             sum(m - 1), max(m) FROM o
      UNION ALL
      SELECT 'part.p_partkey', count(*), sum(CASE WHEN m > 1 THEN 1 ELSE 0 END),
             sum(m - 1), max(m) FROM p
    )
    ORDER BY pk
    """,
)
def q_dup_key_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.T t2 — primary-key uniqueness audit over four tables: distinct
    key count, number of duplicated keys, surplus rows, and the worst
    multiplicity. A clean snapshot reports n_dup_keys = 0 /
    max_multiplicity = 1 everywhere — the zero IS the assertion.

    Scale: each table is one groupBy on its PK (the unavoidable
    count-distinct-shaped shuffle — partial aggregation collapses
    nothing on a truly unique key, so this is the audit to schedule off
    the hot path or downgrade to the HLL estimate d3 when a bound
    suffices) followed by a 1-row roll-up; the four 1-row frames union."""
    customer, orders, part, events = load_tables(
        spark, sf_dir, "customer", "orders", "part", "events"
    )

    def audit(df, key, name):
        return (
            df.groupBy(key)
            .agg(F.count(F.lit(1)).alias("m"))
            .agg(
                F.lit(name).alias("pk"),
                F.count(F.lit(1)).cast("long").alias("n_keys"),
                F.sum(F.when(F.col("m") > 1, 1).otherwise(0))
                .cast("long")
                .alias("n_dup_keys"),
                F.sum(F.col("m") - 1).cast("long").alias("n_extra_rows"),
                F.max("m").cast("long").alias("max_multiplicity"),
            )
            .select("pk", "n_keys", "n_dup_keys", "n_extra_rows", "max_multiplicity")
        )

    return (
        audit(customer, "c_custkey", "customer.c_custkey")
        .unionByName(audit(events, "event_id", "events.event_id"))
        .unionByName(audit(orders, "o_orderkey", "orders.o_orderkey"))
        .unionByName(audit(part, "p_partkey", "part.p_partkey"))
        .orderBy("pk")
    )


@query(
    "q_freshness_lag",
    oracle=f"""
    WITH t AS (
      SELECT event_type,
             max(epoch_us(CAST(ts AS TIMESTAMP))) AS max_ts_us
      FROM events GROUP BY event_type
    )
    SELECT event_type, CAST(max_ts_us AS BIGINT) AS max_ts_us,
           CAST(max(max_ts_us) OVER () - max_ts_us AS BIGINT) AS lag_us,
           (max(max_ts_us) OVER () - max_ts_us) > {_STALE_US} AS is_stale
    FROM t
    ORDER BY event_type
    """,
)
def q_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.T t3 — feed-freshness audit: each event feed's newest
    timestamp, its lag behind the newest event overall (exact integer
    microseconds), and a 6-hour staleness flag — the SLA check a
    streaming warehouse runs per source before serving.

    Scale: one partial-aggregated groupBy collapses the fact to
    |event_type| rows; the global max is a window over that tiny frame
    (never a second scan or a driver collect)."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("max_ts_us")
    )
    from pyspark.sql import Window

    w = Window.partitionBy()
    return (
        per_type.select(
            "event_type",
            F.col("max_ts_us").cast("long").alias("max_ts_us"),
            (F.max("max_ts_us").over(w) - F.col("max_ts_us"))
            .cast("long")
            .alias("lag_us"),
            (
                (F.max("max_ts_us").over(w) - F.col("max_ts_us")) > F.lit(_STALE_US)
            ).alias("is_stale"),
        )
        .orderBy("event_type")
    )


@query(
    "q_accepted_values",
    oracle="""
    WITH o AS (
      SELECT count(*) AS n,
             sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS v_status,
             sum(CASE WHEN o_orderpriority NOT IN
                   ('1-URGENT','2-HIGH','3-MEDIUM','5-LOW') THEN 1 ELSE 0 END) AS v_prio
      FROM orders
    ), l AS (
      SELECT count(*) AS n,
             sum(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) AS v_rf
      FROM lineitem
    ), e AS (
      SELECT count(*) AS n,
             sum(CASE WHEN event_type NOT IN ('click','view','signup','purchase')
                 THEN 1 ELSE 0 END) AS v_type
      FROM events
    )
    SELECT rule, CAST(n AS BIGINT) AS n_rows, CAST(v AS BIGINT) AS n_violations
    FROM (
      SELECT 'events.event_type_behavioral' AS rule, n, v_type AS v FROM e
      UNION ALL SELECT 'lineitem.l_returnflag_domain', n, v_rf FROM l
      UNION ALL SELECT 'orders.o_orderpriority_specified', n, v_prio FROM o
      UNION ALL SELECT 'orders.o_orderstatus_domain', n, v_status FROM o
    )
    ORDER BY rule
    """,
)
def q_accepted_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.T t4 — accepted-values (categorical domain) audit: four rules
    across three tables — order status/priority domains, return-flag
    domain, and a "behavioral event types only" rule that (by design)
    counts the generator's 'error' events as violations, so the report
    carries both clean and firing rules.

    Scale: one conditional-sum aggregate pass per scanned table (orders
    evaluates both of its rules on a single scan via stack); unions of
    1-row frames."""
    orders, li, ev = load_tables(spark, sf_dir, "orders", "lineitem", "events")

    def viol(cond):
        return F.sum(F.when(cond, 1).otherwise(0))

    o_wide = orders.agg(
        F.count(F.lit(1)).alias("n"),
        viol(~F.col("o_orderstatus").isin("O", "F", "P")).alias("v_status"),
        viol(
            ~F.col("o_orderpriority").isin(
                "1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"
            )
        ).alias("v_prio"),
    ).selectExpr(
        "n",
        "stack(2, 'orders.o_orderstatus_domain', v_status,"
        " 'orders.o_orderpriority_specified', v_prio) AS (rule, v)",
    )
    l_wide = li.agg(
        F.count(F.lit(1)).alias("n"),
        viol(~F.col("l_returnflag").isin("A", "N", "R")).alias("v"),
    ).select(F.lit("lineitem.l_returnflag_domain").alias("rule"), "n", "v")
    e_wide = ev.agg(
        F.count(F.lit(1)).alias("n"),
        viol(~F.col("event_type").isin("click", "view", "signup", "purchase")).alias(
            "v"
        ),
    ).select(F.lit("events.event_type_behavioral").alias("rule"), "n", "v")
    return (
        o_wide.select("rule", "n", "v")
        .unionByName(l_wide)
        .unionByName(e_wide)
        .select(
            "rule",
            F.col("n").cast("long").alias("n_rows"),
            F.col("v").cast("long").alias("n_violations"),
        )
        .orderBy("rule")
    )


@query(
    "q_cross_table_consistency",
    oracle="""
    WITH j AS (
      SELECT l.l_shipdate, o.o_orderdate
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), a AS (
      SELECT count(*) AS n,
             sum(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END) AS v_before,
             sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 180 DAY
                 THEN 1 ELSE 0 END) AS v_sla
      FROM j
    )
    SELECT rule, CAST(n AS BIGINT) AS n_checked,
           CAST(v AS BIGINT) AS n_violations,
           CAST((v * 10000) // n AS BIGINT) AS violation_bp
    FROM (
      SELECT 'ship_not_before_order' AS rule, n, v_before AS v FROM a
      UNION ALL SELECT 'ship_within_180d_sla', n, v_sla FROM a
    )
    ORDER BY rule
    """,
)
def q_cross_table_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.T t5 — cross-table consistency audit: every lineitem joined to
    its order, checking (a) nothing ships before its order date and (b)
    everything ships within a 180-day SLA; violation counts and exact
    basis-point rates per rule. (The synthetic generator draws ship
    dates independently of order dates, so rule (a) genuinely fires —
    the audit exists precisely to catch that class of upstream bug.)

    Scale: one fact⋈fact sort-merge on the order key (the l2/l9 shape —
    bucketized twins exist for it) feeding a single conditional-sum
    aggregate; the 1-row wide result pivots to 2 rule rows via stack."""
    li, orders = load_tables(spark, sf_dir, "lineitem", "orders")
    j = li.select("l_orderkey", "l_shipdate").join(
        orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    wide = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("l_shipdate") < F.col("o_orderdate"), 1).otherwise(0)).alias(
            "v_before"
        ),
        F.sum(
            F.when(
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 180 DAY"),
                1,
            ).otherwise(0)
        ).alias("v_sla"),
    )
    return (
        wide.selectExpr(
            "n",
            "stack(2, 'ship_not_before_order', v_before,"
            " 'ship_within_180d_sla', v_sla) AS (rule, v)",
        )
        .select(
            "rule",
            F.col("n").cast("long").alias("n_checked"),
            F.col("v").cast("long").alias("n_violations"),
            F.expr("CAST((v * 10000) div n AS BIGINT)").alias("violation_bp"),
        )
        .orderBy("rule")
    )
