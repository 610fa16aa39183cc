"""Aggregation operators (SURVEY.md §2.D).

All queries here are single-pass hash aggregations: Catalyst plans them as
partial HashAggregate → shuffle on the grouping keys → final HashAggregate,
so the shuffle carries only one row per (partition × group) — the plan that
survives a 100× scale-up as long as group cardinality stays bounded.
Doubles are rounded on both the Spark and oracle side (hash hygiene).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from recommendersystems_bigdata_spark.catalog import load_table, load_tables, register_views
from recommendersystems_bigdata_spark.functions.exactmath import revenue_sum_col, revenue_sum_sql
from recommendersystems_bigdata_spark.registry import query


@query(
    "q_agg_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) / 100.0         AS sum_qty,
           sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) / 100.0    AS sum_base_price,
           ((sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                 * CAST(100 - floor(l_discount * 100 + 0.5) AS BIGINT)) + 50)
            // 100) / 100.0                                                   AS sum_disc_price,
           ((sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                 * CAST(100 - floor(l_discount * 100 + 0.5) AS BIGINT)
                 * CAST(100 + floor(l_tax * 100 + 0.5) AS BIGINT)) + 5000)
            // 10000) / 100.0                                                 AS sum_charge,
           round(avg(l_quantity), 2)                                          AS avg_qty,
           round(avg(l_extendedprice), 2)                                     AS avg_price,
           round(avg(l_discount), 4)                                          AS avg_disc,
           count(*)                                                           AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d1 — TPC-H-Q1-shaped pricing summary (flagship).

    Scan → pushed filter → 2-key hash agg with 6 measures. The filter and
    the 7-column projection both reach the parquet scan (PushedFilters /
    ReadSchema); everything up to the partial aggregate runs in one
    whole-stage-codegen span.

    The four SUM measures run in exact integer micros (cents × discount/
    tax cents), with the 2-dp rounding done by integer half-up BEFORE the
    one float divide: a raw double sum's value depends on partial-sum
    order, and at sf0.01 the R/F disc-price group sits 0.0001 from its
    rounding boundary — inside the worst-case double summation error for
    a 15k-row group, i.e. a layout change could flip the rounded digit.
    Integer partials are associative, so the result is bit-identical on
    any partition layout and any engine. (Measured AVG margins are ≥ 5
    orders above their float error — sum error/n shrinks as 1/sqrt(n) —
    so the avg measures keep the direct spelling.) BIGINT micros hold to
    ~sf30 per group; beyond that the same expressions widen to
    DECIMAL(38) accumulators unchanged.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # floor(x*100 + 0.5) = exact cents for these non-negative 2-dp values,
    # in plain codegen double math (F.round would be a per-row BigDecimal
    # — measured 2× on this scan stage; see functions/exactmath.py)
    qty_c = F.floor(F.col("l_quantity") * 100 + 0.5).cast("long")
    price_c = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    disc_f = (100 - F.floor(F.col("l_discount") * 100 + 0.5)).cast("long")
    tax_f = (100 + F.floor(F.col("l_tax") * 100 + 0.5)).cast("long")
    agg = (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty_c).alias("_sq_c"),
            F.sum(price_c).alias("_sbp_c"),
            F.sum(price_c * disc_f).alias("_sdp_e4"),
            F.sum(price_c * disc_f * tax_f).alias("_sc_e6"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    # integer half-up at 2 dp (all values positive, long `div` — the e6
    # charge sum exceeds double's exact-integer range at sf≥0.1, so no
    # float floor), THEN the exact /100.0 — never round() a tie-capable
    # float
    #
    # Overflow guard (runs on the handful of post-agg group rows, zero
    # hot-path cost): the BIGINT _sc_e6 accumulator wraps silently in
    # non-ANSI mode, but _sbp_c is an exact witness for its magnitude —
    # per row charge_e6 = price_c·disc_f·tax_f ≤ price_c·100·200 (disc
    # ∈ [0,1] ⇒ disc_f ≤ 100; tax ≤ 1.0 ⇒ tax_f ≤ 200, generous vs
    # TPC-H's 0.08), so true _sc_e6 ≤ _sbp_c·20000. If _sbp_c stays
    # under LONG_MAX/20000 no wrap can have happened; past it the query
    # fails loudly with the widening instruction instead of returning a
    # wrapped sum.
    _long_max = (1 << 63) - 1
    charge_e2 = F.when(
        F.col("_sbp_c") > _long_max // 20000,
        F.raise_error(F.lit(
            "q_agg_pricing_summary: _sc_e6 BIGINT accumulator may have "
            "overflowed at this scale; widen the charge sum to "
            "DECIMAL(38,0) (see docstring)"
        )).cast("long"),
    ).otherwise(F.expr("(_sc_e6 + 5000) div 10000"))
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        (F.col("_sq_c") / 100.0).alias("sum_qty"),
        (F.col("_sbp_c") / 100.0).alias("sum_base_price"),
        (F.expr("(_sdp_e4 + 50) div 100") / 100.0).alias("sum_disc_price"),
        (charge_e2 / 100.0).alias("sum_charge"),
        "avg_qty",
        "avg_price",
        "avg_disc",
        "count_order",
    )


@query(
    "q_agg_count_distinct",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS n_customers,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d2 — exact distinct aggregation (planned as expand + two-phase agg)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query("q_agg_approx_distinct")
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d3 — HyperLogLog++ approximate distinct (rows-only: sketches are
    engine-specific). At 100 TB this replaces the expand-based exact
    distinct with a fixed-size sketch mergeable map-side."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
    )


@query(
    "q_agg_conditional",
    oracle=f"""
    SELECT l_linestatus,
           {revenue_sum_sql(cond="l_returnflag = 'A'")} AS rev_a,
           {revenue_sum_sql(cond="l_returnflag = 'N'")} AS rev_n,
           {revenue_sum_sql(cond="l_returnflag = 'R'")} AS rev_r,
           CAST(sum(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_bulk
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def q_agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d4 — filtered/conditional aggregation (manual pivot via sum-case).

    The conditional revenue sums use the exact integer-micros builder
    (functions/exactmath.py): these are whole-linestatus groups — the
    largest groups in the schema — exactly where a raw double sum's
    partial-order noise can flip the rounded cent."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        revenue_sum_col(cond="l_returnflag = 'A'").alias("rev_a"),
        revenue_sum_col(cond="l_returnflag = 'N'").alias("rev_n"),
        revenue_sum_col(cond="l_returnflag = 'R'").alias("rev_r"),
        F.sum(F.when(F.col("l_quantity") >= 25, 1).otherwise(0)).cast("long").alias("n_bulk"),
    )


@query(
    "q_agg_having",
    oracle="""
    SELECT c_nationkey, count(*) AS n_customers, round(avg(c_acctbal), 2) AS avg_bal
    FROM customer
    GROUP BY c_nationkey
    HAVING count(*) > 50
    """,
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d5 — post-aggregation filter (HAVING)."""
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("c_acctbal"), 2).alias("avg_bal"),
        )
        .filter(F.col("n_customers") > 50)
    )


@query(
    "q_agg_rollup",
    oracle="""
    SELECT r_name, n_name,
           CAST(grouping_id(r_name, n_name) AS BIGINT) AS gid,
           count(*) AS n_customers,
           round(sum(c_acctbal), 2) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d6 — hierarchical totals: region → nation → grand total."""
    customer, nation, region = load_tables(spark, sf_dir, "customer", "nation", "region")
    return (
        customer.join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(
            F.grouping_id("r_name", "n_name").cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


@query(
    "q_agg_cube",
    oracle="""
    SELECT event_type, day,
           CAST(grouping_id(event_type, day) AS BIGINT) AS gid,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM (
      SELECT event_type,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
             value
      FROM events
    )
    GROUP BY CUBE(event_type, day)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d7 — cube over event_type × day: all four grouping combinations."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    )
    return ev.cube("event_type", "day").agg(
        F.grouping_id("event_type", "day").cast("long").alias("gid"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@query(
    "q_agg_grouping_sets",
    oracle="""
    SELECT lang, source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY GROUPING SETS ((lang, source), (lang), ())
    """,
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d8 — explicit grouping sets, spelled in Spark SQL over a temp view."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT lang, source, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY GROUPING SETS ((lang, source), (lang), ())
        """
    )


@query(
    "q_agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4) AS sd_qty,
           round(var_samp(l_quantity), 4) AS var_qty,
           round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d9 — statistical aggregates (rounded: accumulation order differs
    between engines at the ulp level)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("covar_qty_price"),
        )
    )


@query(
    "q_agg_percentile",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
           round(quantile_cont(o_totalprice, 0.9), 2) AS p90_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d10 — exact interpolated percentiles (Spark `percentile` ==
    DuckDB `quantile_cont`: both linear interpolation on (n-1)*q)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.percentile("o_totalprice", 0.5), 2).alias("median_price"),
            F.round(F.percentile("o_totalprice", 0.9), 2).alias("p90_price"),
        )
    )


@query(
    "q_agg_collect",
    oracle="""
    SELECT c_nationkey,
           array_to_string(list_sort(list(DISTINCT c_mktsegment)), '|') AS segments,
           count(*) AS n_customers
    FROM customer
    GROUP BY c_nationkey
    """,
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d11 — set aggregation; sorted then joined to a scalar string
    (hash hygiene rule 2: never emit raw collect_list/set order, and the
    driver canonicalizer cannot sort/hash array-typed columns at all)."""
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(
            F.array_join(F.sort_array(F.collect_set("c_mktsegment")), "|").alias("segments"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


@query(
    "q_agg_min_max_by",
    oracle="""
    SELECT c_nationkey, top_customer, top_acctbal, bottom_customer, bottom_acctbal
    FROM (
      SELECT c_nationkey,
             first(c_name) OVER w_top AS top_customer,
             first(c_acctbal) OVER w_top AS top_acctbal,
             first(c_name) OVER w_bot AS bottom_customer,
             first(c_acctbal) OVER w_bot AS bottom_acctbal,
             row_number() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn
      FROM customer
      WINDOW w_top AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_name DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
             w_bot AS (PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_name ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ) WHERE rn = 1
    """,
)
def q_agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d12 — argmax/argmin per group via ordered-struct max/min.

    `max(struct(acctbal, name))` gives a deterministic argmax (ties on
    acctbal broken by name) — the distributed-safe spelling of max_by.
    """
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_nationkey").agg(
        F.max(F.struct("c_acctbal", "c_name")).getField("c_name").alias("top_customer"),
        F.max(F.struct("c_acctbal", "c_name")).getField("c_acctbal").alias("top_acctbal"),
        F.min(F.struct("c_acctbal", "c_name")).getField("c_name").alias("bottom_customer"),
        F.min(F.struct("c_acctbal", "c_name")).getField("c_acctbal").alias("bottom_acctbal"),
    )


_SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")


@query(
    "q_pivot_wide",
    oracle="""
    SELECT c_nationkey,
           round(sum(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN c_acctbal END), 2) AS AUTOMOBILE,
           round(sum(CASE WHEN c_mktsegment = 'BUILDING'   THEN c_acctbal END), 2) AS BUILDING,
           round(sum(CASE WHEN c_mktsegment = 'FURNITURE'  THEN c_acctbal END), 2) AS FURNITURE,
           round(sum(CASE WHEN c_mktsegment = 'HOUSEHOLD'  THEN c_acctbal END), 2) AS HOUSEHOLD,
           round(sum(CASE WHEN c_mktsegment = 'MACHINERY'  THEN c_acctbal END), 2) AS MACHINERY
    FROM customer
    GROUP BY c_nationkey
    """,
)
def q_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d14 — long→wide pivot: per-nation account balance by market segment.

    The pivot values are declared explicitly, which matters twice: the
    output schema is fixed without a distinct-values pre-pass (one job,
    not two — at 100 TB the discovery scan is a full extra pass), and the
    plan stays a single partial→final hash aggregate with one column per
    declared value (no shuffle explosion; missing combos are NULL exactly
    as the sum-CASE spelling produces)."""
    cust = load_table(spark, sf_dir, "customer")
    pivoted = (
        cust.groupBy("c_nationkey")
        .pivot("c_mktsegment", list(_SEGMENTS))
        .agg(F.round(F.sum("c_acctbal"), 2))
    )
    return pivoted


@query(
    "q_unpivot_long",
    oracle="""
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS metric_value
    FROM part WHERE p_partkey <= 500
    UNION ALL
    SELECT p_partkey, 'p_retailprice', p_retailprice
    FROM part WHERE p_partkey <= 500
    """,
)
def q_unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d15 — wide→long unpivot (melt): part's numeric measures as
    (key, metric, value) rows. Unpivot is a zero-shuffle projection —
    each input row fans out to n_measures output rows inside codegen, so
    it scales like a scan regardless of table size."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    return part.unpivot(
        ids=["p_partkey"],
        values=[F.col("p_size").cast("double").alias("p_size"), "p_retailprice"],
        variableColumnName="metric",
        valueColumnName="metric_value",
    )


@query(
    "q_agg_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
           CAST(floor(o_totalprice / 50000) * 50000 AS BIGINT) AS bucket_lo,
           count(*) AS n,
           round(avg(o_totalprice), 2) AS avg_price
    FROM orders
    GROUP BY 1, 2
    """,
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals (50k-wide buckets) — the
    distribution-profiling aggregate every data-quality dashboard runs.
    Bucket assignment is map-side arithmetic; the shuffle carries one
    partial row per (partition, bucket)."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000).cast("long")
    return (
        orders.groupBy(bucket.alias("bucket"), (bucket * 50000).alias("bucket_lo"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
    )


@query(
    "q_agg_zscore_outliers",
    oracle="""
    WITH stats AS (
      SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, round(e.value, 2) AS value,
           round((e.value - s.mu) / s.sigma, 4) AS zscore
    FROM events e JOIN stats s ON e.event_type = s.event_type
    WHERE abs((e.value - s.mu) / s.sigma) > 2.5
    """,
)
def q_agg_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score anomaly detection: events whose value sits >2.5σ from their
    type's mean. The per-type stats table is tiny (5 rows) → broadcast;
    the corpus side stays map-local, so the detector is one scan + one
    broadcast join at any scale."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 2.5)
        .select(
            "event_id",
            "event_type",
            F.round("value", 2).alias("value"),
            F.round(z, 4).alias("zscore"),
        )
    )


@query(
    "q_events_transition",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ),
    counts AS (
      SELECT prev_type, event_type AS next_type, count(*) AS n
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT prev_type, next_type, n,
           round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev_type), 4) AS prob
    FROM counts
    """,
)
def q_events_transition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition matrix over per-user event sequences: bigram
    (prev_type → next_type) counts and row-normalized probabilities.
    One user_id shuffle for the lag, then a 25-row aggregate — the
    sequence-analytics building block for next-event prediction."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    order_w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    seq = ev.select(
        "event_type", F.lag("event_type").over(order_w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    norm_w = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") * 1.0 / F.sum("n").over(norm_w), 4).alias("prob"),
    )


@query(
    "q_agg_moments",
    oracle="""
    WITH mu AS (
      SELECT event_type, avg(value) AS m1 FROM events GROUP BY event_type
    ),
    moments AS (
      SELECT e.event_type,
             avg(pow(e.value - mu.m1, 2)) AS m2,
             avg(pow(e.value - mu.m1, 3)) AS m3,
             avg(pow(e.value - mu.m1, 4)) AS m4
      FROM events e JOIN mu ON e.event_type = mu.event_type
      GROUP BY e.event_type
    )
    SELECT event_type,
           round(m2, 4) AS variance_pop,
           round(m3 / pow(m2, 1.5), 4) AS skewness_pop,
           round(m4 / pow(m2, 2) - 3, 4) AS excess_kurtosis_pop
    FROM moments
    """,
)
def q_agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher statistical moments per event_type: population variance,
    skewness, excess kurtosis — spelled as explicit central moments on
    BOTH engines because builtin skewness/kurtosis differ (Spark is
    population-form, DuckDB sample-corrected). Two aggregation passes
    (mean, then centered powers) with the tiny means table broadcast."""
    ev = load_table(spark, sf_dir, "events")
    mu = ev.groupBy("event_type").agg(F.avg("value").alias("m1"))
    centered = ev.join(F.broadcast(mu), "event_type").select(
        "event_type", (F.col("value") - F.col("m1")).alias("d")
    )
    m = centered.groupBy("event_type").agg(
        F.avg(F.pow("d", 2)).alias("m2"),
        F.avg(F.pow("d", 3)).alias("m3"),
        F.avg(F.pow("d", 4)).alias("m4"),
    )
    return m.select(
        "event_type",
        F.round("m2", 4).alias("variance_pop"),
        F.round(F.col("m3") / F.pow("m2", 1.5), 4).alias("skewness_pop"),
        F.round(F.col("m4") / F.pow("m2", 2) - 3, 4).alias("excess_kurtosis_pop"),
    )


@query("q_agg_approx_percentile")
def q_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (Greenwald-Khanna sketch) of o_totalprice
    per priority — the mergeable-quantile path that replaces d10's exact
    percentile at 100 TB (exact needs a per-group sort; the sketch is a
    bounded-size mergeable partial, same shape as the HLL rollup d16).

    Rows-only: sketch internals are engine-specific; the ≤2% error gate
    vs the exact d10 twin is asserted in tests/test_plans.py.
    """
    orders = load_table(spark, sf_dir, "orders")
    pcts = F.percentile_approx("o_totalprice", [0.5, 0.9], 10000)
    return orders.groupBy("o_orderpriority").agg(
        F.round(pcts[0], 2).alias("p50_approx"),
        F.round(pcts[1], 2).alias("p90_approx"),
    )


@query(
    "q_agg_iqr_outliers",
    oracle="""
    WITH q AS (
      SELECT o_orderpriority,
             quantile_cont(o_totalprice, 0.25) AS q1,
             quantile_cont(o_totalprice, 0.75) AS q3
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o.o_orderpriority,
           round(q.q1, 2) AS q1, round(q.q3, 2) AS q3,
           CAST(count(*) FILTER (o.o_totalprice > q.q3 + 1.5 * (q.q3 - q.q1))
                AS BIGINT) AS n_high_outliers,
           CAST(count(*) FILTER (o.o_totalprice < q.q1 - 1.5 * (q.q3 - q.q1))
                AS BIGINT) AS n_low_outliers,
           count(*) AS n_orders
    FROM orders o JOIN q ON o.o_orderpriority = q.o_orderpriority
    GROUP BY o.o_orderpriority, q.q1, q.q3
    """,
)
def q_agg_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey IQR outlier detection: per-priority exact quartiles, 1.5×IQR
    fences, outlier counts above/below — the robust complement to the
    z-score detector (d18). Quartiles come from one exact-percentile agg
    (tiny result, broadcast back over the scan); both engines use linear
    interpolation so the fences agree bit-for-bit."""
    orders = load_table(spark, sf_dir, "orders")
    q = orders.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", 0.25).alias("q1"),
        F.percentile("o_totalprice", 0.75).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    hi, lo = F.col("q3") + 1.5 * iqr, F.col("q1") - 1.5 * iqr
    return (
        orders.join(F.broadcast(q), "o_orderpriority")
        .groupBy("o_orderpriority", "q1", "q3")
        .agg(
            F.sum(F.when(F.col("o_totalprice") > hi, 1).otherwise(0)).cast("long").alias("n_high_outliers"),
            F.sum(F.when(F.col("o_totalprice") < lo, 1).otherwise(0)).cast("long").alias("n_low_outliers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            "o_orderpriority",
            F.round("q1", 2).alias("q1"),
            F.round("q3", 2).alias("q3"),
            "n_high_outliers",
            "n_low_outliers",
            "n_orders",
        )
    )


@query(
    "q_gini_concentration",
    oracle="""
    WITH rev AS (
      SELECT o_custkey, CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT cents, row_number() OVER (ORDER BY cents, o_custkey) AS i FROM rev
    ),
    sums AS (
      SELECT count(*) AS n,
             CAST(sum(cents) AS BIGINT) AS total,
             CAST(sum(i * cents) AS BIGINT) AS weighted
      FROM ranked
    )
    SELECT n AS n_customers, total AS total_cents,
           CAST(floor((2.0 * weighted - (n + 1.0) * total)
                      / (CAST(n AS DOUBLE) * total) * 1000000) AS BIGINT) AS gini_x1e6
    FROM sums
    """,
)
def q_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration — how unequal
    the spend distribution is (0 = uniform, →1 = one whale). Uses the
    rank formula G = (2·Σ i·xᵢ − (n+1)·Σ xᵢ) / (n·Σ xᵢ) over ascending
    per-customer totals.

    Hash-match discipline: revenue is floored to integer cents
    per-ORDER before summing (double summation order never matters),
    the rank products stay in BIGINT, and only the final ratio touches
    floating point — one divide of identical integers on both engines,
    floor-scaled to 1e6.

    Scale: the rank IS the two-pass distributed ranking
    (functions/ranks.py global_row_number — per-partition local index +
    offset broadcast), not a single-partition window, so the per-customer
    aggregate can grow to billions of rows without funnelling through
    one task.
    """
    from recommendersystems_bigdata_spark.functions.ranks import global_row_number

    orders = load_table(spark, sf_dir, "orders")

    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).cast("long").alias("cents")
    )
    ranked = global_row_number(
        rev, [F.col("cents").asc(), F.col("o_custkey").asc()], "i"
    ).select("cents", "i")
    sums = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").cast("long").alias("total"),
        F.sum(F.col("i") * F.col("cents")).cast("long").alias("weighted"),
    )
    gini = (
        (2.0 * F.col("weighted") - (F.col("n") + 1.0) * F.col("total"))
        / (F.col("n").cast("double") * F.col("total"))
        * 1_000_000
    )
    return sums.select(
        F.col("n").alias("n_customers"),
        F.col("total").alias("total_cents"),
        F.floor(gini).cast("long").alias("gini_x1e6"),
    )


@query(
    "q_quantile_binning",
    oracle="""
    WITH binned AS (
      SELECT o_totalprice,
             ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      FROM orders
    )
    SELECT CAST(decile AS BIGINT) AS decile, count(*) AS n_orders,
           min(o_totalprice) AS lo, max(o_totalprice) AS hi,
           round(sum(o_totalprice), 2) AS total
    FROM binned GROUP BY decile
    """,
)
def q_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth decile binning of order value — quantile discretization,
    the feature-binning step ML pipelines run before one-hot/monotonic
    encoders (and the equi-DEPTH complement of the fixed-width histogram
    d17). ntile is made deterministic by the unique-key tie-break.

    Scale: the exact ntile runs as the distributed global-ntile
    (functions/ranks.py) — range-partitioned two-pass, no
    Exchange SinglePartition over the orders table. At 1000× the bins
    can also come from approx-percentile cut points (d21) broadcast back
    over the scan — one pass, no sort — when exactness isn't required.
    """
    from recommendersystems_bigdata_spark.functions.ranks import global_ntile

    orders = load_table(spark, sf_dir, "orders")
    binned = global_ntile(
        orders.select("o_totalprice", "o_orderkey"),
        [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()],
        10,
        "decile",
    )
    return binned.groupBy(F.col("decile").cast("long").alias("decile")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@query(
    "q_skew_report",
    oracle="""
    WITH per_key AS (
      SELECT l_partkey, count(*) AS n_rows FROM lineitem GROUP BY l_partkey
    ),
    total AS (SELECT count(*) AS n_total FROM lineitem)
    SELECT l_partkey, n_rows, CAST(rn AS BIGINT) AS rank,
           CAST(floor(CAST(n_rows AS DOUBLE) * 1000000 / n_total) AS BIGINT)
             AS share_x1e6
    FROM (
      SELECT *, row_number() OVER (ORDER BY n_rows DESC, l_partkey) AS rn
      FROM per_key
    ), total
    WHERE rn <= 20
    """,
)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic: the 20 heaviest l_partkey values and
    their share of all lineitem rows — the pre-flight a pipeline runs
    before a big join to decide whether a key needs the salted treatment
    (l8) or AQE skew-join splitting. Purely integer counts.

    Scale: per-key counts combine map-side; the top-20 is a
    TakeOrderedAndProject over the (small) per-key aggregate, and the
    1-row total broadcasts — nothing here grows with the fact table
    beyond the first agg.
    """
    li = load_table(spark, sf_dir, "lineitem")
    from pyspark.sql import Window

    per_key = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_rows"))
    total = li.agg(F.count(F.lit(1)).alias("n_total"))
    # limit-first: the sort+limit lowers to TakeOrderedAndProject (each
    # partition keeps its local top-20, the driver merges) — the ranking
    # window then runs over 20 rows, never the full per-key aggregate.
    top = per_key.orderBy(F.col("n_rows").desc(), "l_partkey").limit(20)
    ranked = top.withColumn(
        "rank", F.row_number().over(Window.orderBy(F.col("n_rows").desc(), "l_partkey")).cast("long")
    )
    return ranked.crossJoin(F.broadcast(total)).select(
        "l_partkey",
        "n_rows",
        "rank",
        F.floor(F.col("n_rows").cast("double") * 1_000_000 / F.col("n_total"))
        .cast("long")
        .alias("share_x1e6"),
    )


@query(
    "q_anomaly_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, abs(e.value - m.med) AS dev, m.med
      FROM events e JOIN med m ON e.event_type = m.event_type
    ),
    mad AS (
      SELECT event_type, quantile_cont(dev, 0.5) AS mad FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           round(d.med, 4) AS med,
           round(m.mad, 4) AS mad,
           count(*) AS n_events,
           CAST(count(*) FILTER (d.dev > 4.4478 * m.mad) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    GROUP BY d.event_type, d.med, m.mad
    """,
)
def q_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection via median absolute deviation: events
    whose |value − median| exceeds 3σ-equivalent (3 × 1.4826 × MAD) of
    their type — the outlier fence that, unlike z-scores (d18), a few
    extreme points cannot drag. Completes the robust-stats trio with
    the IQR fences (d22).

    Two tiny per-type medians broadcast back over the scan; abs and the
    fence comparison are single IEEE ops on identical operands, so
    counts match the oracle exactly.

    Scale: three passes over events with a broadcast join each — at
    100 TB the exact medians swap for percentile_approx partials (d21's
    mergeable-sketch path) and it becomes one pass.
    """
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.percentile("value", 0.5).alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("dev")
    )
    mad = dev.groupBy("event_type").agg(F.percentile("dev", 0.5).alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("dev") > 4.4478 * F.col("mad"), 1).otherwise(0))
            .cast("long")
            .alias("n_outliers"),
        )
        .select(
            "event_type",
            F.round("med", 4).alias("med"),
            F.round("mad", 4).alias("mad"),
            "n_events",
            "n_outliers",
        )
    )


@query(
    "q_repeat_purchase_rate",
    oracle="""
    WITH per_cust AS (
      SELECT c_mktsegment, o_custkey, count(*) AS n_orders
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment, o_custkey
    )
    SELECT c_mktsegment,
           count(*) AS n_buyers,
           CAST(count(*) FILTER (n_orders >= 2) AS BIGINT) AS n_repeat,
           CAST(floor(CAST(count(*) FILTER (n_orders >= 2) AS DOUBLE) * 1000000
                      / count(*)) AS BIGINT) AS repeat_x1e6,
           CAST(floor(CAST(sum(n_orders) AS DOUBLE) * 100 / count(*)) AS BIGINT)
             AS avg_orders_x100
    FROM per_cust GROUP BY c_mktsegment
    """,
)
def q_repeat_purchase_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase rate per market segment: share of buyers with ≥2
    orders plus mean order count — the loyalty KPI next to RFM (e10).
    Exact integer counts end-to-end; the ratios are floor-scaled single
    divides (round() of an integer ratio is the half-way-decimal trap:
    Spark rounds the shortest decimal repr HALF_UP, DuckDB rounds the
    binary value — 403/40 = 10.075 produced 10.08 vs 10.07).

    Scale: the per-customer rollup shuffles once on the customer key
    (the dimension join broadcasts); the segment rollup is 5 groups.
    """
    orders, cust = load_tables(spark, sf_dir, "orders", "customer")
    per_cust = (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment", "o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    repeat = F.sum(F.when(F.col("n_orders") >= 2, 1).otherwise(0))
    return per_cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_buyers"),
        repeat.cast("long").alias("n_repeat"),
        F.floor(repeat.cast("double") * 1_000_000 / F.count(F.lit(1)))
        .cast("long")
        .alias("repeat_x1e6"),
        F.floor(F.sum("n_orders").cast("double") * 100 / F.count(F.lit(1)))
        .cast("long")
        .alias("avg_orders_x100"),
    )


@query(
    "q_drift_chi2",
    oracle="""
    WITH mid AS (
      SELECT epoch_us(CAST(min(ts) AS TIMESTAMP))
             + (epoch_us(CAST(max(ts) AS TIMESTAMP))
                - epoch_us(CAST(min(ts) AS TIMESTAMP))) // 2 AS mid_us
      FROM events
    ),
    halves AS (
      SELECT event_type,
             CASE WHEN epoch_us(CAST(ts AS TIMESTAMP)) < mid_us
                  THEN 'first' ELSE 'second' END AS half
      FROM events, mid
    ),
    cells AS (
      SELECT event_type, half, count(*) AS o FROM halves GROUP BY event_type, half
    ),
    totals AS (
      SELECT c.event_type, c.half, c.o,
             sum(c.o) OVER (PARTITION BY c.event_type) AS row_t,
             sum(c.o) OVER (PARTITION BY c.half) AS col_t,
             sum(c.o) OVER () AS grand
      FROM cells c
    )
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           CAST(sum(CAST(floor(
             (o - CAST(row_t * col_t AS DOUBLE) / grand)
             * (o - CAST(row_t * col_t AS DOUBLE) / grand)
             / (CAST(row_t * col_t AS DOUBLE) / grand) * 1000000) AS BIGINT))
             AS BIGINT) AS chi2_x1e6
    FROM totals
    """,
)
def q_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift detection: χ² statistic of the event-type mix,
    first half of the time range vs second — the temporal drift check a
    pipeline runs before trusting a model trained on last month's mix.

    Every χ² term is a single-IEEE-op chain from exact integer counts
    (observed, row/col/grand totals), floor-scaled to an integer BEFORE
    the sum — so no double summation order anywhere and the statistic
    hash-matches exactly.

    Scale: one contingency-table aggregate (types × 2 cells) carries the
    whole corpus; the window totals run over that tiny table.
    """
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    b = ev.agg(
        F.unix_micros(F.min("ts").cast("timestamp")).alias("lo"),
        F.unix_micros(F.max("ts").cast("timestamp")).alias("hi"),
    )
    halves = ev.crossJoin(F.broadcast(b)).select(
        "event_type",
        F.when(
            F.unix_micros(F.col("ts").cast("timestamp"))
            < F.col("lo") + F.floor((F.col("hi") - F.col("lo")) / 2),
            "first",
        )
        .otherwise("second")
        .alias("half"),
    )
    cells = halves.groupBy("event_type", "half").agg(F.count(F.lit(1)).alias("o"))
    totals = cells.select(
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("row_t"),
        F.sum("o").over(Window.partitionBy("half")).alias("col_t"),
        F.sum("o").over(Window.partitionBy()).alias("grand"),
    )
    e = (F.col("row_t") * F.col("col_t")).cast("double") / F.col("grand")
    term = F.floor((F.col("o") - e) * (F.col("o") - e) / e * 1_000_000).cast("long")
    return totals.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum(term).cast("long").alias("chi2_x1e6"),
    )


@query(
    "q_ab_test_proportions",
    oracle="""
    WITH per_user AS (
      SELECT user_id, user_id % 2 = 0 AS in_a,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_p
      FROM events GROUP BY user_id
    ),
    tot AS (
      SELECT count(*) AS n_users, CAST(sum(n_p) AS BIGINT) AS total_p FROM per_user
    ),
    assigned AS (
      SELECT in_a,
             CASE WHEN n_p * n_users > total_p THEN 1 ELSE 0 END AS converted
      FROM per_user, tot
    ),
    arms AS (
      SELECT CAST(count(*) FILTER (in_a) AS BIGINT) AS n_a,
             CAST(count(*) FILTER (NOT in_a) AS BIGINT) AS n_b,
             CAST(sum(converted) FILTER (in_a) AS BIGINT) AS c_a,
             CAST(sum(converted) FILTER (NOT in_a) AS BIGINT) AS c_b
      FROM assigned
    )
    SELECT n_a, n_b, c_a, c_b,
           CAST(floor((CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
                      * 1000000) AS BIGINT) AS uplift_x1e6,
           CASE WHEN c_a + c_b = 0 OR c_a + c_b = n_a + n_b THEN NULL
                ELSE CAST(floor(
             (CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
             / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                    * (1 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                    * (CAST(n_a + n_b AS DOUBLE) / (CAST(n_a AS DOUBLE) * n_b)))
             * 10000) AS BIGINT) END AS zstat_x1e4
    FROM arms
    """,
)
def q_ab_test_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B test: users split deterministically by key
    parity, per-user purchase conversion compared with the pooled
    z-statistic — the experimentation readout every growth team runs.

    All inputs are exact integers; uplift and z are single-IEEE-op
    chains floor-scaled at the end, so the statistic hash-matches.

    Scale: one per-user aggregate (shuffle on user_id), then a 1-row
    reduction — assignment is a map-side expression (hash-mod in
    production so arms stay stable under resharding, cf. l20).

    Round 11: the per-user relation is localCheckpoint-PINNED — it
    feeds both the 1-row totals and the assignment pass, and Catalyst
    gave the duplicated subtree no exchange reuse, so the whole events
    fact was scanned and user-shuffled TWICE (2 parquet scans in
    plans/r11/q_ab_test_proportions_before.txt; measured 8.2 s → ~3 s
    at sf0.1). Pinning the (user_id, n_p) reduction — 16 bytes/user —
    is the §2.AX spend-census discipline: materialize the reduced
    relation once, never re-run the fact pass."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("n_p")
    ).localCheckpoint()
    tot = per_user.agg(
        F.count(F.lit(1)).alias("n_users"), F.sum("n_p").cast("long").alias("total_p")
    )
    assigned = per_user.crossJoin(F.broadcast(tot)).select(
        (F.col("user_id") % 2 == 0).alias("in_a"),
        F.when(F.col("n_p") * F.col("n_users") > F.col("total_p"), 1)
        .otherwise(0)
        .alias("converted"),
    )
    arms = assigned.agg(
        F.sum(F.col("in_a").cast("int")).cast("long").alias("n_a"),
        F.sum((~F.col("in_a")).cast("int")).cast("long").alias("n_b"),
        F.sum(F.when(F.col("in_a"), F.col("converted")).otherwise(0)).cast("long").alias("c_a"),
        F.sum(F.when(~F.col("in_a"), F.col("converted")).otherwise(0)).cast("long").alias("c_b"),
    )
    pa = F.col("c_a").cast("double") / F.col("n_a")
    pb = F.col("c_b").cast("double") / F.col("n_b")
    pool = (F.col("c_a") + F.col("c_b")).cast("double") / (F.col("n_a") + F.col("n_b"))
    se = F.sqrt(
        pool
        * (1 - pool)
        * ((F.col("n_a") + F.col("n_b")).cast("double") / (F.col("n_a").cast("double") * F.col("n_b")))
    )
    return arms.select(
        "n_a",
        "n_b",
        "c_a",
        "c_b",
        F.floor((pa - pb) * 1_000_000).cast("long").alias("uplift_x1e6"),
        F.when(
            (F.col("c_a") + F.col("c_b") > 0)
            & (F.col("c_a") + F.col("c_b") < F.col("n_a") + F.col("n_b")),
            F.floor((pa - pb) / se * 10_000),
        )
        .cast("long")
        .alias("zstat_x1e4"),
    )
