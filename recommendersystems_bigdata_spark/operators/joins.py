"""Join operators (SURVEY.md §2.C).

Scale stance: dimension tables (region/nation, and at test scale customer/
part/supplier) sit far below the broadcast threshold, so star joins plan as
BroadcastHashJoin chains with zero fact-side shuffles; the planner does this
automatically and q_join_broadcast pins it with explicit hints. Fact-fact
joins (self co-occurrence, event pairs) shuffle on their equi keys — the
partitioning a 1000-executor cluster co-locates on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table, load_tables
from recommendersystems_bigdata_spark.functions.exactmath import revenue_sum_col, revenue_sum_sql
from recommendersystems_bigdata_spark.registry import query


@query(
    "q_join_inner_equi",
    oracle="""
    SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def q_join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c1 — inner equi join; planner picks broadcast vs sort-merge by size."""
    orders, customer = load_tables(spark, sf_dir, "orders", "customer")
    return orders.join(customer, orders.o_custkey == customer.c_custkey, "inner").select(
        "o_orderkey", "o_custkey", "c_name", "c_mktsegment", "o_totalprice"
    )


_STAR_ORACLE = f"""
    SELECT r_name, n_name,
           {revenue_sum_sql()} AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
"""


@query("q_join_star_multiway", oracle=_STAR_ORACLE)
def q_join_star_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c2 — 5-way star join, revenue per region × nation.

    Catalyst broadcast-joins each dim onto the lineitem stream; the only
    shuffle is the final 2-key aggregation.
    """
    li, orders, customer, nation, region = load_tables(
        spark, sf_dir, "lineitem", "orders", "customer", "nation", "region"
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            revenue_sum_col().alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query("q_join_broadcast", oracle=_STAR_ORACLE)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c7 — same star join with *explicit* broadcast hints on the dims.

    Same result as c2 (the hint is physical-only); at 100 TB the hints
    guarantee the true dims (customer/nation/region) never shuffle even if
    size stats are stale. `orders` is a FACT table (~1.5B rows at 100 TB)
    and deliberately carries NO hint: the orders⋈lineitem leg must stay
    sort-merge/shuffled-hash (or bucketed — see tests/test_bucketing.py);
    broadcasting it would OOM the driver at scale. Plan shape is asserted
    in tests/test_plans.py.
    """
    li, orders, customer, nation, region = load_tables(
        spark, sf_dir, "lineitem", "orders", "customer", "nation", "region"
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            revenue_sum_col().alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q_join_left_outer",
    oracle="""
    SELECT c_custkey, c_name,
           count(o_orderkey) AS n_orders,
           round(coalesce(sum(o_totalprice), 0), 2) AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def q_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c3 — left outer join preserving order-less customers (n_orders = 0)."""
    orders, customer = load_tables(spark, sf_dir, "orders", "customer")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


@query(
    "q_join_full_outer",
    oracle="""
    SELECT coalesce(c.c_custkey, o.o_custkey) AS entity_key,
           (c.c_custkey IS NOT NULL) AS has_customer_row,
           (o.o_custkey IS NOT NULL) AS has_orders
    FROM (SELECT c_custkey FROM customer WHERE c_acctbal > 9000) c
    FULL JOIN (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 450000) o
      ON c.c_custkey = o.o_custkey
    """,
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c4 — full outer join: nulls materialize on both sides."""
    orders, customer = load_tables(spark, sf_dir, "orders", "customer")
    rich = customer.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    buyers = orders.filter(F.col("o_totalprice") > 450000).select("o_custkey").distinct()
    return rich.join(buyers, rich.c_custkey == buyers.o_custkey, "full").select(
        F.coalesce(F.col("c_custkey"), F.col("o_custkey")).alias("entity_key"),
        F.col("c_custkey").isNotNull().alias("has_customer_row"),
        F.col("o_custkey").isNotNull().alias("has_orders"),
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c5 — left semi join: customers with ≥1 order, no right columns."""
    orders, customer = load_tables(spark, sf_dir, "orders", "customer")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_acctbal")


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c6 — left anti join: customers with zero orders."""
    orders, customer = load_tables(spark, sf_dir, "orders", "customer")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


@query(
    "q_join_theta_range",
    oracle="""
    SELECT a.event_type AS first_type,
           count(*) AS n_pairs,
           round(avg(epoch_us(CAST(b.ts AS TIMESTAMP)) - epoch_us(CAST(a.ts AS TIMESTAMP))) / 1000000, 2) AS avg_gap_sec
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND CAST(b.ts AS TIMESTAMP) <= CAST(a.ts AS TIMESTAMP) + INTERVAL 1 HOUR
    GROUP BY a.event_type
    """,
)
def q_join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c8 — equi + range θ-join: same-user event pairs within one hour.

    The equi conjunct (user_id) keeps this a hash/sort-merge join — the range
    predicate is applied post-match, so no nested-loop blowup at scale.
    """
    events = load_table(spark, sf_dir, "events")
    a = events.alias("a")
    b = events.alias("b")
    pair = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 1 HOUR")),
    )
    gap_us = F.unix_micros(F.col("b.ts").cast("timestamp")) - F.unix_micros(
        F.col("a.ts").cast("timestamp")
    )
    return pair.groupBy(F.col("a.event_type").alias("first_type")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg(gap_us) / 1000000, 2).alias("avg_gap_sec"),
    )


@query(
    "q_join_cross_topn",
    oracle="""
    WITH grid AS (
      SELECT r_regionkey, r_name, p.o_orderpriority
      FROM region CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) p
    ),
    actual AS (
      SELECT n_regionkey AS rk, o_orderpriority, count(*) AS n
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      GROUP BY n_regionkey, o_orderpriority
    )
    SELECT g.r_name, g.o_orderpriority,
           CAST(coalesce(a.n, 0) AS BIGINT) AS n_orders
    FROM grid g LEFT JOIN actual a
      ON g.r_regionkey = a.rk AND g.o_orderpriority = a.o_orderpriority
    """,
)
def q_join_cross_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c9 — bounded cross join: full region × priority grid with zero-fill.

    Cross join is safe precisely because both sides are tiny dims (5 × 5);
    the counts come from a separate star-join aggregate that never crosses.
    """
    orders, customer, nation, region = load_tables(
        spark, sf_dir, "orders", "customer", "nation", "region"
    )
    grid = region.select("r_regionkey", "r_name").crossJoin(
        orders.select("o_orderpriority").distinct()
    )
    actual = (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_regionkey").alias("rk"), "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return grid.join(
        actual,
        (grid.r_regionkey == actual.rk) & (grid.o_orderpriority == actual.o_orderpriority),
        "left",
    ).select(
        grid.r_name,
        grid.o_orderpriority,
        F.coalesce(actual.n, F.lit(0)).cast("long").alias("n_orders"),
    )


@query(
    "q_join_asof",
    oracle="""
    WITH latest_order AS (
      SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    )
    SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
           o.o_orderkey AS asof_orderkey, o.o_orderdate AS asof_orderdate, o.o_totalprice AS asof_totalprice
    FROM events e
    JOIN latest_order o
      ON e.user_id = o.o_custkey AND o.rn = 1 AND o.o_orderdate <= CAST(e.ts AS TIMESTAMP)
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c10 — as-of join: each event paired with the customer's latest order
    at or before the event time.

    Spark has no native ASOF; the scalable pattern is a window `row_number`
    over the right side keyed by the join key, then an equi join — one
    shuffle per side on the key, no range explosion. Ties on o_orderdate are
    broken by o_orderkey DESC for determinism. (All orders predate all
    events in this corpus, so rn=1 can be hoisted before the join; the
    general form filters rn=1 *after* the as-of inequality.)
    """
    events, orders = load_tables(spark, sf_dir, "events", "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    latest = (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
    )
    return events.join(
        latest,
        (events.user_id == latest.o_custkey) & (latest.o_orderdate <= events.ts),
    ).select(
        "event_id",
        "user_id",
        "ts",
        F.col("o_orderkey").alias("asof_orderkey"),
        F.col("o_orderdate").alias("asof_orderdate"),
        F.col("o_totalprice").alias("asof_totalprice"),
    )


@query(
    "q_join_self_cooccur",
    oracle="""
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_orders_together
    FROM lineitem a
    JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY a.l_partkey, b.l_partkey
    """,
)
def q_join_self_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c11 — self join: item-item co-occurrence within an order.

    Shuffles both aliases on l_orderkey (co-located pair generation), then
    re-aggregates on the pair key — the canonical item-based CF prep.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders_together"))
    )


@query(
    "q_subquery_in",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (
      SELECT c_custkey FROM customer
      WHERE c_acctbal >= (SELECT quantile_cont(c_acctbal, 0.9) FROM customer)
    )
    """,
)
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c12 — IN-subquery (Catalyst rewrites to a left-semi join)."""
    orders, customer = load_tables(spark, sf_dir, "orders", "customer")
    threshold = customer.agg(F.percentile("c_acctbal", 0.9).alias("thr"))
    top = customer.crossJoin(F.broadcast(threshold)).filter(
        F.col("c_acctbal") >= F.col("thr")
    ).select("c_custkey")
    return orders.join(
        top, orders.o_custkey == top.c_custkey, "left_semi"
    ).select("o_orderkey", "o_custkey", "o_totalprice")


@query(
    "q_subquery_scalar_corr",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_nationkey, c.c_acctbal
    FROM customer c
    JOIN (SELECT c_nationkey, avg(c_acctbal) AS nation_avg
          FROM customer GROUP BY c_nationkey) n
      ON c.c_nationkey = n.c_nationkey
    WHERE c.c_acctbal > n.nation_avg
    """,
)
def q_subquery_scalar_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c13 — correlated scalar subquery, hand-decorrelated to agg + join.

    The decorrelated form is exactly what Catalyst's RewriteCorrelatedScalarSubquery
    produces; writing it directly keeps one aggregation pass over customer.
    """
    customer = load_table(spark, sf_dir, "customer")
    nation_avg = customer.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.avg("c_acctbal").alias("nation_avg")
    )
    return (
        customer.join(F.broadcast(nation_avg), customer.c_nationkey == nation_avg.nk)
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    )


@query(
    "q_join_skew_salted",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_items,
           round(sum(l_extendedprice), 2) AS total_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant salted join — identical results to the plain join
    (same oracle), different physical distribution.

    The probe side tags each row with salt = crc32(key) % S; the build
    side is exploded into S copies, one per salt value, and the join key
    becomes (key, salt). A hot key's rows now spread over S reducers
    instead of hammering one — the manual fallback when AQE skew-join
    splitting can't help (e.g. a skewed build side below the split
    threshold, or a non-AQE engine). S=8 here; at 100 TB S is sized to
    the observed hot-key factor.
    """
    num_salts = 8
    li, orders = load_tables(spark, sf_dir, "lineitem", "orders")
    probe = li.select("l_orderkey", "l_extendedprice").withColumn(
        "salt", F.pmod(F.crc32(F.col("l_orderkey").cast("string")), F.lit(num_salts))
    )
    build = orders.select("o_orderkey", "o_orderpriority").withColumn(
        "salt", F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(num_salts)]))
    )
    return (
        probe.join(
            build,
            (probe.l_orderkey == build.o_orderkey) & (probe.salt == build.salt),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
    )


_BLOOM_P = (1 << 31) - 1
_BLOOM_M = 4096  # bits
_BLOOM_COEF = [(3, 101), (5, 211), (7, 307)]  # k = 3 hash functions


@query(
    "q_bloom_prefilter",
    oracle=f"""
    WITH buyers AS (SELECT DISTINCT o_custkey FROM orders
                    WHERE o_totalprice > 450000),
    bh AS (
      SELECT o_custkey,
             CAST(CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))
                  AS UBIGINT) AS BIGINT) % {_BLOOM_P} AS h60
      FROM buyers
    ),
    bloom AS (
      SELECT DISTINCT pos FROM (
        {" UNION ALL ".join(
            f"SELECT (({a} * h60 + {b}) % {_BLOOM_P}) % {_BLOOM_M} AS pos FROM bh"
            for a, b in _BLOOM_COEF)}
      )
    ),
    ch AS (
      SELECT c_custkey,
             CAST(CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))
                  AS UBIGINT) AS BIGINT) % {_BLOOM_P} AS h60
      FROM customer
    ),
    probes AS (
      {" UNION ALL ".join(
          f"SELECT c_custkey, (({a} * h60 + {b}) % {_BLOOM_P}) % {_BLOOM_M} AS pos FROM ch"
          for a, b in _BLOOM_COEF)}
    ),
    verdict AS (
      SELECT p.c_custkey,
             count(*) FILTER (bloom.pos IS NOT NULL) = 3 AS bloom_pass
      FROM probes p LEFT JOIN bloom ON p.pos = bloom.pos
      GROUP BY p.c_custkey
    ),
    truth AS (
      SELECT c_custkey,
             EXISTS (SELECT 1 FROM buyers b WHERE b.o_custkey = c_custkey)
               AS is_buyer
      FROM customer
    )
    SELECT CAST(count(*) FILTER (is_buyer AND bloom_pass) AS BIGINT) AS true_pass,
           CAST(count(*) FILTER (NOT is_buyer AND bloom_pass) AS BIGINT) AS false_pass,
           CAST(count(*) FILTER (NOT is_buyer AND NOT bloom_pass) AS BIGINT)
             AS true_drop,
           CAST(count(*) FILTER (is_buyer AND NOT bloom_pass) AS BIGINT)
             AS false_drop
    FROM verdict JOIN truth USING (c_custkey)
    """,
)
def q_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Bloom-filter pre-join filter: a 4096-bit / 3-hash
    filter built over the distinct high-value buyer keys (orders above
    450k), probed by every customer,
    scored against exact semi-join truth — the runtime-filter pattern
    (Spark's own InjectRuntimeFilter / DPP) made explicit and
    engine-portable. `false_drop` MUST be 0 (Bloom never false-negatives);
    `false_pass` is the measured false-positive cost.

    Scale: the filter is ≤ m distinct positions regardless of build-side
    size — broadcast it and the probe side filters BEFORE the shuffle,
    which is the whole point: a 100 TB fact scan drops non-matching rows
    at the scan for the cost of 3 integer hashes per row.
    """
    orders, customer = load_tables(spark, sf_dir, "orders", "customer")
    h = "CAST(conv(substring(md5(CAST({k} AS STRING)), 1, 15), 16, 10) AS BIGINT) % {p}"
    buyers = orders.filter(F.col("o_totalprice") > 450000).select("o_custkey").distinct()
    bh = buyers.selectExpr(
        "o_custkey", h.format(k="o_custkey", p=_BLOOM_P) + " AS h60"
    )
    positions = F.explode(
        F.array(*[((a * F.col("h60") + b) % _BLOOM_P) % _BLOOM_M for a, b in _BLOOM_COEF])
    )
    bloom = bh.select(positions.alias("pos")).distinct()
    ch = customer.selectExpr("c_custkey", h.format(k="c_custkey", p=_BLOOM_P) + " AS h60")
    probes = ch.select("c_custkey", positions.alias("pos"))
    verdict = (
        probes.join(F.broadcast(bloom.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy("c_custkey")
        .agg((F.sum(F.coalesce(F.col("hit"), F.lit(0))) == 3).alias("bloom_pass"))
    )
    truth = customer.join(
        buyers.withColumnRenamed("o_custkey", "c_custkey").withColumn("b", F.lit(1)),
        "c_custkey",
        "left",
    ).select("c_custkey", F.col("b").isNotNull().alias("is_buyer"))
    both = verdict.join(truth, "c_custkey")
    flag = lambda c: F.sum(c.cast("int")).cast("long")
    return both.agg(
        flag(F.col("is_buyer") & F.col("bloom_pass")).alias("true_pass"),
        flag(~F.col("is_buyer") & F.col("bloom_pass")).alias("false_pass"),
        flag(~F.col("is_buyer") & ~F.col("bloom_pass")).alias("true_drop"),
        flag(F.col("is_buyer") & ~F.col("bloom_pass")).alias("false_drop"),
    )


@query(
    "q_tpch_q3_shipping",
    oracle=f"""
    SELECT l_orderkey,
           {revenue_sum_sql()} AS revenue,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND CAST(o_orderdate AS DATE) < DATE '1995-03-15'
      AND CAST(l_shipdate AS DATE) > DATE '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): top-10 unshipped-revenue orders for
    one market segment as of a date — the classic 3-way join + agg +
    top-k every warehouse is benchmarked with.

    Scale: customer filters to one segment then broadcasts; lineitem and
    orders filters push to the scans; the top-10 lowers to
    TakeOrderedAndProject — the fact table shuffles once on the
    order key for the aggregate.
    """
    customer, orders, lineitem = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    cutoff = F.lit("1995-03-15").cast("date")
    joined = (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders.filter(F.col("o_orderdate").cast("date") < cutoff),
              F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem.filter(F.col("l_shipdate").cast("date") > cutoff),
              F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return (
        joined.groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(revenue_sum_col().alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "q_tpch_q5_local_volume",
    oracle=f"""
    SELECT n_name,
           {revenue_sum_sql()} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
    GROUP BY n_name
    """,
)
def q_tpch_q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): revenue per nation where the
    customer and supplier share a nation, one region, one order year —
    the 6-way join whose distinguishing twist is the c_nationkey =
    s_nationkey equi-conjunct ACROSS the two fact-side dims.

    Scale: nation/region/supplier broadcast; the orders date filter
    pushes to the scan; lineitem shuffles once on the order key. The
    nation equality rides the join condition, not a post-filter, so
    Catalyst prunes non-local pairs inside the join.
    """
    customer, orders, lineitem, supplier, nation, region = load_tables(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    od = F.col("o_orderdate").cast("date")
    return (
        customer.join(
            orders.filter(
                (od >= F.lit("1996-01-01").cast("date"))
                & (od < F.lit("1997-01-01").cast("date"))
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(revenue_sum_col().alias("revenue"))
    )


@query(
    "q_tpch_q10_returns",
    oracle=f"""
    SELECT c_custkey, c_name,
           {revenue_sum_sql()} AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND CAST(o_orderdate AS DATE) >= DATE '1996-10-01'
      AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): top-20 customers by revenue
    lost to returns in one quarter — fact filters pushed to both scans,
    dims broadcast, top-k lowered to TakeOrderedAndProject.
    """
    customer, orders, lineitem, nation = load_tables(
        spark, sf_dir, "customer", "orders", "lineitem", "nation"
    )
    od = F.col("o_orderdate").cast("date")
    return (
        customer.join(
            orders.filter(
                (od >= F.lit("1996-10-01").cast("date"))
                & (od < F.lit("1997-01-01").cast("date"))
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            lineitem.filter(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(revenue_sum_col().alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


@query(
    "q_tpch_q18_large_orders",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
           o_totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 250
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    """,
)
def q_tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total quantity
    exceeds a threshold, with their customers — the classic
    aggregate-derived IN-subquery that Catalyst rewrites to a semi-join.

    Scale: the HAVING pre-aggregate runs once over lineitem with map-side
    partials and produces a small key set; that set semi-joins the fact
    tables (broadcast when under threshold), so the second lineitem pass
    only aggregates the surviving orders.
    """
    customer, orders, lineitem = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(big.withColumnRenamed("l_orderkey", "big_key")),
            F.col("o_orderkey") == F.col("big_key"),
            "left_semi",
        )
        .groupBy(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("o_orderdate"),
            "o_totalprice",
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
    )


def asof_backward_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list,
) -> DataFrame:
    """General backward as-of join, merge-based (the scalable form).

    For every left row, attach the right row with the greatest
    ``right_ts <= left_ts`` for the same ``key`` — without a range join.
    Both sides are unioned into one (key, ts)-sorted stream (right rows
    sort BEFORE left rows at equal ts, so the match is inclusive), and
    the right payload is carried forward with ``last(..., ignorenulls)``
    over an unbounded-preceding row frame. One shuffle on the key, state
    linear in the window frame — the same plan shape at 100 TB, vs. the
    O(|left|·|right-per-key|) blow-up of the inequality-join spelling.

    Returns every left row plus the carried ``_asof_ts`` (the matched
    right timestamp, null if no prior right row) and the carried payload
    columns. Callers choose inner/left semantics and any tolerance bound
    by filtering on ``_asof_ts`` themselves.

    Requires (key, ts) unique per side for a deterministic result (the
    caller dedups ties first, picking its keep-best row — same contract
    as every engine's asof implementation).
    """
    left_cols = [c for c in left.columns]
    internals = {"_k", "_ts", "_side", "_r_ts", "_m", "_asof_ts"}
    reserved = (internals | {"ts"}) & set(payload_cols)
    if reserved:
        raise ValueError(f"payload column names collide with internals: {sorted(reserved)}")
    # The left frame's columns survive the union verbatim, so they must not
    # shadow the internal bookkeeping names either (a left `_k`/_ts/_side/
    # _r_ts would duplicate after the select; a left `_m`/_asof_ts would
    # collide with the carried-struct output).
    bad_left = internals & set(left_cols)
    if bad_left:
        raise ValueError(f"left column names collide with internals: {sorted(bad_left)}")
    overlap = set(left_cols) & set(payload_cols)
    if overlap:
        raise ValueError(f"payload columns shadow left columns: {sorted(overlap)}")
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r_ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload_cols],
    )
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        F.col(right_ts).alias("_r_ts"),
        *[F.col(c) for c in payload_cols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Carry ONE struct, not parallel columns: a right row with a null
    # payload FIELD must not tear (ignorenulls picking that field from an
    # older row) — the struct itself is non-null for every right row.
    pack = F.when(
        F.col("_side") == 0,
        F.struct(
            F.col("_r_ts").alias("ts"),
            *[F.col(c).alias(c) for c in payload_cols],
        ),
    )
    carried = F.last(pack, ignorenulls=True).over(w)
    return (
        l.unionByName(r)
        .select("_side", *left_cols, carried.alias("_m"))
        .filter(F.col("_side") == 1)
        .select(
            *left_cols,
            F.col("_m.ts").alias("_asof_ts"),
            *[F.col(f"_m.{c}").alias(c) for c in payload_cols],
        )
    )


@query(
    "q_join_asof_general",
    oracle="""
    WITH clicks AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'click'
    ),
    buys AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS bts,
             event_id AS buy_event_id, value
      FROM events WHERE event_type = 'purchase'
    ),
    joined AS MATERIALIZED (
      -- MATERIALIZED fences the tolerance predicate out of the ASOF
      -- binder (it would otherwise be pushed in and read as a second
      -- ASOF inequality, a BinderException)
      SELECT c.event_id, c.user_id, c.ts,
             b.buy_event_id AS buy_event_id,
             b.bts AS buy_ts,
             round(b.value, 2) AS buy_value
      FROM clicks c
      ASOF JOIN buys b
        ON c.user_id = b.user_id AND b.bts <= c.ts
    )
    SELECT * FROM joined WHERE buy_ts >= ts - INTERVAL 30 DAY
    """,
)
def q_join_asof_general(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c10b — GENERAL as-of join (interleaved timestamps): each click
    event paired with the same user's most recent purchase at or before
    the click, within a 30-day tolerance. Unlike c10 (whose right side is
    hoisted to rn=1 because all orders predate all events), clicks and
    purchases interleave, so this exercises the true merge-based as-of:
    union both sides, carry the purchase payload forward per user with an
    ignore-nulls last() over the (ts, side) order, then keep left rows
    inside tolerance.

    Scale: one shuffle on user_id for the merged stream; no inequality
    join, no per-left-row right scan. DuckDB's native ASOF JOIN is the
    oracle — the engine-portability proof for the carried-forward form.

    (user_id, ts) is unique corpus-wide [verified], so no tie-dedup pass
    is needed; the general contract is documented on asof_backward_join.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("buy_event_id"),
        F.round("value", 2).alias("buy_value"),
    )
    joined = asof_backward_join(
        clicks,
        buys,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        payload_cols=["buy_event_id", "buy_value"],
    )
    return (
        joined.filter(
            F.col("_asof_ts").isNotNull()
            & (F.col("_asof_ts") >= F.col("ts") - F.expr("INTERVAL 30 DAYS"))
        )
        .select(
            "event_id",
            "user_id",
            "ts",
            "buy_event_id",
            F.col("_asof_ts").alias("buy_ts"),
            "buy_value",
        )
    )
