"""Advanced relational analytics (SURVEY.md §2.U, round 9).

Second-tier SQL surface a warehouse user reaches for once the §2.C–§2.I
basics exist: interval-RANGE window frames, exact weighted medians,
correlated-EXISTS cohorting, strict sequential pattern matching,
bottom-k (KMV) distinct sketching with a deterministic estimate, exact
integer Gini impurity, and a bucketed point-in-interval join. Spark-first
shape: everything is DataFrame/window composition (no UDFs); every
measure that could tie or round is spelled in exact integers so results
are layout- and engine-invariant (the repo-wide discipline — see
functions/exactmath.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table, load_tables
from recommendersystems_bigdata_spark.registry import query

# KMV sketch width, and the 57-bit scale constant (2^57) used by the
# deterministic estimator below. 60-bit hash prefixes are right-shifted
# 3 bits before the divide so (k-1) * 2^57 stays inside int64.
_KMV_K = 64
_POW57 = 1 << 57

_CENTS = "CAST(floor({col} * 100 + 0.5) AS BIGINT)"


@query(
    "q_win_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER (
             PARTITION BY o_custkey
             ORDER BY datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS sum_30d_cents
    FROM orders
    ORDER BY o_orderkey
    """,
)
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.U u1 — time-interval RANGE window frame: for every order, the
    same customer's rolling 30-day spend ending at that order's date, in
    exact cents. RANGE (value-based) framing differs from the §2.E ROWS
    frames (e3): all orders on the same day fall in each other's frame
    regardless of intra-day row order, so the result is deterministic
    even under date ties — no tiebreak column needed.

    Scale: one hash-partition shuffle on o_custkey + one in-partition
    sort on the integer epoch-day key; the frame sum is streaming (Spark
    evaluates integer RANGE frames with a sliding accumulator, never
    re-summing per row)."""
    orders = load_table(spark, sf_dir, "orders")
    day = F.expr("datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')")
    cents = F.expr(_CENTS.format(col="o_totalprice"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day")
        .rangeBetween(-30, Window.currentRow)
    )
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            day.cast("int").alias("day"),
            cents.alias("cents"),
        )
        .withColumn("sum_30d_cents", F.sum("cents").over(w).cast("long"))
        .orderBy("o_orderkey")
    )


@query(
    "q_weighted_median",
    oracle="""
    WITH g AS (
      SELECT l_returnflag,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
             CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS w
      FROM lineitem GROUP BY 1, 2
    ), c AS (
      SELECT l_returnflag, cents, w,
             sum(w) OVER (PARTITION BY l_returnflag ORDER BY cents) AS cum,
             sum(w) OVER (PARTITION BY l_returnflag) AS total
      FROM g
    )
    SELECT l_returnflag,
           CAST(min(cents) AS BIGINT) AS median_cents,
           CAST(min(total) AS BIGINT) AS total_weight
    FROM c WHERE 2 * cum >= total
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.U u2 — exact weighted median: per return flag, the lower
    weighted median of extended price (cents) weighted by quantity —
    the smallest price whose cumulative weight reaches half the total.
    Pre-aggregating to (flag, cents) weight sums BEFORE the cumulative
    window removes the classic tie hazard: equal-price rows never
    straddle the crossing point, so the answer is independent of row
    order in both engines.

    Scale: one groupBy (flag, cents) collapses the fact to the distinct
    value set; the cumulative window then sorts only distinct prices per
    flag (bounded by price cardinality, not row count); the final min is
    a tiny aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    g = (
        li.select(
            "l_returnflag",
            F.expr(_CENTS.format(col="l_extendedprice")).alias("cents"),
            F.expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").alias("wt"),
        )
        .groupBy("l_returnflag", "cents")
        .agg(F.sum("wt").alias("w"))
    )
    wp = Window.partitionBy("l_returnflag")
    c = g.select(
        "l_returnflag",
        "cents",
        F.sum("w").over(wp.orderBy("cents")).alias("cum"),
        F.sum("w").over(wp).alias("total"),
    )
    return (
        c.filter(2 * F.col("cum") >= F.col("total"))
        .groupBy("l_returnflag")
        .agg(
            F.min("cents").cast("long").alias("median_cents"),
            F.min("total").cast("long").alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_exists_correlated",
    oracle="""
    WITH f AS (
      SELECT c_mktsegment,
             CASE WHEN EXISTS (
               SELECT 1 FROM orders o
               WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
             ) THEN 1 ELSE 0 END AS has_big
      FROM customer c
    )
    SELECT c_mktsegment,
           count(*) AS n_customers,
           CAST(sum(has_big) AS BIGINT) AS n_with_big_order,
           CAST(count(*) - sum(has_big) AS BIGINT) AS n_without_big_order
    FROM f GROUP BY 1 ORDER BY 1
    """,
)
def q_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.U u3 — correlated EXISTS cohorting: per market segment, how
    many customers have at least one order above 300k (EXISTS) vs none
    (NOT EXISTS). The Spark lowering is the standard decorrelation: a
    LEFT SEMI join marks the EXISTS cohort, and the complement falls out
    of the per-segment totals — no correlated subquery execution, no
    row-per-order fan-out.

    Scale: the order side is pre-filtered and projected to distinct
    custkeys BEFORE the semi join, so the join's build side is bounded
    by |customers with a big order|, not |orders|; one hash join + one
    |segments|-row aggregate."""
    customer, orders = load_tables(spark, sf_dir, "customer", "orders")
    big = (
        orders.filter(F.col("o_totalprice") > 300000)
        .select("o_custkey")
        .distinct()
    )
    flagged = (
        customer.select("c_custkey", "c_mktsegment")
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            "c_mktsegment",
            F.when(F.col("o_custkey").isNotNull(), 1).otherwise(0).alias("has_big"),
        )
    )
    return (
        flagged.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("has_big").cast("long").alias("n_with_big_order"),
            (F.count(F.lit(1)) - F.sum("has_big"))
            .cast("long")
            .alias("n_without_big_order"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q_pattern_funnel_strict",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id
      FROM events WHERE event_type IN ('view','click','purchase')
    ), s AS (
      SELECT user_id, event_type AS t1,
             lead(event_type, 1) OVER w AS t2,
             lead(event_type, 2) OVER w AS t3,
             us AS u1,
             lead(us, 1) OVER w AS u2,
             lead(us, 2) OVER w AS u3
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    )
    SELECT count(*) AS n_sequences,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM s
    WHERE t1 = 'view' AND t2 = 'click' AND t3 = 'purchase'
      AND u2 - u1 <= 3600000000 AND u3 - u2 <= 3600000000
    """,
)
def q_pattern_funnel_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.U u4 — strict sequential pattern match (MATCH_RECOGNIZE-lite):
    count view→click→purchase runs that are CONSECUTIVE in the user's
    funnel-event stream (no other funnel event between steps) with each
    step at most 1 hour after the previous. Contrast with i3's funnel,
    which allows gaps. Order inside a user is pinned by (ts, event_id) —
    the repo's standard tiebreak — so "consecutive" is well-defined
    under timestamp ties in both engines.

    Scale: one hash-partition on user_id + one in-partition sort powers
    both lead() columns; the match predicate is a codegen'd filter; the
    global count is a 1-row aggregate. The non-funnel event types are
    filtered before the shuffle."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.filter(F.col("event_type").isin("view", "click", "purchase")).select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    s = e.select(
        "user_id",
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
        F.col("us").alias("u1"),
        F.lead("us", 1).over(w).alias("u2"),
        F.lead("us", 2).over(w).alias("u3"),
    )
    hour = 3_600_000_000
    return s.filter(
        (F.col("t1") == "view")
        & (F.col("t2") == "click")
        & (F.col("t3") == "purchase")
        & (F.col("u2") - F.col("u1") <= hour)
        & (F.col("u3") - F.col("u2") <= hour)
    ).agg(
        F.count(F.lit(1)).alias("n_sequences"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )


@query(
    "q_distinct_kmv",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15) AS hx
      FROM lineitem
    ), bk AS (
      SELECT hx FROM h ORDER BY hx LIMIT {_KMV_K}
    ), kv AS (
      SELECT max(hx) AS kth_min_h60,
             CAST(concat('0x', max(hx)) AS BIGINT) AS kth_num
      FROM bk
    ), ex AS (SELECT count(*) AS exact_distinct FROM h)
    SELECT {_KMV_K} AS k, kv.kth_min_h60,
           CAST(({_KMV_K - 1} * {_POW57}) // (kv.kth_num // 8) AS BIGINT)
             AS est_distinct,
           CAST(ex.exact_distinct AS BIGINT) AS exact_distinct
    FROM kv, ex
    """,
)
def q_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.U u5 — KMV (k-minimum-values) distinct sketch with a fully
    DETERMINISTIC estimate: hash each part key to a 60-bit md5 prefix
    (15 hex chars — lexicographic order on the fixed-width hex IS
    numeric order), keep the k=64 smallest, and estimate distinct count
    as (k-1)·2^60 / h_(k) — spelled `(k-1)·2^57 div (h div 8)` so the
    numerator stays inside int64; the 3-bit truncation perturbs the
    estimate by < 2^-57 relative and identically in both engines.
    Unlike the HLL key (d3, rows-only), this sketch hash-matches its
    oracle because md5 and integer division agree bit-for-bit.

    Scale: the distinct-hash set collapses map-side; the k smallest
    lower to TakeOrderedAndProject (the b9 bottom-k pattern — mergeable
    across shards, no global sort); the exact-distinct companion column
    is the one count-distinct shuffle and exists to expose the sketch's
    error — drop it in production and the whole query is bottom-k
    cheap."""
    li = load_table(spark, sf_dir, "lineitem")
    h = li.select(
        F.expr("substr(md5(CAST(l_partkey AS STRING)), 1, 15)").alias("hx")
    ).distinct()
    bk = h.orderBy("hx").limit(_KMV_K)
    kv = bk.agg(
        F.max("hx").alias("kth_min_h60"),
        F.expr("CAST(conv(max(hx), 16, 10) AS BIGINT)").alias("kth_num"),
    )
    ex = h.agg(F.count(F.lit(1)).cast("long").alias("exact_distinct"))
    return kv.crossJoin(F.broadcast(ex)).select(
        F.lit(_KMV_K).alias("k"),
        "kth_min_h60",
        F.expr(
            f"CAST(({_KMV_K - 1} * {_POW57}L) div (kth_num div 8) AS BIGINT)"
        ).alias("est_distinct"),
        "exact_distinct",
    )


@query(
    "q_gini_impurity",
    oracle="""
    WITH g AS (
      SELECT c_mktsegment, c_nationkey, count(*) AS cnt
      FROM customer GROUP BY 1, 2
    )
    SELECT c_mktsegment,
           CAST(sum(cnt) AS BIGINT) AS n_customers,
           count(*) AS n_groups,
           CAST(1000000 - (sum(cnt * cnt) * 1000000)
                // (sum(cnt) * sum(cnt)) AS BIGINT) AS gini_ppm
    FROM g GROUP BY 1 ORDER BY 1
    """,
)
def q_gini_impurity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.U u6 — exact integer Gini impurity: per market segment, the
    impurity of its nation distribution, 1 − Σ(cᵢ/n)², in parts-per-
    million via pure integer arithmetic: 10⁶ − (Σcᵢ²·10⁶) div n² — no
    float division, no log (the reason this concentration measure is
    here and entropy is not: it is exactly expressible in integers).
    Complements d24's Gini *coefficient* (inequality of a numeric
    value) — this is the categorical-diversity impurity.

    Scale: two partial-aggregated groupBys (segment×nation, then
    segment); shuffle bounded by group cardinality. Σcᵢ² needs int64
    only up to cᵢ ≈ 3·10⁹ rows per (segment, nation); beyond that the
    same expression widens to DECIMAL(38) accumulators unchanged."""
    customer = load_table(spark, sf_dir, "customer")
    g = customer.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        g.groupBy("c_mktsegment")
        .agg(
            F.sum("cnt").cast("long").alias("n_customers"),
            F.count(F.lit(1)).alias("n_groups"),
            F.expr(
                "CAST(1000000 - (sum(cnt * cnt) * 1000000)"
                " div (sum(cnt) * sum(cnt)) AS BIGINT)"
            ).alias("gini_ppm"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q_join_point_in_interval",
    oracle="""
    WITH inc AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ius
      FROM events WHERE event_type = 'error'
    ), pts AS (
      SELECT user_id, event_type, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us
      FROM events WHERE event_type <> 'error'
    )
    SELECT p.event_type,
           count(*) AS n_points,
           CAST(sum(CASE WHEN EXISTS (
             SELECT 1 FROM inc i
             WHERE i.user_id = p.user_id
               AND p.us >= i.ius AND p.us < i.ius + 3600000000
           ) THEN 1 ELSE 0 END) AS BIGINT) AS n_in_incident,
           CAST((sum(CASE WHEN EXISTS (
             SELECT 1 FROM inc i
             WHERE i.user_id = p.user_id
               AND p.us >= i.ius AND p.us < i.ius + 3600000000
           ) THEN 1 ELSE 0 END) * 10000) // count(*) AS BIGINT)
             AS in_incident_bp
    FROM pts p
    GROUP BY 1 ORDER BY 1
    """,
)
def q_join_point_in_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.U u7 — bucketed point-in-interval join: each 'error' event
    opens a 1-hour incident window for its user; for every other event
    type, how many events fall inside at least one incident window of
    the same user (count + exact bp rate). EXISTS semantics — an event
    inside two overlapping incidents counts once.

    Scale: the textbook interval-join lowering — points carry an hour
    bucket (us div 1h); incidents explode to their two covered buckets;
    the join is EQUI on (user_id, bucket) with the range as residual, so
    candidate pairs are bounded by per-user-per-hour activity (never the
    all-pairs theta join a naive `BETWEEN` produces), and it stays a
    hash/sort-merge join (the c8 no-nested-loop rule). The left-semi
    dedups multi-incident matches before the aggregate."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    hour = 3_600_000_000
    inc = (
        ev.filter(F.col("event_type") == "error")
        .select(F.col("user_id").alias("i_user"), us.alias("ius"))
        .withColumn("i_bucket", F.explode(F.expr(
            f"array(ius div {hour}, ius div {hour} + 1)"
        )))
    )
    pts = ev.filter(F.col("event_type") != "error").select(
        "user_id", "event_type", "event_id", us.alias("us")
    )
    matched = (
        pts.withColumn("bucket", F.expr(f"us div {hour}"))
        .join(
            inc,
            (F.col("user_id") == F.col("i_user"))
            & (F.col("bucket") == F.col("i_bucket"))
            & (F.col("us") >= F.col("ius"))
            & (F.col("us") < F.col("ius") + hour),
            "left_semi",
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_in"))
    )
    totals = pts.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_points"))
    return (
        totals.join(matched, "event_type", "left")
        .select(
            "event_type",
            "n_points",
            F.coalesce(F.col("n_in"), F.lit(0)).cast("long").alias("n_in_incident"),
            F.expr(
                "CAST((coalesce(n_in, 0) * 10000) div n_points AS BIGINT)"
            ).alias("in_incident_bp"),
        )
        .orderBy("event_type")
    )


@query(
    "q_percentile_cont_exact",
    oracle="""
    WITH v AS (
      SELECT l_returnflag,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY floor(l_extendedprice * 100 + 0.5))
               - 1 AS idx
      FROM lineitem
    ), n AS (
      SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1
    ), p AS (
      SELECT n.l_returnflag, pct, n.n,
             ((n.n - 1) * pct) // 100 AS lo_idx,
             ((n.n - 1) * pct) % 100 AS frac
      FROM n CROSS JOIN (SELECT unnest([25, 50, 75]) AS pct)
    )
    SELECT p.l_returnflag, CAST(p.pct AS INT) AS pct,
           CAST(lo.cents * 100
                + (hi.cents - lo.cents) * p.frac AS BIGINT) AS value_e2c
    FROM p
    JOIN v lo ON lo.l_returnflag = p.l_returnflag AND lo.idx = p.lo_idx
    JOIN v hi ON hi.l_returnflag = p.l_returnflag
             AND hi.idx = least(p.lo_idx + 1, p.n - 1)
    ORDER BY 1, 2
    """,
)
def q_percentile_cont_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.U u8 — EXACT linearly-interpolated percentiles (the SQL
    percentile_cont / numpy type-7 definition) in pure integers: per
    return flag, the price quartiles as hundredths of a cent —
    ``lo·100 + (hi − lo)·frac`` where the rank position (n−1)·p/100
    splits into integer index and hundredths remainder. The built-in
    percentile_cont interpolates in floats (engine-divergent on ties
    near representation boundaries); this spelling is bit-identical
    everywhere. Duplicate prices make the order statistic well-defined
    regardless of row_number tie order — equal values at a position
    give equal cents.

    Scale (the CDF-over-distinct-values lowering, same trick as u2): the
    fact collapses to (flag, cents, count) with a map-side partial
    aggregate, the cumulative window then sorts only DISTINCT prices
    (bounded by price cardinality, not row count — the oracle's naive
    row_number-the-whole-fact spelling is the semantic reference, not
    the plan), and the quartile positions resolve with ONE broadcast
    join against the |flags|·3-row position frame: a value row covers
    rank indices [cum − cnt, cum), so the row holding each order
    statistic is picked by a codegen'd range predicate. Measured: the
    first spelling (row_number the whole fact, window-sorted twice —
    once per join side) was 2.2 s at sf0.1 but 9.3 s at 10×; this one is
    2.4 s at sf0.1 and FLAT 2.3 s at 10× (duplicate prices dominate at
    volume, so the distinct-value frame stops growing — SCALE.md §10)."""
    li = load_table(spark, sf_dir, "lineitem")
    g = (
        li.select(
            "l_returnflag",
            F.expr(_CENTS.format(col="l_extendedprice")).alias("cents"),
        )
        .groupBy("l_returnflag", "cents")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cum = g.withColumn(
        "cum",
        F.sum("cnt").over(Window.partitionBy("l_returnflag").orderBy("cents")),
    )
    n = li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n"))
    pcts = n.crossJoin(
        F.broadcast(
            n.sparkSession.createDataFrame([(25,), (50,), (75,)], "pct INT")
        )
    ).select(
        F.col("l_returnflag").alias("p_flag"),
        "pct",
        F.expr("((n - 1) * pct) div 100").alias("lo_idx"),
        F.expr("least(((n - 1) * pct) div 100 + 1, n - 1)").alias("hi_idx"),
        F.expr("((n - 1) * pct) % 100").alias("frac"),
    )
    lo_hit = (F.col("cum") - F.col("cnt") <= F.col("lo_idx")) & (
        F.col("lo_idx") < F.col("cum")
    )
    hi_hit = (F.col("cum") - F.col("cnt") <= F.col("hi_idx")) & (
        F.col("hi_idx") < F.col("cum")
    )
    return (
        cum.join(F.broadcast(pcts), F.col("l_returnflag") == F.col("p_flag"))
        .filter(lo_hit | hi_hit)
        .groupBy("p_flag", "pct", "frac")
        .agg(
            F.max(F.when(lo_hit, F.col("cents"))).alias("lo_cents"),
            F.max(F.when(hi_hit, F.col("cents"))).alias("hi_cents"),
        )
        .select(
            F.col("p_flag").alias("l_returnflag"),
            "pct",
            (
                F.col("lo_cents") * 100
                + (F.col("hi_cents") - F.col("lo_cents")) * F.col("frac")
            )
            .cast("long")
            .alias("value_e2c"),
        )
        .orderBy("l_returnflag", "pct")
    )


@query(
    "q_bitmap_distinct",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct_users
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def q_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.U u9 — EXACT distinct counting via Spark 4 bitmap aggregates:
    per event type, distinct users computed as a two-level roll-up —
    users bucket into 32k-bit bitmap segments (bitmap_bucket_number),
    each (type, bucket) partial OR-aggregates its bit positions
    map-side, and the final count sums bitmap_count over buckets. The
    result is EXACTLY count(DISTINCT user_id) (the oracle) — but unlike
    count(DISTINCT), the aggregation state is mergeable fixed-size
    bitmaps instead of a per-key hash set, the shape that survives
    billions of users per group: state is O(id_range/32k) segments,
    partials combine by OR, and no expand/re-shuffle of raw ids occurs.

    Scale: two partial-aggregated groupBys, both mergeable; the raw-id
    shuffle of a naive count(DISTINCT) is replaced by shipping OR-able
    bitmap segments. For sparse id spaces beyond memory, the HLL key
    (d3) is the lossy fallback; this is the exact one."""
    ev = load_table(spark, sf_dir, "events")
    seg = (
        ev.select("event_type", "user_id")
        .groupBy(
            "event_type",
            F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
        )
        .agg(
            F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm")
        )
    )
    return (
        seg.groupBy("event_type")
        .agg(F.expr("CAST(sum(bitmap_count(bm)) AS BIGINT)").alias("n_distinct_users"))
        .orderBy("event_type")
    )


@query(
    "q_topk_movers",
    oracle="""
    WITH wk AS (
      SELECT l_partkey,
             datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) // 7
               AS week,
             sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                 * CAST(100 - floor(l_discount * 100 + 0.5) AS BIGINT)) AS rev_e4
      FROM lineitem GROUP BY 1, 2
    ), d AS (
      SELECT l_partkey, week, rev_e4,
             lag(rev_e4) OVER (PARTITION BY l_partkey ORDER BY week) AS prev_e4,
             lag(week) OVER (PARTITION BY l_partkey ORDER BY week) AS prev_week
      FROM wk
    )
    SELECT l_partkey, CAST(week AS BIGINT) AS week,
           CAST(rev_e4 AS BIGINT) AS rev_e4,
           CAST(prev_e4 AS BIGINT) AS prev_e4,
           CAST(rev_e4 - prev_e4 AS BIGINT) AS delta_e4
    FROM d
    WHERE prev_week = week - 1
    ORDER BY abs(rev_e4 - prev_e4) DESC, l_partkey, week
    LIMIT 10
    """,
)
def q_topk_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.U u10 — week-over-week top movers: weekly discount revenue per
    part (exact integer e4 units — the exactmath spelling), deltas only
    between CONSECUTIVE weeks (a gap week yields no comparison rather
    than a bogus multi-week delta), global top-10 by absolute swing with
    the (part, week) tiebreak so the cut is deterministic.

    Scale: groupBy (part, week) partial-aggregates map-side; the lag
    window sorts within part (tiny per-part series); the global top-10
    lowers to TakeOrderedAndProject — per-partition top-10s merge on
    the driver, no global sort."""
    li = load_table(spark, sf_dir, "lineitem")
    wk = (
        li.select(
            "l_partkey",
            F.expr(
                "datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01') div 7"
            ).alias("week"),
            F.expr(
                "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
                " * CAST(100 - floor(l_discount * 100 + 0.5) AS BIGINT)"
            ).alias("rev_term"),
        )
        .groupBy("l_partkey", "week")
        .agg(F.sum("rev_term").alias("rev_e4"))
    )
    w = Window.partitionBy("l_partkey").orderBy("week")
    d = wk.select(
        "l_partkey",
        "week",
        "rev_e4",
        F.lag("rev_e4").over(w).alias("prev_e4"),
        F.lag("week").over(w).alias("prev_week"),
    ).filter(F.col("prev_week") == F.col("week") - 1)
    return (
        d.select(
            "l_partkey",
            F.col("week").cast("long").alias("week"),
            F.col("rev_e4").cast("long").alias("rev_e4"),
            F.col("prev_e4").cast("long").alias("prev_e4"),
            (F.col("rev_e4") - F.col("prev_e4")).cast("long").alias("delta_e4"),
        )
        .orderBy(
            F.abs(F.col("delta_e4")).desc(), "l_partkey", "week"
        )
        .limit(10)
    )


@query(
    "q_backlog_aging",
    oracle="""
    WITH mx AS (
      SELECT max(CAST(o_orderdate AS DATE)) AS max_d FROM orders
    ), aged AS (
      SELECT CASE
               WHEN datediff('day', CAST(o_orderdate AS DATE), mx.max_d) <= 90
                 THEN '0-90d'
               WHEN datediff('day', CAST(o_orderdate AS DATE), mx.max_d) <= 180
                 THEN '091-180d'
               WHEN datediff('day', CAST(o_orderdate AS DATE), mx.max_d) <= 365
                 THEN '181-365d'
               ELSE '365d+'
             END AS age_bucket,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders, mx WHERE o_orderstatus = 'O'
    )
    SELECT age_bucket, count(*) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS total_cents
    FROM aged GROUP BY 1 ORDER BY 1
    """,
)
def q_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.U u11 — open-order backlog aging: orders still open (status
    'O') bucketed by age against the snapshot's newest order date —
    order counts and exact-cents exposure per aging band, the
    receivables report every order warehouse runs.

    Scale: the as-of date is a 1-row max aggregate broadcast against the
    filtered fact (the adjudicated 1-row-BNLJ pattern, same as d19/q22);
    the status filter pushes to the scan; one |buckets|-row aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    mx = orders.agg(F.expr("max(CAST(o_orderdate AS DATE))").alias("max_d"))
    aged = (
        orders.filter(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(mx))
        .select(
            F.expr(
                "CASE WHEN datediff(max_d, CAST(o_orderdate AS DATE)) <= 90"
                " THEN '0-90d'"
                " WHEN datediff(max_d, CAST(o_orderdate AS DATE)) <= 180"
                " THEN '091-180d'"
                " WHEN datediff(max_d, CAST(o_orderdate AS DATE)) <= 365"
                " THEN '181-365d' ELSE '365d+' END"
            ).alias("age_bucket"),
            F.expr(_CENTS.format(col="o_totalprice")).alias("cents"),
        )
    )
    return (
        aged.groupBy("age_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").cast("long").alias("total_cents"),
        )
        .orderBy("age_bucket")
    )
