"""Scalar function operators (SURVEY.md §2.H).

Everything here is a built-in `pyspark.sql.functions` expression — JVM-side,
whole-stage-codegen'd, no Python in the row path. Cross-engine hazards
handled per FIXTURES.md: computed ints cast to BIGINT on the Spark side
(DuckDB's natural width), double→int via trunc() in the oracle (DuckDB CAST
rounds, Spark truncates), and transcendental outputs rounded (libm vs JVM
may differ in the last ulp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from recommendersystems_bigdata_spark.catalog import load_table, load_tables
from recommendersystems_bigdata_spark.registry import query


@query(
    "q_str_basic",
    oracle="""
    SELECT c_custkey,
           lower(c_name) AS name_lower,
           upper(c_mktsegment) AS segment_upper,
           CAST(length(c_name) AS BIGINT) AS name_len,
           substring(c_name, 10, 9) AS key_digits,
           concat(c_mktsegment, '/', CAST(c_nationkey AS VARCHAR)) AS seg_nation,
           trim('  padded  ') AS trimmed
    FROM customer
    """,
)
def q_str_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """h1 — lower/upper/length/substring/concat/trim on customer names
    (c_name is 'Customer#000000000'; digits start at position 10)."""
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.lower("c_name").alias("name_lower"),
        F.upper("c_mktsegment").alias("segment_upper"),
        F.length("c_name").cast("long").alias("name_len"),
        F.substring("c_name", 10, 9).alias("key_digits"),
        F.concat(F.col("c_mktsegment"), F.lit("/"), F.col("c_nationkey").cast("string")).alias(
            "seg_nation"
        ),
        F.trim(F.lit("  padded  ")).alias("trimmed"),
    )


@query(
    "q_str_regex",
    oracle="""
    SELECT p_partkey, p_brand,
           CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS BIGINT) AS brand_id,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS vowelless,
           (p_name LIKE '%widget%') AS is_widget
    FROM part
    """,
)
def q_str_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """h2 — regexp_extract (group capture), global regexp_replace, LIKE."""
    return load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("long").alias("brand_id"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("vowelless"),
        F.col("p_name").like("%widget%").alias("is_widget"),
    )


@query(
    "q_str_split_explode",
    oracle="""
    SELECT token, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    WHERE token <> ''
    GROUP BY token
    ORDER BY n DESC, token ASC
    LIMIT 20
    """,
)
def q_str_split_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """h3 — tokenize + explode + count: the top-20 corpus tokens.

    split/explode is the UDTF-shaped lattice every text-analysis operator
    builds on; the aggregation immediately collapses the exploded rows, so
    the shuffle carries (token, partial count), not raw tokens.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(20)
    )


@query(
    "q_date_parts",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           CAST(month(o_orderdate) AS BIGINT) AS mo,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY 1, 2, 3
    """,
)
def q_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """h4 — calendar decomposition: revenue by year/quarter/month."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.quarter("o_orderdate").cast("long").alias("qtr"),
            F.month("o_orderdate").cast("long").alias("mo"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@query(
    "q_date_arith",
    oracle="""
    SELECT o_orderpriority,
           round(avg(datediff('day', o_orderdate, l_shipdate)), 2) AS avg_latency_days,
           CAST(min(datediff('day', o_orderdate, l_shipdate)) AS BIGINT) AS min_latency_days,
           CAST(max(datediff('day', o_orderdate, l_shipdate)) AS BIGINT) AS max_latency_days,
           count(*) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def q_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """h5 — date arithmetic: order→ship latency distribution per priority."""
    li, orders = load_tables(spark, sf_dir, "lineitem", "orders")
    lat = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.avg(lat), 2).alias("avg_latency_days"),
            F.min(lat).cast("long").alias("min_latency_days"),
            F.max(lat).cast("long").alias("max_latency_days"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q_math",
    oracle="""
    SELECT p_partkey,
           round(p_retailprice, 1) AS price_r1,
           CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
           CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
           abs(p_retailprice - 1000) AS dist_from_1k,
           p_retailprice * p_retailprice AS price_sq,
           sqrt(p_retailprice) AS price_sqrt,
           round(ln(p_retailprice), 6) AS price_ln,
           greatest(p_retailprice, CAST(p_size AS DOUBLE) * 100) AS g,
           least(p_retailprice, CAST(p_size AS DOUBLE) * 100) AS l
    FROM part
    WHERE p_retailprice > 0
    """,
)
def q_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """h6 — math functions. sqrt/abs/multiply are IEEE-exact cross-engine;
    ln goes through libm vs JVM so it is rounded to 6dp. round(x,1) on a
    2-decimal source never sits on a .x5 boundary's repr edge the way
    round(x,2) on 4-decimal products does."""
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_retailprice") > 0)
        .select(
            "p_partkey",
            F.round("p_retailprice", 1).alias("price_r1"),
            F.floor("p_retailprice").cast("long").alias("price_floor"),
            F.ceil("p_retailprice").cast("long").alias("price_ceil"),
            F.abs(F.col("p_retailprice") - 1000).alias("dist_from_1k"),
            (F.col("p_retailprice") * F.col("p_retailprice")).alias("price_sq"),
            F.sqrt("p_retailprice").alias("price_sqrt"),
            F.round(F.log("p_retailprice"), 6).alias("price_ln"),
            F.greatest(F.col("p_retailprice"), F.col("p_size").cast("double") * 100).alias("g"),
            F.least(F.col("p_retailprice"), F.col("p_size").cast("double") * 100).alias("l"),
        )
    )


@query(
    "q_cond",
    oracle="""
    SELECT c_custkey, c_acctbal,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 1000 THEN 'low'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS tier,
           coalesce(nullif(c_mktsegment, 'AUTOMOBILE'), 'CAR') AS segment_renamed,
           CAST(trunc(c_acctbal) AS INTEGER) AS bal_trunc
    FROM customer
    """,
)
def q_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """h7 — CASE/coalesce/nullif; negative balances get their own band.

    Oracle uses trunc() before the int cast: DuckDB CAST(double AS INT)
    rounds, Spark truncates — trunc aligns them.
    """
    bal = F.col("c_acctbal")
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_acctbal",
        F.when(bal < 0, "debt")
        .when(bal < 1000, "low")
        .when(bal < 5000, "mid")
        .otherwise("high")
        .alias("tier"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("AUTOMOBILE")), F.lit("CAR")).alias(
            "segment_renamed"
        ),
        bal.cast("int").alias("bal_trunc"),
    )


@query(
    "q_arr_basic",
    oracle="""
    SELECT vec_id, label,
           CAST(len(embedding) AS BIGINT) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
           array_to_string(list_transform(list_slice(embedding, 1, 4),
                          x -> printf('%.6f', CAST(x AS DOUBLE))), '|') AS first4,
           (len(embedding) = 64) AS is_64d
    FROM embeddings
    """,
)
def q_arr_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """h8 — array basics on the embedding column: size, index, slice.

    Slice elements rounded to 6dp double on both sides: raw float32
    pass-through hashes differently depending on the engine's
    float32→float64 widening (hygiene rule 3 applied to arrays).
    """
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        F.array_join(
            F.transform(
                F.slice("embedding", 1, 4),
                lambda x: F.format_string("%.6f", x.cast("double")),
            ),
            "|",
        ).alias("first4"),
        (F.size("embedding") == 64).alias("is_64d"),
    )


@query(
    "q_arr_hof",
    oracle="""
    SELECT vec_id, label,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive
    FROM embeddings
    """,
)
def q_arr_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """h9 — higher-order array functions: L2 norm via transform+aggregate,
    positive-component count via filter. Elements cast to double *before*
    squaring on both sides so accumulation precision matches; rounded 6dp
    against summation-order noise."""
    emb = load_table(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return emb.select(
        "vec_id",
        "label",
        F.round(F.sqrt(sq_sum), 6).alias("l2_norm"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).cast("long").alias("n_positive"),
    )


@query(
    "q_map_ops",
    oracle="""
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click_cnt,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase_cnt,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
    FROM events
    GROUP BY user_id
    """,
)
def q_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """h10 — map construction + access: per-user event_type→count map built
    with map_from_entries, read back with element_at, sized with map_keys.

    The *output* projects scalar lookups, not the raw map — map iteration
    order is engine-specific and would break order-insensitive hashing
    (hygiene: map ordering, SURVEY §2 h10).
    """
    ev = load_table(spark, sf_dir, "events")
    counted = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    mapped = counted.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "cnt")))
        ).alias("type_counts")
    )
    return mapped.select(
        "user_id",
        F.coalesce(F.element_at("type_counts", "click"), F.lit(0)).cast("long").alias("click_cnt"),
        F.coalesce(F.element_at("type_counts", "purchase"), F.lit(0)).cast("long").alias("purchase_cnt"),
        F.size(F.map_keys("type_counts")).cast("long").alias("n_types"),
    )


@query(
    "q_json_extract",
    oracle="""
    SELECT event_type,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
           CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """h11 — JSON path extraction from the props column ({"k": int})."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.round(F.avg(k), 4).alias("avg_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_cast_types",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
           CAST(o_orderdate AS VARCHAR) AS date_str,
           CAST(trunc(o_totalprice) AS BIGINT) AS price_int,
           CAST(o_totalprice AS VARCHAR) LIKE '%.%' AS price_has_decimal
    FROM orders
    """,
)
def q_cast_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """h12 — casting matrix: int↔string round-trip, timestamp→string
    (midnight-valued, so both engines print 'YYYY-MM-DD HH:MM:SS'),
    double→int truncation."""
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderkey").cast("string").cast("long").alias("key_roundtrip"),
        F.col("o_orderdate").cast("string").alias("date_str"),
        F.col("o_totalprice").cast("long").alias("price_int"),
        F.col("o_totalprice").cast("string").like("%.%").alias("price_has_decimal"),
    )


@query(
    "q_str_levenshtein",
    oracle="""
    SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
           a.c_name AS name_a, b.c_name AS name_b,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS edit_dist
    FROM customer a
    JOIN customer b
      ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 2
    """,
)
def q_str_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """h13 — edit-distance near-duplicate name pairs, bounded to one nation.

    The nationkey equi conjunct keeps the self-join hash-partitioned (no
    cross product); at 100 TB the same shape works with any blocking key.

    Round 11: the distance is evaluated with Spark's THRESHOLD variant
    ``levenshtein(l, r, 2)`` — the banded O(len·k) algorithm with early
    exit instead of the full O(len²) matrix per pair (guide §1.2,
    per-task work; the blocked self-join still evaluates one distance
    per candidate pair, ~4.5M at sf0.1, so the per-pair constant IS the
    query's cost). Results are identical: for every surviving row the
    threshold form returns exactly the unbounded distance (it returns
    −1 only above the threshold, and the filter admits 0..2 — −1 can
    never pass)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    a = cust.alias("a")
    b = cust.alias("b")
    dist = F.levenshtein(F.col("a.c_name"), F.col("b.c_name"), 2)
    return (
        a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .filter((dist >= 0) & (dist <= 2))
        .select(
            F.col("a.c_custkey").alias("key_a"),
            F.col("b.c_custkey").alias("key_b"),
            F.col("a.c_name").alias("name_a"),
            F.col("b.c_name").alias("name_b"),
            dist.cast("long").alias("edit_dist"),
        )
    )
