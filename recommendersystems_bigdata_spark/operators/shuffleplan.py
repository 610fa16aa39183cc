"""Shuffle-plan advisor — key-distribution, salt and broadcast
pre-flight audits (SURVEY.md §2.CB, round 11).

"Will this join skew, should that key be salted, can this dim
broadcast" — the planning censuses an engine operator reads BEFORE
committing a physical strategy, beside §2.D's top-20 heavy-key report
(`q_skew_report`, the per-key list) and §2.C's executable salted join
(`q_join_skew_salted`, the treatment itself) — this suite publishes
the DECISION inputs:

- cb1: key-imbalance census — for each candidate lineitem join key
  (order / part / supp): rows, distinct keys, the heaviest key's
  rows, the max/mean imbalance in bp, and how many keys breach the
  AQE-style 5× skew factor.
- cb2: the salt advisor — for the 10 heaviest part keys, the salt
  fan-out that brings the key under the planning target rows/task,
  and the expected post-salt maximum.
- cb3: the broadcast advisor — per dim table, rows and the exact
  payload bytes vs the 10 MiB auto-broadcast default.
- cb4: the partition-load histogram — rows per planning bucket under
  the documented hash model, with per-bucket share and load-vs-mean.

PLANNING CONVENTIONS (all documented constants, both engines
identical — these model the decision, they do not introspect Spark):

    imbalance_bp  = (10⁴·n_max·K) div N        (max/mean in bp)
    heavy keys    : n_k·K > 5·N                (AQE skewedPartitionFactor
                                                analog at key grain)
    target        = ceil(N/P), P = 200         (planning tasks/shuffle)
    salt(k)       = ceil(n_k/target)           (fan-out per heavy key)
    post-salt max = ceil(n_k/salt)
    bucket model  : l_suppkey % 32             (NOT engine hash — Spark's
                    Murmur3 and DuckDB's hash differ; the mod model is
                    engine-free and preserves the skew signal)
    payload bytes : Σ rows [ 8/col BIGINT·DOUBLE + 4/col INTEGER
                    + length(col)/VARCHAR ]    (encoding-free lower
                    bound; verdict vs 10·1024·1024)

All ceilings are the exact integer spellings ``(a + b − 1) div b`` on
non-negative operands (Spark ``div`` ≡ DuckDB ``//``).

Spark-first shape, sized for 100 TB: each census is ONE partial-
aggregated fact pass to a keys-sized relation (per-key counts combine
map-side — the aggregation itself cannot skew a task because combine
happens before exchange), reduced census-side to ≤ 3 / 10 / 5 / 32
published rows; the 1-row totals broadcast. cb2's top-10 lowers to
TakeOrderedAndProject (per-partition local top-10, driver merge — the
`q_skew_report` device). Nothing here materializes anything
fact-sized after the first aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query

_DEC = "decimal(38,0)"

# one key-imbalance census row for a given key column (DuckDB)
def _imb_duck(col: str) -> str:
    return f"""
    SELECT '{col}' AS key_col,
           CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(max(n) AS BIGINT) AS max_key_rows,
           CAST(sum(n) // count(*) AS BIGINT) AS mean_key_rows,
           CAST((10000 * max(n) * count(*)) // sum(n) AS BIGINT)
             AS imbalance_bp,
           CAST(sum(CASE WHEN n * (SELECT count(*) FROM (
                     SELECT {col} FROM lineitem GROUP BY 1))
                    > 5 * (SELECT count(*) FROM lineitem)
                    THEN 1 ELSE 0 END) AS BIGINT) AS heavy_keys
    FROM (SELECT {col}, CAST(count(*) AS HUGEINT) AS n
          FROM lineitem GROUP BY 1)
    """


@query(
    "q_shuffle_key_imbalance",
    oracle=f"""
    {_imb_duck('l_orderkey')}
    UNION ALL
    {_imb_duck('l_partkey')}
    UNION ALL
    {_imb_duck('l_suppkey')}
    ORDER BY key_col
    """,
)
def q_shuffle_key_imbalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.CB cb1 — the key-imbalance census for the three candidate
    lineitem join keys: rows, distinct keys, the heaviest key, the
    max/mean imbalance in bp, and the count of keys breaching the
    5× AQE-style skew factor (``n_k·K > 5·N`` — integer-cleared,
    never a division).

    Scale: three partial-aggregated fact passes (map-side combine),
    each reduced to ONE census row."""
    li = load_table(spark, sf_dir, "lineitem")
    rows = None
    for col in ("l_orderkey", "l_partkey", "l_suppkey"):
        per = li.groupBy(col).agg(
            F.expr(f"CAST(count(*) AS {_DEC})").alias("n")
        )
        tot = per.agg(
            F.expr(f"CAST(sum(n) AS {_DEC})").alias("big_n"),
            F.expr(f"CAST(count(*) AS {_DEC})").alias("big_k"),
            F.expr("CAST(max(n) AS BIGINT)").alias("max_n"),
        )
        d = per.crossJoin(F.broadcast(tot)).agg(
            F.lit(col).alias("key_col"),
            F.expr("CAST(max(big_n) AS BIGINT)").alias("n_rows"),
            F.expr("CAST(max(big_k) AS BIGINT)").alias("n_keys"),
            F.expr("CAST(max(max_n) AS BIGINT)").alias("max_key_rows"),
            F.expr("CAST(max(big_n) div max(big_k) AS BIGINT)").alias(
                "mean_key_rows"
            ),
            F.expr(
                f"CAST((CAST(10000 AS {_DEC}) * max(max_n) * max(big_k))"
                f" div max(big_n) AS BIGINT)"
            ).alias("imbalance_bp"),
            F.expr(
                "CAST(sum(CASE WHEN n * big_k > 5 * big_n"
                " THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("heavy_keys"),
        )
        rows = d if rows is None else rows.unionAll(d)
    return rows.orderBy("key_col")


@query(
    "q_shuffle_salt_advisor",
    oracle="""
    WITH per AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_key
      FROM lineitem GROUP BY 1
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_total,
             CAST((count(*) + 199) // 200 AS BIGINT) AS target
      FROM lineitem
    ),
    top AS (
      SELECT l_partkey, n_key,
             row_number() OVER (ORDER BY n_key DESC, l_partkey) AS rnk
      FROM per
    )
    SELECT t.l_partkey, t.n_key, CAST(t.rnk AS BIGINT) AS heavy_rank,
           o.target AS target_rows_per_task,
           CAST((t.n_key + o.target - 1) // o.target AS BIGINT) AS salt,
           CAST((t.n_key + (t.n_key + o.target - 1) // o.target - 1)
                // ((t.n_key + o.target - 1) // o.target) AS BIGINT)
             AS post_salt_max_rows
    FROM top t CROSS JOIN tot o
    WHERE t.rnk <= 10 ORDER BY heavy_rank
    """,
)
def q_shuffle_salt_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.CB cb2 — the salt advisor: for the 10 heaviest part keys
    (ties → smallest key), the planning target rows/task (P = 200
    model tasks), the exact-ceiling salt fan-out that brings the key
    under target, and the post-salt expected maximum.

    Scale: partial-agg per-key counts; the top-10 lowers to
    TakeOrderedAndProject; the 1-row total broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_key")
    )
    tot = li.agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.expr("CAST((count(*) + 199) div 200 AS BIGINT)").alias(
            "target"
        ),
    )
    top = per.orderBy(F.col("n_key").desc(), "l_partkey").limit(10)
    ranked = top.withColumn(
        "heavy_rank",
        F.row_number()
        .over(Window.orderBy(F.col("n_key").desc(), "l_partkey"))
        .cast("long"),
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            "l_partkey",
            "n_key",
            "heavy_rank",
            F.col("target").alias("target_rows_per_task"),
            F.expr(
                "CAST((n_key + target - 1) div target AS BIGINT)"
            ).alias("salt"),
            F.expr(
                "CAST((n_key + (n_key + target - 1) div target - 1)"
                " div ((n_key + target - 1) div target) AS BIGINT)"
            ).alias("post_salt_max_rows"),
        )
        .orderBy("heavy_rank")
    )


# (table, [(col, kind)]) — kind: 8-byte, 4-byte, or varchar
_DIMS = (
    ("region", (("r_regionkey", 4), ("r_name", 0))),
    ("nation", (("n_nationkey", 4), ("n_name", 0), ("n_regionkey", 4))),
    (
        "customer",
        (
            ("c_custkey", 8),
            ("c_name", 0),
            ("c_nationkey", 4),
            ("c_acctbal", 8),
            ("c_mktsegment", 0),
        ),
    ),
    (
        "supplier",
        (
            ("s_suppkey", 8),
            ("s_name", 0),
            ("s_nationkey", 4),
            ("s_acctbal", 8),
        ),
    ),
    (
        "part",
        (
            ("p_partkey", 8),
            ("p_name", 0),
            ("p_brand", 0),
            ("p_type", 0),
            ("p_size", 4),
            ("p_retailprice", 8),
        ),
    ),
)


def _bytes_expr(cols) -> str:
    terms = [
        f"length({c})" if kind == 0 else str(kind) for c, kind in cols
    ]
    return " + ".join(terms)


@query(
    "q_broadcast_advisor",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{t}' AS dim_table, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum({_bytes_expr(cols)}) AS BIGINT) AS payload_bytes,
           CASE WHEN sum({_bytes_expr(cols)}) < 10485760
                THEN 'broadcast' ELSE 'shuffle' END AS verdict
    FROM {t}
    """
        for t, cols in _DIMS
    )
    + "\nORDER BY dim_table",
)
def q_broadcast_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.CB cb3 — the broadcast advisor: per dim table, rows and the
    exact payload bytes under the documented width model (8/4 bytes
    fixed types, length() for varchars — an encoding-free lower
    bound), with the verdict against Spark's 10 MiB
    autoBroadcastJoinThreshold default.

    Scale: five dim scans, each partial-aggregated to one row — the
    byte sum combines map-side."""
    rows = None
    for t, cols in _DIMS:
        df = load_table(spark, sf_dir, t)
        d = df.agg(
            F.lit(t).alias("dim_table"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.expr(f"CAST(sum({_bytes_expr(cols)}) AS BIGINT)").alias(
                "payload_bytes"
            ),
            F.expr(
                f"CASE WHEN sum({_bytes_expr(cols)}) < 10485760"
                f" THEN 'broadcast' ELSE 'shuffle' END"
            ).alias("verdict"),
        )
        rows = d if rows is None else rows.unionAll(d)
    return rows.orderBy("dim_table")


@query(
    "q_shuffle_partition_histogram",
    oracle="""
    WITH buckets AS (
      SELECT l_suppkey % 32 AS bucket, CAST(count(*) AS BIGINT) AS rows_
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(rows_) AS BIGINT) AS n FROM buckets)
    SELECT CAST(b.bucket AS BIGINT) AS bucket, b.rows_ AS n_rows,
           CAST((10000 * b.rows_) // t.n AS BIGINT) AS share_bp,
           CAST((10000 * b.rows_ * 32) // t.n AS BIGINT)
             AS load_vs_mean_bp
    FROM buckets b CROSS JOIN tot t ORDER BY bucket
    """,
)
def q_shuffle_partition_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """§2.CB cb4 — the partition-load histogram under the documented
    engine-free bucket model (``l_suppkey % 32``): rows per bucket,
    share in bp, and per-bucket load vs the uniform mean in bp (10⁴ =
    perfectly balanced) — the at-a-glance "will 32 tasks finish
    together" readout.

    Scale: one partial-aggregated fact pass to ≤ 32 rows + a 1-row
    total broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    buckets = li.groupBy(
        F.expr("l_suppkey % 32").alias("bucket")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    tot = buckets.agg(F.expr("CAST(sum(n_rows) AS BIGINT)").alias("n"))
    return (
        buckets.crossJoin(F.broadcast(tot))
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            "n_rows",
            F.expr("CAST((10000 * n_rows) div n AS BIGINT)").alias(
                "share_bp"
            ),
            F.expr(
                "CAST((10000 * n_rows * 32) div n AS BIGINT)"
            ).alias("load_vs_mean_bp"),
        )
        .orderBy("bucket")
    )
