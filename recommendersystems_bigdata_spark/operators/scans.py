"""Scan / source / sink operators (SURVEY.md §2.A).

Sources are plain parquet relations so Catalyst gets pushdown + pruning for
free; sinks demonstrate the partitioned-write layout a 100 TB deployment
relies on for partition pruning (write once, prune every read).
"""

from __future__ import annotations

from recommendersystems_bigdata_spark.tmpdirs import scratch_dir

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import TABLES, load_table, register_views
from recommendersystems_bigdata_spark.registry import query


@query("q_scan_parquet", oracle="SELECT * FROM lineitem")
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a1 — full parquet scan, schema carried by footers (no inference)."""
    return load_table(spark, sf_dir, "lineitem")


@query(
    "q_scan_schema",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal, c_mktsegment
    FROM customer
    """,
)
def q_scan_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a2 — schema-on-read: project one column per physical type.

    The projection reaches the scan (ReadSchema lists exactly these four
    columns), so a 100 TB customer table reads 4 of its columns, not all.
    """
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment"
    )


_COUNT_ORACLE = " UNION ALL ".join(
    f"SELECT '{t}' AS table_name, count(*) AS n FROM {t}" for t in TABLES
)


@query("q_scan_count_all", oracle=_COUNT_ORACLE)
def q_scan_count_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a3 — row counts of all ten corpus tables, unioned.

    Parquet count() is served from footer row-group metadata — no data read.
    """
    dfs = [
        load_table(spark, sf_dir, t)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit(t).alias("table_name"), "n")
        for t in TABLES
    ]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


@query(
    "q_sql_entry",
    oracle="""
    SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_sql_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a6 — temp-view registration + ``spark.sql`` entry point."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY o_orderpriority
        """
    )


@query(
    "q_io_csv_json_roundtrip",
    oracle="""
    SELECT 'csv' AS format, count(*) AS n,
           CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
           CAST(sum(n_regionkey) AS BIGINT) AS region_sum
    FROM nation
    UNION ALL
    SELECT 'json', count(*),
           CAST(sum(n_nationkey) AS BIGINT),
           CAST(sum(n_regionkey) AS BIGINT)
    FROM nation
    """,
)
def q_io_csv_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a4 — CSV and JSON ingestion via a temp-dir round trip.

    Writes ``nation`` to csv (header) and json, reads both back, and
    returns per-format checksum rows. The oracle computes the same
    checksums from the ORIGINAL table, so a reader that mis-parses types
    or drops rows hash-mismatches — a real oracle check, not a smoke.
    """
    nation = load_table(spark, sf_dir, "nation")
    base = scratch_dir("io_roundtrip")
    nation.write.mode("overwrite").option("header", True).csv(f"{base}/nation_csv")
    nation.write.mode("overwrite").json(f"{base}/nation_json")
    csv_df = spark.read.option("header", True).option("inferSchema", True).csv(f"{base}/nation_csv")
    json_df = spark.read.json(f"{base}/nation_json")

    def checksum(df: DataFrame, fmt: str) -> DataFrame:
        return df.agg(
            F.lit(fmt).alias("format"),
            F.count(F.lit(1)).alias("n"),
            F.sum("n_nationkey").cast("long").alias("key_sum"),
            F.sum("n_regionkey").cast("long").alias("region_sum"),
        ).select("format", "n", "key_sum", "region_sum")

    return checksum(csv_df, "csv").unionByName(checksum(json_df, "json"))


@query(
    "q_sink_partitioned",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
    FROM events
    WHERE event_type IN ('click', 'purchase')
    GROUP BY event_type
    """,
)
def q_sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a5 — partitioned parquet sink + partition-pruned read-back.

    Writes ``events`` partitioned by ``event_type``; the read-back filter on
    the partition column prunes directories (PartitionFilters in the plan) —
    the layout that makes 100 TB event scans cheap. The round-trip must be
    lossless, so the result hash-matches the oracle computed directly on the
    source table (write → read → aggregate ≡ aggregate).
    """
    events = load_table(spark, sf_dir, "events")
    base = scratch_dir("sink_partitioned")
    events.write.mode("overwrite").partitionBy("event_type").parquet(f"{base}/events_part")
    back = spark.read.parquet(f"{base}/events_part")
    return (
        back.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


@query(
    "q_upsert_latest",
    oracle="""
    WITH updates AS (
      SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
             o_totalprice, 1 AS version
      FROM orders WHERE o_orderkey % 10 = 0
    ),
    base AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             o_totalprice, 0 AS version
      FROM orders
    ),
    merged AS (
      SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY version DESC)
               AS rn
      FROM (SELECT * FROM base UNION ALL SELECT * FROM updates)
    )
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           CAST(version AS BIGINT) AS version
    FROM merged WHERE rn = 1
    """,
)
def q_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-style latest-wins upsert: a derived updates batch (10% of
    orders flipped to status 'U', version 1 — pure column swaps, no float
    arithmetic, so the oracle agrees bit-exactly) applied over the base table —
    union + per-key latest pick, the portable spelling of MERGE INTO /
    CDC compaction on engines without ACID tables.

    One shuffle on the merge key. At 100 TB the base side is
    bucket-partitioned on the key so only update-touched partitions
    rewrite (partition-overwrite sink, see a5/a8); the union+row_number
    core here is exactly the per-partition merge job.
    """
    base = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            F.lit(0).alias("version"),
        )
    )
    updates = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            F.lit("U").alias("o_orderstatus"),
            "o_totalprice",
            F.lit(1).alias("version"),
        )
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.col("version").desc())
    return (
        base.unionByName(updates)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            F.col("version").cast("long").alias("version"),
        )
    )


@query(
    "q_scd2_history",
    oracle="""
    WITH versions AS (
      SELECT o_orderkey, o_orderstatus, 0 AS version FROM orders
      UNION ALL
      SELECT o_orderkey, 'U', 1 FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey, 'X', 2 FROM orders WHERE o_orderkey % 20 = 0
    )
    SELECT o_orderkey, o_orderstatus,
           CAST(version AS BIGINT) AS valid_from,
           CAST(coalesce(lead(version) OVER (PARTITION BY o_orderkey ORDER BY version),
                         9999) AS BIGINT) AS valid_to,
           lead(version) OVER (PARTITION BY o_orderkey ORDER BY version) IS NULL
             AS is_current
    FROM versions
    """,
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history build: stack change versions per key, derive
    [valid_from, valid_to) intervals with lead() and flag the current
    row — the slowly-changing-dimension bookkeeping a warehouse keeps
    instead of a9's latest-wins overwrite. One shuffle on the key; the
    interval derivation is a per-key window."""
    orders = load_table(spark, sf_dir, "orders")
    v0 = orders.select("o_orderkey", "o_orderstatus", F.lit(0).alias("version"))
    v1 = orders.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey", F.lit("U").alias("o_orderstatus"), F.lit(1).alias("version")
    )
    v2 = orders.filter(F.col("o_orderkey") % 20 == 0).select(
        "o_orderkey", F.lit("X").alias("o_orderstatus"), F.lit(2).alias("version")
    )
    w = Window.partitionBy("o_orderkey").orderBy("version")
    nxt = F.lead("version").over(w)
    return (
        v0.unionByName(v1)
        .unionByName(v2)
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.col("version").cast("long").alias("valid_from"),
            F.coalesce(nxt, F.lit(9999)).cast("long").alias("valid_to"),
            nxt.isNull().alias("is_current"),
        )
    )


@query(
    "q_apply_deletes",
    oracle="""
    WITH tombstones AS (
      SELECT o_orderkey FROM orders WHERE o_orderkey % 97 = 0
    ),
    survivors AS (
      SELECT * FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM tombstones t
                        WHERE t.o_orderkey = o.o_orderkey)
    )
    SELECT o_orderstatus,
           count(*) AS n_rows,
           CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents,
           CAST(min(o_orderkey) AS BIGINT) AS min_key,
           CAST(max(o_orderkey) AS BIGINT) AS max_key
    FROM survivors GROUP BY o_orderstatus
    """,
)
def q_apply_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tombstone-delete application — the DELETE half of CDC merge
    (q_upsert_latest is the UPDATE half): a derived tombstone batch
    anti-joined against the base table, summarized per status with an
    integer-cents checksum proving exactly the deleted keys vanished.

    Scale: the tombstone side of a CDC batch is small — broadcast the
    anti-join so the base scan never shuffles; with a bucketed base
    (l9) even billion-row delete batches co-locate by key.
    """
    orders = load_table(spark, sf_dir, "orders")
    tombstones = orders.filter(F.col("o_orderkey") % 97 == 0).select("o_orderkey")
    survivors = orders.join(F.broadcast(tombstones), "o_orderkey", "left_anti")
    return survivors.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).cast("long").alias("total_cents"),
        F.min("o_orderkey").cast("long").alias("min_key"),
        F.max("o_orderkey").cast("long").alias("max_key"),
    )


@query(
    "q_zorder_clustering",
    oracle="""
    WITH keyed AS (
      SELECT o_orderkey,
             CAST(o_custkey & 65535 AS BIGINT) AS x,
             CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
                  & 65535 AS BIGINT) AS y
      FROM orders
    ),
    zvals AS (
      SELECT o_orderkey, x, y,
             CAST(list_sum(list_transform(generate_series(0, 15),
                  i -> (((x >> i) & 1) << (2 * i)) + (((y >> i) & 1) << (2 * i + 1))))
                  AS BIGINT) AS z
      FROM keyed
    )
    SELECT CAST(z >> 16 AS BIGINT) AS z_bucket,
           count(*) AS n_rows,
           CAST(min(x) AS BIGINT) AS min_cust, CAST(max(x) AS BIGINT) AS max_cust,
           CAST(min(y) AS BIGINT) AS min_day, CAST(max(y) AS BIGINT) AS max_day
    FROM zvals GROUP BY 1
    """,
)
def q_zorder_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering report: interleave the bits of
    (customer key, order day) into one sort key and summarize each
    z-bucket's min/max in BOTH dimensions — the table-maintenance
    technique that makes a single file sort give range-scan pruning on
    two columns at once. The narrow per-bucket spans in the output ARE
    the proof the curve localizes both dims.

    Pure integer bit arithmetic (shift/and folded over sequence(0,15)),
    so the oracle matches exactly.

    Scale: computing z is map-side; the real maintenance job sorts by z
    and writes files whose footer min/max then prune both predicates —
    this report is the quality check run after compaction (a8).
    """
    orders = load_table(spark, sf_dir, "orders")
    keyed = orders.select(
        "o_orderkey",
        (F.col("o_custkey").bitwiseAND(F.lit(65535))).cast("long").alias("x"),
        (
            F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
        ).bitwiseAND(F.lit(65535)).cast("long").alias("y"),
    )
    z = F.expr(
        "aggregate(sequence(0, 15), cast(0 as bigint), (acc, i) -> acc"
        " + shiftleft(shiftright(x, i) & 1, 2 * i)"
        " + shiftleft(shiftright(y, i) & 1, 2 * i + 1))"
    )
    zvals = keyed.select("o_orderkey", "x", "y", z.alias("z"))
    return zvals.groupBy(F.shiftright("z", 16).cast("long").alias("z_bucket")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("x").cast("long").alias("min_cust"),
        F.max("x").cast("long").alias("max_cust"),
        F.min("y").cast("long").alias("min_day"),
        F.max("y").cast("long").alias("max_day"),
    )
