"""Format connectors beyond parquet: ORC and line-text round trips.

Roundtrip queries return checksum rows computed FROM THE ROUNDTRIPPED
data, while the oracle computes the same checksums from the original
table — so a reader/writer that silently corrupts types or drops rows
hash-mismatches. This is the pattern that upgrades IO smoke checks into
real oracle checks.
"""

from __future__ import annotations

from recommendersystems_bigdata_spark.tmpdirs import scratch_dir

from pyspark.sql import DataFrame, SparkSession, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query

_CHECKSUM_ORACLE = """
    SELECT 'orc' AS format, count(*) AS n,
           CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
           CAST(sum(n_regionkey) AS BIGINT) AS region_sum
    FROM nation
    UNION ALL
    SELECT 'text', count(*),
           CAST(sum(n_nationkey) AS BIGINT),
           CAST(sum(n_regionkey) AS BIGINT)
    FROM nation
"""


def _checksum(df: DataFrame, fmt: str) -> DataFrame:
    return df.agg(
        F.lit(fmt).alias("format"),
        F.count(F.lit(1)).alias("n"),
        F.sum("n_nationkey").cast("long").alias("key_sum"),
        F.sum("n_regionkey").cast("long").alias("region_sum"),
    ).select("format", "n", "key_sum", "region_sum")


@query(
    "q_sink_compaction",
    oracle="""
    SELECT CAST(64 AS BIGINT) AS n_files_fragmented,
           CAST(2 AS BIGINT) AS n_files_compacted,
           count(*) AS n,
           CAST(sum(event_id) AS BIGINT) AS id_sum,
           CAST(sum(user_id) AS BIGINT) AS user_sum,
           round(sum(value), 2) AS value_sum
    FROM events
    """,
)
def q_sink_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the table-maintenance op every large ingest
    pipeline needs (streaming/hourly jobs leave thousands of KB-sized
    files; scan task count then tracks file count, not data size).

    Fragments events into 64 files, compacts to 2 with a single
    `repartition`, and checksums the compacted copy against the source
    oracle — so the query fails if compaction drops/duplicates rows OR if
    either write produces an unexpected file count (the counts are
    literals on both sides). At 100 TB the same job runs per partition
    directory with `repartitionByRange` on the sort key, sized so files
    land near `maxPartitionBytes` — preserving clustering and min/max
    pruning while collapsing the file count.
    """
    import glob

    ev = load_table(spark, sf_dir, "events")
    base = scratch_dir("compact")

    ev.repartition(64).write.mode("overwrite").parquet(f"{base}/fragmented")
    frag = spark.read.parquet(f"{base}/fragmented")
    n_frag = len(glob.glob(f"{base}/fragmented/part-*"))

    frag.repartition(2).write.mode("overwrite").parquet(f"{base}/compacted")
    comp = spark.read.parquet(f"{base}/compacted")
    n_comp = len(glob.glob(f"{base}/compacted/part-*"))

    return comp.agg(
        F.lit(n_frag).cast("long").alias("n_files_fragmented"),
        F.lit(n_comp).cast("long").alias("n_files_compacted"),
        F.count(F.lit(1)).alias("n"),
        F.sum("event_id").cast("long").alias("id_sum"),
        F.sum("user_id").cast("long").alias("user_sum"),
        F.round(F.sum("value"), 2).alias("value_sum"),
    )


@query("q_io_orc_text_roundtrip", oracle=_CHECKSUM_ORACLE)
def q_io_orc_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC and line-text ingestion via temp-dir round trips.

    ORC is Spark's other first-class columnar format (same pushdown /
    pruning machinery as parquet). The text source reads one string line
    per row — the shape of raw log ingestion — parsed back with
    split + casts, the standard ELT first step.
    """
    nation = load_table(spark, sf_dir, "nation")
    base = scratch_dir("fmt_roundtrip")

    nation.write.mode("overwrite").orc(f"{base}/nation_orc")
    orc_df = spark.read.orc(f"{base}/nation_orc")

    (
        nation.select(
            F.concat_ws("|", "n_nationkey", "n_name", "n_regionkey").alias("value")
        )
        .write.mode("overwrite")
        .text(f"{base}/nation_text")
    )
    parts = F.split("value", r"\|")
    text_df = spark.read.text(f"{base}/nation_text").select(
        F.element_at(parts, 1).cast("int").alias("n_nationkey"),
        F.element_at(parts, 2).alias("n_name"),
        F.element_at(parts, 3).cast("int").alias("n_regionkey"),
    )
    return _checksum(orc_df, "orc").unionByName(_checksum(text_df, "text"))
