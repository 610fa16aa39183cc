"""Format connectors beyond parquet: ORC and line-text round trips.

Roundtrip queries return checksum rows computed FROM THE ROUNDTRIPPED
data, while the oracle computes the same checksums from the original
table — so a reader/writer that silently corrupts types or drops rows
hash-mismatches. This is the pattern that upgrades IO smoke checks into
real oracle checks.
"""

from __future__ import annotations

import tempfile

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


@query("q_io_orc_text_roundtrip", oracle=_CHECKSUM_ORACLE)
def q_io_orc_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC and line-text ingestion via temp-dir round trips.

    ORC is Spark's other first-class columnar format (same pushdown /
    pruning machinery as parquet). The text source reads one string line
    per row — the shape of raw log ingestion — parsed back with
    split + casts, the standard ELT first step.
    """
    nation = load_table(spark, sf_dir, "nation")
    base = tempfile.mkdtemp(prefix="rsbd_fmt_")

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
