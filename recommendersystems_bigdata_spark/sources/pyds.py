"""Custom Python DataSource connector (SURVEY.md §2.A a18, round 9).

Spark 4's Python DataSource API (`pyspark.sql.datasource`) lets a pure-
Python connector plug into the planner as a first-class format: it
declares a schema, plans InputPartitions (the split list the scheduler
distributes), and each task materializes its partition — here as
pyarrow RecordBatches, the Arrow-vectorized path across the Python
boundary. This module exercises the whole contract on a realistic
format: `kvlog`, a key=value structured-log text format (the shape of
app/server logs before anyone converts them to parquet).

Roundtrip query: the events table is serialized to kvlog text files
(one file per planned split), read back through the registered
connector, and aggregated; the oracle computes the same aggregate
straight from the parquet events table — so the driver's hash compare
certifies the ENTIRE custom source path (schema, partition planning,
per-split parse, Arrow batch emission) bit-for-bit.

Scale honesty: a Python source parses rows in Python — the documented
slow path vs the JVM parquet reader (§2.J measures that gap). What the
API gets right for 100 TB anyway: splits are planned driver-side and
scanned in parallel (one task per InputPartition, here one per file),
rows cross into the JVM as Arrow RecordBatches (no per-row pickling),
and the connector composes with every downstream operator. The play at
scale is exactly this module's flow — use the connector to INGEST a
legacy format once, then operate on columnar storage.

Worker-shipping rule (engine-wide): the DataSource classes are defined
INSIDE the query function, so cloudpickle serializes them by value —
a module-level class would be pickled by reference and die with
ModuleNotFoundError on workers that don't share the driver's sys.path.
"""

from __future__ import annotations

import glob
import hashlib
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query
from recommendersystems_bigdata_spark.tmpdirs import scratch_dir

# kvlog materialization cache: sf_dir -> text dir (one per session, reused
# by repeat runs of the query — the determinism lint runs every query twice).
_KVLOG_SRC: dict[str, str] = {}

_N_SPLITS = 4


def _kvlog_dir(spark: SparkSession, sf_dir: str) -> str:
    """Serialize events as kvlog text files, _N_SPLITS files = splits."""
    key = os.path.abspath(sf_dir)
    if key in _KVLOG_SRC and os.path.isdir(_KVLOG_SRC[key]):
        return _KVLOG_SRC[key]
    out = scratch_dir("kvlog_" + hashlib.md5(key.encode()).hexdigest()[:8])
    ev = load_table(spark, sf_dir, "events")
    (
        ev.select(
            F.format_string(
                "ts=%d user=%d type=%s value_c=%d id=%d",
                F.unix_micros(F.col("ts").cast("timestamp")),
                F.col("user_id"),
                F.col("event_type"),
                F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"),
                F.col("event_id"),
            ).alias("value")
        )
        .repartition(_N_SPLITS)
        .write.mode("overwrite")
        .text(out)
    )
    _KVLOG_SRC[key] = out
    return out


@query(
    "q_pyds_kvlog_scan",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS value_cents,
           CAST(min(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS first_us,
           CAST(max(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS last_us
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def q_pyds_kvlog_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.A a18 — custom Python DataSource roundtrip: events → kvlog
    structured-log text → read back through a registered
    `pyspark.sql.datasource.DataSource` ("kvlog" format, one
    InputPartition per log file, per-split parse emitted as pyarrow
    RecordBatches) → per-type aggregate in exact integers (counts,
    cent-sums, first/last microsecond timestamps). The oracle aggregates
    the original parquet table directly, so a hash match certifies the
    connector end to end: schema declaration, split planning, parsing,
    and Arrow emission.

    Scale: splits scan in parallel (task per InputPartition); rows cross
    the Python boundary as Arrow batches, never per-row pickles; the
    documented cost is the Python parse itself — the connector is the
    ingest-once path for legacy formats, not the steady-state scan."""
    src = _kvlog_dir(spark, sf_dir)

    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class _KvLogReader(DataSourceReader):
        def __init__(self, options):
            self._dir = options["path"]

        def partitions(self):
            files = sorted(glob.glob(os.path.join(self._dir, "part-*")))
            return [InputPartition(f) for f in files]

        def read(self, partition):
            import pyarrow as pa

            ts, users, types, cents, ids = [], [], [], [], []
            with open(partition.value, encoding="utf-8") as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    kv = dict(tok.split("=", 1) for tok in line.split(" "))
                    ts.append(int(kv["ts"]))
                    users.append(int(kv["user"]))
                    types.append(kv["type"])
                    cents.append(int(kv["value_c"]))
                    ids.append(int(kv["id"]))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ts, pa.int64()),
                    pa.array(users, pa.int64()),
                    pa.array(types, pa.string()),
                    pa.array(cents, pa.int64()),
                    pa.array(ids, pa.int64()),
                ],
                names=["ts_us", "user_id", "event_type", "value_c", "event_id"],
            )

    class KvLogSource(DataSource):
        @classmethod
        def name(cls):
            return "kvlog"

        def schema(self):
            return (
                "ts_us BIGINT, user_id BIGINT, event_type STRING,"
                " value_c BIGINT, event_id BIGINT"
            )

        def reader(self, schema):
            return _KvLogReader(self.options)

    spark.dataSource.register(KvLogSource)
    df = spark.read.format("kvlog").option("path", src).load()
    return (
        df.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value_c").cast("long").alias("value_cents"),
            F.min("ts_us").cast("long").alias("first_us"),
            F.max("ts_us").cast("long").alias("last_us"),
        )
        .orderBy("event_type")
    )
