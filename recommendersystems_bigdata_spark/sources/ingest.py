"""Ingestion-robustness operators (SURVEY.md §2.A additions, round 5):
corrupt-tolerant JSON scanning and schema-evolution parquet merging.

At 100 TB the scan layer's failure mode is not "the file is missing" but
"0.01% of lines are garbage" and "last quarter's shards lack this
quarter's column". These operators exercise Spark's REAL handling of
both — PERMISSIVE JSON parsing with a corrupt-record column, and
``mergeSchema`` over heterogeneous parquet shards — against oracles that
compute the expected outcome analytically from the clean source table.
The fixtures are built BY the operator, distributed (``to_json`` +
text sink / parquet sink), with a deterministic corruption/partition
rule keyed on ``doc_id``, so the oracle needs no access to the temp
files: if Spark's permissive parser or schema merger ever deviates from
the declared semantics, the hash check fails.
"""

from __future__ import annotations

from recommendersystems_bigdata_spark.tmpdirs import scratch_dir

from pyspark.sql import DataFrame, SparkSession, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query


@query(
    "q_scan_corrupt_json",
    oracle="""
    SELECT CASE WHEN doc_id % 7 = 0 THEN '_corrupt' ELSE lang END AS lang_bucket,
           count(*) AS n_docs,
           CAST(coalesce(sum(CASE WHEN doc_id % 7 <> 0 THEN n_chars END), 0)
                AS BIGINT) AS chars_sum
    FROM documents
    GROUP BY 1
    """,
)
def q_scan_corrupt_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a13 — corrupt-tolerant JSON scan with quarantine accounting.

    Serializes ``documents`` to JSONL with every 7th doc's line truncated
    mid-object (guaranteed unparseable), then reads the file back in
    PERMISSIVE mode with an explicit schema plus a corrupt-record column
    and reports per-language clean-row counts/char sums next to a
    ``_corrupt`` quarantine bucket. The corruption rule is deterministic
    (``doc_id % 7``), so the oracle derives the expected report from the
    clean table — a parser that silently drops corrupt lines (DROPMALFORMED
    semantics) or nulls the wrong rows hash-mismatches.

    Scale design: both legs are map-only over the corpus — ``to_json`` +
    conditional truncate fuse into the write stage's codegen; the
    read-back parses once with a user-supplied schema (no sampling pass
    for inference, which at 100 TB would double the scan) and feeds one
    partial-aggregated groupBy on a low-cardinality bucket key. The
    quarantine column pattern is the production shape: corrupt raw lines
    stay addressable for replay instead of vanishing."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    base = scratch_dir("ingest_json")
    path = f"{base}/docs_jsonl"
    line = F.to_json(F.struct("doc_id", "lang", "n_chars"))
    docs.select(
        F.when(F.col("doc_id") % 7 == 0, F.substring(line, 1, 10))
        .otherwise(line)
        .alias("value")
    ).write.mode("overwrite").text(path)

    parsed = (
        spark.read.schema("doc_id BIGINT, lang STRING, n_chars BIGINT, _corrupt_record STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    return (
        parsed.groupBy(
            F.when(F.col("_corrupt_record").isNotNull(), F.lit("_corrupt"))
            .otherwise(F.col("lang"))
            .alias("lang_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("n_chars"), F.lit(0)).cast("long").alias("chars_sum"),
        )
    )


@query(
    "q_scan_schema_evolution",
    oracle="""
    SELECT lang, count(*) AS n_docs,
           CAST(sum(CASE WHEN doc_id % 2 = 1 AND source IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_with_source
    FROM documents
    GROUP BY lang
    """,
)
def q_scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a14 — schema-evolution scan over heterogeneous parquet shards.

    Writes two parquet shards from ``documents`` — an "old" shard
    (even doc_ids, columns ``doc_id, lang``) and a "new" shard (odd
    doc_ids, plus the later-added ``source`` column) — then reads both
    with ``mergeSchema`` and reports, per language, total docs and how
    many carry the evolved column. The even/odd split rule lets the
    oracle compute the expectation from the source table: a reader that
    drops the unevolved shard's rows, fails to null-extend them, or
    resolves the merged schema wrong hash-mismatches.

    Scale design: ``mergeSchema`` reconciles footers only (no data pass)
    — its 100 TB cost is one footer read per file, which is why shard
    counts (not shard sizes) bound it; the query itself is scan +
    one partial-aggregated groupBy. Null-extension happens at the
    reader's projection, map-side."""
    docs = load_table(spark, sf_dir, "documents")
    base = scratch_dir("ingest_evo")
    old = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang")
    new = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "lang", "source")
    old.write.mode("overwrite").parquet(f"{base}/s_old")
    new.write.mode("overwrite").parquet(f"{base}/s_new")
    merged = spark.read.option("mergeSchema", True).parquet(
        f"{base}/s_old", f"{base}/s_new"
    )
    return merged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.col("source").isNotNull(), 1).otherwise(0)
        ).cast("long").alias("n_with_source"),
    )


@query(
    "q_sink_partitioned_daily",
    oracle="""
    SELECT CAST(CAST(CAST(ts AS TIMESTAMP) AS DATE) AS VARCHAR) AS event_date,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    WHERE CAST(CAST(ts AS TIMESTAMP) AS DATE)
          BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'
    GROUP BY 1
    """,
)
def q_sink_partitioned_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a5b — DATE-partitioned parquet sink + partition-pruned read-back
    (VERDICT r6 #7: the executable form of SCALE.md's "partition by date
    at 100 TB" claim, next to a5's event_type layout).

    Writes ``events`` partitioned by ``event_date = to_date(ts)`` — the
    production layout for an append-only event lake: ~30 partitions here,
    one per day at any scale, so ingest appends to exactly one directory
    per day and retention drops whole directories. The read-back filters
    one calendar week ON THE PARTITION COLUMN, which prunes 23 of 30
    directories at planning time (``PartitionFilters`` with no pushed
    data filter — asserted in tests/test_plans.py, along with the DPP
    variant where the week arrives via a joined dimension instead of a
    literal). The aggregate over the surviving week must hash-match the
    oracle computed on the unpartitioned source: write → prune → read →
    aggregate ≡ filter → aggregate, i.e. the layout is lossless and the
    pruning is correct, not just fast.

    Scale design: day-granular directories keep per-partition file counts
    bounded (a date+hour or date+bucket scheme is the same plan shape);
    ``round(sum(value), 2)`` is layout-safe here because value is a 2-dp
    quantity (exactmath.py module docstring). The ``repartition`` on the
    partition column before the write keeps one task per day directory
    instead of every task writing every day — the small-files discipline
    a 1000-executor ingest needs. The result's date is emitted as its ISO
    string (repo convention for date-keyed oracles)."""
    ev = load_table(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
    base = scratch_dir("sink_daily")
    # repartition by the partition column so each output directory is
    # written by one task (bounded file count), not by every task
    ev.repartition("event_date").write.mode("overwrite").partitionBy(
        "event_date"
    ).parquet(f"{base}/events_daily")
    back = spark.read.parquet(f"{base}/events_daily")
    return (
        back.filter(
            F.col("event_date").between(F.lit("2024-01-08"), F.lit("2024-01-14"))
        )
        .groupBy(F.col("event_date").cast("string").alias("event_date"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@query(
    "q_io_xml_roundtrip",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM orders
    GROUP BY 1, 2
    """,
)
def q_io_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a15 — XML sink + source round-trip (Spark 4 native ``xml`` format).

    Serializes ``orders`` (key, status, priority, exact integer cents) to
    XML with a ``rowTag``, reads it back with an EXPLICIT schema, and
    aggregates per (status, priority). The aggregate must hash-match the
    oracle computed on the parquet source, proving the XML writer/parser
    pair is lossless for longs and strings — the same write→read→aggregate
    ≡ aggregate contract the CSV/JSON (a4) and ORC/text (a12) round-trips
    pin for their formats. Money crosses the text format as integer cents
    (``floor(x*100+0.5)``, exactmath.py): a double serialized as decimal
    text and re-parsed is NOT guaranteed bit-identical, integers are.

    Scale design: both legs are map-only (row→XML-fragment render, then
    StAX pull-parse per row); the explicit read schema skips the
    whole-corpus inference pass that ``spark.read.xml`` would otherwise
    burn at 100 TB, exactly as a13 does for JSON. XML's cost is
    per-record framing, not structure — the one shuffle is the final
    ≤15-key partial-aggregated groupBy."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    base = scratch_dir("ingest_xml")
    path = f"{base}/orders_xml"
    orders.write.mode("overwrite").format("xml").option("rootTag", "orders").option(
        "rowTag", "order"
    ).save(path)
    back = (
        spark.read.schema(
            "o_orderkey BIGINT, o_orderstatus STRING, "
            "o_orderpriority STRING, cents BIGINT"
        )
        .format("xml")
        .option("rowTag", "order")
        .load(path)
    )
    return back.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").cast("long").alias("total_cents"),
    )


@query(
    "q_snapshot_diff",
    oracle="""
    WITH base AS (
      SELECT o_orderkey AS k, o_orderstatus,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
      FROM orders
    )
    SELECT CASE WHEN k % 11 = 0 THEN 'insert'
                WHEN k % 13 = 0 THEN 'delete'
                WHEN k % 7 = 0 THEN 'update'
                ELSE 'same' END AS change_type,
           o_orderstatus,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN k % 13 <> 0 AND k % 7 = 0 THEN c + 500
                         ELSE c END) AS BIGINT) AS cents_effective
    FROM base
    WHERE NOT (k % 11 = 0 AND k % 13 = 0)
    GROUP BY 1, 2
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a16 — CDC changeset between two table snapshots (snapshot diff).

    Materializes two parquet snapshots of ``orders`` under deterministic
    divergence rules — the "old" snapshot lacks keys ≡0 (mod 11) (these
    become INSERTS), the "new" snapshot lacks keys ≡0 (mod 13) (DELETES)
    and reprices keys ≡0 (mod 7) by +500 cents (UPDATES) — then computes
    the changeset the way a real engine must: a full outer join of the
    snapshots on the primary key, classifying each row from null-ness and
    VALUE COMPARISON (update = both present ∧ cents differ), never from
    the generation rule. The oracle derives the expected (change_type,
    status) census analytically from the modular rules, so a diff that
    misclassifies any row — e.g. treats a null-extended column as a
    change, or loses delete rows to an inner join — hash-mismatches.
    ``cents_effective`` is the post-change value (deletes carry their
    last-known value), summed in exact integer cents.

    Scale design: the diff is one shuffle on the primary key for each
    side (sort-merge full outer); at 100 TB both snapshots would be
    bucketed by key on write (the l9 layout), making the diff a
    zero-shuffle zip of co-located buckets. Classification and the
    effective-value projection are map-side; the final groupBy has ≤12
    keys and partial-aggregates. This is the incremental-maintenance
    primitive: its output stream IS the apply-set a5/a7-style upsert
    sinks consume."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        "o_orderstatus",
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    base = scratch_dir("snapshot_diff")
    orders.filter(F.col("k") % 11 != 0).write.mode("overwrite").parquet(
        f"{base}/snap_old"
    )
    orders.filter(F.col("k") % 13 != 0).withColumn(
        "cents",
        F.when(F.col("k") % 7 == 0, F.col("cents") + 500).otherwise(F.col("cents")),
    ).write.mode("overwrite").parquet(f"{base}/snap_new")

    old = spark.read.parquet(f"{base}/snap_old").alias("o")
    new = spark.read.parquet(f"{base}/snap_new").alias("n")
    diff = old.join(new, F.col("o.k") == F.col("n.k"), "full_outer").select(
        F.when(F.col("o.k").isNull(), F.lit("insert"))
        .when(F.col("n.k").isNull(), F.lit("delete"))
        .when(F.col("n.cents") != F.col("o.cents"), F.lit("update"))
        .otherwise(F.lit("same"))
        .alias("change_type"),
        F.coalesce(F.col("n.o_orderstatus"), F.col("o.o_orderstatus")).alias(
            "o_orderstatus"
        ),
        F.coalesce(F.col("n.cents"), F.col("o.cents")).alias("cents_effective"),
    )
    return diff.groupBy("change_type", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("cents_effective").cast("long").alias("cents_effective"),
    )


@query(
    "q_variant_extract",
    oracle="""
    SELECT event_type,
           CAST(json_extract(props, '$.k') AS BIGINT) % 8 AS k_bucket,
           count(*) AS n_events,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS k_sum
    FROM events
    GROUP BY 1, 2
    """,
)
def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a17 — semi-structured ingestion via VARIANT (Spark 4 ``parse_json``).

    Parses the stored JSON payload column ``events.props`` into a VARIANT
    once, then does TYPED extraction (``try_variant_get`` → BIGINT) and
    aggregates per (event_type, k mod 8). The oracle recomputes the same
    census with DuckDB's JSON extraction over the raw strings, so a
    parse/extract pair that mistypes, nulls, or truncates any payload
    hash-mismatches. This is the modern counterpart to h9
    ``q_json_extract`` (string-path ``get_json_object``): same semantics,
    different execution contract.

    Scale design: VARIANT is the right 100 TB shape for repeated access —
    the payload is tokenized ONCE into a binary-encoded tree at parse
    time, and every subsequent field access is an offset walk, where
    ``get_json_object`` re-tokenizes the JSON text per call site. With
    the parse in the same projection the whole pipeline is map-side
    (parse → extract → partial agg) with one ≤40-key shuffle. In a real
    lake the parse would run at INGEST and the variant column be stored
    (shredded) in parquet, amortizing it to zero per query; ``try_``
    extraction quarantines type drift as NULL instead of failing the
    scan, matching a13's dirty-data discipline."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.parse_json("props").alias("v")
    )
    got = ev.select(
        "event_type",
        F.try_variant_get("v", "$.k", "bigint").alias("k_val"),
    )
    return got.groupBy(
        "event_type", (F.col("k_val") % 8).alias("k_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k_val").cast("long").alias("k_sum"),
    )


@query(
    "q_merge_into",
    oracle="""
    WITH base AS (
      SELECT o_orderkey AS k, o_orderstatus,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
      FROM orders
    )
    SELECT o_orderstatus,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN k % 11 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_inserted,
           CAST(sum(CASE WHEN k % 11 <> 0 AND k % 13 <> 0 AND k % 7 = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_updated,
           CAST(sum(CASE WHEN k % 11 <> 0 AND k % 13 <> 0 AND k % 7 = 0
                         THEN c + 500 ELSE c END) AS BIGINT) AS total_cents
    FROM base
    WHERE NOT (k % 11 <> 0 AND k % 13 = 0)
    GROUP BY 1
    """,
)
def q_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a18 — three-action MERGE INTO apply (the executable counterpart of
    a16's changeset DERIVATION: a16 diffs two snapshots into a change
    feed, a18 applies a change feed onto a base snapshot).

    The base table is ``orders`` minus keys ≡0 (mod 11); the change feed
    carries one action per affected key with I > D > U precedence —
    INSERT the missing mod-11 keys, DELETE keys ≡0 (mod 13), UPDATE keys
    ≡0 (mod 7) to cents+500. The apply is engine-real: a full outer join
    of base and changes on the primary key, with the merged row decided
    by matched/unmatched status × action (matched+U → new value,
    matched+D → drop, unmatched change+I → insert, base-only → keep) —
    never by re-deriving the modular rule. The oracle computes the
    post-merge census (per-status rows, inserted/updated action counts,
    exact integer cents mass) analytically from the source, so an apply
    that drops unmatched inserts to an inner join, double-applies an
    update, or resurrects deletes hash-mismatches.

    Scale design: one shuffle on the primary key per side (sort-merge
    full outer); in a real lake the base is bucketed by key on write
    (the l9 layout) and the daily change feed is ≪ the base, so the
    apply degenerates to a broadcast-side merge per bucket with zero
    base shuffle. Action decode and value selection are map-side; the
    census groupBy has ≤3 keys and partial-aggregates. Precedence is
    resolved when the feed is BUILT (one row per key), which is the
    CDC-compaction contract every MERGE engine assumes."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        "o_orderstatus",
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    base = orders.filter(F.col("k") % 11 != 0)
    changes = (
        orders.withColumn(
            "action",
            F.when(F.col("k") % 11 == 0, "I")
            .when(F.col("k") % 13 == 0, "D")
            .when(F.col("k") % 7 == 0, "U"),
        )
        .filter(F.col("action").isNotNull())
        .select(
            F.col("k").alias("ck"),
            F.col("o_orderstatus").alias("c_status"),
            "action",
            F.when(F.col("action") == "U", F.col("cents") + 500)
            .otherwise(F.col("cents"))
            .alias("new_cents"),
        )
    )
    merged = (
        base.join(changes, base["k"] == changes["ck"], "full_outer")
        # D rows drop whether matched (delete) or unmatched (tombstone for
        # an absent key produces nothing); base-only rows have NULL action,
        # so the filter must be null-safe — `action != 'D'` alone is
        # three-valued NULL there and would silently drop every kept row
        .filter(F.col("action").isNull() | (F.col("action") != "D"))
        .select(
            F.coalesce(F.col("o_orderstatus"), F.col("c_status")).alias(
                "o_orderstatus"
            ),
            F.when(F.col("action").isin("I", "U"), F.col("new_cents"))
            .otherwise(F.col("cents"))
            .alias("cents_out"),
            F.col("action"),
        )
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("action") == "I", 1).otherwise(0))
        .cast("long")
        .alias("n_inserted"),
        F.sum(F.when(F.col("action") == "U", 1).otherwise(0))
        .cast("long")
        .alias("n_updated"),
        F.sum("cents_out").cast("long").alias("total_cents"),
    )


@query(
    "q_incremental_agg",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS total_cents,
           min(o_orderkey) AS min_key,
           max(o_orderkey) AS max_key,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) // count(*)
                AS BIGINT) AS avg_cents
    FROM orders
    GROUP BY 1
    """,
)
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a19 — incremental aggregate maintenance via mergeable partial
    states (the materialized-view-refresh primitive).

    Splits ``orders`` into a "yesterday" snapshot (keys with k mod 5 ≠ 0)
    and a "today" delta (k mod 5 = 0), computes the per-priority
    aggregate STATE — (count, exact cents sum, min key, max key), each a
    commutative monoid — on each side independently, then MERGES the two
    state tables (sum+sum, min+min, max+max) and derives the final
    metrics (including avg as a truncating integer division of merged
    sums) from the merged state only. The oracle aggregates the full
    table directly, so the check pins the algebraic contract
    merge(state(A), state(B)) = state(A ∪ B): a non-mergeable spelling
    (e.g. averaging the two sides' averages) hash-mismatches
    immediately.

    Scale design: this is THE pattern that makes a 100 TB nightly
    rollup affordable — the historical partition's state is computed
    once and stored (rows = groups, not facts), and each refresh
    aggregates only the delta and merges, so daily cost is
    O(delta + groups) instead of O(corpus). Both legs partial-aggregate
    map-side; the merge groupBy runs over 2×groups rows. Every state
    component here is a true monoid; the repo's sketch aggregates
    (d3 HLL, d20 KLL) extend the same merge contract to
    distinct-count/quantile states."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        "o_orderpriority",
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias("cents"),
    )

    def state(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("s"),
            F.min("k").alias("mn"),
            F.max("k").alias("mx"),
        )

    snapshot = state(orders.filter(F.col("k") % 5 != 0))
    delta = state(orders.filter(F.col("k") % 5 == 0))
    merged = (
        snapshot.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n").cast("long").alias("n_orders"),
            F.sum("s").cast("long").alias("total_cents"),
            F.min("mn").alias("min_key"),
            F.max("mx").alias("max_key"),
        )
    )
    return merged.select(
        "o_orderpriority",
        "n_orders",
        "total_cents",
        "min_key",
        "max_key",
        F.expr("CAST(total_cents div n_orders AS BIGINT)").alias("avg_cents"),
    )
