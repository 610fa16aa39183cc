"""Table fingerprinting / replication audits (SURVEY.md §2.BW,
round 10).

The "are these two 100 TB replicas identical, and if not WHERE" layer
of a data platform — bucketed content checksums whose comparison costs
one pass per side and whose diff localizes the damage, beside §2.A's
snapshot diff (row-level, for tables that fit a join) and §2.B's FK
integrity (global counts):

- bw1: the bucketed orders fingerprint — 64 key-hash buckets, each
  with row count, content checksum, and key range: replicas diff
  bucket-by-bucket, and only differing buckets need row-level repair.
- bw2: bucketed FK reconciliation — orders vs the lineitem order
  rollup per bucket: matched keys and orphan counts on BOTH sides
  (localizing referential damage to 1/64 of the keyspace).
- bw3: the ship-month incremental fingerprint of lineitem — the
  partition-level checksum an incremental sync diffs to find WHICH
  months to re-ship.
- bw4: the one-row whole-table probes for orders and lineitem — the
  cheapest "identical or not" gate, published side by side.

THE ROW-CHECKSUM DEVICE: a content hash both engines can evaluate
bit-identically must be pure integer arithmetic (engine hash()
builtins differ; md5 strings exist in both but cannot be SUMMED).
Every row maps to

    rowhash = (k₁·P₁ + k₂·P₂ + k₃·P₃) mod M,   M = 2⁶¹ − 1

over exact integer fields (keys, cents, epoch days), with distinct
odd primes P so field transpositions change the hash; bucket
checksums are ``(Σ rowhash) mod M`` — commutative, so partitioning
and row order never matter, and map-side partial sums combine freely.

PER-ROW ARITHMETIC IS PURE BIGINT since round 11 (DuckDB keeps
HUGEINT): the round-10 spelling evaluated the whole row polynomial in
decimal(38,0), i.e. three 128-bit multiplies + two adds + one mod per
row on Spark's slow BigDecimal path — the single most expensive
expression in the bench's full-fact scan profile. The identity
``(a+b+c) mod M = ((a mod M)+(b mod M)+(c mod M)) mod M`` lets each
``field·P`` term reduce independently, and every term provably fits
int64 at the 100 TB design point: the largest field is lineitem's
``orderkey·8+linenumber ≤ 4.9·10¹²`` (orderkey ≤ 6·10¹¹ at
SF=100 000) times P₁ ≈ 10⁶ → ≤ 4.9·10¹⁸ < 2⁶³−1 (headroom ~1.9×;
cents·100+qty ≤ ~1.1·10⁹ times P₂ < 2³⁰ → ≤ 1.2·10¹⁸; epoch days
~10⁴·P₃ ≈ 10¹³), and the sum of three mod-reduced terms is
< 3·(2⁶¹−1) < 2⁶³−1. Spark 4 runs ANSI, so a beyond-design-point SF
would fail loudly, never wrap silently. Only the ACROSS-ROWS sum
stays decimal(38,0) (rows × M needs 128 bits — 6·10¹¹ lineitem rows ×
2.3·10¹⁸ ≈ 1.4·10³⁰ ≪ 10³⁸); the published checksum fits BIGINT
(< M). Row values are bit-identical to the round-10 spelling (same
integers, same mod), verified against the unchanged DuckDB oracle and
the committed sweep hashes. A deleted row, a flipped
cent, or a date shift each change the bucket checksum (mod-M
collisions require an adversary, not drift — this is a replication
audit, not a cryptographic MAC; the doc states that contract).

Spark-first shape, sized for 100 TB: every fingerprint is ONE
partial-aggregated pass (groupBy bucket / month — map-side combine
does almost all the work; 64 or |months| result rows); bw2 is the
co-partitioned orders⋈lineitem-rollup full outer join on the order
key — the join both tables are naturally clustered for — reduced to
64 rows before anything leaves the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from recommendersystems_bigdata_spark.catalog import load_table, load_tables
from recommendersystems_bigdata_spark.registry import query

_DEC = "decimal(38,0)"
_M = 2**61 - 1
_P1, _P2, _P3 = 1_000_003, 998_244_353, 754_974_721

_O_CENTS = "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
_L_CENTS = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
_L_QTY = "CAST(floor(l_quantity + 0.5) AS BIGINT)"

# epoch-day spellings (both engines: date difference from 1970-01-01)
_O_DAY_SPARK = "datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')"
_O_DAY_DUCK = (
    "date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))"
)
_L_DAY_SPARK = "datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01')"
_L_DAY_DUCK = (
    "date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))"
)


def _rowhash(dec_cast: str, k1: str, k2: str, k3: str) -> str:
    """HUGEINT spelling (DuckDB oracle): the whole polynomial in one
    128-bit expression."""
    return (
        f"(CAST({k1} AS {dec_cast}) * {_P1}"
        f" + CAST({k2} AS {dec_cast}) * {_P2}"
        f" + CAST({k3} AS {dec_cast}) * {_P3}) % {_M}"
    )


def _rowhash_bigint(k1: str, k2: str, k3: str) -> str:
    """int64 spelling (Spark engine side): each ``field·P`` term reduced
    mod M independently — bit-identical values to :func:`_rowhash` (see
    the module doc's overflow-bound argument), no BigDecimal per-row
    path."""
    return (
        f"((CAST({k1} AS BIGINT) * {_P1}) % {_M}"
        f" + (CAST({k2} AS BIGINT) * {_P2}) % {_M}"
        f" + (CAST({k3} AS BIGINT) * {_P3}) % {_M}) % {_M}"
    )


_O_HASH_SPARK = _rowhash_bigint("o_orderkey", _O_CENTS, _O_DAY_SPARK)
_O_HASH_DUCK = _rowhash("HUGEINT", "o_orderkey", _O_CENTS, _O_DAY_DUCK)
_L_HASH_SPARK = _rowhash_bigint(
    "l_orderkey * 8 + l_linenumber", f"{_L_CENTS} * 100 + {_L_QTY}",
    _L_DAY_SPARK,
)
_L_HASH_DUCK = _rowhash(
    "HUGEINT", "l_orderkey * 8 + l_linenumber",
    f"{_L_CENTS} * 100 + {_L_QTY}", _L_DAY_DUCK,
)


@query(
    "q_fingerprint_orders",
    oracle=f"""
    SELECT CAST(o_orderkey % 64 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS rows_n,
           CAST(sum({_O_HASH_DUCK}) % {_M} AS BIGINT) AS checksum,
           CAST(min(o_orderkey) AS BIGINT) AS key_min,
           CAST(max(o_orderkey) AS BIGINT) AS key_max
    FROM orders GROUP BY 1 ORDER BY bucket
    """,
)
def q_fingerprint_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BW bw1 — the bucketed orders fingerprint: 64 key-hash
    buckets, each with row count, the mod-M content checksum over
    (orderkey, total cents, order epoch-day), and the key range. Two
    replicas agree iff all 64 rows agree; a diff names the 1/64
    keyspace slice to repair.

    Scale: one pass, map-side partial sums (mod-M sums commute), 64
    result rows at any SF."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.expr("CAST(o_orderkey % 64 AS BIGINT)").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("rows_n"),
            F.expr(
                f"CAST(sum(CAST({_O_HASH_SPARK} AS {_DEC})) % {_M} AS BIGINT)"
            ).alias("checksum"),
            F.min("o_orderkey").cast("long").alias("key_min"),
            F.max("o_orderkey").cast("long").alias("key_max"),
        )
        .orderBy("bucket")
    )


@query(
    "q_fingerprint_reconcile",
    oracle="""
    WITH o AS (
      SELECT o_orderkey AS k FROM orders
    ),
    l AS (
      SELECT DISTINCT l_orderkey AS k FROM lineitem
    ),
    j AS (
      SELECT COALESCE(o.k, l.k) AS k,
             (o.k IS NOT NULL) AS in_o, (l.k IS NOT NULL) AS in_l
      FROM o FULL OUTER JOIN l ON o.k = l.k
    )
    SELECT CAST(k % 64 AS BIGINT) AS bucket,
           CAST(sum(CASE WHEN in_o THEN 1 ELSE 0 END) AS BIGINT)
             AS orders_keys,
           CAST(sum(CASE WHEN in_l THEN 1 ELSE 0 END) AS BIGINT)
             AS lineitem_keys,
           CAST(sum(CASE WHEN in_o AND in_l THEN 1 ELSE 0 END) AS BIGINT)
             AS matched,
           CAST(sum(CASE WHEN in_o AND NOT in_l THEN 1 ELSE 0 END)
                AS BIGINT) AS orders_orphans,
           CAST(sum(CASE WHEN in_l AND NOT in_o THEN 1 ELSE 0 END)
                AS BIGINT) AS lineitem_orphans
    FROM j GROUP BY 1 ORDER BY bucket
    """,
)
def q_fingerprint_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BW bw2 — bucketed FK reconciliation: the orders keyset vs
    the DISTINCT lineitem order keyset, full-outer-joined on the key
    both tables cluster on, rolled up to 64 buckets of matched /
    orphan counts — referential damage localized to a keyspace slice
    instead of §2.B's single global verdict.

    Scale: the fact⋈fact leg is the natural co-partitioned order-key
    join (lineitem pre-deduped to order grain map-side); output is 64
    rows."""
    orders, lineitem = load_tables(spark, sf_dir, "orders", "lineitem")
    o = orders.select(F.col("o_orderkey").alias("k"))
    l = lineitem.select(F.col("l_orderkey").alias("k")).distinct()
    j = o.withColumn("in_o", F.lit(True)).join(
        l.withColumn("in_l", F.lit(True)),
        o.k == l.k,
        "full_outer",
    ).select(
        F.coalesce(o.k, l.k).alias("k"),
        F.coalesce("in_o", F.lit(False)).alias("in_o"),
        F.coalesce("in_l", F.lit(False)).alias("in_l"),
    )
    return (
        j.groupBy(F.expr("CAST(k % 64 AS BIGINT)").alias("bucket"))
        .agg(
            F.sum(F.when(F.col("in_o"), 1).otherwise(0))
            .cast("long")
            .alias("orders_keys"),
            F.sum(F.when(F.col("in_l"), 1).otherwise(0))
            .cast("long")
            .alias("lineitem_keys"),
            F.sum(F.when(F.col("in_o") & F.col("in_l"), 1).otherwise(0))
            .cast("long")
            .alias("matched"),
            F.sum(F.when(F.col("in_o") & ~F.col("in_l"), 1).otherwise(0))
            .cast("long")
            .alias("orders_orphans"),
            F.sum(F.when(F.col("in_l") & ~F.col("in_o"), 1).otherwise(0))
            .cast("long")
            .alias("lineitem_orphans"),
        )
        .orderBy("bucket")
    )


@query(
    "q_fingerprint_by_month",
    oracle=f"""
    SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT) AS ym,
           CAST(count(*) AS BIGINT) AS rows_n,
           CAST(sum({_L_HASH_DUCK}) % {_M} AS BIGINT) AS checksum
    FROM lineitem GROUP BY 1 ORDER BY ym
    """,
)
def q_fingerprint_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BW bw3 — the incremental-sync fingerprint: per ship month,
    row count and the mod-M checksum over (orderkey·8+linenumber,
    price cents·100+qty, ship epoch-day). An incremental replica diffs
    this ≤|months|-row table to find exactly which partitions to
    re-ship — the checksum-manifest pattern.

    Scale: one pass, map-side combine, |months| rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            (F.year("l_shipdate") * 100 + F.month("l_shipdate"))
            .cast("long")
            .alias("ym")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("rows_n"),
            F.expr(
                f"CAST(sum(CAST({_L_HASH_SPARK} AS {_DEC})) % {_M} AS BIGINT)"
            ).alias("checksum"),
        )
        .orderBy("ym")
    )


@query(
    "q_fingerprint_total",
    oracle=f"""
    SELECT 'orders' AS tbl, CAST(count(*) AS BIGINT) AS rows_n,
           CAST(sum({_O_HASH_DUCK}) % {_M} AS BIGINT) AS checksum,
           CAST(sum(CAST(o_orderkey AS HUGEINT)) % {_M} AS BIGINT)
             AS key_sum_mod
    FROM orders
    UNION ALL
    SELECT 'lineitem', CAST(count(*) AS BIGINT),
           CAST(sum({_L_HASH_DUCK}) % {_M} AS BIGINT),
           CAST(sum(CAST(l_orderkey AS HUGEINT) * 8 + l_linenumber)
                % {_M} AS BIGINT)
    FROM lineitem
    ORDER BY tbl
    """,
)
def q_fingerprint_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BW bw4 — the whole-table probes: one row per table (orders,
    lineitem) with row count, the mod-M content checksum, and the
    mod-M key sum — the O(1)-output "replicas identical?" gate run
    before any bucketed drill-down.

    Scale: two independent single-pass 1-row aggregates."""
    orders, lineitem = load_tables(spark, sf_dir, "orders", "lineitem")
    o = orders.agg(
        F.count(F.lit(1)).cast("long").alias("rows_n"),
        F.expr(f"CAST(sum(CAST({_O_HASH_SPARK} AS {_DEC})) % {_M} AS BIGINT)").alias(
            "checksum"
        ),
        F.expr(
            f"CAST(sum(CAST(o_orderkey AS {_DEC})) % {_M} AS BIGINT)"
        ).alias("key_sum_mod"),
    ).select(F.lit("orders").alias("tbl"), "rows_n", "checksum", "key_sum_mod")
    l = lineitem.agg(
        F.count(F.lit(1)).cast("long").alias("rows_n"),
        F.expr(f"CAST(sum(CAST({_L_HASH_SPARK} AS {_DEC})) % {_M} AS BIGINT)").alias(
            "checksum"
        ),
        F.expr(
            f"CAST(sum(CAST(l_orderkey AS {_DEC}) * 8 + l_linenumber)"
            f" % {_M} AS BIGINT)"
        ).alias("key_sum_mod"),
    ).select(
        F.lit("lineitem").alias("tbl"), "rows_n", "checksum", "key_sum_mod"
    )
    return o.unionAll(l).orderBy("tbl")
