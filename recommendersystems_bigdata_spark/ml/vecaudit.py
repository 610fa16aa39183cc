"""Embedding-space audits (SURVEY.md §2.BN, round 9).

The geometry health checks a vector corpus gets before ANN indexing
or embedding-based dedup trusts it (beside §2.K's similarity/ANN
operators, which CONSUME the vectors these audit):

- bn1: the norm audit — the census of squared L2 norms in milli
  buckets with the unit-norm band flag: cosine pipelines assume
  normalized vectors; a drifting encoder shows up here first.
- bn2: the dead-dimension screen — per dimension, how many vectors
  are near-zero there: dimensions the encoder never uses waste index
  memory and dilute distance contrast.
- bn3: the concentration screen — per vector, the share of its energy
  in its single largest component, bucketed: "peaky" one-hot-like
  vectors embed degenerate inputs (empty strings, OOV floods).
- bn4: the label-balance audit — per label, vector count/share, mean
  squared norm, and the peaky rate: class imbalance plus per-class
  geometry in one table.

CROSS-ENGINE FLOAT EXACTNESS (the device this suite pins): every
float computation is PER ROW and FOLD-ORDERED — Spark's
``aggregate(embedding, 0.0D, (a, x) -> a + x·x)`` and DuckDB's
``list_reduce(list_transform(e, x -> x·x), (a, b) -> a + b)`` execute
the identical left-fold FP sequence (the leading ``0 + x₁²`` is exact),
and each float32 component casts to double losslessly — so the raw
doubles are bit-identical across engines (verified: 0 mismatches over
the corpus), and flooring them to e6 fixed-point yields exact integers.
NO float is ever aggregated ACROSS rows (cross-row float sums are
partition-order-dependent); every cross-row statistic aggregates the
per-row integers. The per-dimension screens explode the (row, dim)
relation — a fixed 64× fan-out that partial-aggregates immediately to
the 64-row dimension census (Spark 0-based ``posexplode`` aligned to
DuckDB's 1-based lambda index by ``i - 1``).

Scale: every audit is ONE pass over the vector table (map-side fold →
bounded census: ≤ a few norm/concentration buckets, 64 dimensions,
|labels| rows); totals ride 1-row broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query

# per-row folds — identical FP sequences in both engines (module doc)
_NORM2_SPARK = (
    "aggregate(embedding, CAST(0 AS DOUBLE),"
    " (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
)
_NORM2_DUCK = (
    "list_reduce(list_transform(embedding,"
    " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)"
)
_MAXSQ_SPARK = (
    "array_max(transform(embedding,"
    " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
)
_MAXSQ_DUCK = (
    "list_max(list_transform(embedding,"
    " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
)
_CONC_SPARK = (
    f"CASE WHEN {_NORM2_SPARK} = 0 THEN 0 ELSE"
    f" CAST(floor(10000 * ({_MAXSQ_SPARK}) / ({_NORM2_SPARK})) AS BIGINT)"
    f" END"
)
_CONC_DUCK = (
    f"CASE WHEN {_NORM2_DUCK} = 0 THEN 0 ELSE"
    f" CAST(floor(10000 * ({_MAXSQ_DUCK}) / ({_NORM2_DUCK})) AS BIGINT)"
    f" END"
)

_PEAKY_BP = 2500  # one component carrying ≥ 25 % of the energy
_NEAR_ZERO = 0.01
_DEAD_BP = 9950


@query(
    "q_emb_norm_audit",
    oracle=f"""
    WITH v AS (
      SELECT CAST(floor(1000000 * {_NORM2_DUCK}) AS BIGINT) AS norm2_e6
      FROM embeddings
    ),
    census AS (
      SELECT norm2_e6 // 1000 AS norm2_milli,
             CAST(count(*) AS BIGINT) AS vectors,
             CAST(min(norm2_e6) AS BIGINT) AS min_norm2_e6,
             CAST(max(norm2_e6) AS BIGINT) AS max_norm2_e6
      FROM v GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(vectors) AS BIGINT) AS n FROM census)
    SELECT norm2_milli, vectors,
           CAST((10000 * vectors) // n AS BIGINT) AS share_bp,
           min_norm2_e6, max_norm2_e6,
           norm2_milli BETWEEN 998 AND 1001 AS unit_band
    FROM census, tot ORDER BY norm2_milli
    """,
)
def q_emb_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BN bn1 — the squared-norm census in milli buckets with the
    unit-band flag (‖v‖² ∈ [0.998, 1.002)): the first thing to check
    before trusting cosine ≈ dot. The e6 fixed-point norms are exact
    integers from the bit-identical per-row fold (module doc).

    Scale: one map-side fold pass → bounded norm census; the total is
    an unpartitioned window OVER THE BOUNDED CENSUS (round 11 — the
    round-10 1-row-broadcast spelling re-aggregated the census from
    scratch for the total, and Catalyst/AQE gave the duplicated subtree
    no exchange reuse, so the fact-wide fold ran TWICE: 2 parquet scans
    + 2 fold passes in plans/r11/q_emb_norm_audit_before.txt; measured
    3.1 s → 0.55 s at sf0.1. The window's SinglePartition input is the
    ≤~10³-row census, the same boundedness adjudication as §2.AX's
    census windows — guide §2.4, share the pass instead of repeating
    it)."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        F.expr(f"CAST(floor(1000000 * {_NORM2_SPARK}) AS BIGINT)").alias(
            "norm2_e6"
        )
    )
    census = v.groupBy(
        F.expr("norm2_e6 div 1000").alias("norm2_milli")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("vectors"),
        F.min("norm2_e6").cast("long").alias("min_norm2_e6"),
        F.max("norm2_e6").cast("long").alias("max_norm2_e6"),
    )
    n = F.sum("vectors").over(Window.partitionBy()).cast("long")
    return (
        census.withColumn("n", n)
        .select(
            "norm2_milli",
            "vectors",
            F.expr("CAST((10000 * vectors) div n AS BIGINT)").alias(
                "share_bp"
            ),
            "min_norm2_e6",
            "max_norm2_e6",
            F.expr("norm2_milli BETWEEN 998 AND 1001").alias("unit_band"),
        )
        .orderBy("norm2_milli")
    )


@query(
    "q_emb_dead_dims",
    oracle=f"""
    WITH d AS (
      SELECT unnest(list_transform(embedding,
               (x, i) -> struct_pack(dim := i - 1, x := CAST(x AS DOUBLE))),
             recursive := true)
      FROM embeddings
    ),
    census AS (
      SELECT dim, CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) FILTER (WHERE abs(x) < {_NEAR_ZERO}) AS BIGINT)
               AS near_zero,
             CAST(min(floor(1000000 * x)) AS BIGINT) AS min_e6,
             CAST(max(floor(1000000 * x)) AS BIGINT) AS max_e6
      FROM d GROUP BY dim
    )
    SELECT dim, n, near_zero,
           CAST((10000 * near_zero) // n AS BIGINT) AS zero_share_bp,
           min_e6, max_e6,
           (10000 * near_zero) // n >= {_DEAD_BP} AS dead
    FROM census ORDER BY dim
    """,
)
def q_emb_dead_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BN bn2 — the dead-dimension screen: per dimension, the count
    and share of vectors whose component is near zero (|x| < 0.01),
    the e6 fixed-point component range, and the dead flag (≥ 99.5 %
    near-zero) — a dimension the encoder never energizes is pure index
    overhead. Spark's 0-based posexplode aligns to DuckDB's 1-based
    lambda index via ``i − 1``.

    Scale: the 64× explode partial-aggregates immediately to the
    64-row dimension census — the shuffle carries 64 groups, never the
    exploded relation."""
    emb = load_table(spark, sf_dir, "embeddings")
    d = emb.select(F.posexplode("embedding").alias("dim", "xf")).select(
        "dim", F.col("xf").cast("double").alias("x")
    )
    census = d.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count_if(F.abs(F.col("x")) < _NEAR_ZERO)
        .cast("long")
        .alias("near_zero"),
        F.expr("CAST(min(floor(1000000 * x)) AS BIGINT)").alias("min_e6"),
        F.expr("CAST(max(floor(1000000 * x)) AS BIGINT)").alias("max_e6"),
    )
    return census.select(
        "dim",
        "n",
        "near_zero",
        F.expr("CAST((10000 * near_zero) div n AS BIGINT)").alias(
            "zero_share_bp"
        ),
        "min_e6",
        "max_e6",
        F.expr(f"(10000 * near_zero) div n >= {_DEAD_BP}").alias("dead"),
    ).orderBy("dim")


@query(
    "q_emb_concentration_screen",
    oracle=f"""
    WITH v AS (
      SELECT {_CONC_DUCK} AS conc_bp FROM embeddings
    ),
    census AS (
      SELECT 500 * (conc_bp // 500) AS bucket_lo_bp,
             CAST(count(*) AS BIGINT) AS vectors
      FROM v GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(vectors) AS BIGINT) AS n FROM census)
    SELECT bucket_lo_bp, vectors,
           CAST((10000 * vectors) // n AS BIGINT) AS share_bp,
           bucket_lo_bp >= {_PEAKY_BP} AS peaky
    FROM census, tot ORDER BY bucket_lo_bp
    """,
)
def q_emb_concentration_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BN bn3 — the energy-concentration census: per vector, the bp
    share of its largest single component's energy (max x² / ‖v‖²,
    floored on bit-identical doubles — zero-norm vectors score 0 by
    the guard), bucketed in 500 bp bands with the peaky flag (≥ 25 %):
    near-one-hot vectors are degenerate-input fingerprints.

    Scale: one map-side fold pass → ≤ 21-bucket census; the total is an
    unpartitioned window over the bounded census (round 11 — same
    double-fold removal as bn1, see q_emb_norm_audit's scale note)."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(F.expr(_CONC_SPARK).alias("conc_bp"))
    census = v.groupBy(
        F.expr("500 * (conc_bp div 500)").alias("bucket_lo_bp")
    ).agg(F.count(F.lit(1)).cast("long").alias("vectors"))
    return (
        census.withColumn(
            "n", F.sum("vectors").over(Window.partitionBy()).cast("long")
        )
        .select(
            "bucket_lo_bp",
            "vectors",
            F.expr("CAST((10000 * vectors) div n AS BIGINT)").alias(
                "share_bp"
            ),
            F.expr(f"bucket_lo_bp >= {_PEAKY_BP}").alias("peaky"),
        )
        .orderBy("bucket_lo_bp")
    )


@query(
    "q_emb_label_balance",
    oracle=f"""
    WITH v AS (
      SELECT label,
             CAST(floor(1000000 * {_NORM2_DUCK}) AS BIGINT) AS norm2_e6,
             {_CONC_DUCK} AS conc_bp
      FROM embeddings
    ),
    census AS (
      SELECT label, CAST(count(*) AS BIGINT) AS vectors,
             CAST(sum(norm2_e6) // count(*) AS BIGINT) AS mean_norm2_e6,
             CAST(count(*) FILTER (WHERE conc_bp >= {_PEAKY_BP}) AS BIGINT)
               AS peaky
      FROM v GROUP BY label
    ),
    tot AS (SELECT CAST(sum(vectors) AS BIGINT) AS n FROM census)
    SELECT label, vectors,
           CAST((10000 * vectors) // n AS BIGINT) AS share_bp,
           mean_norm2_e6, peaky,
           CAST((10000 * peaky) // vectors AS BIGINT) AS peaky_bp
    FROM census, tot ORDER BY label
    """,
)
def q_emb_label_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BN bn4 — the label-balance audit: per label, vector count
    and corpus share, the integer mean of the exact e6 squared norms
    (cross-row aggregation touches only per-row integers — the module
    exactness rule), and the peaky count/rate: class imbalance and
    per-class geometry drift in one table.

    Scale: one map-side fold pass → |labels|-row census; the total is
    an unpartitioned window over the bounded census (round 11 — same
    double-fold removal as bn1, see q_emb_norm_audit's scale note)."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "label",
        F.expr(f"CAST(floor(1000000 * {_NORM2_SPARK}) AS BIGINT)").alias(
            "norm2_e6"
        ),
        F.expr(_CONC_SPARK).alias("conc_bp"),
    )
    census = v.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("vectors"),
        F.expr("CAST(sum(norm2_e6) div count(*) AS BIGINT)").alias(
            "mean_norm2_e6"
        ),
        F.count_if(F.col("conc_bp") >= _PEAKY_BP).cast("long").alias("peaky"),
    )
    return (
        census.withColumn(
            "n", F.sum("vectors").over(Window.partitionBy()).cast("long")
        )
        .select(
            "label",
            "vectors",
            F.expr("CAST((10000 * vectors) div n AS BIGINT)").alias(
                "share_bp"
            ),
            "mean_norm2_e6",
            "peaky",
            F.expr("CAST((10000 * peaky) div vectors AS BIGINT)").alias(
                "peaky_bp"
            ),
        )
        .orderBy("label")
    )
