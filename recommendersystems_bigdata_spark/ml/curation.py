"""Corpus-curation operators (BASELINE.json:6 mandate, SURVEY.md §2.M):
the dataset-assembly decisions a large-scale training-data pipeline makes
AFTER per-document filtering and dedup — deterministic downsampling,
source-mixture rebalancing, cross-source near-dup screening, a staged
quality-filter funnel, token-budget shard planning, train/test split
leakage accounting, a dedup-threshold sensitivity sweep, and the
source-overlap matrix.

All eight are SQL-oracle-checked (hash-exact: every score is integer
arithmetic or a single rounded ratio of exact integers). Scale notes:

- sampling / split-leakage key on deterministic md5 hashes, so reruns and
  backfills select the SAME rows with no stored state — the property that
  makes a 100 TB sample reproducible across engine versions.
- mixture rebalancing and the quality funnel are one aggregation pass
  each (fixed-width state per group; funnel flags fold map-side inside
  one codegen stage over the scan).
- cross-source near-dup reuses the banded MinHash candidate generator
  (`ml.dedup.band_candidates` — O(n·bands), capped buckets, never
  all-pairs); the source predicate prunes candidates BEFORE the
  token-level Jaccard verify fans out.
- shard planning groups by a bounded bucket key (≤5 buckets), so the
  final share window runs over a type-cardinality-bounded frame, not the
  corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.ml.dedup import _BAND_CAND_SQL
from recommendersystems_bigdata_spark.registry import query

_SQL_TOKENS = "list_filter(string_split(text, ' '), t -> t <> '')"

_SAMPLE_CAP = 20  # docs kept per source by the deterministic sampler
_SHARD_TOKENS = 2048  # token budget per planned training shard


def _tokens():
    # lazily built: Column construction needs an active SparkContext
    return F.filter(F.split("text", " "), lambda t: t != "")


@query(
    "q_curate_sample_per_source",
    oracle=f"""
    SELECT doc_id, source, CAST(rn AS BIGINT) AS sample_rank
    FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    ) WHERE rn <= {_SAMPLE_CAP}
    """,
)
def q_curate_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic capped downsampling: keep at most 20 docs per
    source, chosen by md5(doc_id) order — the reproducible alternative to
    `sample()` when a rerun or backfill must select the SAME rows (no RNG
    state, no seed-per-partition coupling).

    Scale: one shuffle on the source key; the hash order is computed
    map-side and the row_number cap truncates skewed sources, so a source
    with 10^9 docs costs its scan plus a per-group top-20 — at 100 TB the
    per-source top-k would switch to the two-pass rank-then-filter shape
    if a single source outgrew one task's frame.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "source", F.row_number().over(w).cast("long").alias("sample_rank"))
        .filter(F.col("sample_rank") <= _SAMPLE_CAP)
    )


@query(
    "q_curate_mix_rebalance",
    oracle="""
    WITH per_src AS (
      SELECT source, count(*) AS n_docs FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(sum(n_docs) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS n_sources
      FROM per_src
    )
    SELECT source, n_docs,
           CAST(floor(total * 1.0 / n_sources) AS BIGINT) AS target_n,
           least(n_docs, CAST(floor(total * 1.0 / n_sources) AS BIGINT)) AS keep_n,
           round(least(n_docs, CAST(floor(total * 1.0 / n_sources) AS BIGINT)) * 1.0
                 / n_docs, 4) AS keep_rate,
           greatest(CAST(0 AS BIGINT),
                    CAST(floor(total * 1.0 / n_sources) AS BIGINT) - n_docs) AS deficit
    FROM per_src CROSS JOIN tot
    """,
)
def q_curate_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixture rebalancing plan: given a uniform target share per
    source, compute each source's keep count, keep rate, and deficit —
    the arithmetic a data-mixture planner runs before writing sampling
    weights. Over-represented sources get keep_rate < 1; under-represented
    ones report the deficit to fill from elsewhere.

    Scale: one groupBy(source) with count-only state, then a 1-row total
    broadcast-joined back — no second pass over the corpus. The division
    is exact (counts ≪ 2^53), so floor() agrees bit-for-bit across
    engines."""
    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = per_src.agg(
        F.sum("n_docs").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_sources"),
    )
    target = F.floor(F.col("total") * 1.0 / F.col("n_sources")).cast("long")
    keep = F.least(F.col("n_docs"), target)
    return per_src.join(F.broadcast(tot), how="cross").select(
        "source",
        "n_docs",
        target.alias("target_n"),
        keep.alias("keep_n"),
        F.round(keep * 1.0 / F.col("n_docs"), 4).alias("keep_rate"),
        F.greatest(F.lit(0).cast("long"), target - F.col("n_docs")).alias("deficit"),
    )


@query(
    "q_dedup_cross_source",
    oracle=f"""
    WITH {_BAND_CAND_SQL},
    src AS (SELECT doc_id, source FROM documents)
    SELECT c.doc_a, c.doc_b, sa.source AS src_a, sb.source AS src_b,
           CAST(floor(len(list_intersect(ta.ts, tb.ts)) * 1000000.0
                      / (len(ta.ts) + len(tb.ts) - len(list_intersect(ta.ts, tb.ts))))
                AS BIGINT) AS jaccard_x1e6
    FROM cand c
    JOIN src sa ON sa.doc_id = c.doc_a
    JOIN src sb ON sb.doc_id = c.doc_b AND sa.source <> sb.source
    JOIN tok ta ON ta.doc_id = c.doc_a
    JOIN tok tb ON tb.doc_id = c.doc_b
    WHERE floor(len(list_intersect(ta.ts, tb.ts)) * 1000000.0
                / (len(ta.ts) + len(tb.ts) - len(list_intersect(ta.ts, tb.ts))))
          >= 900000
    """,
)
def q_dedup_cross_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source near-dup screen: banded MinHash candidate pairs whose
    two docs come from DIFFERENT sources, verified by exact Jaccard ≥ 0.9
    on the distinct-token sets — the check that finds one crawl snapshot
    republishing another's pages (within-source dups are ordinary dedup's
    job; cross-source dups decide which SOURCE to drop or down-weight).

    Scale: candidates come from `ml.dedup.band_candidates` (O(n·bands)
    bucketed equi-joins, capped buckets — never all-pairs); the
    source-inequality predicate applies on the candidate pairs BEFORE the
    token-level verify join fans out, and the verify fans out candidates,
    not the corpus. Jaccard is floor-scaled exact-integer arithmetic."""
    from recommendersystems_bigdata_spark.ml.dedup import band_candidates

    docs = load_table(spark, sf_dir, "documents")
    cand = band_candidates(spark, sf_dir)
    src = docs.select("doc_id", "source")
    tok = docs.select(
        "doc_id",
        F.array_distinct(_tokens()).alias("ts"),
    )
    pairs = (
        cand.join(
            F.broadcast(src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("src_a"))),
            "doc_a",
        )
        .join(
            F.broadcast(src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("src_b"))),
            "doc_b",
        )
        .filter(F.col("src_a") != F.col("src_b"))
    )
    ta = tok.select(F.col("doc_id").alias("doc_a"), F.col("ts").alias("ts_a"))
    tb = tok.select(F.col("doc_id").alias("doc_b"), F.col("ts").alias("ts_b"))
    inter = F.size(F.array_intersect(F.col("ts_a"), F.col("ts_b")))
    union = F.size(F.col("ts_a")) + F.size(F.col("ts_b")) - inter
    jac = F.floor(inter.cast("double") * 1_000_000 / union).cast("long")
    return (
        pairs.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select("doc_a", "doc_b", "src_a", "src_b", jac.alias("jaccard_x1e6"))
        .filter(F.col("jaccard_x1e6") >= 900_000)
    )


_CASCADE_STAGES = (
    ("min_chars", "length(text) >= 100"),
    ("min_tokens", "n_tok >= 20"),
    ("type_token_ratio", "2 * n_distinct >= n_tok"),
    ("mean_token_len", "3 * n_tok <= sum_len AND sum_len <= 10 * n_tok"),
)


@query(
    "q_curate_quality_cascade",
    oracle=f"""
    WITH feat AS (
      SELECT length(text) >= 100 AS f1,
             len({_SQL_TOKENS}) >= 20 AS f2,
             2 * len(list_distinct({_SQL_TOKENS})) >= len({_SQL_TOKENS}) AS f3,
             3 * len({_SQL_TOKENS})
               <= CAST(list_sum(list_transform({_SQL_TOKENS}, t -> length(t))) AS BIGINT)
             AND CAST(list_sum(list_transform({_SQL_TOKENS}, t -> length(t))) AS BIGINT)
               <= 10 * len({_SQL_TOKENS}) AS f4
      FROM documents
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN f1 AND f2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(sum(CASE WHEN f1 AND f2 AND f3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
             CAST(sum(CASE WHEN f1 AND f2 AND f3 AND f4 THEN 1 ELSE 0 END) AS BIGINT) AS n4
      FROM feat
    )
    SELECT CAST(1 AS BIGINT) AS stage, 'min_chars' AS stage_name,
           n0 AS docs_in, n1 AS docs_out, n0 - n1 AS rejected FROM agg
    UNION ALL SELECT 2, 'min_tokens', n1, n2, n1 - n2 FROM agg
    UNION ALL SELECT 3, 'type_token_ratio', n2, n3, n2 - n3 FROM agg
    UNION ALL SELECT 4, 'mean_token_len', n3, n4, n3 - n4 FROM agg
    """,
)
def q_curate_quality_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged quality-filter funnel: four filters applied in sequence
    (min chars → min tokens → type-token ratio ≥ 0.5 → mean token length
    in [3,10]), reporting per-stage in/out/rejected counts — the
    acceptance report a filtering pipeline publishes so each rule's cost
    in discarded data is visible before committing the cut.

    Ratio thresholds compare via integer cross-multiplication
    (2·distinct ≥ total, 3·total ≤ sumlen ≤ 10·total), so no float ever
    enters the funnel. Scale: all four flags fold map-side in one
    codegen pass over the scan into a single fixed-width aggregate row;
    the 4-row funnel is reshaped driver-side from that one row
    (`stack`), so corpus size only affects the scan."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    feat = docs.select(
        (F.length("text") >= 100).alias("f1"),
        (F.size(toks) >= 20).alias("f2"),
        (2 * F.size(F.array_distinct(toks)) >= F.size(toks)).alias("f3"),
        F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)).alias("sum_len"),
        F.size(toks).cast("long").alias("n_tok"),
    ).select(
        "f1", "f2", "f3",
        ((3 * F.col("n_tok") <= F.col("sum_len")) & (F.col("sum_len") <= 10 * F.col("n_tok"))).alias("f4"),
    )
    agg = feat.agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        F.sum(F.when(F.col("f1"), 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("f1") & F.col("f2"), 1).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when(F.col("f1") & F.col("f2") & F.col("f3"), 1).otherwise(0)).cast("long").alias("n3"),
        F.sum(F.when(F.col("f1") & F.col("f2") & F.col("f3") & F.col("f4"), 1).otherwise(0))
        .cast("long")
        .alias("n4"),
    )
    return agg.selectExpr(
        """stack(4,
             CAST(1 AS BIGINT), 'min_chars',        n0, n1, n0 - n1,
             CAST(2 AS BIGINT), 'min_tokens',       n1, n2, n1 - n2,
             CAST(3 AS BIGINT), 'type_token_ratio', n2, n3, n2 - n3,
             CAST(4 AS BIGINT), 'mean_token_len',   n3, n4, n3 - n4
           ) AS (stage, stage_name, docs_in, docs_out, rejected)"""
    )


@query(
    "q_curate_token_shards",
    oracle=f"""
    WITH lens AS (
      SELECT CASE WHEN len({_SQL_TOKENS}) < 16  THEN '000-015'
                  WHEN len({_SQL_TOKENS}) < 32  THEN '016-031'
                  WHEN len({_SQL_TOKENS}) < 64  THEN '032-063'
                  WHEN len({_SQL_TOKENS}) < 128 THEN '064-127'
                  ELSE '128+' END AS bucket,
             CAST(len({_SQL_TOKENS}) AS BIGINT) AS n_tok
      FROM documents
    ),
    per_bucket AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS total_tokens
      FROM lens GROUP BY bucket
    )
    SELECT bucket, n_docs, total_tokens,
           CAST(floor((total_tokens + {_SHARD_TOKENS - 1}) * 1.0 / {_SHARD_TOKENS})
                AS BIGINT) AS n_shards,
           round(total_tokens * 1.0 / sum(total_tokens) OVER (), 4) AS token_share
    FROM per_bucket
    """,
)
def q_curate_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard planning by sequence-length bucket: docs binned into
    power-of-two token-count ranges, with per-bucket doc/token totals, the
    number of 2048-token shards each bucket fills, and its token
    share — the layout pass before length-bucketed packing (packing
    same-length docs together minimizes padding waste).

    Scale: one groupBy on a ≤5-value bucket key (map-side partials
    collapse the corpus to 5 rows); the share window runs over that
    bounded 5-row frame, not the corpus. Shard count is the integer
    ceiling identity floor((t + b − 1) / b) — exact for totals ≪ 2^53.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(_tokens())
    lens = docs.select(
        F.when(n_tok < 16, "000-015")
        .when(n_tok < 32, "016-031")
        .when(n_tok < 64, "032-063")
        .when(n_tok < 128, "064-127")
        .otherwise("128+")
        .alias("bucket"),
        n_tok.cast("long").alias("n_tok"),
    )
    per_bucket = lens.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
    )
    w = Window.partitionBy()  # ≤5 rows: bounded by the bucket CASE arms
    return per_bucket.select(
        "bucket",
        "n_docs",
        "total_tokens",
        F.floor((F.col("total_tokens") + (_SHARD_TOKENS - 1)) * 1.0 / _SHARD_TOKENS)
        .cast("long")
        .alias("n_shards"),
        F.round(F.col("total_tokens") * 1.0 / F.sum("total_tokens").over(w), 4).alias(
            "token_share"
        ),
    )


@query(
    "q_curate_split_leakage",
    oracle="""
    WITH hashed AS (
      SELECT doc_id, lang, md5(text) AS content_hash,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1','2','3') AS is_test
      FROM documents
    ),
    train AS (SELECT DISTINCT content_hash FROM hashed WHERE NOT is_test),
    test AS (
      SELECT lang, content_hash,
             content_hash IN (SELECT content_hash FROM train) AS leaked
      FROM hashed WHERE is_test
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_test,
           CAST(sum(CASE WHEN leaked THEN 1 ELSE 0 END) AS BIGINT) AS n_leaked,
           round(sum(CASE WHEN leaked THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS leak_rate
    FROM test GROUP BY lang
    """,
)
def q_curate_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test split leakage audit: split the corpus deterministically
    by doc_id hash (first md5 hex digit 0–3 → ~25% test), then count test
    docs whose exact content hash also appears on the train side, per
    language — the held-out-contamination check run before any eval set
    is trusted (complements l13's n-gram screen, which catches partial
    overlap; this catches verbatim copies across the split).

    Scale: both sides reduce to 16-byte content hashes before the
    membership join (a semi-join on the hash — shuffle carries hashes,
    never text); the split predicate is a map-side hash of the key, so
    the same doc lands on the same side in every rerun with no stored
    split table."""
    docs = load_table(spark, sf_dir, "documents")
    hashed = docs.select(
        "lang",
        F.md5("text").alias("content_hash"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
        .isin("0", "1", "2", "3")
        .alias("is_test"),
    )
    train = hashed.filter(~F.col("is_test")).select("content_hash").distinct()
    test = hashed.filter(F.col("is_test")).select("lang", "content_hash")
    leaked = test.join(train.withColumn("leaked", F.lit(True)), "content_hash", "left")
    return leaked.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.sum(F.when(F.col("leaked"), 1).otherwise(0)).cast("long").alias("n_leaked"),
        F.round(
            F.sum(F.when(F.col("leaked"), 1).otherwise(0)) * 1.0 / F.count(F.lit(1)), 4
        ).alias("leak_rate"),
    )


@query(
    "q_curate_dedup_sensitivity",
    oracle=f"""
    WITH {_BAND_CAND_SQL},
    jac AS (
      SELECT CAST(floor(len(list_intersect(ta.ts, tb.ts)) * 1000000.0
                        / (len(ta.ts) + len(tb.ts) - len(list_intersect(ta.ts, tb.ts))))
                  AS BIGINT) AS jaccard_x1e6
      FROM cand c
      JOIN tok ta ON ta.doc_id = c.doc_a
      JOIN tok tb ON tb.doc_id = c.doc_b
    ),
    thresholds(thr) AS (VALUES (500000), (700000), (800000), (900000))
    SELECT CAST(thr AS BIGINT) AS threshold_x1e6,
           CAST(sum(CASE WHEN jaccard_x1e6 >= thr THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_pairs
    FROM thresholds CROSS JOIN jac
    GROUP BY thr
    """,
)
def q_curate_dedup_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-threshold sensitivity sweep: near-dup pair counts at Jaccard
    thresholds 0.5 / 0.7 / 0.8 / 0.9 over the banded candidate set — the
    one-pass curve a pipeline inspects before committing to a dedup
    threshold (too low deletes distinct docs; too high leaves templates).

    Scale: the expensive part (candidate generation + exact Jaccard) runs
    ONCE; the four thresholds are conditional sums over the same pair
    scores, folded map-side into one fixed-width aggregate row per
    threshold. Candidates are the capped band buckets (never all-pairs),
    so the sweep costs the same as one verify pass."""
    from recommendersystems_bigdata_spark.ml.dedup import band_candidates

    docs = load_table(spark, sf_dir, "documents")
    cand = band_candidates(spark, sf_dir)
    tok = docs.select("doc_id", F.array_distinct(_tokens()).alias("ts"))
    ta = tok.select(F.col("doc_id").alias("doc_a"), F.col("ts").alias("ts_a"))
    tb = tok.select(F.col("doc_id").alias("doc_b"), F.col("ts").alias("ts_b"))
    inter = F.size(F.array_intersect(F.col("ts_a"), F.col("ts_b")))
    union = F.size(F.col("ts_a")) + F.size(F.col("ts_b")) - inter
    jac = (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(F.floor(inter.cast("double") * 1_000_000 / union).cast("long").alias("j"))
    )
    thr = spark.range(0).sparkSession.createDataFrame(
        [(500_000,), (700_000,), (800_000,), (900_000,)], "threshold_x1e6 long"
    )
    return (
        jac.join(F.broadcast(thr), how="cross")
        .groupBy("threshold_x1e6")
        .agg(
            F.sum(F.when(F.col("j") >= F.col("threshold_x1e6"), 1).otherwise(0))
            .cast("long")
            .alias("n_dup_pairs")
        )
    )


@query(
    "q_curate_source_overlap",
    oracle=f"""
    WITH {_BAND_CAND_SQL},
    src AS (SELECT doc_id, source FROM documents),
    hits AS (
      SELECT least(sa.source, sb.source) AS source_x,
             greatest(sa.source, sb.source) AS source_y
      FROM cand c
      JOIN src sa ON sa.doc_id = c.doc_a
      JOIN src sb ON sb.doc_id = c.doc_b AND sa.source <> sb.source
      JOIN tok ta ON ta.doc_id = c.doc_a
      JOIN tok tb ON tb.doc_id = c.doc_b
      WHERE len(list_intersect(ta.ts, tb.ts)) * 1.0
            / (len(ta.ts) + len(tb.ts) - len(list_intersect(ta.ts, tb.ts))) >= 0.9
    )
    SELECT source_x, source_y, CAST(count(*) AS BIGINT) AS n_dup_pairs
    FROM hits GROUP BY source_x, source_y
    """,
)
def q_curate_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-overlap matrix: for each unordered source pair, the number
    of verified cross-source near-dup pairs (Jaccard ≥ 0.9 over banded
    candidates) — the aggregate that tells a curator WHICH crawl sources
    republish each other, turning m3's pair list into a drop/down-weight
    decision per source pair.

    Scale: same bounded pipeline as m3 (capped band buckets → broadcast
    source map → candidate-bounded verify), collapsed to at most
    |sources|² rows by one groupBy on the normalized pair key."""
    from recommendersystems_bigdata_spark.ml.dedup import band_candidates

    docs = load_table(spark, sf_dir, "documents")
    cand = band_candidates(spark, sf_dir)
    src = docs.select("doc_id", "source")
    tok = docs.select("doc_id", F.array_distinct(_tokens()).alias("ts"))
    pairs = (
        cand.join(
            F.broadcast(src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("src_a"))),
            "doc_a",
        )
        .join(
            F.broadcast(src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("src_b"))),
            "doc_b",
        )
        .filter(F.col("src_a") != F.col("src_b"))
    )
    ta = tok.select(F.col("doc_id").alias("doc_a"), F.col("ts").alias("ts_a"))
    tb = tok.select(F.col("doc_id").alias("doc_b"), F.col("ts").alias("ts_b"))
    inter = F.size(F.array_intersect(F.col("ts_a"), F.col("ts_b")))
    union = F.size(F.col("ts_a")) + F.size(F.col("ts_b")) - inter
    return (
        pairs.join(ta, "doc_a")
        .join(tb, "doc_b")
        .filter(inter * 1.0 / union >= 0.9)
        .select(
            F.least("src_a", "src_b").alias("source_x"),
            F.greatest("src_a", "src_b").alias("source_y"),
        )
        .groupBy("source_x", "source_y")
        .agg(F.count(F.lit(1)).alias("n_dup_pairs"))
    )


_SHUFFLE_SEED = "42"  # seed string mixed into the permutation hash
_SHUFFLE_SHARD_DOCS = 64  # docs per contiguous output shard


@query(
    "q_curate_global_shuffle",
    oracle=f"""
    SELECT doc_id,
           CAST(rn AS BIGINT) AS pos,
           CAST(floor((rn - 1) / {_SHUFFLE_SHARD_DOCS}) AS BIGINT) AS shard
    FROM (
      SELECT doc_id,
             row_number() OVER (
               ORDER BY md5('{_SHUFFLE_SEED}' || CAST(doc_id AS VARCHAR)),
                        doc_id) AS rn
      FROM documents
    )
    """,
)
def q_curate_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic seeded global shuffle + contiguous shard assignment:
    permute the corpus by md5(seed || doc_id), number it globally, and cut
    the permuted order into fixed-size shards — the permute-before-sharding
    step every training pipeline runs so adjacent training batches don't
    replay crawl order. Seeded hashing (not RNG) means a rerun, a backfill,
    or a different engine reproduces the SAME permutation.

    Scale: the hash is computed map-side; the global position comes from
    the distributed two-pass rank (`functions/ranks.py` — range shuffle on
    the hash key, per-partition counts, no single-partition exchange), so
    the permutation of a 100 TB corpus costs one range-partitioned sort,
    which is also exactly the layout the shard writer wants (shards are
    contiguous runs of the range partitioning)."""
    from recommendersystems_bigdata_spark.functions.ranks import global_row_number

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.concat(F.lit(_SHUFFLE_SEED), F.col("doc_id").cast("string"))).alias("_k"),
    )
    ranked = global_row_number(docs, [F.col("_k"), F.col("doc_id")], "pos")
    return ranked.select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        F.floor((F.col("pos") - 1) / _SHUFFLE_SHARD_DOCS).cast("long").alias("shard"),
    )


_INTERLEAVE_SEED = "17"


@query(
    "q_curate_interleave",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, source,
             md5('{_INTERLEAVE_SEED}' || CAST(doc_id AS VARCHAR)) AS k,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5('{_INTERLEAVE_SEED}' || CAST(doc_id AS VARCHAR)),
                        doc_id) AS sr
      FROM documents
    )
    SELECT doc_id, source,
           CAST(row_number() OVER (ORDER BY sr, k, doc_id) AS BIGINT) AS pos
    FROM ranked
    """,
)
def q_curate_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-robin source interleaving: shuffle WITHIN each source
    (seeded hash order), then emit rank-1 docs of every source first, then
    rank-2, and so on — the mixture scheduler that keeps a training stream
    alternating sources evenly instead of draining one source at a time,
    without storing per-source state.

    Scale: the per-source rank is one partitioned window (shuffle on the
    source key, skew bounded by the per-source doc count); the global
    interleave position reuses the distributed two-pass rank over
    (source_rank, hash) — no single-partition exchange. Both ordering keys
    are recompute-deterministic (hash arithmetic), satisfying the ranks.py
    caller contract."""
    from recommendersystems_bigdata_spark.functions.ranks import global_row_number

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.md5(F.concat(F.lit(_INTERLEAVE_SEED), F.col("doc_id").cast("string"))).alias("_k"),
    )
    w = Window.partitionBy("source").orderBy(F.col("_k"), F.col("doc_id"))
    ranked = docs.withColumn("_sr", F.row_number().over(w))
    out = global_row_number(ranked, [F.col("_sr"), F.col("_k"), F.col("doc_id")], "pos")
    return out.select("doc_id", "source", F.col("pos").cast("long").alias("pos"))


_WS_SEED = "ws"
_WS_CAP_CHARS = 2000  # docs at/above this length are always kept (p = 1)


@query(
    "q_curate_weighted_sample",
    oracle=f"""
    SELECT doc_id, lang, n_chars,
           round(least(n_chars, {_WS_CAP_CHARS}) * 1.0 / {_WS_CAP_CHARS}, 4) AS keep_p
    FROM documents
    WHERE CAST('0x' || substr(md5('{_WS_SEED}' || CAST(doc_id AS VARCHAR)), 1, 4)
               AS BIGINT) * {_WS_CAP_CHARS}
          < least(n_chars, {_WS_CAP_CHARS}) * 65536
    """,
)
def q_curate_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling: keep each doc with probability
    proportional to its (capped) length — the length-weighted downsampler
    a token-budgeted corpus build runs, with NO RNG state: the uniform
    draw is the first 16 bits of md5(seed‖doc_id), and the keep test is
    an exact integer cross-multiplication (u · CAP < min(n_chars, CAP) ·
    2^16), so every engine, rerun, and backfill keeps the SAME rows.
    Docs at/above the cap are always kept (p = 1).

    Scale: map-only — hash, compare, filter inside one codegen stage over
    the scan; no shuffle, no state, trivially linear at 100 TB. The same
    shape generalizes to any per-doc weight (quality score, source
    priority) that both sides of a backfill can recompute."""
    docs = load_table(spark, sf_dir, "documents")
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(_WS_SEED), F.col("doc_id").cast("string"))), 1, 4
        ),
        16,
        10,
    ).cast("long")
    capped = F.least(F.col("n_chars"), F.lit(_WS_CAP_CHARS))
    return docs.filter(u * _WS_CAP_CHARS < capped * 65536).select(
        "doc_id",
        "lang",
        "n_chars",
        F.round(capped * 1.0 / _WS_CAP_CHARS, 4).alias("keep_p"),
    )
