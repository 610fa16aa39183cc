"""Training-data-pipeline operators (BASELINE.json:6 mandate, SURVEY.md
§2.L extension): the document-corpus transforms a large-scale LLM data
pipeline runs between raw crawl and tokenized shards — PII redaction,
context-window chunking, benchmark-contamination screening, repetition-
based quality filtering, and sequence packing.

All five are SQL-oracle-checked. Scale notes per operator:

- redact / chunk / repetition are embarrassingly parallel map-side
  transforms — no shuffle at all; at 100 TB they pipeline inside one
  whole-stage-codegen pass over the parquet scan.
- contamination joins the corpus's n-gram fingerprints against the
  (tiny, broadcast) eval-set fingerprint table — the shuffle-free shape
  of the standard decontamination pass; the corpus side stays
  map-local because the eval side is broadcast.
- packing needs a running token total, which is inherently sequential —
  we scope the cumulative sum per language shard (PARTITION BY lang) so
  each shard packs independently; at 100 TB the partition key becomes
  (shard_id) and bins never cross shard boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query


def _tokens():
    # lazily built: Column construction needs an active SparkContext
    return F.filter(F.split("text", " "), lambda t: t != "")


_SQL_TOKENS = "list_filter(string_split(text, ' '), t -> t <> '')"

# Deterministic quasi-identifier denylist standing in for PII patterns
# (the synthetic corpus has no emails/phones; the plumbing — global
# regexp rewrite + match accounting — is what the operator exercises).
_REDACT_PAT = r"\b(customer|supplier|order)\b"

_CHUNK, _STRIDE = 32, 24  # context-window chunking with 8-token overlap
_PACK_BUDGET = 512  # tokens per packed training sequence


@query(
    "q_text_redact",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_REDACT_PAT}')) AS BIGINT) AS n_redactions,
           md5(regexp_replace(text, '{_REDACT_PAT}', '[REDACTED]', 'g')) AS redacted_md5,
           CAST(length(regexp_replace(text, '{_REDACT_PAT}', '[REDACTED]', 'g'))
                AS BIGINT) AS n_chars_redacted
    FROM documents
    """,
)
def q_text_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style redaction: global regexp rewrite of denylisted tokens to
    ``[REDACTED]`` plus a per-doc match count. Pure JVM regexp (pattern in
    the Java∩RE2 common subset); Spark's regexp_replace is global by
    default, DuckDB's needs the 'g' flag."""
    docs = load_table(spark, sf_dir, "documents")
    redacted = F.regexp_replace("text", _REDACT_PAT, "[REDACTED]")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_REDACT_PAT), F.lit(0)))
        .cast("long")
        .alias("n_redactions"),
        F.md5(redacted).alias("redacted_md5"),
        F.length(redacted).cast("long").alias("n_chars_redacted"),
    )


@query(
    "q_text_chunk",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents
    ),
    c AS (
      SELECT doc_id, toks,
             unnest(generate_series(0, CAST(floor((len(toks) - 1) / {_STRIDE}) AS BIGINT)))
               AS chunk_idx
      FROM t
    )
    SELECT doc_id,
           CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(len(list_slice(toks, chunk_idx * {_STRIDE} + 1,
                               least(chunk_idx * {_STRIDE} + {_CHUNK}, len(toks))))
                AS BIGINT) AS n_chunk_tokens,
           md5(array_to_string(list_slice(toks, chunk_idx * {_STRIDE} + 1,
                                          least(chunk_idx * {_STRIDE} + {_CHUNK}, len(toks))),
                               ' ')) AS chunk_md5
    FROM c
    """,
)
def q_text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: fixed {chunk}-token windows at stride
    {stride} (8-token overlap), the standard long-doc → training-sample
    fan-out. sequence+explode+slice stays entirely JVM-side; the fan-out
    factor is bounded by doc length so partitions scale smoothly.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", _tokens().alias("toks"))
    n = F.size("toks")
    chunks = toks.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0).cast("long"), F.floor((n - 1) / _STRIDE))).alias(
            "chunk_idx"
        ),
    )
    chunk = F.slice("toks", (F.col("chunk_idx") * _STRIDE + 1).cast("int"), _CHUNK)
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )


_SQL_3GRAMS = (
    f"list_transform(generate_series(1, len({_SQL_TOKENS}) - 2), "
    f"i -> array_to_string(list_slice({_SQL_TOKENS}, i, i + 2), ' '))"
)


@query(
    "q_text_repetition",
    oracle=f"""
    WITH g AS (
      SELECT doc_id,
             CAST(len({_SQL_3GRAMS}) AS BIGINT) AS n_grams,
             CAST(len(list_distinct({_SQL_3GRAMS})) AS BIGINT) AS n_distinct_grams
      FROM documents
    )
    SELECT doc_id, n_grams, n_distinct_grams,
           round(1.0 - n_distinct_grams * 1.0 / n_grams, 4) AS dup_gram_ratio
    FROM g
    """,
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signal: fraction of duplicate token 3-grams per
    doc — the Gopher/C4-style intra-document repetition filter. Built from
    higher-order array functions, so it never explodes rows at all."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", _tokens().alias("toks"))
    grams = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 2),
        lambda i: F.concat_ws(" ", F.slice("toks", i, 3)),
    )
    g = toks.select(
        "doc_id",
        F.size(grams).cast("long").alias("n_grams"),
        F.size(F.array_distinct(grams)).cast("long").alias("n_distinct_grams"),
    )
    return g.select(
        "doc_id",
        "n_grams",
        "n_distinct_grams",
        F.round(1.0 - F.col("n_distinct_grams") / F.col("n_grams"), 4).alias("dup_gram_ratio"),
    )


@query(
    "q_contamination_check",
    oracle=f"""
    WITH gd AS (
      SELECT DISTINCT doc_id, unnest({_SQL_3GRAMS}) AS gram FROM documents
    ),
    ev AS (SELECT doc_id AS eval_id, gram FROM gd
           WHERE doc_id % 50 = 0 AND doc_id < 500),
    tr AS (SELECT doc_id, gram FROM gd
           WHERE NOT (doc_id % 50 = 0 AND doc_id < 500))
    SELECT tr.doc_id,
           CAST(count(DISTINCT tr.gram) AS BIGINT) AS n_contaminated_grams,
           CAST(count(DISTINCT ev.eval_id) AS BIGINT) AS n_eval_docs_hit
    FROM tr JOIN ev USING (gram)
    GROUP BY tr.doc_id
    """,
)
def q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination screen: token-3-gram overlap between every
    training doc and a held-out eval set (docs with doc_id % 50 == 0 AND
    doc_id < 500 — a FIXED 10-doc benchmark at every scale factor).

    The id cap is the operationally-correct shape: real benchmark sets are
    fixed-size while the corpus grows, so the screen must be corpus-linear.
    (A %-only eval set grows with the corpus and was measured 25x at 10x
    data — SCALE.md's contamination entry.) The fixed eval side's
    distinct-gram table broadcasts and the corpus side never shuffles;
    per-doc overlap counts come out of one partial-aggregated groupBy."""
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(_tokens()) - 2),
                    lambda i: F.concat_ws(" ", F.slice(_tokens(), i, 3)),
                )
            )
        ).alias("gram"),
    )
    is_eval = (F.col("doc_id") % 50 == 0) & (F.col("doc_id") < 500)
    ev = grams.filter(is_eval).select(F.col("doc_id").alias("eval_id"), "gram")
    tr = grams.filter(~is_eval)
    return (
        tr.join(F.broadcast(ev), "gram")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("gram").alias("n_contaminated_grams"),
            F.countDistinct("eval_id").alias("n_eval_docs_hit"),
        )
    )


@query(
    "q_docs_pack",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, CAST(len({_SQL_TOKENS}) AS BIGINT) AS n_tokens FROM documents
    ),
    binned AS (
      SELECT lang, doc_id, n_tokens,
             CAST(floor((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                             ROWS UNBOUNDED PRECEDING) - n_tokens)
                        / {_PACK_BUDGET}) AS BIGINT) AS bin_id
      FROM t
    )
    SELECT lang, bin_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM binned
    GROUP BY lang, bin_id
    """,
)
def q_docs_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign docs (in doc_id order, per language shard)
    to ~{budget}-token training bins via a running token total. The
    cumulative sum is windowed PARTITION BY lang, so shards pack
    independently — the scalable shape (global packing would serialize
    the whole corpus through one partition)."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", "lang", F.size(_tokens()).cast("long").alias("n_tokens"))
    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    binned = t.withColumn(
        "bin_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / _PACK_BUDGET).cast("long"),
    )
    return binned.groupBy("lang", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@query(
    "q_text_lm_score",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_SQL_TOKENS}) AS t FROM documents
    ),
    freq AS (SELECT t, count(*) AS n FROM tok GROUP BY t),
    total AS (SELECT count(*) AS n_total FROM tok),
    scored AS (
      SELECT tok.doc_id,
             count(*) AS n_tokens,
             sum(-ln(CAST(freq.n AS DOUBLE) / total.n_total)) AS nll
      FROM tok JOIN freq USING (t) CROSS JOIN total
      GROUP BY tok.doc_id
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           round(nll / n_tokens, 4) AS avg_neg_log_prob
    FROM scored
    """,
)
def q_text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring: per-doc average negative log
    probability under the corpus's own unigram distribution — the
    perplexity-style quality filter LLM pipelines use to drop
    gibberish (high surprise) and boilerplate (low surprise).

    The vocabulary table is small (corpus-wide distinct tokens) and
    broadcasts; the per-doc score is then map-side lookup + aggregate.
    At 100 TB the unigram table is the only shared state — megabytes
    for any natural-language vocabulary."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_tokens()).alias("t"))
    freq = tok.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
    total = tok.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        tok.join(F.broadcast(freq), "t")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(-F.log(F.col("n").cast("double") / F.col("n_total"))).alias("nll"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round(F.col("nll") / F.col("n_tokens"), 4).alias("avg_neg_log_prob"),
        )
    )


@query(
    "q_kfold_split",
    oracle="""
    WITH folded AS (
      SELECT CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT)
                  AS BIGINT) % 5 AS fold,
             n_chars, lang
      FROM documents
    )
    SELECT fold, count(*) AS n_docs,
           round(CAST(sum(n_chars) AS DOUBLE) / count(*), 2) AS avg_n_chars,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
    FROM folded GROUP BY fold
    """,
)
def q_kfold_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-fold cross-validation assignment by hashing the
    stable document key (md5 mod k) — the reproducible, engine-portable
    split a training pipeline needs so every rerun and every system
    (Spark, the feature store, the eval harness) lands each doc in the
    same fold. Reports per-fold size, mean length, and language spread
    as the balance check.

    Scale: the fold id is a map-side expression over the scan — no
    shuffle, no sampling state, and adding data never reassigns existing
    docs (unlike randomSplit, whose assignment shifts with partitioning).
    """
    docs = load_table(spark, sf_dir, "documents")
    fold = (
        F.expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT)") % 5
    )
    return docs.groupBy(fold.alias("fold")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.sum("n_chars").cast("double") / F.count(F.lit(1)), 2).alias("avg_n_chars"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
    )


@query(
    "q_feature_minmax",
    oracle="""
    WITH bounds AS (
      SELECT min(c_acctbal) AS lo, max(c_acctbal) AS hi FROM customer
    )
    SELECT c_custkey, c_acctbal,
           CAST(floor((c_acctbal - lo) / (hi - lo) * 1000000) AS BIGINT)
             AS scaled_x1e6
    FROM customer, bounds
    """,
)
def q_feature_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-max feature scaling of customer balance to [0, 1] — the
    feature-normalization twin of z-scoring (d18), spelled so the 1-row
    bounds broadcast back over the scan (no second shuffle).

    Hash-match: subtraction, divide, and scale are each one IEEE op on
    identical operands, so the floor-scaled integer matches the oracle
    exactly — no double summation anywhere.

    Scale: bounds are a 1-row aggregate (map-side partials), the scan
    re-reads pruned columns only, and the scaled projection is map-only.
    """
    cust = load_table(spark, sf_dir, "customer")
    bounds = cust.agg(F.min("c_acctbal").alias("lo"), F.max("c_acctbal").alias("hi"))
    return cust.crossJoin(F.broadcast(bounds)).select(
        "c_custkey",
        "c_acctbal",
        F.floor((F.col("c_acctbal") - F.col("lo")) / (F.col("hi") - F.col("lo")) * 1_000_000)
        .cast("long")
        .alias("scaled_x1e6"),
    )


@query(
    "q_pipeline_end2end",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id, lang, md5(text) AS h,
             CAST(len({{toks}}) AS BIGINT) AS n_tokens
      FROM documents
    ),
    keep_dedup AS (
      SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
      FROM sized
    ),
    tagged AS (
      SELECT lang, n_tokens,
             CASE WHEN rn > 1 THEN 'dup'
                  WHEN n_tokens < 20 OR n_tokens > 1000 THEN 'length'
                  ELSE 'kept' END AS status
      FROM keep_dedup
    )
    SELECT lang,
           CAST(count(*) FILTER (status = 'kept') AS BIGINT) AS n_kept,
           CAST(count(*) FILTER (status = 'dup') AS BIGINT) AS n_dropped_dup,
           CAST(count(*) FILTER (status = 'length') AS BIGINT) AS n_dropped_len,
           CAST(sum(n_tokens) FILTER (status = 'kept') AS BIGINT) AS kept_tokens,
           CAST(sum(CASE WHEN status = 'kept'
                    THEN greatest((n_tokens - 32 + 23) // 24, 0) + 1
                    ELSE 0 END) AS BIGINT) AS n_chunks
    FROM tagged GROUP BY lang
    """.format(toks="list_filter(string_split(text, ' '), t -> t <> '')"),
)
def q_pipeline_end2end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data pipeline accounting: exact dedup
    (keep-min-id per content hash, k11) → length filter (20–1000
    tokens) → context-window chunk estimate (l11's 32/24 window math) —
    the per-language keep/drop/chunk report a corpus build publishes
    after every run.

    Scale: one content-hash shuffle (16-byte keys) for dedup rank, then
    a per-lang map-side-combined aggregate — the whole report is two
    exchanges regardless of corpus size.
    """
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        "lang",
        F.md5("text").alias("h"),
        F.size(_tokens()).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("h").orderBy("doc_id")
    tagged = sized.withColumn("rn", F.row_number().over(w)).select(
        "lang",
        "n_tokens",
        F.when(F.col("rn") > 1, "dup")
        .when((F.col("n_tokens") < 20) | (F.col("n_tokens") > 1000), "length")
        .otherwise("kept")
        .alias("status"),
    )
    kept = F.col("status") == "kept"
    chunks = F.greatest(F.floor((F.col("n_tokens") - 32 + 23) / 24), F.lit(0)) + 1
    return tagged.groupBy("lang").agg(
        F.sum(kept.cast("int")).cast("long").alias("n_kept"),
        F.sum((F.col("status") == "dup").cast("int")).cast("long").alias("n_dropped_dup"),
        F.sum((F.col("status") == "length").cast("int")).cast("long").alias("n_dropped_len"),
        F.sum(F.when(kept, F.col("n_tokens")).otherwise(0)).cast("long").alias("kept_tokens"),
        F.sum(F.when(kept, chunks).otherwise(0)).cast("long").alias("n_chunks"),
    )
