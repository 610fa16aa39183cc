"""Corpus lexical statistics (SURVEY.md §2.AO, round 9).

The corpus-diagnostics layer an LLM-data pipeline runs after ingest and
before curation: collocation strength (bigram lift — which adjacent
pairs are genuinely associated vs merely frequent), skip-gram
co-occurrence (the window-k pair counts word2vec-style embedding
trainers consume), hapax-legomena rates (the OCR-garbage / genuine-
long-tail tripwire), per-language word-length profiles, and the Zipf
rank table (rank×frequency ≈ const is the classic sanity check that a
corpus is natural text, not machine spam).

Exactness: all counts BIGINT; lift in truncated basis points
``(10000·c_xy·n_tok) div (c_x·c_y)`` — exact while
``10⁴·c_xy·n_tok < 2⁶³`` (the min-support filter keeps c_xy on the
distribution head; at extreme corpus sizes the same expression lifts
to DECIMAL(38,0) in both engines, the §2.AI Laspeyres escalation); all
shares in truncated bp. No floats, so both engines hash identically.

Spark-first shape, sized for 100 TB:
- Token/bigram/pair generation is JVM-side (split + higher-order
  ``transform``/``flatten`` + one explode) — never a Python UDF; the
  fan-out is ×1 (unigrams), ×1 (bigrams) or ×2 (skip-grams) of the
  token stream, all map-side before a partial-aggregated groupBy.
- Every groupBy is keyed by token/bigram/pair — vocabulary-bounded
  outputs, map-side combine absorbs the stream.
- Global top-k lowers to TakeOrderedAndProject (per-partition local
  top-k, driver merge) BEFORE any rank window, so windows only ever
  see k rows (the q_top_bigrams lesson).
- The lift join joins the 20-row filtered bigram head AGAINST the
  unigram census twice — broadcast the head, not the vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query


def _tokens():
    return F.filter(F.split("text", " "), lambda t: t != "")


_SQL_TOKENS = "list_filter(string_split(text, ' '), t -> t <> '')"


@query(
    "q_colloc_bigram_lift",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_TOKENS} AS tl FROM documents
    ),
    uni AS (
      SELECT unnest(tl) AS tok FROM toks
    ),
    ucount AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY 1
    ),
    ntok AS (
      SELECT CAST(sum(c) AS BIGINT) AS n FROM ucount
    ),
    bg AS (
      SELECT unnest(list_transform(generate_series(1, len(tl) - 1),
                    i -> struct_pack(w1 := tl[i], w2 := tl[i + 1]))) AS p
      FROM toks WHERE len(tl) >= 2
    ),
    bcount AS (
      SELECT p.w1 AS w1, p.w2 AS w2, CAST(count(*) AS BIGINT) AS c_xy
      FROM bg GROUP BY 1, 2
      HAVING count(*) >= 5
    ),
    lifted AS (
      SELECT b.w1, b.w2, b.c_xy, u1.c AS c_x, u2.c AS c_y,
             (10000 * b.c_xy * (SELECT n FROM ntok)) // (u1.c * u2.c)
               AS lift_bp
      FROM bcount b
      JOIN ucount u1 ON b.w1 = u1.tok
      JOIN ucount u2 ON b.w2 = u2.tok
    )
    SELECT w1, w2, c_xy, c_x, c_y, lift_bp
    FROM lifted ORDER BY lift_bp DESC, w1, w2 LIMIT 20
    """,
)
def q_colloc_bigram_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AO ao1 — collocation strength: adjacent token pairs with
    support ≥ 5, scored by lift — observed pair rate over the rate
    independence predicts, ``(10000·c_xy·n_tok) div (c_x·c_y)`` in
    truncated bp (10000 = independent; higher = genuine collocation).
    Top-20 by (lift DESC, pair) — fully deterministic.

    Scale: unigram census and bigram census are each ONE map-side-
    combined shuffle over the token stream; the lift join runs on the
    support-filtered bigram head against the vocabulary-bounded unigram
    census; top-20 lowers to TakeOrderedAndProject."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(_tokens().alias("tl"))
    ucount = (
        toks.select(F.explode("tl").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    n_tok = ucount.agg(F.sum("c").cast("long").alias("n"))
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("tl") - 1),
        lambda i: F.struct(
            F.element_at("tl", i).alias("w1"),
            F.element_at("tl", i + 1).alias("w2"),
        ),
    )
    bcount = (
        toks.filter(F.size("tl") >= 2)
        .select(F.explode(bigrams).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c_xy"))
        .filter(F.col("c_xy") >= 5)
    )
    u1 = ucount.select(F.col("tok").alias("w1"), F.col("c").alias("c_x"))
    u2 = ucount.select(F.col("tok").alias("w2"), F.col("c").alias("c_y"))
    lifted = (
        bcount.join(u1, "w1")
        .join(u2, "w2")
        .join(F.broadcast(n_tok))
        .select(
            "w1",
            "w2",
            "c_xy",
            "c_x",
            "c_y",
            F.expr("(10000 * c_xy * n) div (c_x * c_y)").alias("lift_bp"),
        )
    )
    return lifted.orderBy(F.desc("lift_bp"), "w1", "w2").limit(20)


@query(
    "q_skipgram_cooccur",
    oracle=f"""
    WITH toks AS (
      SELECT {_SQL_TOKENS} AS tl FROM documents
    ),
    pairs AS (
      SELECT unnest(list_transform(generate_series(1, len(tl) - 1),
                    i -> struct_pack(w1 := tl[i], w2 := tl[i + 1]))) AS p
      FROM toks WHERE len(tl) >= 2
      UNION ALL
      SELECT unnest(list_transform(generate_series(1, len(tl) - 2),
                    i -> struct_pack(w1 := tl[i], w2 := tl[i + 2]))) AS p
      FROM toks WHERE len(tl) >= 3
    ),
    counted AS (
      SELECT p.w1 AS w1, p.w2 AS w2, CAST(count(*) AS BIGINT) AS n
      FROM pairs GROUP BY 1, 2
    )
    SELECT w1, w2, n FROM counted ORDER BY n DESC, w1, w2 LIMIT 20
    """,
)
def q_skipgram_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AO ao2 — skip-gram co-occurrence: ordered token pairs within
    window distance ≤ 2 (the word2vec-style context counts an embedding
    trainer consumes), corpus top-20 by (count DESC, pair). Distances 1
    and 2 are generated as two explicit passes — the fan-out is exactly
    ×2 of the token stream, never quadratic.

    Scale: JVM-side pair generation (flatten of two transform lists,
    one explode), ONE map-side-combined shuffle keyed by pair,
    TakeOrderedAndProject for the head."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(_tokens().alias("tl"))

    def _pairs(k: int):
        return F.transform(
            F.sequence(F.lit(1), F.size("tl") - k),
            lambda i: F.struct(
                F.element_at("tl", i).alias("w1"),
                F.element_at("tl", i + k).alias("w2"),
            ),
        )

    p1 = toks.filter(F.size("tl") >= 2).select(F.explode(_pairs(1)).alias("p"))
    p2 = toks.filter(F.size("tl") >= 3).select(F.explode(_pairs(2)).alias("p"))
    counted = (
        p1.unionAll(p2)
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return counted.orderBy(F.desc("n"), "w1", "w2").limit(20)


@query(
    "q_text_hapax_rate",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest({_SQL_TOKENS}) AS tok FROM documents
    ),
    freq AS (
      SELECT source, tok, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY 1, 2
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS vocab,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
           CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS dis_legomena,
           (10000 * CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT))
             // CAST(count(*) AS BIGINT) AS hapax_share_bp
    FROM freq GROUP BY 1 ORDER BY source
    """,
)
def q_text_hapax_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AO ao3 — hapax-legomena census: per crawl source, vocabulary
    size, once-seen (hapax) and twice-seen (dis legomena) type counts,
    and the hapax share in bp. Natural text runs ~40–60% hapax; a
    collapsed share flags template spam, an inflated one flags OCR
    noise — the cheap screen that runs before any LM-score filter.

    Scale: one (source, token) partial-aggregated census — the only
    corpus-sized shuffle — then a |sources|-row conditional rollup."""
    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select("source", F.explode(_tokens()).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return (
        freq.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("vocab"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
            .cast("long")
            .alias("hapax"),
            F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
            .cast("long")
            .alias("dis_legomena"),
        )
        .withColumn(
            "hapax_share_bp", F.expr("(10000 * hapax) div vocab")
        )
        .orderBy("source")
    )


@query(
    "q_word_length_profile",
    oracle=f"""
    WITH toks AS (
      SELECT lang, unnest({_SQL_TOKENS}) AS tok FROM documents
    ),
    lens AS (
      SELECT lang, CAST(len(tok) AS BIGINT) AS wlen, tok FROM toks
    )
    SELECT lang, wlen,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT tok) AS BIGINT) AS n_types,
           (10000 * CAST(count(*) AS BIGINT))
             // CAST(sum(count(*)) OVER (PARTITION BY lang) AS BIGINT)
             AS share_bp
    FROM lens GROUP BY 1, 2 ORDER BY lang, wlen
    """,
)
def q_word_length_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AO ao4 — word-length profile: per language, the token-length
    histogram (occurrence count, distinct types, share of the
    language's stream in bp). Length distributions are a language
    fingerprint (zh tokens run short, de long) — the profile feeds the
    same langid heuristics k15 applies.

    Scale: one (lang, length) partial-aggregated census; the distinct-
    type count shuffles (lang, length, token) once; the share window
    runs over the bounded |langs|×|lengths| relation."""
    docs = load_table(spark, sf_dir, "documents")
    lens = docs.select(
        "lang", F.explode(_tokens()).alias("tok")
    ).select("lang", F.length("tok").cast("long").alias("wlen"), "tok")
    census = lens.groupBy("lang", "wlen").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        F.countDistinct("tok").cast("long").alias("n_types"),
    )
    w = Window.partitionBy("lang")
    return (
        census.withColumn(
            "lang_total", F.sum("n_occurrences").over(w).cast("long")
        )
        .select(
            "lang",
            "wlen",
            "n_occurrences",
            "n_types",
            F.expr("(10000 * n_occurrences) div lang_total").alias(
                "share_bp"
            ),
        )
        .orderBy("lang", "wlen")
    )


@query(
    "q_text_zipf_ranktable",
    oracle=f"""
    WITH toks AS (
      SELECT unnest({_SQL_TOKENS}) AS tok FROM documents
    ),
    counted AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY 1
    ),
    top AS (
      SELECT tok, n, row_number() OVER (ORDER BY n DESC, tok) AS rnk
      FROM counted ORDER BY n DESC, tok LIMIT 30
    )
    SELECT CAST(rnk AS BIGINT) AS rank, tok, n,
           CAST(rnk AS BIGINT) * n AS zipf_product,
           (10000 * n) // CAST(max(n) OVER () AS BIGINT) AS pct_of_top_bp
    FROM top ORDER BY rank
    """,
)
def q_text_zipf_ranktable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AO ao5 — Zipf rank table: the corpus top-30 tokens with
    rank × frequency (Zipf's law predicts a roughly constant product
    on natural text — machine-generated spam flattens it) and each
    frequency as bp of the top token's. The one-page corpus-health
    chart every ingest review starts with.

    Scale: vocabulary census (one map-side-combined shuffle), top-30
    via TakeOrderedAndProject; the rank window and the max-over-all
    run on 30 rows."""
    docs = load_table(spark, sf_dir, "documents")
    counted = (
        docs.select(F.explode(_tokens()).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    top = counted.orderBy(F.desc("n"), "tok").limit(30)
    w = Window.orderBy(F.desc("n"), "tok")
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn("zipf_product", F.col("rank") * F.col("n"))
        .withColumn(
            "pct_of_top_bp",
            F.expr(
                "(10000 * n) div max(n) OVER"
                " (ROWS BETWEEN UNBOUNDED PRECEDING"
                " AND UNBOUNDED FOLLOWING)"
            ),
        )
        .select("rank", "tok", "n", "zipf_product", "pct_of_top_bp")
        .orderBy("rank")
    )
