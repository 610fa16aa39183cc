"""Text-analysis operators over the document corpus (SURVEY.md §2.K
k14–k16 plus the language-ID / quality-scoring / fingerprint mandates).

Everything SQL-oracle-checkable is built from split/explode + aggregates —
the exploded token relation collapses immediately into (token, …) partials,
so the shuffles stay proportional to vocabulary, not corpus size. The only
non-oracle entry is the hashing-based MLlib pipeline (k16), whose feature
indices are hash-defined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query

def _tokens():
    # built lazily: Column construction needs an active SparkContext
    return F.filter(F.split("text", " "), lambda t: t != "")


_SQL_TOKENS = "list_filter(string_split(text, ' '), t -> t <> '')"

_STOPWORDS = ("the", "a", "of", "and", "to")
_SQL_STOP_LIST = "['" + "', '".join(_STOPWORDS) + "']"


@query(
    "q_text_stats",
    oracle=f"""
    WITH tok AS (
      SELECT lang, unnest({_SQL_TOKENS}) AS t FROM documents
    ),
    counts AS (
      SELECT lang, t, count(*) AS n FROM tok GROUP BY lang, t
    ),
    top AS (
      SELECT lang, t AS top_token FROM (
        SELECT lang, t, row_number() OVER (PARTITION BY lang ORDER BY n DESC, t ASC) AS rn
        FROM counts
      ) WHERE rn = 1
    ),
    stats AS (
      SELECT lang,
             count(*) AS n_docs,
             round(avg(n_chars), 2) AS avg_chars,
             round(avg(len({_SQL_TOKENS})), 2) AS avg_tokens
      FROM documents GROUP BY lang
    )
    SELECT s.lang, n_docs, avg_chars, avg_tokens, top_token
    FROM stats s JOIN top USING (lang)
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k14 — per-language corpus stats + most frequent token."""
    docs = load_table(spark, sf_dir, "documents")
    stats = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        F.round(F.avg(F.size(_tokens())), 2).alias("avg_tokens"),
    )
    counts = (
        docs.select("lang", F.explode(_tokens()).alias("t"))
        .groupBy("lang", "t")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("t").asc())
    top = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("lang", F.col("t").alias("top_token"))
    )
    return stats.join(top, "lang")


@query(
    "q_tfidf_topterm",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_SQL_TOKENS}) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0) AS score
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term AS top_term, round(score, 6) AS tfidf
    FROM (
      SELECT doc_id, term, score,
             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rn
      FROM scored
    ) WHERE rn = 1
    """,
)
def q_tfidf_topterm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k15 — exact TF-IDF, DataFrame-native: per-doc top term.

    idf = ln((N+1)/(df+1)) + 1 (smoothed, sklearn-style). Two aggregates
    (tf per doc-term, df per term) + a broadcast of the tiny df/N side —
    no hashing, so fully oracle-checkable, unlike HashingTF (k16).
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_tokens()).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf") * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0)
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("term").alias("top_term"), F.round("score", 6).alias("tfidf"))
    )


@query(
    "q_text_langid",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, unnest(list_distinct({_SQL_TOKENS})) AS t FROM documents
    ),
    profile AS (
      SELECT lang AS profile_lang, t FROM (
        SELECT lang, t, count(*) AS n,
               row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, t ASC) AS rn
        FROM tok GROUP BY lang, t
      ) WHERE rn <= 15
    ),
    overlap AS (
      SELECT tok.doc_id, profile.profile_lang, count(*) AS n_hits
      FROM tok JOIN profile ON tok.t = profile.t
      GROUP BY tok.doc_id, profile.profile_lang
    ),
    best AS (
      SELECT doc_id, profile_lang AS predicted_lang, CAST(n_hits AS BIGINT) AS n_hits FROM (
        SELECT doc_id, profile_lang, n_hits,
               row_number() OVER (PARTITION BY doc_id ORDER BY n_hits DESC, profile_lang ASC) AS rn
        FROM overlap
      ) WHERE rn = 1
    )
    SELECT d.doc_id, d.lang AS actual_lang, b.predicted_lang, b.n_hits
    FROM documents d JOIN best b ON d.doc_id = b.doc_id
    """,
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language identification by token-profile overlap.

    Profiles = top-15 distinct-doc tokens per language (built from the
    corpus itself — a deterministic, oracle-checkable stand-in for
    n-gram LM scoring); prediction = argmax profile overlap. The profile
    table is tiny (5 langs × 15 tokens) → broadcast.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", "lang", F.explode(F.array_distinct(_tokens())).alias("t"))
    counts = tok.groupBy("lang", "t").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("t").asc())
    profile = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 15)
        .select(F.col("lang").alias("profile_lang"), "t")
    )
    overlap = (
        tok.join(F.broadcast(profile), "t")
        .groupBy("doc_id", "profile_lang")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    w2 = Window.partitionBy("doc_id").orderBy(F.col("n_hits").desc(), F.col("profile_lang").asc())
    best = (
        overlap.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("profile_lang").alias("predicted_lang"), F.col("n_hits").cast("long"))
    )
    return docs.select("doc_id", F.col("lang").alias("actual_lang")).join(best, "doc_id")


@query(
    "q_text_quality",
    oracle=f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_actual,
           CAST(len({_SQL_TOKENS}) AS BIGINT) AS n_tokens,
           round(CAST(length(text) AS DOUBLE) / len({_SQL_TOKENS}), 4) AS avg_token_len,
           round(CAST(len(list_filter({_SQL_TOKENS}, t -> list_contains({_SQL_STOP_LIST}, t))) AS DOUBLE)
                 / len({_SQL_TOKENS}), 4) AS stopword_ratio,
           CAST(len(list_distinct({_SQL_TOKENS})) AS BIGINT) AS n_unique_tokens,
           round(CAST(len(list_distinct({_SQL_TOKENS})) AS DOUBLE) / len({_SQL_TOKENS}), 4)
             AS type_token_ratio
    FROM documents
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring signals per document: length, token stats, stopword
    ratio, type-token ratio — the standard pre-training filter features."""
    stop = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_tok = F.size(_tokens())
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_actual"),
        n_tok.cast("long").alias("n_tokens"),
        F.round(F.length("text").cast("double") / n_tok, 4).alias("avg_token_len"),
        F.round(
            F.size(F.filter(_tokens(), lambda t: F.array_contains(stop, t))).cast("double") / n_tok,
            4,
        ).alias("stopword_ratio"),
        F.size(F.array_distinct(_tokens())).cast("long").alias("n_unique_tokens"),
        F.round(F.size(F.array_distinct(_tokens())).cast("double") / n_tok, 4).alias(
            "type_token_ratio"
        ),
    )


@query(
    "q_text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct({_SQL_TOKENS})), ' ')) AS fingerprint,
           count(*) OVER (PARTITION BY md5(array_to_string(list_sort(list_distinct({_SQL_TOKENS})), ' ')))
             AS n_same_fingerprint
    FROM documents
    """,
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 over the sorted distinct-token set — an
    order-insensitive content hash (catches shuffled/duplicated docs that
    exact text-hash dedup misses)."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(_tokens()))))
    w = Window.partitionBy("fingerprint")
    return (
        docs.select("doc_id", fp.alias("fingerprint"))
        .withColumn("n_same_fingerprint", F.count(F.lit(1)).over(w))
    )


@query("q_tfidf_mllib")
def q_tfidf_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k16 — MLlib feature pipeline: Tokenizer → StopWordsRemover → NGram →
    HashingTF → IDF (rows-only: feature indices are hash-defined).

    Returns per-doc vector summaries (nnz, top index) so the result is a
    stable relation even though the 2^18 hash space is engine-internal.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import IDF, HashingTF, NGram, StopWordsRemover, Tokenizer

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pipe = Pipeline(
        stages=[
            Tokenizer(inputCol="text", outputCol="tokens"),
            StopWordsRemover(inputCol="tokens", outputCol="clean"),
            NGram(n=2, inputCol="clean", outputCol="bigrams"),
            HashingTF(inputCol="bigrams", outputCol="tf", numFeatures=1 << 18),
            IDF(inputCol="tf", outputCol="tfidf"),
        ]
    )
    model = pipe.fit(docs)
    out = model.transform(docs)

    # VectorUDT can't cross the pandas_udf/mapInPandas Arrow boundary
    # (UDTs are rejected there), and a JVM-side reconstruction was measured
    # NOT equivalent: MLlib's HashingTF buckets via Murmur3
    # hashUnsafeBytes2 (Scala-collection-consistent tail mixing), while
    # F.hash is catalyst hashUnsafeBytes — same nnz, different bucket ids
    # on every doc. vector_to_array would densify 2^18 doubles per row —
    # worse than any UDF. So the sparse vector is read by an
    # Arrow-OPTIMIZED Python UDF (useArrow=True): UDT values arrive
    # Arrow-batched (ArrowEvalPython, not row-pickled BatchEvalPython),
    # keeping j1 the only deliberate row-at-a-time UDF in the registry
    # (plan-asserted in tests/test_plans.py).
    from pyspark.sql.types import LongType

    def nnz_of(v):
        return int(v.numNonzeros())

    def top_idx_of(v):
        return int(v.indices[int(v.values.argmax())]) if v.numNonzeros() else -1

    nnz_udf = F.udf(nnz_of, LongType(), useArrow=True)
    top_udf = F.udf(top_idx_of, LongType(), useArrow=True)
    return out.select(
        "doc_id", nnz_udf("tfidf").alias("nnz"), top_udf("tfidf").alias("top_feature_idx")
    )


@query(
    "q_text_tokenize_bpeish",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
                  AS BIGINT) AS ws_tokens,
             CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))
                  AS BIGINT) AS bpeish_tokens
      FROM documents
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(ws_tokens) AS BIGINT) AS total_ws_tokens,
           CAST(sum(bpeish_tokens) AS BIGINT) AS total_bpeish_tokens,
           round(avg(bpeish_tokens * 1.0 / ws_tokens), 4) AS expansion_ratio
    FROM toks
    GROUP BY lang
    """,
)
def q_text_tokenize_bpeish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace words vs a BPE-ish sub-word
    regex (letter runs | digit runs | single punctuation), the standard
    pre-tokenizer shape of byte-pair-encoding vocabularies.

    The ratio between the two is the classic "tokens per word" expansion
    estimate an LLM-data pipeline budgets by. Pure JVM regexps — the
    pattern is written in the common subset of Java and RE2 syntax so the
    DuckDB oracle tokenizes identically.
    """
    docs = load_table(spark, sf_dir, "documents")
    bpeish = F.size(
        F.regexp_extract_all(F.lower("text"), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), F.lit(0))
    ).cast("long")
    ws = F.size(_tokens()).cast("long")
    per_doc = docs.select("doc_id", "lang", ws.alias("ws_tokens"), bpeish.alias("bpeish_tokens"))
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ws_tokens").alias("total_ws_tokens"),
        F.sum("bpeish_tokens").alias("total_bpeish_tokens"),
        F.round(F.avg(F.col("bpeish_tokens") / F.col("ws_tokens")), 4).alias("expansion_ratio"),
    )


@query(
    "q_top_bigrams",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_TOKENS} AS tl FROM documents
    ),
    bg AS (
      SELECT unnest(list_transform(generate_series(1, len(tl) - 1),
                    i -> tl[i] || ' ' || tl[i + 1])) AS bigram
      FROM toks
    ),
    counted AS (
      SELECT bigram, count(*) AS n FROM bg GROUP BY bigram
    )
    SELECT bigram, n, CAST(rn AS BIGINT) AS rank
    FROM (
      SELECT *, row_number() OVER (ORDER BY n DESC, bigram) AS rn FROM counted
    ) WHERE rn <= 20
    """,
)
def q_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 token bigrams — the n-gram frequency table an
    LM data pipeline builds for contamination screens (see
    q_contamination_check) and boilerplate detection. The bigram list is
    built JVM-side with sequence+slice higher-order functions, exploded
    once, and counted with map-side partials.

    Scale: identical shape to word count (h3) — one shuffle keyed by
    bigram; the head of the distribution is what matters, so the global
    top-20 is a TakeOrderedAndProject over the aggregated counts.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(_tokens().alias("tl"))
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("tl") - 1),
        lambda i: F.concat_ws(" ", F.slice("tl", i, 2)),
    )
    counted = (
        toks.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # limit-first: sort+limit lowers to TakeOrderedAndProject (per-partition
    # local top-20, driver merge) — the rank window then sees 20 rows, not
    # the whole bigram vocabulary (which grows with the corpus).
    top = counted.orderBy(F.col("n").desc(), "bigram").limit(20)
    w = Window.orderBy(F.col("n").desc(), "bigram")
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "bigram", "n", "rank"
    )


@query(
    "q_vocab_growth",
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest({_SQL_TOKENS}) AS t FROM documents
    ),
    per_source AS (
      SELECT source, count(*) AS total_tokens,
             CAST(count(DISTINCT t) AS BIGINT) AS distinct_tokens
      FROM tok GROUP BY source
    ),
    docs AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source)
    SELECT source, n_docs, total_tokens, distinct_tokens,
           CAST(floor(CAST(distinct_tokens AS DOUBLE) * 1000000 / total_tokens)
                AS BIGINT) AS ttr_x1e6
    FROM per_source JOIN docs USING (source)
    """,
)
def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary size and type-token ratio per crawl source — the
    Heaps-law diagnostic that tells a data pipeline which sources are
    lexically rich vs boilerplate-heavy (low TTR → templated text, a
    dedup/quality signal alongside l5/l12).

    Scale: the token explode shuffles once on source (tiny cardinality
    — skew-prone at 100 TB, so production salts the count-distinct or
    swaps in the HLL sketch path d16); everything else is integer exact.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(_tokens()).alias("t"))
    per_source = tok.groupBy("source").agg(
        F.count(F.lit(1)).alias("total_tokens"),
        F.countDistinct("t").cast("long").alias("distinct_tokens"),
    )
    ndocs = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    return per_source.join(ndocs, "source").select(
        "source",
        "n_docs",
        "total_tokens",
        "distinct_tokens",
        F.floor(F.col("distinct_tokens").cast("double") * 1_000_000 / F.col("total_tokens"))
        .cast("long")
        .alias("ttr_x1e6"),
    )


@query(
    "q_boilerplate_segments",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_TOKENS} AS tl FROM documents
    ),
    seg AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(0, len(tl) // 8 - 1),
                    i -> list_aggregate(list_slice(tl, i * 8 + 1, i * 8 + 8),
                                        'string_agg', ' ')))
               AS segment
      FROM toks
    ),
    counted AS (
      SELECT segment,
             count(*) AS n_occurrences,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM seg GROUP BY segment
      HAVING count(DISTINCT doc_id) >= 2
    )
    SELECT segment, n_occurrences, n_docs, CAST(rn AS BIGINT) AS rank
    FROM (
      SELECT *, row_number() OVER (ORDER BY n_docs DESC, segment) AS rn
      FROM counted
    ) WHERE rn <= 20
    """,
)
def q_boilerplate_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate detection: non-overlapping 8-token
    segments (the line/sentence proxy for this corpus, which has no
    punctuation) repeated across >=2 documents, ranked by document
    reach — the C4-style line-dedup signal that catches templated
    intros and footers even when whole docs are unique.

    Scale: identical shape to word count — segment build is a map-side
    HOF, one shuffle keyed by segment (hash segments to 16 bytes at
    100 TB to shrink it, as k11 does for whole docs); top-20 is a
    TakeOrderedAndProject.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", _tokens().alias("tl"))
    segments = F.transform(
        F.sequence(F.lit(0), F.floor(F.size("tl") / 8).cast("int") - 1),
        lambda i: F.concat_ws(" ", F.slice("tl", i * 8 + 1, 8)),
    )
    sent = toks.filter(F.size("tl") >= 8).select(
        "doc_id", F.explode(segments).alias("segment")
    )
    counted = (
        sent.groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
        )
        .filter(F.col("n_docs") >= 2)
    )
    # limit-first (TakeOrderedAndProject): the segment table grows with the
    # corpus; only 20 rows ever reach the ranking window.
    top = counted.orderBy(F.col("n_docs").desc(), "segment").limit(20)
    w = Window.orderBy(F.col("n_docs").desc(), "segment")
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "segment", "n_occurrences", "n_docs", "rank"
    )


_CM_P = (1 << 31) - 1  # Mersenne prime for the universal hash family
_CM_W = 256  # sketch width (buckets per hash row)
_CM_COEF = [(2, 12289), (6, 24578), (10, 36867), (14, 49156)]  # depth 4


@query(
    "q_countmin_heavy_hitters",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({_SQL_TOKENS}) AS t FROM documents
    ),
    h AS (
      SELECT t, CAST(CAST(('0x' || substr(md5(t), 1, 15)) AS UBIGINT) AS BIGINT)
                  % {_CM_P} AS h60
      FROM tok
    ),
    cells AS (
      {" UNION ALL ".join(
          f"SELECT {j} AS row_id, (({a} * h60 + {b}) % {_CM_P}) % {_CM_W} AS bucket,"
          f" count(*) AS c FROM h GROUP BY 2"
          for j, (a, b) in enumerate(_CM_COEF))}
    ),
    exact AS (
      SELECT t, h60, count(*) AS exact_n FROM h GROUP BY t, h60
    ),
    top AS (
      SELECT t, h60, exact_n
      FROM (SELECT *, row_number() OVER (ORDER BY exact_n DESC, t) AS rn FROM exact)
      WHERE rn <= 20
    ),
    est AS (
      {" UNION ALL ".join(
          f"SELECT t, exact_n, (SELECT c FROM cells WHERE row_id = {j}"
          f" AND bucket = (({a} * top.h60 + {b}) % {_CM_P}) % {_CM_W}) AS est"
          f" FROM top"
          for j, (a, b) in enumerate(_CM_COEF))}
    )
    SELECT t AS token, exact_n,
           CAST(min(est) AS BIGINT) AS cm_estimate,
           CAST(min(est) - exact_n AS BIGINT) AS overestimate
    FROM est GROUP BY t, exact_n
    """,
)
def q_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation, checked against exact
    counts for the top-20 tokens: a depth-4 × width-256 integer sketch
    built with the same md5-derived universal hash family as the MinHash
    ops (l17) — fully deterministic, so unlike d16's opaque HLL this
    sketch hash-matches its oracle. CM estimates only ever OVERcount;
    the non-negative `overestimate` column is the proof.

    Scale: this is THE mergeable heavy-hitter structure — each executor
    builds its 4×256 integer grid map-side, grids add cell-wise (the
    groupBy here), and the fixed-size result answers any point query.
    At 100 TB the sketch replaces a full token groupBy whenever only
    head frequencies matter.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(_tokens()).alias("t"))
    h60 = F.expr(f"CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT) % {_CM_P}")
    hashed = tok.select("t", h60.alias("h60"))
    # sketch: per (row, bucket) cell counts — 4 passes expressed as one
    # explode over the hash family so the scan runs once
    rows = F.array(
        *[
            F.struct(
                F.lit(j).alias("row_id"),
                (((a * F.col("h60") + b) % _CM_P) % _CM_W).alias("bucket"),
            )
            for j, (a, b) in enumerate(_CM_COEF)
        ]
    )
    cells = (
        hashed.select(F.explode(rows).alias("rb"))
        .groupBy(F.col("rb.row_id").alias("row_id"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    exact = hashed.groupBy("t", "h60").agg(F.count(F.lit(1)).alias("exact_n"))
    # limit-first (TakeOrderedAndProject): the exact-count table spans the
    # whole vocabulary; the heavy-hitter window only needs its top 20.
    top20 = exact.orderBy(F.col("exact_n").desc(), "t").limit(20)
    wtop = Window.orderBy(F.col("exact_n").desc(), "t")
    top = top20.withColumn("rn", F.row_number().over(wtop))
    probes = top.select(
        "t",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row_id"),
                        (((a * F.col("h60") + b) % _CM_P) % _CM_W).alias("bucket"),
                    )
                    for j, (a, b) in enumerate(_CM_COEF)
                ]
            )
        ).alias("rb"),
    ).select("t", "exact_n", F.col("rb.row_id").alias("row_id"), F.col("rb.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(cells), ["row_id", "bucket"])
        .groupBy(F.col("t").alias("token"), "exact_n")
        .agg(
            F.min("c").cast("long").alias("cm_estimate"),
            (F.min("c") - F.col("exact_n")).cast("long").alias("overestimate"),
        )
    )
