"""Document search / retrieval operators (SURVEY.md §2.X, round 9).

The exact-retrieval layer a training-data pipeline runs next to the
dedup/contamination screens: an inverted-index posting census, boolean
retrieval, positional phrase search, per-term top-k posting
materialization, and an integer BM25-style ranked search. Contamination
audits (§2.L) answer "is this exact document in the corpus?"; these
answer the IR-shaped questions — "which documents mention X (and not Y)",
"where does this exact phrase occur", "which documents rank highest for
this query" — over the same `documents` table.

Exactness discipline: every score is integer — document-frequency shares
in basis points, the BM25 tf/length normalization and the idf proxy as
non-negative floor divisions (`div` on non-negative operands agrees with
DuckDB's `//`, the repo-wide safe pattern), so hashes match the oracle
bit-for-bit. No logarithms: the idf proxy `(N − df)·10⁴ div df` preserves
BM25's rareness ordering without a transcendental.

Spark-first shape, sized for 100 TB:
- Boolean and phrase search are ZERO-SHUFFLE scans — per-document term
  frequencies and adjacent-pair matches are array higher-order functions
  (`filter`/`zip_with`/`slice`) evaluated map-side inside codegen; the
  only exchange is the final deterministic ordering of the (small) hit
  set. Retrieval selectivity does the work of an index probe.
- The posting census and ranked search explode tokens but collapse
  immediately to (doc, term) partial counts; ranked search filters to the
  query's terms BEFORE the shuffle, so the exchanged relation is bounded
  by hits-per-query, not corpus tokens. Stats sides (df table, avgdl) are
  1-to-|terms|-row broadcasts.
- Top-k cuts lower to TakeOrderedAndProject (per-partition top-k merge,
  no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query

# shared tokenization — identical to ml/text.py so the whole text surface
# agrees on what a "token" is (split on single space, drop empties).
_SQL_TOKS = "list_filter(string_split(text, ' '), t -> t <> '')"

# boolean query (x2): +data +query -dup ('dup' is the rare injected token)
_MUST = ("data", "query")
_MUST_NOT = "dup"
# phrase query (x3)
_PHRASE = ("table", "scan")
# per-term top-k materialization (x4)
_TOPK_TERMS = ("spark", "data", "query", "join")
_TOPK_K = 3
# ranked search (x5): one common + one rare term so the idf proxy matters
_RANK_TERMS = ("spark", "dup")
_RANK_K = 10
# BM25-ish constants in basis points: k1 = 1.2, b = 0.75
_K1_BP = 12_000
_ONE_MINUS_B_BP = 2_500
_B_BP = 7_500


def _toks():
    return F.filter(F.split("text", " "), lambda t: t != "")


@query(
    "q_search_postings",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS t FROM documents
    ),
    tf AS (
      SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY doc_id, t
    ),
    stats AS (
      SELECT t, count(*) AS df, CAST(sum(tf) AS BIGINT) AS tf_total
      FROM tf GROUP BY t
    ),
    top AS (
      SELECT t, doc_id AS top_doc_id, CAST(tf AS BIGINT) AS top_doc_tf FROM (
        SELECT t, doc_id, tf,
               row_number() OVER (PARTITION BY t ORDER BY tf DESC, doc_id ASC) AS rn
        FROM tf
      ) WHERE rn = 1
    ),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT s.t AS token, CAST(s.df AS BIGINT) AS df, s.tf_total,
           CAST((s.df * 10000) // n.n_docs AS BIGINT) AS doc_share_bp,
           top.top_doc_id, top.top_doc_tf
    FROM stats s JOIN top ON s.t = top.t CROSS JOIN n
    ORDER BY df DESC, token ASC LIMIT 20
    """,
)
def q_search_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.X x1 — inverted-index posting census: for the 20 highest-df
    tokens, the document frequency, total term frequency, corpus share in
    exact basis points, and the top posting (max per-doc tf, ties broken
    by lowest doc_id) — the statistics block an index build materializes
    per term.

    Scale: the exploded token relation collapses immediately to
    (doc, term) partial counts (combiner runs map-side), then to |vocab|
    term rows; the top posting is one row_number window partitioned by
    term over the already-collapsed tf relation; the final cut is
    TakeOrderedAndProject. The 1-row corpus count broadcasts."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(_toks()).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = tf.groupBy("t").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("tf_total")
    )
    w = Window.partitionBy("t").orderBy(F.col("tf").desc(), F.col("doc_id").asc())
    top = (
        tf.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("t", F.col("doc_id").alias("top_doc_id"), F.col("tf").alias("top_doc_tf"))
    )
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        stats.join(top, "t")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("t").alias("token"),
            "df",
            "tf_total",
            F.expr("(df * 10000) div n_docs").alias("doc_share_bp"),
            "top_doc_id",
            "top_doc_tf",
        )
        .orderBy(F.col("df").desc(), F.col("token").asc())
        .limit(20)
    )


@query(
    "q_search_boolean",
    oracle=f"""
    SELECT doc_id, lang,
           CAST(len(list_filter({_SQL_TOKS}, t -> t = '{_MUST[0]}')) AS BIGINT) AS tf_data,
           CAST(len(list_filter({_SQL_TOKS}, t -> t = '{_MUST[1]}')) AS BIGINT) AS tf_query
    FROM documents
    WHERE len(list_filter({_SQL_TOKS}, t -> t = '{_MUST[0]}')) > 0
      AND len(list_filter({_SQL_TOKS}, t -> t = '{_MUST[1]}')) > 0
      AND len(list_filter({_SQL_TOKS}, t -> t = '{_MUST_NOT}')) = 0
    ORDER BY doc_id
    """,
)
def q_search_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.X x2 — boolean retrieval (+data +query −dup): documents
    containing BOTH required terms and NOT the excluded one, with the
    per-document term frequencies.

    Scale: ZERO shuffle — each per-doc tf is `size(filter(tokens, …))`
    evaluated map-side inside whole-stage codegen, and the boolean
    predicate prunes rows at the scan, exactly like an index probe's
    selectivity but with no index to maintain. At 100 TB this is a
    pushed-projection scan of (doc_id, lang, text) and nothing else; the
    only exchange is the final order of the (selectivity-bounded) hit
    set."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _toks()
    tf_data = F.size(F.filter(toks, lambda t: t == _MUST[0]))
    tf_query = F.size(F.filter(toks, lambda t: t == _MUST[1]))
    tf_not = F.size(F.filter(toks, lambda t: t == _MUST_NOT))
    return (
        docs.select(
            "doc_id",
            "lang",
            tf_data.alias("tf_data"),
            tf_query.alias("tf_query"),
            tf_not.alias("tf_not"),
        )
        .where((F.col("tf_data") > 0) & (F.col("tf_query") > 0) & (F.col("tf_not") == 0))
        .drop("tf_not")
        .orderBy("doc_id")
    )


@query(
    "q_search_phrase",
    oracle=f"""
    SELECT doc_id, lang, CAST(hits AS BIGINT) AS hits
    FROM (
      SELECT doc_id, lang,
             CASE WHEN len(toks) < 2 THEN 0 ELSE len(list_filter(
               list_zip(toks[1:len(toks) - 1], toks[2:len(toks)]),
               p -> p[1] = '{_PHRASE[0]}' AND p[2] = '{_PHRASE[1]}')) END AS hits
      FROM (SELECT doc_id, lang, {_SQL_TOKS} AS toks FROM documents)
    )
    WHERE hits > 0
    ORDER BY doc_id
    """,
)
def q_search_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.X x3 — positional phrase search ("table scan"): documents where
    the exact token bigram occurs, with the occurrence count. The
    adjacency test is the array zip of each token with its successor —
    the same answer a positional index gives, computed directly on the
    token array.

    Scale: ZERO shuffle, like x2 — `zip_with(slice(toks, 1, n−1),
    slice(toks, 2, n−1), …)` marks adjacent pairs map-side and
    `aggregate` sums them, all inside codegen; no posexplode, no
    (doc, pos) relation, no window. The phrase predicate prunes at the
    scan; only matching docs reach the final (tiny) sort."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = F.expr(
        "zip_with(slice(toks, 1, size(toks) - 1), slice(toks, 2, size(toks) - 1), "
        f"(x, y) -> CASE WHEN x = '{_PHRASE[0]}' AND y = '{_PHRASE[1]}' THEN 1 ELSE 0 END)"
    )
    return (
        docs.select("doc_id", "lang", _toks().alias("toks"))
        .select(
            "doc_id",
            "lang",
            F.when(F.size("toks") < 2, F.lit(0))
            .otherwise(F.aggregate(pairs, F.lit(0), lambda acc, x: acc + x))
            .cast("long")
            .alias("hits"),
        )
        .where(F.col("hits") > 0)
        .orderBy("doc_id")
    )


@query(
    "q_search_topk_per_term",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS t FROM documents
    ),
    tf AS (
      SELECT doc_id, t, count(*) AS tf FROM tok
      WHERE t IN ('{_TOPK_TERMS[0]}', '{_TOPK_TERMS[1]}', '{_TOPK_TERMS[2]}', '{_TOPK_TERMS[3]}')
      GROUP BY doc_id, t
    )
    SELECT t AS token, CAST(rnk AS BIGINT) AS rnk, doc_id, CAST(tf AS BIGINT) AS tf
    FROM (
      SELECT t, doc_id, tf,
             row_number() OVER (PARTITION BY t ORDER BY tf DESC, doc_id ASC) AS rnk
      FROM tf
    ) WHERE rnk <= {_TOPK_K}
    ORDER BY token, rnk
    """,
)
def q_search_topk_per_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.X x4 — per-term top-k postings: for each of 4 query terms, the
    3 documents with the highest term frequency (ties to the lowest
    doc_id) — the impact-ordered posting-list head a ranked index keeps
    materialized.

    Scale: the term filter is applied BEFORE any shuffle (the exploded
    relation is cut to the 4 query terms map-side), so the exchanged tf
    relation is bounded by hits for those terms, not corpus tokens; then
    one |terms|-partition row_number window takes the heads. Adding terms
    widens the filter, never the shape."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(_toks()).alias("t"))
        .where(F.col("t").isin(*_TOPK_TERMS))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w = Window.partitionBy("t").orderBy(F.col("tf").desc(), F.col("doc_id").asc())
    return (
        tf.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _TOPK_K)
        .select(F.col("t").alias("token"), F.col("rnk").cast("long").alias("rnk"), "doc_id", "tf")
        .orderBy("token", "rnk")
    )


@query(
    "q_search_bm25ish",
    oracle=f"""
    WITH dl AS (
      SELECT doc_id, len({_SQL_TOKS}) AS dl FROM documents
    ),
    corpus AS (
      SELECT CAST(sum(dl) // count(*) AS BIGINT) AS avgdl, count(*) AS n_docs FROM dl
    ),
    tok AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS t FROM documents
    ),
    tf AS (
      SELECT doc_id, t, count(*) AS tf FROM tok
      WHERE t IN ('{_RANK_TERMS[0]}', '{_RANK_TERMS[1]}')
      GROUP BY doc_id, t
    ),
    dfreq AS (
      SELECT t, count(*) AS df FROM tf GROUP BY t
    ),
    scored AS (
      SELECT tf.doc_id,
             ((corpus.n_docs - dfreq.df) * 10000 // dfreq.df)
               * (tf.tf * ({_K1_BP} + 10000))
               // (tf.tf * 10000
                   + ({_K1_BP} * ({_ONE_MINUS_B_BP} + ({_B_BP} * ((dl.dl * 10000) // corpus.avgdl)) // 10000)) // 10000)
               AS term_score
      FROM tf
      JOIN dl ON tf.doc_id = dl.doc_id
      JOIN dfreq ON tf.t = dfreq.t
      CROSS JOIN corpus
    )
    SELECT doc_id, CAST(sum(term_score) AS BIGINT) AS score,
           CAST(count(*) AS BIGINT) AS terms_hit
    FROM scored GROUP BY doc_id
    ORDER BY score DESC, doc_id ASC LIMIT {_RANK_K}
    """,
)
def q_search_bm25ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.X x5 — integer BM25-style ranked search for the query
    {spark, dup}: per matching document,
    ``Σ_t idf_bp(t) · tf·(k₁+1)·10⁴ div (tf·10⁴ + k₁·((1−b) + b·dl/avgdl))``
    with k₁ = 1.2, b = 0.75, every factor held in basis points and every
    division a non-negative floor division — BM25's tf saturation and
    length normalization, bit-identical across engines. The idf proxy
    ``(N − df)·10⁴ div df`` replaces the logarithm (monotone in df, so
    rareness ordering — 'dup' ≫ 'spark' — is preserved); top-10 by
    (score DESC, doc_id ASC) is a deterministic cut.

    Scale: document length is computed map-side and rides the partial-agg
    as a group key (functionally dependent on doc_id), so the hit-bounded
    tf relation never joins a corpus-wide table; the exploded relation is
    filtered to the query's terms before the (doc, term) shuffle; df is a
    WINDOW COUNT over the hit-bounded tf relation (round 11 — the
    round-10 groupBy+broadcast-join spelling recomputed the whole
    scan→tokenize→explode subtree for the df leg because Catalyst gave
    it no exchange reuse: 3 parquet scans in the plan, now 2, 14
    Exchanges → 8; guide §2.4 — a window keyed like the data it reads
    replaces a re-aggregation plus a join); the corpus stats (1 row)
    broadcast back; the final cut is TakeOrderedAndProject. Everything
    exchanged is bounded by query hits, not corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    dl = docs.select("doc_id", F.size(_toks()).alias("dl"))
    corpus = F.broadcast(
        dl.agg(
            F.expr("sum(dl) div count(*)").cast("long").alias("avgdl"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )
    # dl rides along as a group key (functionally dependent on doc_id), so
    # the hit-bounded tf relation never joins back to a corpus-wide table.
    tf = (
        docs.select("doc_id", F.size(_toks()).alias("dl"), F.explode(_toks()).alias("t"))
        .where(F.col("t").isin(*_RANK_TERMS))
        .groupBy("doc_id", "dl", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # df via a window over the hit-bounded tf relation: one tf subtree in
    # the plan (no re-scan for a df aggregate, no join back).
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("t")))
        .crossJoin(corpus)
        .select(
            "doc_id",
            F.expr(
                "((n_docs - df) * 10000 div df)"
                f" * (tf * ({_K1_BP} + 10000))"
                f" div (tf * 10000"
                f" + ({_K1_BP} * ({_ONE_MINUS_B_BP} + ({_B_BP} * ((dl * 10000) div avgdl)) div 10000)) div 10000)"
            ).alias("term_score"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("term_score").cast("long").alias("score"),
            F.count(F.lit(1)).alias("terms_hit"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(_RANK_K)
    )
