"""Intra-document repetition screens — duplicated-n-gram quality
signals (SURVEY.md §2.CC, round 11).

"How much of this document is the document repeating itself" — the
within-document repetition family of LLM-corpus quality filtering
(the Gopher/MassiveText repetition rules re-expressed for this
corpus), beside §2.K's CROSS-document near-dup machinery (MinHash,
Jaccard, SimHash find copies BETWEEN docs; none looks inside one) and
`q_text_quality`'s token/stopword ratios (no positional structure):

- cc1: the bigram repetition census — per doc, distinct vs duplicated
  bigram instances and the top-bigram share.
- cc2: the trigram coverage — the same census at n = 3 (longer grams
  flag templated spans that bigram noise misses).
- cc3: immediate repeats — adjacent equal tokens ("a a"), count,
  share and distinct stuttered tokens, computed by pure
  higher-order-function array scans (no explode).
- cc4: the per-source screen — how many documents each source would
  lose to the duplicated-bigram threshold rule.

PUBLISHED SPELLINGS (integer bp, truncating division on non-negative
counts — Spark ``div`` ≡ DuckDB ``//``; a doc with no n-grams, i.e.
fewer than n tokens, publishes NULL shares in BOTH engines):

    grams_n(d)      = tokens(d) − (n−1)      instances of token n-grams
    dup_instances   = Σ_g c_g · [c_g ≥ 2]    instances of repeated grams
    dup_share_bp    = (10⁴·dup_instances) div grams_n
    top_share_bp    = (10⁴·max_g c_g) div grams_n
    screen rule     : dup_share_bp > 1000    (flag docs where > 10% of
                      bigram instances repeat — splits this corpus at
                      roughly its 75th percentile, documented constant)

Tokenization is the exact whitespace split both engines share
(`split(text, ' ')` ≡ `string_split(text, ' ')`; the corpus is
single-spaced ASCII).

Spark-first shape, sized for 100 TB: cc1/cc2 are the canonical
explode → partial-agg pipeline — grams explode linearly in corpus
tokens, count per (doc, gram) with map-side combine (the shuffle key
is (doc_id, gram): cardinality ≈ corpus grams, perfectly spreadable,
no skew beyond a single document's length), then reduce to one row
per doc; nothing ever groups ACROSS documents except cc4's
≤|sources|-row census. cc3 never explodes at all — `filter`/
`transform`/`array_distinct` HOFs scan each token array in place
(whole-stage codegen, zero shuffle before the final projection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query


# DuckDB: per-doc n-gram repetition census for gram size n
def _census_duck(n: int) -> str:
    gram = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
    return f"""
toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
grams AS (
  SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tok,
         unnest(list_transform(range(1, len(t) - {n - 2}),
                               i -> {gram})) AS g
  FROM toks
),
cnt AS (
  SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c
  FROM grams GROUP BY 1, 2
),
-- LEFT JOIN keeps gram-less docs (unnest drops them from `grams`) —
-- they publish zero counts / NULL shares exactly like the Spark side
census AS (
  SELECT tk.doc_id, CAST(len(tk.t) AS BIGINT) AS n_tok,
         COALESCE(a.n_grams, 0) AS n_grams,
         COALESCE(a.distinct_grams, 0) AS distinct_grams,
         COALESCE(a.dup_instances, 0) AS dup_instances,
         COALESCE(a.top_count, 0) AS top_count
  FROM toks tk LEFT JOIN (
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_grams,
           CAST(count(*) AS BIGINT) AS distinct_grams,
           CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
             AS dup_instances,
           CAST(max(c) AS BIGINT) AS top_count
    FROM cnt GROUP BY 1
  ) a ON tk.doc_id = a.doc_id
)
"""

_SHARES_DUCK = """
SELECT doc_id, n_tok, n_grams, distinct_grams, dup_instances,
       CAST(CASE WHEN n_grams = 0 THEN NULL
            ELSE (10000 * dup_instances) // n_grams END AS BIGINT)
         AS dup_share_bp,
       CAST(CASE WHEN n_grams = 0 THEN NULL
            ELSE (10000 * top_count) // n_grams END AS BIGINT)
         AS top_share_bp
FROM census ORDER BY doc_id
"""


def _census_spark(spark: SparkSession, sf_dir: str, n: int) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    gram = ", ' ', ".join(f"element_at(t, i + {j})" for j in range(n))
    toks = docs.select(
        "doc_id", F.expr("split(text, ' ')").alias("t")
    ).select(
        "doc_id",
        F.expr("CAST(size(t) AS BIGINT)").alias("n_tok"),
        F.expr(
            f"CASE WHEN size(t) < {n} THEN array()"
            f" ELSE transform(sequence(1, size(t) - {n - 1}),"
            f" i -> concat({gram})) END"
        ).alias("grams"),
    )
    cnt = (
        toks.select(
            "doc_id", "n_tok", F.explode_outer("grams").alias("g")
        )
        .groupBy("doc_id", "n_tok", "g")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return cnt.groupBy("doc_id", "n_tok").agg(
        F.expr(
            "CAST(sum(CASE WHEN g IS NULL THEN 0 ELSE c END) AS BIGINT)"
        ).alias("n_grams"),
        F.expr(
            "CAST(count(CASE WHEN g IS NULL THEN NULL ELSE 1 END)"
            " AS BIGINT)"
        ).alias("distinct_grams"),
        F.expr(
            "CAST(sum(CASE WHEN g IS NOT NULL AND c >= 2 THEN c"
            " ELSE 0 END) AS BIGINT)"
        ).alias("dup_instances"),
        F.expr(
            "CAST(max(CASE WHEN g IS NULL THEN 0 ELSE c END) AS BIGINT)"
        ).alias("top_count"),
    )


def _shares(census: DataFrame) -> DataFrame:
    return census.select(
        "doc_id",
        "n_tok",
        "n_grams",
        "distinct_grams",
        "dup_instances",
        F.expr(
            "CAST(CASE WHEN n_grams = 0 THEN NULL"
            " ELSE (10000 * dup_instances) div n_grams END AS BIGINT)"
        ).alias("dup_share_bp"),
        F.expr(
            "CAST(CASE WHEN n_grams = 0 THEN NULL"
            " ELSE (10000 * top_count) div n_grams END AS BIGINT)"
        ).alias("top_share_bp"),
    ).orderBy("doc_id")


@query(
    "q_rep_bigram_census",
    oracle=f"WITH {_census_duck(2)} {_SHARES_DUCK}",
)
def q_rep_bigram_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.CC cc1 — the bigram repetition census: per doc, token and
    bigram-instance counts, distinct bigrams, instances of repeated
    bigrams, and the dup/top shares in truncated bp (NULL for a
    gram-less doc — both engines).

    Scale: explode → (doc, gram) partial-agg → per-doc reduce; the
    shuffle key spreads over corpus grams."""
    return _shares(_census_spark(spark, sf_dir, 2))


@query(
    "q_rep_trigram_coverage",
    oracle=f"WITH {_census_duck(3)} {_SHARES_DUCK}",
)
def q_rep_trigram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.CC cc2 — the trigram coverage census: cc1 at n = 3 —
    repeated trigrams flag templated spans that common-bigram noise
    (stopword pairs) misses; the screen reads both.

    Scale: identical pipeline, one fewer gram per doc."""
    return _shares(_census_spark(spark, sf_dir, 3))


@query(
    "q_rep_immediate_repeats",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    )
    SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tok,
           CAST(len(list_filter(range(1, len(t)),
                                i -> t[i] = t[i+1])) AS BIGINT)
             AS repeats,
           CAST(CASE WHEN len(t) < 2 THEN NULL
                ELSE (10000 * len(list_filter(range(1, len(t)),
                                              i -> t[i] = t[i+1])))
                     // (len(t) - 1) END AS BIGINT) AS repeat_share_bp,
           CAST(len(list_distinct(
                  list_transform(
                    list_filter(range(1, len(t)), i -> t[i] = t[i+1]),
                    i -> t[i]))) AS BIGINT) AS stuttered_tokens
    FROM toks ORDER BY doc_id
    """,
)
def q_rep_immediate_repeats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.CC cc3 — immediate repeats: adjacent equal tokens per doc
    ("the the"), their share of adjacent pairs, and how many distinct
    tokens stutter — computed entirely by array higher-order
    functions (filter/transform/array_distinct): no explode, no
    shuffle, whole-stage codegen over each token array in place.

    Scale: a single projection pass over documents."""
    docs = load_table(spark, sf_dir, "documents")
    rep_idx = (
        "filter(sequence(1, size(t) - 1),"
        " i -> element_at(t, i) = element_at(t, i + 1))"
    )
    return (
        docs.select("doc_id", F.expr("split(text, ' ')").alias("t"))
        .select(
            "doc_id",
            F.expr("CAST(size(t) AS BIGINT)").alias("n_tok"),
            F.expr(
                f"CAST(CASE WHEN size(t) < 2 THEN 0"
                f" ELSE size({rep_idx}) END AS BIGINT)"
            ).alias("repeats"),
            F.expr(
                f"CAST(CASE WHEN size(t) < 2 THEN NULL"
                f" ELSE (10000 * size({rep_idx})) div (size(t) - 1)"
                f" END AS BIGINT)"
            ).alias("repeat_share_bp"),
            F.expr(
                f"CAST(CASE WHEN size(t) < 2 THEN 0"
                f" ELSE size(array_distinct(transform({rep_idx},"
                f" i -> element_at(t, i)))) END AS BIGINT)"
            ).alias("stuttered_tokens"),
        )
        .orderBy("doc_id")
    )


@query(
    "q_rep_screen_by_source",
    oracle=f"""
    WITH {_census_duck(2)},
    shares AS (
      SELECT doc_id,
             CASE WHEN n_grams = 0 THEN NULL
                  ELSE (10000 * dup_instances) // n_grams END AS sh
      FROM census
    )
    SELECT d.source, CAST(count(*) AS BIGINT) AS docs,
           CAST(sum(CASE WHEN s.sh > 1000 THEN 1 ELSE 0 END) AS BIGINT)
             AS flagged,
           CAST((10000 * sum(CASE WHEN s.sh > 1000 THEN 1 ELSE 0 END))
                // count(*) AS BIGINT) AS flagged_share_bp,
           CAST(sum(COALESCE(s.sh, 0)) // count(*) AS BIGINT)
             AS mean_dup_share_bp
    FROM documents d JOIN shares s ON d.doc_id = s.doc_id
    GROUP BY 1 ORDER BY d.source
    """,
)
def q_rep_screen_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.CC cc4 — the per-source screen: documents each source would
    lose to the ``dup_share_bp > 1000`` rule (the documented
    threshold), the flagged share, and the mean dup share (NULL
    shares count 0 — a gram-less doc cannot be flagged).

    Scale: cc1's per-doc census joins the source attribute doc-grain
    (equi-join, AQE-decided) and reduces to ≤|sources| rows."""
    docs = load_table(spark, sf_dir, "documents")
    census = _census_spark(spark, sf_dir, 2).select(
        "doc_id",
        F.expr(
            "CASE WHEN n_grams = 0 THEN NULL"
            " ELSE (10000 * dup_instances) div n_grams END"
        ).alias("sh"),
    )
    return (
        docs.select("doc_id", "source")
        .join(census, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs"),
            F.expr(
                "CAST(sum(CASE WHEN sh > 1000 THEN 1 ELSE 0 END)"
                " AS BIGINT)"
            ).alias("flagged"),
            F.expr(
                "CAST((10000 * sum(CASE WHEN sh > 1000 THEN 1"
                " ELSE 0 END)) div count(*) AS BIGINT)"
            ).alias("flagged_share_bp"),
            F.expr(
                "CAST(sum(COALESCE(sh, 0)) div count(*) AS BIGINT)"
            ).alias("mean_dup_share_bp"),
        )
        .orderBy("source")
    )
