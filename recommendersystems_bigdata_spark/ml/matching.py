"""Record matching / asymmetric similarity (SURVEY.md §2.P, round 8):
SymSpell-blocked fuzzy key join and containment-based near-dup triage.

Two operator classes the dedup family (§2.K/§2.L) does not cover:

* **Fuzzy JOIN on strings** — matching corrupted/typo'd keys back to a
  canonical registry is entity resolution, not dedup: the output is
  (dirty key, canonical key) pairs, and the algorithmic content is the
  BLOCKING scheme that avoids the brute-force n×m Levenshtein matrix.
  The blocked result is provably IDENTICAL to brute force at edit
  distance ≤ 1 (symmetric-delete completeness), and the DuckDB oracle
  IS the brute force — so the hash check certifies the equivalence on
  real data, not just the speedup.
* **Asymmetric containment** — Jaccard misses subset duplication (a
  short doc quoted whole inside a long one scores low symmetric
  similarity but 100% containment). Containment = |A∩B| / min(|A|,|B|)
  is the LLM-curation screen for quote inclusion and boilerplate
  swallowing; reported in exact integer basis points.

Determinism discipline: match distances, shared-token counts and the
containment ratio are integers (truncating div on non-negative
operands, identical on both engines); the corrupted strings are a pure
function of the key (deterministic typo position), so both engines
derive the identical dirty batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query

# Spark + DuckDB spellings of the canonical registry string and its
# deterministically-corrupted variant (delete the char at 0-based index
# key mod length — every dirty string is exactly one deletion from its
# source, and the position varies across the batch).
_CS_SPARK = "concat(split(p_name, ' ')[0], '#', CAST(p_partkey AS STRING))"
_CS_DUCK = "string_split(p_name, ' ')[1] || '#' || CAST(p_partkey AS VARCHAR)"


def _dirty_expr(cs: str, key: str) -> str:
    """Delete the char at 0-based position ``key mod length(cs)`` —
    identical substring semantics on Spark and DuckDB (1-based, 3-arg)."""
    m = f"({key} % length({cs}))"
    return (
        f"concat(substring({cs}, 1, {m}), "
        f"substring({cs}, {m} + 2, length({cs})))"
    )


def deletion_keys(s_col: str) -> str:
    """SymSpell blocking keys for max edit distance 1: the string itself
    plus every single-char deletion (Spark SQL expression). Two strings
    within Levenshtein 1 ALWAYS share a key: equality shares the string,
    a deletion/insertion pair shares the shorter string, a substitution
    pair shares the deletion at the substituted position — so the
    blocked join loses no pair (the completeness the oracle certifies)."""
    return (
        f"array_union(array({s_col}), "
        f"transform(sequence(1, length({s_col})), "
        f"i -> concat(substring({s_col}, 1, i - 1), "
        f"substring({s_col}, i + 1, length({s_col})))))"
    )


@query(
    "q_fuzzy_join_symspell",
    oracle=f"""
    WITH clean AS (
      SELECT p_partkey AS ckey, {_CS_DUCK} AS cs FROM part
    ),
    dirty AS (
      SELECT ckey AS dkey, {_dirty_expr('cs', 'ckey')} AS ds
      FROM clean WHERE ckey % 3 = 0
    )
    SELECT d.dkey, c.ckey, CAST(levenshtein(d.ds, c.cs) AS BIGINT) AS dist
    FROM dirty d JOIN clean c ON levenshtein(d.ds, c.cs) <= 1
    """,
)
def q_fuzzy_join_symspell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p1 — SymSpell-blocked fuzzy join (edit distance ≤ 1) of a corrupted
    key batch against the canonical part registry.

    The dirty batch is every third registry string with one
    deterministically-positioned character deleted; the join must
    recover (dirty, canonical) pairs within Levenshtein 1 — each dirty
    row's own source, plus any true near-collisions between distinct
    registry entries. The engine path NEVER evaluates the n×m distance
    matrix: both sides explode into symmetric-delete blocking keys
    (string + every 1-deletion, L+1 keys per string), candidates come
    from a bucketed equi-join on the key, and Levenshtein runs only on
    the deduped candidates. The DuckDB oracle IS the brute-force n×m
    join, so the hash match certifies blocked ≡ naive on the data —
    symmetric-delete completeness at distance 1, not just recall.

    Scale design: key explosion is O(n·L) rows (L ≈ string length), the
    candidate join shuffles on the deletion key whose bucket sizes are
    ~1 for keyed strings (the '#key' suffix keeps them near-unique; a
    natural-language registry would cap degenerate buckets exactly as
    band_candidates does for MinHash), and the exact verify is
    candidate-bounded. Brute force is O(n·m) distance evaluations —
    at a 10⁹-row registry the blocked plan is the only one that
    finishes. Raising the edit budget to 2 is the same plan with
    2-deletion keys (L² growth), the standard SymSpell trade."""
    clean = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("ckey"), F.expr(_CS_SPARK).alias("cs")
    )
    dirty = clean.filter(F.col("ckey") % 3 == 0).select(
        F.col("ckey").alias("dkey"), F.expr(_dirty_expr("cs", "ckey")).alias("ds")
    )
    ck = clean.select(
        "ckey", "cs", F.explode(F.expr(deletion_keys("cs"))).alias("bk")
    )
    dk = dirty.select(
        "dkey", "ds", F.explode(F.expr(deletion_keys("ds"))).alias("bk")
    )
    cand = (
        dk.join(ck, "bk")
        .select("dkey", "ds", "ckey", "cs")
        .distinct()
    )
    # Threshold (banded) levenshtein — identical values for surviving
    # rows, −1 only above the budget, which the filter can never admit
    # (round 11; see q_str_levenshtein's note).
    dist = F.levenshtein("ds", "cs", 1)
    return cand.filter((dist >= 0) & (dist <= 1)).select(
        "dkey", "ckey", dist.cast("long").alias("dist")
    )


_CONTAIN_BP = 8000  # containment ≥ 0.80


@query(
    "q_dedup_containment",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang,
             unnest(list_distinct(list_filter(string_split(text, ' '),
                                              t -> t <> ''))) AS t
      FROM documents
    ),
    sizes AS (SELECT doc_id, count(*) AS n_tok FROM tok GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
      FROM tok a JOIN tok b
        ON a.lang = b.lang AND a.t = b.t AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_shared,
           CAST(least(sa.n_tok, sb.n_tok) AS BIGINT) AS n_small,
           CAST((10000 * n_shared) // least(sa.n_tok, sb.n_tok) AS BIGINT)
               AS containment_bp
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE (10000 * n_shared) // least(sa.n_tok, sb.n_tok) >= {_CONTAIN_BP}
    """,
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p2 — asymmetric containment screen (≥ 0.80), lang-blocked: doc
    pairs where the SMALLER token set is ≥ 80% contained in the larger.
    Catches what every symmetric measure in §2.K/§2.L structurally
    misses — a short document quoted wholesale inside a long one has
    Jaccard ≈ |A|/|B| (arbitrarily low) but containment 1.0; in
    LLM-curation terms this is the quote-inclusion / boilerplate-
    swallowing screen that decides KEEP-the-superset where the Jaccard
    pass would keep both. Containment is an exact integer basis-point
    cross-multiply (truncating div on non-negative operands — identical
    on both engines), so the hash compare is exact, unlike a rounded
    float ratio.

    Scale design: the same inverted-index shape as k13's exact Jaccard
    (explode distinct tokens → posting-list self-join blocked on lang →
    per-pair shared counts), so cost is Σ posting-list², not n². At
    100 TB the standard tightening is the PPJoin prefix filter — order
    tokens by global frequency and index only each doc's first
    ⌈(1−t)·|A|⌉+1 tokens, which preserves exactly the ≥ t containment
    pairs while shrinking posting lists — a drop-in replacement for the
    explode above; the banded-MinHash generator (l17) is the wrong tool
    here because low-Jaccard/high-containment pairs land outside its
    candidate set by design."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = F.array_distinct(F.filter(F.split("text", " "), lambda t: t != ""))
    tok = docs.select("doc_id", "lang", F.explode(tokens).alias("t"))
    sizes = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    a, b = tok.alias("a"), tok.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.t") == F.col("b.t"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_tok").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_tok").alias("nb"))
    joined = inter.join(sa, "doc_a").join(sb, "doc_b").select(
        "doc_a",
        "doc_b",
        "n_shared",
        F.least("na", "nb").cast("long").alias("n_small"),
        F.expr("CAST((10000 * n_shared) div least(na, nb) AS BIGINT)").alias(
            "containment_bp"
        ),
    )
    return joined.filter(F.col("containment_bp") >= _CONTAIN_BP)


# Jaccard threshold for p3, in basis points (0.8). The prefix length
# below hardcodes the exact-rational spelling of ceil(0.8·n).
_PPJOIN_BP = 8000


@query(
    "q_ppjoin_jaccard",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang,
             unnest(list_distinct(list_filter(string_split(text, ' '),
                                              t -> t <> ''))) AS t
      FROM documents
    ),
    sizes AS (SELECT doc_id, count(*) AS n_tok FROM tok GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
      FROM tok a JOIN tok b
        ON a.lang = b.lang AND a.t = b.t AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_shared,
           CAST(sa.n_tok + sb.n_tok - n_shared AS BIGINT) AS n_union,
           CAST((10000 * n_shared) // (sa.n_tok + sb.n_tok - n_shared)
                AS BIGINT) AS jaccard_bp
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE (10000 * n_shared) // (sa.n_tok + sb.n_tok - n_shared) >= 8000
    """,
)
def q_ppjoin_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p3 — PPJoin-style prefix-filtered set-similarity self-join:
    lang-blocked doc pairs with token-set Jaccard ≥ 0.80, computed the
    way a 100 TB deployment must — candidates come only from PREFIX
    posting lists, never the full inverted index. This implements the
    tightening p2's docstring promises: order each doc's distinct
    tokens by ascending global (lang, token) document frequency (ties
    by token string) and index only the first
    ``|x| − ⌈t·|x|⌉ + 1`` tokens. Correctness of the filter: J(A,B) ≥ t
    forces |A∩B| ≥ t·max(|A|,|B|) (since J ≤ min/max, so min ≥ t·max),
    and the overlap prefix lemma then guarantees the two prefixes share
    a token (Chaudhuri et al., ICDE 2006; Bayardo et al., WWW 2007;
    Xiao et al., WWW 2008 — PPJoin). ⌈0.8n⌉ is the exact integer
    ``(4n + 4) div 5``, so the prefix boundary is engine-identical.
    **The oracle is the full brute-force posting-list join** — the hash
    match certifies prefix-filtered ≡ exhaustive on real data (the p1
    certification pattern), not merely that the fast path is fast.

    Scale: the full index explodes Σ|doc| tokens, but the JOIN runs
    only on prefix rows — rare-token-first ordering makes prefix
    posting lists the shortest ones, collapsing the Σdf² join cost on
    corpora where most token-sharing pairs are NOT near-dups. Two
    honest measured findings (SCALE.md): on THIS near-dup-dense
    synthetic corpus the filter prunes almost nothing (32.5k candidates
    vs 33.5k brute-force token-sharing pairs at sf0.01 — nearly every
    pair is a true near-dup, so no candidate filter has anything to
    remove), and the output itself grows as Σ cluster² with sf
    (output-bound 18.7× wall for 95× more qualifying pairs at 10×
    docs) — which is why at 100 TB mega-clusters go through
    q_dedup_clusters (one component id per doc) and p3 serves as the
    exact-pair PRIMITIVE. Verify is candidate-bounded (distinct-deduped
    so counts cannot inflate); no nested loop (plan-asserted). All
    ratios exact integer basis points."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = F.array_distinct(F.filter(F.split("text", " "), lambda t: t != ""))
    tok = docs.select("doc_id", "lang", F.explode(tokens).alias("t"))
    dfreq = tok.groupBy("lang", "t").agg(F.count(F.lit(1)).alias("df"))

    from pyspark.sql import Window

    w_doc = Window.partitionBy("doc_id").orderBy("df", "t")
    w_cnt = Window.partitionBy("doc_id")
    ranked = (
        tok.join(dfreq, ["lang", "t"])
        .withColumn("pos", F.row_number().over(w_doc))
        .withColumn("n_tok", F.count(F.lit(1)).over(w_cnt))
    )
    # prefix length |x| - ceil(0.8|x|) + 1, all-integer
    prefix = ranked.filter(
        F.col("pos") <= F.col("n_tok") - F.expr("(4 * n_tok + 4) div 5") + 1
    ).select("doc_id", "lang", "t")
    pa, pb = prefix.alias("pa"), prefix.alias("pb")
    cand = (
        pa.join(
            pb,
            (F.col("pa.lang") == F.col("pb.lang"))
            & (F.col("pa.t") == F.col("pb.t"))
            & (F.col("pa.doc_id") < F.col("pb.doc_id")),
        )
        .select(
            F.col("pa.doc_id").alias("doc_a"), F.col("pb.doc_id").alias("doc_b")
        )
        .distinct()
    )
    ta = tok.select(F.col("doc_id").alias("doc_a"), F.col("t").alias("t"))
    tb = tok.select(F.col("doc_id").alias("b_id"), F.col("t").alias("tb"))
    shared = (
        cand.join(ta, "doc_a")
        .join(tb, (F.col("doc_b") == F.col("b_id")) & (F.col("t") == F.col("tb")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sizes = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_tok").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_tok").alias("nb"))
    return (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            F.expr("CAST(na + nb - n_shared AS BIGINT)").alias("n_union"),
            F.expr(
                "CAST((10000 * n_shared) div (na + nb - n_shared) AS BIGINT)"
            ).alias("jaccard_bp"),
        )
        .filter(F.col("jaccard_bp") >= _PPJOIN_BP)
    )
