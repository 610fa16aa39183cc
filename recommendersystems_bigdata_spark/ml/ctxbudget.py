"""Context-window budget analytics (SURVEY.md §2.BL, round 9).

The "how much of this corpus fits a model's context window" planning
family over the document corpus, beside §2.L's chunker (q_text_chunk)
and packer (q_docs_pack): before launching a 100 TB tokenize-and-pack
job, a pipeline owner needs the truncation loss at each candidate
context length, the padding bill of fixed-length batching, the chunk
fan-out of a sliding tokenizer, and the length-coverage curve that
picks the window in the first place.

Token counts reuse §2.K's whitespace convention EXACTLY
(``size(filter(split(text,' '), t -> t != ''))`` — the same expression
q_text_stats/q_docs_pack aggregate), so every budget here is
consistent with the rest of the document pipeline. The ladder rungs
(16/32/48/64/96/128, else 256) and candidate lengths (16/32/64/128)
are config defaults sized to the corpus's 10–99-token documents; the
operators are parametric in the same CASE-ladder device at any scale.

Exactness: token counts are exact integers; losses/waste are sums of
``greatest``/``least`` of integers; every share is a truncating
division of non-negative integers (Spark ``div`` ≡ DuckDB ``//``).

Spark-first shape, sized for 100 TB: every query is ONE map-side
projection of the per-document token count (no token explode — the
count never materializes the token relation) partial-aggregated to a
bounded census (4 candidate lengths, ≤7 ladder rungs, ≤⌈max_tok/32⌉
chunk counts); grand totals ride 1-row broadcasts or live in the same
aggregate row; bl1 computes all four candidate lengths in ONE pass
via conditional sums and unpivots the 1-row result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query

_TOK_SPARK = "size(filter(split(text, ' '), t -> t != ''))"
_TOK_DUCK = "len(list_filter(string_split(text, ' '), t -> t <> ''))"

_CTX_LENGTHS = (16, 32, 64, 128)

_LADDER = (16, 24, 32, 48, 64, 96, 128)
_CAP_CASE = (
    "CASE "
    + " ".join(f"WHEN tok <= {c} THEN {c}" for c in _LADDER)
    + " ELSE 256 END"
)

_CHUNK = 32


def _doc_tok(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "source", F.expr(f"CAST({_TOK_SPARK} AS BIGINT)").alias("tok")
    )


@query(
    "q_ctx_truncation_loss",
    oracle=f"""
    WITH dt AS (
      SELECT CAST({_TOK_DUCK} AS BIGINT) AS tok FROM documents
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(tok) AS BIGINT) AS tokens_total,
             {", ".join(
               f"CAST(count(*) FILTER (WHERE tok > {L}) AS BIGINT)"
               f" AS over_{L}, "
               f"CAST(sum(greatest(tok - {L}, 0)) AS BIGINT) AS lost_{L}"
               for L in _CTX_LENGTHS)}
      FROM dt
    )
    {" UNION ALL ".join(
      f"SELECT {L} AS ctx_len, over_{L} AS docs_over, lost_{L} AS tokens_lost,"
      f" tokens_total,"
      f" CAST((10000 * lost_{L}) // tokens_total AS BIGINT) AS loss_bp,"
      f" CAST((10000 * over_{L}) // n_docs AS BIGINT) AS docs_over_bp"
      f" FROM agg" for L in _CTX_LENGTHS)}
    ORDER BY ctx_len
    """,
)
def q_ctx_truncation_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BL bl1 — the truncation-loss table: for each candidate
    context length, how many documents exceed it, the exact token count
    a hard truncation discards, and the loss/affected shares in bp. All
    four candidates come from ONE conditional-sum pass — no per-length
    rescan — then a 4-row unpivot of the single aggregate row.

    Scale: one map-side token-count projection (no token explode)
    into one partial-aggregated row; the unpivot is driver-free."""
    dt = _doc_tok(spark, sf_dir)
    agg = dt.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("tok").cast("long").alias("tokens_total"),
        *[
            c
            for L in _CTX_LENGTHS
            for c in (
                F.count_if(F.col("tok") > L).cast("long").alias(f"over_{L}"),
                F.expr(f"CAST(sum(greatest(tok - {L}, 0)) AS BIGINT)").alias(
                    f"lost_{L}"
                ),
            )
        ],
    )
    stack = ", ".join(
        f"{L}L, over_{L}, lost_{L}" for L in _CTX_LENGTHS
    )
    return (
        agg.select(
            F.expr(
                f"stack({len(_CTX_LENGTHS)}, {stack})"
                " AS (ctx_len, docs_over, tokens_lost)"
            ),
            "tokens_total",
            "n_docs",
        )
        .select(
            "ctx_len",
            "docs_over",
            "tokens_lost",
            "tokens_total",
            F.expr(
                "CAST((10000 * tokens_lost) div tokens_total AS BIGINT)"
            ).alias("loss_bp"),
            F.expr("CAST((10000 * docs_over) div n_docs AS BIGINT)").alias(
                "docs_over_bp"
            ),
        )
        .orderBy("ctx_len")
    )


@query(
    "q_ctx_padding_waste",
    oracle=f"""
    WITH dt AS (
      SELECT CAST({_TOK_DUCK} AS BIGINT) AS tok FROM documents
    ),
    b AS (
      SELECT CAST({_CAP_CASE} AS BIGINT) AS bucket_cap, tok FROM dt
    )
    SELECT bucket_cap, CAST(count(*) AS BIGINT) AS docs,
           CAST(sum(least(tok, bucket_cap)) AS BIGINT) AS tokens_kept,
           CAST(sum(greatest(bucket_cap - tok, 0)) AS BIGINT) AS pad_tokens,
           CAST(sum(greatest(tok - bucket_cap, 0)) AS BIGINT) AS trunc_tokens,
           CAST((10000 * sum(greatest(bucket_cap - tok, 0)))
                // (count(*) * bucket_cap) AS BIGINT) AS pad_share_bp
    FROM b GROUP BY bucket_cap ORDER BY bucket_cap
    """,
)
def q_ctx_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BL bl2 — the fixed-length batching bill: documents bucketed
    to the smallest ladder rung that holds them (the standard
    length-bucketed batching scheme), and per rung the exact tokens
    kept, the padding tokens a rectangular batch burns, the truncation
    overflow of the top rung, and padding as a share of the rung's
    slot capacity (docs × cap) in bp — the table that justifies (or
    kills) adding a rung.

    Scale: map-side CASE ladder into a ≤8-row census; no joins."""
    dt = _doc_tok(spark, sf_dir)
    b = dt.select(F.expr(f"CAST({_CAP_CASE} AS BIGINT)").alias("bucket_cap"), "tok")
    return (
        b.groupBy("bucket_cap")
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs"),
            F.expr("CAST(sum(least(tok, bucket_cap)) AS BIGINT)").alias(
                "tokens_kept"
            ),
            F.expr(
                "CAST(sum(greatest(bucket_cap - tok, 0)) AS BIGINT)"
            ).alias("pad_tokens"),
            F.expr(
                "CAST(sum(greatest(tok - bucket_cap, 0)) AS BIGINT)"
            ).alias("trunc_tokens"),
        )
        .select(
            "bucket_cap",
            "docs",
            "tokens_kept",
            "pad_tokens",
            "trunc_tokens",
            F.expr(
                "CAST((10000 * pad_tokens) div (docs * bucket_cap) AS BIGINT)"
            ).alias("pad_share_bp"),
        )
        .orderBy("bucket_cap")
    )


@query(
    "q_ctx_chunk_fanout",
    oracle=f"""
    WITH dt AS (
      SELECT CAST({_TOK_DUCK} AS BIGINT) AS tok FROM documents
    ),
    c AS (
      SELECT greatest(1, (tok + {_CHUNK} - 1) // {_CHUNK}) AS chunks, tok
      FROM dt
    ),
    census AS (
      SELECT chunks, CAST(count(*) AS BIGINT) AS docs,
             CAST(sum(tok) AS BIGINT) AS input_tokens,
             CAST(sum(chunks * {_CHUNK} - tok) AS BIGINT) AS slack_tokens
      FROM c GROUP BY chunks
    ),
    tot AS (
      SELECT CAST(sum(chunks * docs) AS BIGINT) AS total_chunks FROM census
    )
    SELECT chunks, docs, input_tokens, slack_tokens,
           CAST((10000 * chunks * docs) // total_chunks AS BIGINT)
             AS chunk_share_bp
    FROM census, tot ORDER BY chunks
    """,
)
def q_ctx_chunk_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BL bl3 — the chunk fan-out census for a non-overlapping
    32-token chunker (``_CHUNK``): per chunks-per-document value,
    document count, exact input tokens, the last-chunk slack a
    rectangular chunk store wastes, and the value's share of all
    produced chunks in bp (empty documents still produce one chunk —
    ``greatest(1,·)`` — matching q_text_chunk's keep-every-doc
    contract). This is the row-count forecast for the downstream
    chunk table.

    Scale: map-side ceil-division into a ≤⌈max_tok/32⌉-row census;
    the chunk total rides a 1-row broadcast."""
    dt = _doc_tok(spark, sf_dir)
    # localCheckpoint pins the ≤⌈max_tok/32⌉-row census so the total
    # leg reads it instead of replaying the fact scan — one scan total
    census = (
        dt.select(
            F.expr(
                f"greatest(1, (tok + {_CHUNK} - 1) div {_CHUNK})"
            ).alias("chunks"),
            "tok",
        )
        .groupBy("chunks")
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs"),
            F.sum("tok").cast("long").alias("input_tokens"),
            F.expr(
                f"CAST(sum(chunks * {_CHUNK} - tok) AS BIGINT)"
            ).alias("slack_tokens"),
        )
        .localCheckpoint()
    )
    tot = census.agg(
        F.expr("CAST(sum(chunks * docs) AS BIGINT)").alias("total_chunks")
    )
    return (
        census.crossJoin(F.broadcast(tot))
        .select(
            "chunks",
            "docs",
            "input_tokens",
            "slack_tokens",
            F.expr(
                "CAST((10000 * chunks * docs) div total_chunks AS BIGINT)"
            ).alias("chunk_share_bp"),
        )
        .orderBy("chunks")
    )


@query(
    "q_ctx_length_coverage",
    oracle=f"""
    WITH dt AS (
      SELECT CAST({_TOK_DUCK} AS BIGINT) AS tok FROM documents
    ),
    census AS (
      SELECT CAST({_CAP_CASE} AS BIGINT) AS cap,
             CAST(count(*) AS BIGINT) AS docs,
             CAST(sum(tok) AS BIGINT) AS tokens
      FROM dt GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(docs) AS BIGINT) AS tot_docs,
             CAST(sum(tokens) AS BIGINT) AS tot_tokens
      FROM census
    )
    SELECT cap, docs, tokens,
           CAST((10000 * sum(docs) OVER w) // tot_docs AS BIGINT)
             AS doc_coverage_bp,
           CAST((10000 * sum(tokens) OVER w) // tot_tokens AS BIGINT)
             AS token_coverage_bp
    FROM census, tot
    WINDOW w AS (ORDER BY cap ROWS UNBOUNDED PRECEDING)
    ORDER BY cap
    """,
)
def q_ctx_length_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.BL bl4 — the length-coverage curve: the ladder-rung histogram
    of document token lengths with CUMULATIVE document and token
    coverage in bp — "a 64-token window covers X% of documents but only
    Y% of tokens", the curve that picks the context length bl1 then
    prices. The cumulative window runs over the ≤8-row census only.

    Scale: one map-side ladder pass to the bounded census; totals ride
    a 1-row broadcast; the only window is census-side."""
    dt = _doc_tok(spark, sf_dir)
    # localCheckpoint pins the ≤8-row census so the totals leg reads
    # it instead of replaying the fact scan — one scan total
    census = (
        dt.groupBy(F.expr(f"CAST({_CAP_CASE} AS BIGINT)").alias("cap"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs"),
            F.sum("tok").cast("long").alias("tokens"),
        )
        .localCheckpoint()
    )
    tot = census.agg(
        F.sum("docs").cast("long").alias("tot_docs"),
        F.sum("tokens").cast("long").alias("tot_tokens"),
    )
    return (
        census.crossJoin(F.broadcast(tot))
        .select(
            "cap",
            "docs",
            "tokens",
            F.expr(
                f"CAST((10000 * sum(docs) OVER (ORDER BY cap"
                f" ROWS UNBOUNDED PRECEDING)) div tot_docs AS BIGINT)"
            ).alias("doc_coverage_bp"),
            F.expr(
                f"CAST((10000 * sum(tokens) OVER (ORDER BY cap"
                f" ROWS UNBOUNDED PRECEDING)) div tot_tokens AS BIGINT)"
            ).alias("token_coverage_bp"),
        )
        .orderBy("cap")
    )
