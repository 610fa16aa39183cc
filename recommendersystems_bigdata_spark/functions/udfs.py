"""UDF / UDAF / UDTF surface (SURVEY.md §2.J j1–j6).

Python-boundary operators, each with a deterministic spec so the DuckDB
oracle still applies. Performance doctrine (SURVEY.md §4): row-at-a-time
Python UDFs (j1) exist to *measure* the boundary cost — everything else
uses Arrow-vectorized pandas UDFs (j2/j3), grouped-map `applyInPandas`
(j4), iterator `mapInPandas` (j5), or a Python UDTF (j6). None of these
belongs in a bench-gated hot path when a built-in expression exists; the
scalar twins live in functions/scalars.py and ml/vectors.py.

Worker-bound callables are *nested defs* (cloudpickle serializes them by
value): module-level functions would need this package importable on the
executors' Python workers, which the driver contract does not guarantee.

Numeric hygiene: every float aggregate is rounded on both sides; j4's
event gaps are computed in integer microseconds end-to-end so the
pandas/DuckDB float summation order cannot diverge.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query


@query(
    "q_udf_python",
    oracle="""
    SELECT p_partkey, p_retailprice,
           CASE WHEN p_retailprice < 950 THEN 'budget'
                WHEN p_retailprice < 1450 THEN 'standard'
                ELSE 'premium' END AS band
    FROM part
    """,
)
def q_udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j1 — row-at-a-time Python UDF (price banding).

    The plan inserts BatchEvalPython: rows are pickled to a forked Python
    worker, breaking whole-stage codegen. The native twin is q_cond's
    CASE WHEN — this query exists to keep the slow path exercised and
    measured, not to recommend it.
    """

    def band(price: float) -> str:
        if price < 950:
            return "budget"
        if price < 1450:
            return "standard"
        return "premium"

    band_udf = F.udf(band, StringType())
    return load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", band_udf("p_retailprice").alias("band")
    )


@query(
    "q_udf_pandas_scalar",
    oracle="""
    SELECT vec_id, label,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm
    FROM embeddings
    """,
)
def q_udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j2 — Arrow-vectorized scalar pandas UDF: L2 norm via numpy.

    ArrowEvalPython ships whole record batches (no per-row pickling);
    numpy does the math in C. The pure-Catalyst twin is q_arr_hof —
    identical output, which the shared oracle asserts.
    """

    @F.pandas_udf(DoubleType())
    def l2_norm_np(emb):
        import numpy as np

        return emb.map(
            lambda a: round(float(np.sqrt(np.sum(np.asarray(a, dtype="float64") ** 2))), 6)
        )

    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", l2_norm_np("embedding").alias("l2_norm")
    )


@query(
    "q_udaf_pandas_agg",
    oracle="""
    WITH ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value ASC, event_id ASC) AS rn_a,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id DESC) AS rn_d,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_type,
           round(avg(value), 4) AS trimmed_mean_value,
           count(*) AS n_kept
    FROM ranked
    WHERE rn_a > CAST(floor(n * 0.1) AS BIGINT)
      AND rn_d > CAST(floor(n * 0.1) AS BIGINT)
    GROUP BY event_type
    """,
)
def q_udaf_pandas_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j3 — grouped-aggregate pandas UDF: 10% trimmed mean of value per
    event_type.

    Spec chosen to be tie-independent: dropping the k = ⌊n·0.1⌋ smallest
    and largest *values* (as a multiset) yields the same kept multiset
    under any tie-break, so the window-rank SQL twin matches exactly.
    """

    @F.pandas_udf(DoubleType())
    def trimmed_mean(v: pd.Series) -> float:
        k = int(len(v) * 0.1)
        kept = v.sort_values().iloc[k : len(v) - k]
        return round(float(kept.mean()), 4)

    @F.pandas_udf(LongType())
    def trimmed_count(v: pd.Series) -> int:
        k = int(len(v) * 0.1)
        return len(v) - 2 * k

    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            trimmed_mean("value").alias("trimmed_mean_value"),
            trimmed_count("value").alias("n_kept"),
        )
    )


@query(
    "q_udtf_grouped_map",
    oracle="""
    WITH g AS (
      SELECT user_id,
             epoch_us(CAST(ts AS TIMESTAMP))
               - lag(epoch_us(CAST(ts AS TIMESTAMP)))
                 OVER (PARTITION BY user_id
                       ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC) AS gap_us
      FROM events
    )
    SELECT user_id,
           count(*) AS n_events,
           round(avg(gap_us) / 1000000, 4) AS avg_gap_s,
           round(CAST(max(gap_us) AS DOUBLE) / 1000000, 4) AS max_gap_s
    FROM g
    GROUP BY user_id
    """,
)
def q_udtf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j4 — grouped-map `applyInPandas`: per-user inter-event gap stats.

    Each user's events arrive as one pandas frame (shuffle on user_id —
    the same key a 100 TB deployment would bucket by); gaps are integer
    microseconds so float summation order can't diverge from the SQL twin.
    """
    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("avg_gap_s", DoubleType()),
            StructField("max_gap_s", DoubleType()),
        ]
    )

    def gap_stats(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["ts", "event_id"])
        us = pdf["ts"].astype("datetime64[us]").astype("int64")
        gaps = us.diff().dropna()
        if len(gaps):
            avg_gap = round(float(gaps.mean()) / 1e6, 4)
            max_gap = round(float(gaps.max()) / 1e6, 4)
        else:
            avg_gap = max_gap = None
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [len(pdf)],
                "avg_gap_s": [avg_gap],
                "max_gap_s": [max_gap],
            }
        )

    events = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    return events.groupBy("user_id").applyInPandas(gap_stats, schema)


@query(
    "q_mapinpandas_clean",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS clean_text,
           CAST(length(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
                AS BIGINT) AS clean_len,
           CAST(len(list_filter(
                string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                x -> x <> '')) AS BIGINT) AS n_tokens
    FROM documents
    """,
)
def q_mapinpandas_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j5 — iterator `mapInPandas`: batch-wise text normalization.

    Map-only (no shuffle): lowercase, collapse non-alphanumerics to single
    spaces, emit cleaned text + length + token count per document. The
    iterator signature streams Arrow batches, so a 100 TB corpus never
    materializes per-partition.
    """
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("clean_text", StringType()),
            StructField("clean_len", LongType()),
            StructField("n_tokens", LongType()),
        ]
    )

    def clean_batches(batches):
        import re

        import pandas as pd

        pattern = re.compile(r"[^a-z0-9]+")
        for pdf in batches:
            clean = pdf["text"].map(lambda t: pattern.sub(" ", t.lower()).strip())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "clean_text": clean,
                    "clean_len": clean.str.len().astype("int64"),
                    "n_tokens": clean.map(lambda t: len([x for x in t.split(" ") if x])).astype(
                        "int64"
                    ),
                }
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInPandas(clean_batches, schema)


@query(
    "q_udtf_topn_tokens",
    oracle="""
    WITH toks AS (
      SELECT doc_id, t.token
      FROM documents,
           unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
             AS t(token)
    ),
    counts AS (
      SELECT doc_id, token, count(*) AS cnt FROM toks GROUP BY doc_id, token
    )
    SELECT doc_id, token, cnt, CAST(rn AS BIGINT) AS token_rank
    FROM (
      SELECT doc_id, token, cnt,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY cnt DESC, token ASC) AS rn
      FROM counts
    ) WHERE rn <= 3
    """,
)
def q_udtf_topn_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j6 — Python UDTF (Spark 4 `udtf`): top-3 tokens per document via a
    LATERAL table function.

    One input row fans out to ≤3 output rows; tokenization is a plain
    single-space split (matching the SQL twin exactly), ranking by
    (count desc, token asc) is tie-free. ``useArrow=True`` makes this an
    Arrow-batched UDTF (ArrowEvalPythonUDTF): the eval loop is still
    per-row by UDTF contract, but row transfer is columnar — keeping j1
    the registry's only row-pickled Python boundary (plan-asserted).
    """
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="doc_id bigint, token string, cnt bigint, token_rank bigint",
        useArrow=True,
    )
    class TopTokens:
        def eval(self, doc_id: int, text: str):
            from collections import Counter

            counts = Counter(t for t in text.lower().split(" ") if t)
            ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            for rank, (token, cnt) in enumerate(ranked[:3], start=1):
                yield doc_id, token, cnt, rank

    spark.udtf.register("topn_tokens", TopTokens)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("udtf_docs")
    return spark.sql(
        "SELECT t.doc_id, t.token, t.cnt, t.token_rank "
        "FROM udtf_docs, LATERAL topn_tokens(doc_id, text) t"
    )
