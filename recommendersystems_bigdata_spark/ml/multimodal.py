"""Multimodal-column operators (SURVEY.md §2.K k17 + the binary-column
mandate: treat image/audio/video as opaque binary + typed metadata).

The media libraries (PIL/librosa/ffmpeg) are not in this container, so the
*decode* step is stubbed (`decode_media`, clearly NotImplementedError) and
the pipeline runs a deterministic fake extractor instead — but every piece
of Spark plumbing is real: BinaryType columns, nested metadata structs,
Arrow-batched mapInPandas with iterator signature, and the fan-out/fan-in
partitioning a 100 TB media table needs (binary payloads never shuffle:
feature extraction is map-only, followed by an aggregate on small features).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.ml.vectors import l2_norm, sql_l2_norm
from recommendersystems_bigdata_spark.registry import query


@query(
    "q_multimodal_join",
    oracle=f"""
    SELECT d.lang, e.label,
           count(*) AS n_docs,
           round(avg(d.n_chars), 2) AS avg_chars,
           round(avg({sql_l2_norm('e.embedding')}), 6) AS avg_l2_norm
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    GROUP BY d.lang, e.label
    """,
)
def q_multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k17 — text ⋈ vector modality join on doc_id = vec_id, aggregated per
    (lang, label). One co-partitioned equi join; the embedding norm is
    computed pre-aggregation so the shuffle carries scalars."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        docs.join(emb, docs.doc_id == emb.vec_id)
        .groupBy("lang", "label")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
            F.round(F.avg(l2_norm(F.col("embedding"))), 6).alias("avg_l2_norm"),
        )
    )


def decode_media(payload: bytes, media_type: str):
    """Decode an image/audio/video payload into pixels/samples/frames.

    STUB — the decode libraries (PIL, librosa, pyav) are not available in
    this environment. The Spark-side contract (binary in, typed features
    out, batch-iterated through mapInPandas) is exercised by
    q_multimodal_features with a deterministic fake extractor instead.
    """
    raise NotImplementedError(
        f"media decode for {media_type!r} requires PIL/librosa/pyav; "
        "wire the real decoder here and q_multimodal_features picks it up"
    )


@query(
    "q_multimodal_features",
    oracle="""
    WITH media AS (
      SELECT doc_id,
             encode(text) AS payload,
             text,
             CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                  WHEN doc_id % 3 = 1 THEN 'audio/wav'
                  ELSE 'video/mp4' END AS media_type
      FROM documents
    )
    SELECT media_type,
           count(*) AS n_assets,
           CAST(sum(octet_length(payload)) AS BIGINT) AS total_bytes,
           round(avg(octet_length(payload)), 2) AS avg_bytes,
           -- DuckDB md5 takes VARCHAR only; payload is utf-8 of text, same digest
           CAST(min(length(md5(text))) AS BIGINT) AS digest_len
    FROM media
    GROUP BY media_type
    """,
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media pipeline: opaque payload + typed metadata → Arrow-batched
    feature extraction → per-modality aggregate.

    The payload is synthesized from text (utf-8 bytes) because no real
    media ships with the corpus; `decode_media` marks where a real decoder
    plugs in. mapInPandas sees genuine BinaryType Arrow batches and emits
    a small typed feature row per asset — the exact shape an image/audio
    extractor at 100 TB uses (map-only over payload partitions, shuffle
    only the extracted features).
    """
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
    )

    def extract(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            # deterministic fake extractor standing in for decode_media():
            # byte length + md5 digest length per asset
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "digest_len": payloads.map(
                        lambda b: len(hashlib.md5(bytes(b)).hexdigest())
                    ).astype("int64"),
                }
            )

    feats = media.mapInPandas(
        extract, "doc_id long, media_type string, n_bytes long, digest_len long"
    )
    return feats.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
        F.round(F.avg("n_bytes"), 2).alias("avg_bytes"),
        F.min("digest_len").cast("long").alias("digest_len"),
    )
