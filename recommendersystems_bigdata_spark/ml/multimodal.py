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


@query(
    "q_multimodal_frames",
    oracle="""
    WITH f AS (
      SELECT lang, text,
             unnest(generate_series(0, CAST(floor((length(text) - 1) / 32.0) AS INT), 4)) AS idx
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_frames,
           round(avg(length(substring(text, idx * 32 + 1, 32))), 4) AS avg_frame_len,
           round(avg(ascii(substring(text, idx * 32 + 1, 1))), 4) AS avg_first_code
    FROM f
    GROUP BY lang
    """,
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over an opaque payload: chunk into fixed 32-byte
    frames, keep every 4th (the video-keyframe access pattern), extract a
    per-frame feature, aggregate per group.

    Entirely JVM-side — `sequence` builds the sampled frame index list and
    `explode` fans out one row per kept frame, so frame fan-out happens
    inside whole-stage codegen with no Python in the row path. A real
    video table swaps `substring` for a decode UDF (`decode_media`); the
    partitioning story is identical: fan-out is map-only, only the small
    per-frame features reach the shuffle. (Corpus text is verified ASCII,
    so char positions == byte positions on both engines.)
    """
    docs = load_table(spark, sf_dir, "documents")
    frames = docs.select(
        "lang",
        "text",
        F.explode(
            F.sequence(
                F.lit(0),
                F.floor((F.length("text") - 1) / 32.0).cast("int"),
                F.lit(4),
            )
        ).alias("idx"),
    )
    frame = F.substring(F.col("text"), F.col("idx") * 32 + 1, 32)
    return frames.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_frames"),
        F.round(F.avg(F.length(frame)), 4).alias("avg_frame_len"),
        F.round(F.avg(F.ascii(F.substring(F.col("text"), F.col("idx") * 32 + 1, 1))), 4).alias(
            "avg_first_code"
        ),
    )


@query(
    "q_media_resize",
    oracle="""
    WITH s AS (
      SELECT doc_id, text,
             unnest(generate_series(1, length(text), 8)) AS pos
      FROM documents
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS resized_len,
           CAST(sum(ascii(substring(text, pos, 1))) % 997 AS BIGINT) AS checksum
    FROM s
    GROUP BY doc_id
    """,
)
def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/downsample plumbing: stride-8 byte subsampling of a binary
    payload through an Arrow-batched iterator UDF (binary in → small typed
    features out), the same batch shape an image resize kernel uses.

    mapInPandas keeps the payload inside its scan partition — resize is
    map-only; nothing but (doc_id, len, checksum) is ever shuffled. A real
    image pipeline replaces the stride slice with PIL resize inside the
    same iterator (`decode_media` marks the seam)."""
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))

    def resize(batches):
        import pandas as pd

        for pdf in batches:
            resized = pdf["payload"].map(lambda b: bytes(b)[::8])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "resized_len": resized.map(len).astype("int64"),
                    "checksum": resized.map(lambda b: sum(b) % 997).astype("int64"),
                }
            )

    return media.mapInPandas(resize, "doc_id long, resized_len long, checksum long")


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
