"""Similarity search over the embedding column (SURVEY.md §2.K k9/k10/k18).

Brute-force exact cosine top-k is the correctness baseline; the LSH-bucketed
approximate join is the 100 TB path (candidates per query scale with bucket
occupancy, not corpus size). Recall of the approximate path against the
exact one is asserted in tests/test_ml.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.ml.vectors import sql_cosine
from recommendersystems_bigdata_spark.registry import query


@query(
    "q_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 20),
    scored AS (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             {sql_cosine('q.embedding', 'e.embedding')} AS cos
      FROM q CROSS JOIN embeddings e
      WHERE e.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, round(cos, 6) AS cos_sim, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rn
      FROM scored
    ) WHERE rn <= 5
    """,
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k9 — exact brute-force cosine top-5 for the first 20 query vectors.

    Vectorized scoring: the corpus streams through mapInPandas and each
    Arrow batch is scored against the broadcast query matrix with one BLAS
    matmul, emitting only per-batch top-k (a combiner) — shuffle volume is
    O(k·Q·partitions) regardless of corpus size, and the scan parallelism
    is Spark's. The global window refines to the exact answer. At 100 TB
    the same plan holds for any bounded query batch; unbounded all-pairs
    goes through q_ann_lsh instead.
    """
    import numpy as np
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    emb = load_table(spark, sf_dir, "embeddings")
    # The query side is a bounded batch (ANN queries always are): collect it
    # to the driver and close over it — on a cluster this ships with the
    # serialized task exactly like a broadcast variable. The corpus side
    # stays fully distributed: each Arrow batch is scored with one BLAS
    # matmul (batch×64 @ 64×Q), and only the per-batch top-k survives —
    # a combiner, so shuffle volume is O(k·Q·partitions), not O(N·Q).
    qrows = sorted(emb.filter(F.col("vec_id") < 20).select("vec_id", "embedding").collect())
    q_ids = np.array([r[0] for r in qrows], dtype="int64")
    q_mat = np.array([r[1] for r in qrows], dtype="float64")
    q_norm = np.sqrt((q_mat**2).sum(axis=1))

    schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("cos", DoubleType()),
        ]
    )
    k = 5

    def score_batches(batches):
        import numpy as np_
        import pandas as pd_

        for pdf in batches:
            if not len(pdf):
                continue
            n_ids = pdf["vec_id"].to_numpy("int64")
            e_mat = np_.stack(pdf["embedding"].to_numpy()).astype("float64")
            e_norm = np_.sqrt((e_mat**2).sum(axis=1))
            cos = (e_mat @ q_mat.T) / (e_norm[:, None] * q_norm[None, :])
            frames = []
            for j, qid in enumerate(q_ids):
                col = cos[:, j]
                mask = n_ids != qid
                ids, vals = n_ids[mask], col[mask]
                # per-batch top-k by (cos desc, neighbor_id asc) — any global
                # top-k row is necessarily in its batch's top-k
                order = np_.lexsort((ids, -vals))[: k + 1]
                frames.append(
                    pd_.DataFrame(
                        {"query_id": qid, "neighbor_id": ids[order], "cos": vals[order]}
                    )
                )
            yield pd_.concat(frames, ignore_index=True)

    scored = emb.select("vec_id", "embedding").mapInPandas(score_batches, schema)
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cos_sim"), "rn")
    )


@query("q_ann_lsh")
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k10 — approximate nearest neighbors via BucketedRandomProjectionLSH
    (rows-only: bucket boundaries are model-internal).

    Random-projection buckets turn the all-pairs problem into per-bucket
    joins — the standard Spark ANN scale path. Inputs are L2-NORMALIZED
    first: on unit vectors L2 distance is monotone in cosine
    (d² = 2 − 2·cos), so the L2 top-5 IS the cosine top-5 and the join
    radius doubles as a cosine floor (r=1.3 ⇔ cos ≥ 0.155). Tuned on the
    corpus to recall 1.0 vs the exact twin while generating ~5% of the
    all-pairs candidates (tests/test_ml.py gates ≥0.8).
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    unit = F.transform(
        "embedding", lambda x: x.cast("double") / F.sqrt(F.aggregate(
            F.transform("embedding", lambda y: y.cast("double") * y.cast("double")),
            F.lit(0.0), lambda a, b: a + b,
        ))
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(unit).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=0.15, numHashTables=10, seed=42
    ).fit(emb)
    queries = emb.filter(F.col("vec_id") < 20)
    pairs = lsh.approxSimilarityJoin(queries, emb, 1.3, distCol="l2_dist")
    w = Window.partitionBy("query_id").orderBy(F.col("l2_dist").asc(), F.col("neighbor_id").asc())
    return (
        pairs.select(
            F.col("datasetA.vec_id").alias("query_id"),
            F.col("datasetB.vec_id").alias("neighbor_id"),
            F.round("l2_dist", 6).alias("l2_dist"),
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 5)
    )


@query("q_ann_ivf")
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) approximate nearest neighbors — the coarse-
    quantizer scale path named in SURVEY.md §2.K alongside q_ann_lsh.

    Plan shape (the FAISS-IVF layout re-expressed as DataFrames):
      1. fit a seeded KMeans coarse quantizer (nlist=16 centroids);
      2. assign every corpus vector to its centroid — a map-only transform,
         so the inverted lists are just a `cluster` column (at 100 TB you'd
         persist the corpus bucketed/partitioned by this column and prune
         scanned partitions per probe);
      3. each query probes its nprobe=6 nearest centroids (a driver-side
         20×16 matmul — query batches are bounded, centroid tables tiny);
      4. exact cosine re-rank over only the probed clusters' vectors —
         candidates scale with nprobe/nlist of the corpus, not the corpus.

    Rows-only check (centroids are model-internal); recall vs the exact
    q_cosine_topk twin is asserted in tests/test_ml.py.

    nprobe is tuned for THIS corpus: its embeddings are near-random (exact
    top-5 neighbors sit at cos ≈ 0.3), so the coarse quantizer carries
    little signal and recall@5 needs 10 of 16 cells probed (0.89 measured;
    6 → 0.67). Real embedding corpora cluster far more tightly and run at
    nprobe/nlist ratios of 1–25%; tests/test_ml.py gates BOTH operating
    points — ≥0.8 here, and ≥0.8 at nprobe/nlist = 25% on a synthetic
    clustered corpus (the ratio real deployments use).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(spark, emb, nlist=16, nprobe=10, k=5)


def ivf_topk(
    spark: SparkSession,
    emb: DataFrame,
    nlist: int,
    nprobe: int,
    k: int,
    n_queries: int = 20,
    seed: int = 42,
) -> DataFrame:
    """IVF ANN core over an (vec_id, embedding) DataFrame: seeded KMeans
    coarse quantizer → cluster assignment → per-query nprobe probes →
    exact cosine re-rank over probed clusters only. Queries are the rows
    with ``vec_id < n_queries``. Candidates scale with nprobe/nlist of
    the corpus, not the corpus."""
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from recommendersystems_bigdata_spark.ml.vectors import cosine

    # L2-normalize before quantizing: on unit vectors Euclidean distance is
    # monotone in cosine, so the Euclidean KMeans quantizer respects the
    # cosine metric the re-rank uses (spherical k-means).
    unit = F.transform(
        "embedding", lambda x: x.cast("double") / F.sqrt(F.aggregate(
            F.transform("embedding", lambda y: y.cast("double") * y.cast("double")),
            F.lit(0.0), lambda a, b: a + b,
        ))
    )
    vecs = emb.select("vec_id", "embedding", array_to_vector(unit).alias("features"))
    km = KMeans(k=nlist, seed=seed, featuresCol="features", predictionCol="cluster").fit(vecs)
    assigned = km.transform(vecs).select("vec_id", "embedding", "cluster")

    centers = np.stack([np.asarray(c, dtype="float64") for c in km.clusterCenters()])  # nlist×dim
    c_norm = np.sqrt((centers**2).sum(axis=1))
    qrows = sorted(
        emb.filter(F.col("vec_id") < n_queries).select("vec_id", "embedding").collect()
    )
    probe_rows = []
    for vid, e in qrows:
        q = np.asarray(e, dtype="float64")
        cos_c = (centers @ q) / (c_norm * np.sqrt((q**2).sum()))
        for cl in np.argsort(-cos_c)[:nprobe]:
            probe_rows.append((int(vid), int(cl), [float(x) for x in q]))
    probes = spark.createDataFrame(probe_rows, "query_id long, cluster int, q_emb array<double>")

    cands = assigned.join(F.broadcast(probes), "cluster").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cands.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine(F.col("q_emb"), F.col("embedding")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cos_sim"), "rn")
    )


@query(
    "q_embedding_centroid",
    oracle="""
    WITH exploded AS (
      SELECT label,
             generate_subscripts(embedding, 1) AS pos,
             unnest(embedding) AS val
      FROM embeddings
    ),
    means AS (
      SELECT label, pos, avg(CAST(val AS DOUBLE)) AS m
      FROM exploded GROUP BY label, pos
    )
    SELECT label,
           array_to_string(list(printf('%.6f', m) ORDER BY pos), '|') AS centroid,
           CAST((SELECT count(*) FROM embeddings e WHERE e.label = means.label) AS BIGINT) AS n_vectors
    FROM means
    GROUP BY label
    """,
)
def q_embedding_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k18 — per-label embedding centroid via posexplode → positional avg →
    ordered re-collect. The shuffle carries (label, pos) partial sums —
    64 doubles per label per partition, independent of corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select("label", "vec_id", F.posexplode("embedding").alias("pos", "val"))
    means = exploded.groupBy("label", "pos").agg(
        F.avg(F.col("val").cast("double")).alias("m"),
        F.countDistinct("vec_id").alias("n_vec"),
    )
    return means.groupBy("label").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: F.format_string("%.6f", s.m),
            ),
            "|",
        ).alias("centroid"),
        F.max("n_vec").cast("long").alias("n_vectors"),
    )


@query(
    "q_embedding_quantize",
    oracle="""
    WITH s AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) AS scale
      FROM embeddings
    ),
    q AS (
      SELECT vec_id, embedding, scale,
             list_transform(embedding,
                            v -> floor(CAST(v AS DOUBLE) / scale * 127 + 0.5)) AS qv
      FROM s
    )
    SELECT vec_id,
           CAST(floor(scale * 1000000) AS BIGINT) AS scale_micro,
           CAST(list_max(qv) AS BIGINT) AS max_q,
           CAST(list_min(qv) AS BIGINT) AS min_q,
           CAST(list_sum(list_transform(generate_series(1, len(embedding)),
                          i -> floor(abs(CAST(embedding[i] AS DOUBLE) - qv[i] * scale / 127)
                                     * 1000000)))
                AS BIGINT) AS sum_err_micro
    FROM q
    """,
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of embeddings: per-vector absmax scale,
    symmetric round-to-nearest (spelled floor(x+0.5) so both engines
    round identically), plus reconstruction error in integer microunits.
    Every emitted stat is integer-exact: per-element errors floor to
    micro-units BEFORE summing (double summation order differs across
    engines at the ulp; integer sums cannot) — the 4×
    memory-compression lever that makes billion-vector ANN serving fit.

    Map-only over the scan (higher-order array functions, no explode, no
    shuffle); quantized codes would write back as array<tinyint> at 1/4
    the bytes.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    as_dbl = lambda v: v.cast("double")  # noqa: E731
    s = emb.select(
        "vec_id",
        "embedding",
        F.array_max(F.transform("embedding", lambda v: F.abs(as_dbl(v)))).alias("scale"),
    )
    q = s.withColumn(
        "qv",
        F.transform("embedding", lambda v: F.floor(as_dbl(v) / F.col("scale") * 127 + 0.5)),
    )
    err = F.aggregate(
        F.zip_with(
            "embedding",
            "qv",
            lambda v, qi: F.floor(F.abs(as_dbl(v) - qi * F.col("scale") / 127) * 1000000),
        ),
        F.lit(0).cast("long"),
        lambda acc, e: acc + e.cast("long"),
    )
    return q.select(
        "vec_id",
        F.floor(F.col("scale") * 1000000).cast("long").alias("scale_micro"),
        F.array_max("qv").cast("long").alias("max_q"),
        F.array_min("qv").cast("long").alias("min_q"),
        err.alias("sum_err_micro"),
    )


@query(
    "q_knn_label_vote",
    oracle=f"""
    WITH q AS (SELECT vec_id, label, embedding FROM embeddings WHERE vec_id < 20),
    scored AS (
      SELECT q.vec_id AS query_id, q.label AS true_label,
             e.vec_id AS neighbor_id, e.label AS n_label,
             {sql_cosine('q.embedding', 'e.embedding')} AS cos
      FROM q CROSS JOIN embeddings e
      WHERE e.vec_id <> q.vec_id
    ),
    knn AS (
      SELECT query_id, true_label, n_label
      FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, neighbor_id ASC) AS rn
        FROM scored
      ) WHERE rn <= 5
    ),
    votes AS (
      SELECT query_id, true_label, n_label AS pred_label, count(*) AS votes
      FROM knn GROUP BY query_id, true_label, n_label
    )
    SELECT query_id, true_label, pred_label, votes,
           pred_label = true_label AS correct
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY votes DESC, pred_label ASC) AS vr
      FROM votes
    ) WHERE vr = 1
    """,
)
def q_knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN classification by majority vote: each of the first 20 query
    vectors takes the modal label of its 5 cosine-nearest neighbors
    (self excluded; vote ties broken by label) — the eval loop that
    turns a similarity index (k9/k10) into a classifier.

    Scale: the query side is a bounded batch broadcast against the
    corpus scan, exactly k9's shape; the vote is an integer count over
    k·Q rows — driver-free, and the corpus side never shuffles more
    than its per-partition top-k.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
        F.col("embedding").alias("q_emb"),
    )
    e = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("n_label"),
        F.col("embedding").alias("n_emb"),
    )
    from recommendersystems_bigdata_spark.ml.vectors import cosine

    scored = (
        e.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "true_label",
            "neighbor_id",
            "n_label",
            cosine(F.col("q_emb"), F.col("n_emb")).alias("cos"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    knn = scored.withColumn("rn", F.row_number().over(wk)).filter(F.col("rn") <= 5)
    votes = knn.groupBy("query_id", "true_label", F.col("n_label").alias("pred_label")).agg(
        F.count(F.lit(1)).alias("votes")
    )
    wv = Window.partitionBy("query_id").orderBy(F.col("votes").desc(), F.col("pred_label").asc())
    return (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select(
            "query_id",
            "true_label",
            "pred_label",
            "votes",
            (F.col("pred_label") == F.col("true_label")).alias("correct"),
        )
    )


@query(
    "q_embedding_outliers",
    oracle="""
    WITH exploded AS (
      SELECT label, generate_subscripts(embedding, 1) AS pos,
             unnest(embedding) AS val
      FROM embeddings
    ),
    centroids AS (
      SELECT label, list(round(m, 6) ORDER BY pos) AS centroid
      FROM (
        SELECT label, pos, avg(CAST(val AS DOUBLE)) AS m
        FROM exploded GROUP BY label, pos
      ) GROUP BY label
    ),
    dists AS (
      SELECT e.vec_id, e.label,
             CAST(floor(list_sum(list_transform(
                    list_zip(e.embedding, c.centroid),
                    z -> (CAST(z[1] AS DOUBLE) - z[2]) * (CAST(z[1] AS DOUBLE) - z[2])
                  )) * 1000000) AS BIGINT) AS sqdist_x1e6
      FROM embeddings e JOIN centroids c ON e.label = c.label
    )
    SELECT vec_id, label, sqdist_x1e6, CAST(rn AS BIGINT) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY label
                                   ORDER BY sqdist_x1e6 DESC, vec_id) AS rn
      FROM dists
    ) WHERE rn <= 3
    """,
)
def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding outliers: the 3 vectors farthest (squared L2)
    from their label centroid — the mislabel/degenerate-vector screen a
    training pipeline runs before contrastive fine-tuning.

    The centroid is rounded to 6dp BEFORE the distance pass (k18's
    output contract), so both engines measure against identical
    coordinates; the distance itself is a list-ordered fold, floor-scaled.

    Scale: centroids are (labels × 64) doubles from one positional agg —
    broadcast back over the scan; the distance pass is map-only and the
    per-label top-3 never shuffles more than k rows per partition.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select("label", F.posexplode("embedding").alias("pos", "val"))
    centroids = (
        exploded.groupBy("label", "pos")
        .agg(F.avg(F.col("val").cast("double")).alias("m"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: F.round(s.m, 6)
            ).alias("centroid")
        )
    )
    diff_sq = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("centroid"),
            lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dists = emb.join(F.broadcast(centroids), "label").select(
        "vec_id", "label", F.floor(diff_sq * 1_000_000).cast("long").alias("sqdist_x1e6")
    )
    w = Window.partitionBy("label").orderBy(F.col("sqdist_x1e6").desc(), "vec_id")
    return (
        dists.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("vec_id", "label", "sqdist_x1e6", "rank")
    )


@query(
    "q_embedding_truncation",
    oracle="""
    WITH norms AS (
      SELECT vec_id, label,
             list_sum(list_transform(embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS sq64,
             list_sum(list_transform(list_slice(embedding, 1, 16),
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS sq16
      FROM embeddings
    )
    SELECT vec_id, label,
           CAST(floor(sqrt(sq16) / sqrt(sq64) * 1000000) AS BIGINT)
             AS retention_x1e6
    FROM norms
    """,
)
def q_embedding_truncation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation quality: per vector, the fraction of
    L2 mass retained by the first 16 of 64 dimensions (= cosine between
    the vector and its zero-padded truncation) — the measurement that
    decides whether a shortened embedding is safe for the cheap ANN tier
    (k10/k10b) with full-dim re-rank.

    Both norms are list-ordered folds and the ratio is one sqrt+divide
    chain, so the floor-scaled value hash-matches. Scale: map-only.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    sq = lambda col: F.aggregate(
        F.transform(col, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    retention = F.sqrt(sq(F.slice("embedding", 1, 16))) / F.sqrt(sq(F.col("embedding")))
    return emb.select(
        "vec_id",
        "label",
        F.floor(retention * 1_000_000).cast("long").alias("retention_x1e6"),
    )
