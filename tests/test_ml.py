"""Approximate-vs-exact twins (SURVEY.md §5): LSH recall floors.

Approximate operators can't hash-match an oracle; instead they must find
most of what their exact twins find — recall below the floor means the
candidate generation is broken, not just noisy.
"""

from __future__ import annotations

from recommendersystems_bigdata_spark import registry

registry.load_all()


def test_minhash_recall_vs_exact_jaccard(spark, sf_dir):
    """MinHashLSH candidates (jaccard_dist ≤ 0.5) must recover ≥80% of the
    exact Jaccard ≥0.5 pairs (lang-blocking in the exact twin only shrinks
    its result, so recall is measured on the exact set)."""
    exact = registry.QUERIES["q_jaccard_shingles"](spark, sf_dir)
    approx = registry.QUERIES["q_dedup_minhash_lsh"](spark, sf_dir)
    exact_pairs = {(r.doc_a, r.doc_b) for r in exact.collect()}
    approx_pairs = {(r.doc_a, r.doc_b) for r in approx.collect()}
    assert exact_pairs, "exact twin found no pairs — threshold broken"
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.8, f"MinHashLSH recall {recall:.3f} < 0.8"


def test_ann_lsh_recall_vs_exact_cosine(spark, sf_dir):
    """BucketedRandomProjectionLSH top-5 vs exact cosine top-5.

    Inputs are L2-normalized inside the query, so L2 ordering equals
    cosine ordering and the index must recover nearly all true neighbors
    (measured 1.0 at bucketLength=0.15 / 10 tables / radius 1.3)."""
    exact = registry.QUERIES["q_cosine_topk"](spark, sf_dir)
    approx = registry.QUERIES["q_ann_lsh"](spark, sf_dir)
    exact_pairs = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    approx_pairs = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    assert len(exact_pairs) == 100  # 20 queries × 5
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.8, f"ANN recall {recall:.3f} < 0.8"


def test_ann_ivf_recall_vs_exact_cosine(spark, sf_dir):
    """IVF (nprobe=10 of nlist=16) must recover most exact cosine top-5
    neighbors — misses can only come from a true neighbor living in an
    unprobed cluster (measured 0.89 on this near-random corpus)."""
    exact = registry.QUERIES["q_cosine_topk"](spark, sf_dir)
    approx = registry.QUERIES["q_ann_ivf"](spark, sf_dir)
    exact_pairs = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    approx_pairs = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    assert len(exact_pairs) == 100  # 20 queries × 5
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.8, f"IVF recall {recall:.3f} < 0.8"


def test_simhash_near_dup_consistency(spark, sf_dir):
    """Exact duplicates (same token set) must have identical SimHash."""
    from pyspark.sql import functions as F

    fp = registry.QUERIES["q_text_fingerprint"](spark, sf_dir)
    sh = registry.QUERIES["q_dedup_simhash"](spark, sf_dir)
    joined = fp.join(sh, "doc_id")
    n_violations = (
        joined.groupBy("fingerprint")
        .agg(F.countDistinct("simhash").alias("n_sh"))
        .filter(F.col("n_sh") > 1)
        .count()
    )
    assert n_violations == 0


def test_als_beats_popularity_on_ranking(spark, sf_dir):
    """Seeded ALS must train, produce 5 recs/user, and its held-out RMSE
    gate: the model's fitted ratings on train data correlate with strength."""
    from recommendersystems_bigdata_spark.ml.recommender import train_als

    model, inter = train_als(spark, sf_dir, implicit=True)
    assert model.rank == 10
    recs = registry.QUERIES["q_als_recommend"](spark, sf_dir)
    from pyspark.sql import functions as F

    per_user = recs.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    assert per_user.filter(F.col("n") != 5).count() == 0
    # implicit ALS scores should rank observed train items above random ones:
    preds = model.transform(inter.select("user", "item", "rating"))
    seen_mean = preds.agg(F.avg("prediction")).collect()[0][0]
    assert seen_mean is not None and seen_mean > 0.05, seen_mean


def test_als_deterministic_same_session(spark, sf_dir):
    """Same seed + same session ⇒ identical recommendations."""
    q = registry.QUERIES["q_als_recommend"]
    a = sorted(map(str, q(spark, sf_dir).collect()))
    b = sorted(map(str, q(spark, sf_dir).collect()))
    assert a == b


def test_dedup_clusters_uses_band_candidates(spark, tmp_path):
    """Two near-dup docs with far-apart ids must land in ONE cluster: the
    candidate edges come from the MinHash band buckets (band_candidates),
    not from any id-adjacency window, so id distance is irrelevant.

    Docs 1 and 42 share the same DISTINCT token set (different text, so
    exact dedup would NOT merge them) ⇒ identical MinHash signature ⇒
    same band bucket ⇒ candidate pair; Jaccard 1.0 ≥ 0.9 ⇒ edge."""
    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (42, "epsilon delta gamma beta alpha epsilon"),  # same token set
        (7, "unrelated words entirely over here"),
        (8, "another completely distinct document body"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = registry.QUERIES["q_dedup_clusters"](spark, str(tmp_path)).collect()
    lab = {r.doc_id: r.cluster_id for r in out}
    canon = {r.doc_id: r.is_canonical for r in out}
    assert lab[42] == lab[1] == 1, lab
    assert canon[1] and not canon[42]
    assert lab[7] == 7 and lab[8] == 8  # singletons stay themselves


def test_ann_ivf_clustered_corpus_low_nprobe(spark):
    """IVF at the operating point real corpora use: on a CLUSTERED vector
    set, recall@5 must hold ≥0.8 with nprobe/nlist = 25% (4 of 16 cells)
    — this corpus's 62% probe ratio is an artifact of its near-random
    embeddings, not of the IVF shape. Synthetic corpus: 8 well-separated
    unit centers, 50 jittered members each; within-cluster cosine ≫
    cross-cluster, so the coarse quantizer carries real signal."""
    import numpy as np

    from recommendersystems_bigdata_spark.ml.similarity import ivf_topk

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(8, 16))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = []
    for ci in range(8):
        pts = centers[ci] + 0.15 * rng.normal(size=(50, 16))
        vecs.extend(pts)
    vecs = np.asarray(vecs)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    got = ivf_topk(spark, emb, nlist=16, nprobe=4, k=5)
    approx = {(r.query_id, r.neighbor_id) for r in got.collect()}

    # exact brute-force cosine top-5 for the 20 query vectors
    norms = np.linalg.norm(vecs, axis=1)
    exact = set()
    for qid in range(20):
        cos = (vecs @ vecs[qid]) / (norms * norms[qid])
        cos[qid] = -np.inf
        order = sorted(range(len(vecs)), key=lambda j: (-cos[j], j))[:5]
        exact.update((qid, j) for j in order)

    assert len(exact) == 100
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"clustered-corpus IVF recall {recall:.3f} < 0.8 at nprobe/nlist=25%"
