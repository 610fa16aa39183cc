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
    """BucketedRandomProjectionLSH top-5 (L2) vs exact cosine top-5.

    L2-on-unnormalized vs cosine are different metrics, so the floor is
    modest — but random-hyperplane buckets must still recover a meaningful
    share of true neighbors for the 20 query vectors."""
    exact = registry.QUERIES["q_cosine_topk"](spark, sf_dir)
    approx = registry.QUERIES["q_ann_lsh"](spark, sf_dir)
    exact_pairs = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    approx_pairs = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    assert len(exact_pairs) == 100  # 20 queries × 5
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.2, f"ANN recall {recall:.3f} < 0.2"


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
