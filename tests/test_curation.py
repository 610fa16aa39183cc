"""Cross-operator invariants for the corpus-curation module (§2.M) that the
per-key oracle parity checks can't express: determinism under physical
re-layout, split soundness, and consistency with the shared banded-LSH
candidate generator.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from recommendersystems_bigdata_spark import registry

registry.load_all()


def test_sample_per_source_invariant_to_partitioning(spark, sf_dir):
    """The deterministic sampler must pick the SAME rows regardless of the
    input's physical layout — the property that makes a 100 TB sample
    reproducible across cluster sizes and reruns. Exercised by forcing two
    different shuffle-partition settings around the same query."""
    fn = registry.QUERIES["q_curate_sample_per_source"]
    base = {tuple(r) for r in fn(spark, sf_dir).collect()}
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        relaid = {tuple(r) for r in fn(spark, sf_dir).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base == relaid
    # and the cap actually binds: no source exceeds 20 kept docs
    per_src = (
        fn(spark, sf_dir).groupBy("source").count().agg(F.max("count")).collect()[0][0]
    )
    assert per_src <= 20


def test_split_leakage_split_is_sound(spark, sf_dir):
    """The hash split must be a partition of the corpus (every doc on
    exactly one side) and n_leaked can never exceed n_test."""
    from recommendersystems_bigdata_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    is_test = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin(
        "0", "1", "2", "3"
    )
    n_total = docs.count()
    n_test = docs.filter(is_test).count()
    n_train = docs.filter(~is_test).count()
    assert n_test + n_train == n_total  # partition: no doc dropped or doubled
    assert 0 < n_test < n_total  # both sides populated at every sf
    rows = registry.QUERIES["q_curate_split_leakage"](spark, sf_dir).collect()
    assert sum(r["n_test"] for r in rows) == n_test
    for r in rows:
        assert 0 <= r["n_leaked"] <= r["n_test"]


def test_cross_source_pairs_are_subset_of_lsh_join(spark, sf_dir):
    """q_dedup_cross_source and q_dedup_lsh_join consume the same
    band_candidates generator; the cross-source screen's pairs must be
    exactly the lsh-join's is_dup pairs (Jaccard ≥ 0.9 implies ≥ 0.5)
    whose two docs come from different sources."""
    from recommendersystems_bigdata_spark.catalog import load_table

    cross = {
        (r["doc_a"], r["doc_b"])
        for r in registry.QUERIES["q_dedup_cross_source"](spark, sf_dir).collect()
    }
    lsh = registry.QUERIES["q_dedup_lsh_join"](spark, sf_dir)
    src = dict(
        load_table(spark, sf_dir, "documents").select("doc_id", "source").collect()
    )
    expected = {
        (r["doc_a"], r["doc_b"])
        for r in lsh.filter(F.col("jaccard_x1e6") >= 900_000).collect()
        if src[r["doc_a"]] != src[r["doc_b"]]
    }
    assert cross == expected


def test_quality_cascade_is_monotone(spark, sf_dir):
    """Funnel counts must telescope: each stage's docs_in equals the prior
    stage's docs_out, and counts never increase down the cascade."""
    rows = sorted(
        registry.QUERIES["q_curate_quality_cascade"](spark, sf_dir).collect(),
        key=lambda r: r["stage"],
    )
    assert [r["stage"] for r in rows] == [1, 2, 3, 4]
    for prev, cur in zip(rows, rows[1:]):
        assert cur["docs_in"] == prev["docs_out"]
    for r in rows:
        assert r["rejected"] == r["docs_in"] - r["docs_out"] >= 0


def test_token_shards_account_for_every_doc_and_token(spark, sf_dir):
    """Bucket totals must partition the corpus: doc and token sums over
    buckets equal the corpus totals, and shard counts cover the tokens."""
    from recommendersystems_bigdata_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    n_tokens = docs.select(
        F.sum(F.size(F.filter(F.split("text", " "), lambda t: t != ""))).alias("t")
    ).collect()[0]["t"]
    rows = registry.QUERIES["q_curate_token_shards"](spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert sum(r["total_tokens"] for r in rows) == n_tokens
    for r in rows:
        assert r["n_shards"] * 2048 >= r["total_tokens"]
        assert (r["n_shards"] - 1) * 2048 < r["total_tokens"]


def test_mix_rebalance_keep_counts_are_feasible(spark, sf_dir):
    """keep_n ≤ n_docs everywhere, and a source is either capped at the
    target or fully kept with the deficit reported."""
    rows = registry.QUERIES["q_curate_mix_rebalance"](spark, sf_dir).collect()
    for r in rows:
        assert r["keep_n"] <= r["n_docs"]
        assert r["keep_n"] <= r["target_n"]
        if r["n_docs"] >= r["target_n"]:
            assert r["keep_n"] == r["target_n"] and r["deficit"] == 0
        else:
            assert r["keep_n"] == r["n_docs"]
            assert r["deficit"] == r["target_n"] - r["n_docs"]


def test_dedup_sensitivity_is_monotone_and_anchored(spark, sf_dir):
    """Pair counts must be non-increasing in the threshold, and the sweep
    must anchor to the lsh-join (same candidate generator, same Jaccard
    arithmetic): the 0.9 row equals the lsh-join's count of pairs at
    jaccard_x1e6 ≥ 900000, and the 0.5 row its count at ≥ 500000."""
    rows = {
        r["threshold_x1e6"]: r["n_dup_pairs"]
        for r in registry.QUERIES["q_curate_dedup_sensitivity"](spark, sf_dir).collect()
    }
    assert sorted(rows) == [500_000, 700_000, 800_000, 900_000]
    seq = [rows[t] for t in sorted(rows)]
    assert seq == sorted(seq, reverse=True)  # monotone non-increasing
    lsh = registry.QUERIES["q_dedup_lsh_join"](spark, sf_dir)
    n_90 = lsh.filter(F.col("jaccard_x1e6") >= 900_000).count()
    assert rows[900_000] == n_90
    n_50 = lsh.filter(F.col("jaccard_x1e6") >= 500_000).count()
    assert rows[500_000] == n_50


def test_source_overlap_totals_match_cross_source_pairs(spark, sf_dir):
    """The overlap matrix is m3's pair list aggregated: its pair total
    must equal the cross-source screen's row count, and every (x, y) key
    must be normalized (x < y)."""
    m = registry.QUERIES["q_curate_source_overlap"](spark, sf_dir).collect()
    n_pairs = registry.QUERIES["q_dedup_cross_source"](spark, sf_dir).count()
    assert sum(r["n_dup_pairs"] for r in m) == n_pairs
    for r in m:
        assert r["source_x"] < r["source_y"]


def test_global_shuffle_is_permutation_with_even_shards(spark, sf_dir):
    """m9: pos must be exactly 1..n (a permutation), every shard except the
    last must hold exactly 64 docs, and the permutation must be identical
    under a different physical layout (seeded hash, not RNG)."""
    fn = registry.QUERIES["q_curate_global_shuffle"]
    rows = fn(spark, sf_dir).collect()
    n = len(rows)
    assert sorted(r["pos"] for r in rows) == list(range(1, n + 1))
    by_shard = {}
    for r in rows:
        by_shard[r["shard"]] = by_shard.get(r["shard"], 0) + 1
    last = max(by_shard)
    assert all(c == 64 for s, c in by_shard.items() if s != last)
    assert 1 <= by_shard[last] <= 64
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        relaid = {(r["doc_id"], r["pos"]) for r in fn(spark, sf_dir).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert relaid == {(r["doc_id"], r["pos"]) for r in rows}


def test_interleave_alternates_sources_round_robin(spark, sf_dir):
    """m10: walking the output in pos order, the per-source rank sequence
    must be non-decreasing (all rank-1 docs of every source precede any
    rank-2 doc), and each contiguous rank block must contain every source
    that still has docs at that rank — the round-robin property."""
    fn = registry.QUERIES["q_curate_interleave"]
    rows = sorted(fn(spark, sf_dir).collect(), key=lambda r: r["pos"])
    n = len(rows)
    assert sorted(r["pos"] for r in rows) == list(range(1, n + 1))
    seen_per_source = {}
    ranks = []
    for r in rows:
        sr = seen_per_source.get(r["source"], 0) + 1
        seen_per_source[r["source"]] = sr
        ranks.append(sr)
    assert ranks == sorted(ranks), "per-source ranks must be emitted in waves"
    # every source appears exactly once in the first wave
    from recommendersystems_bigdata_spark.catalog import load_table

    n_sources = load_table(spark, sf_dir, "documents").select("source").distinct().count()
    first_wave = {r["source"] for r in rows[:n_sources]}
    assert len(first_wave) == n_sources


def test_weighted_sample_keeps_all_long_docs(spark, sf_dir):
    """m11: docs at/above the 2000-char cap have keep_p = 1 and must ALL
    be kept; the realized sample rate must track the mean keep
    probability (loose 3-sigma-ish band at this corpus size)."""
    from recommendersystems_bigdata_spark.catalog import load_table

    fn = registry.QUERIES["q_curate_weighted_sample"]
    kept = fn(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    n_long = docs.filter(F.col("n_chars") >= 2000).count()
    n_long_kept = kept.filter(F.col("n_chars") >= 2000).count()
    assert n_long_kept == n_long
    expected = (
        docs.select(
            F.avg(F.least(F.col("n_chars"), F.lit(2000)) / 2000.0).alias("p")
        ).collect()[0]["p"]
    )
    realized = kept.count() / docs.count()
    assert abs(realized - expected) < 0.15, (realized, expected)


# ---------------------------------------------------------------------------
# Hypothesis fuzz (VERDICT r6 #6): m9/m10/m11 determinism under physically
# reordered input. Each example rewrites `documents` in a RANDOM row order
# and partition count to a scratch sf_dir, runs the seeded-hash curation
# query on it, and requires the output to be IDENTICAL to the baseline run
# on the pristine table — the property that makes a 100 TB shuffle/
# interleave/sample reproducible across cluster sizes, file layouts, and
# backfills. (The earlier shuffle-partition tests vary the EXCHANGE layout;
# this varies the SOURCE layout, which those can't reach.)
# ---------------------------------------------------------------------------

import os as _os

from hypothesis import HealthCheck, given, settings, strategies as st

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.oracle import canonicalize
from recommendersystems_bigdata_spark.tmpdirs import scratch_dir

_DERANDOMIZE = _os.environ.get("FUZZ_DEEP") is None
_EXAMPLES = int(_os.environ.get("FUZZ_EXAMPLES", "0"))

_M_KEYS = (
    "q_curate_global_shuffle",   # m9
    "q_curate_interleave",       # m10
    "q_curate_weighted_sample",  # m11
)

# keyed on (key, sf_dir) so a future second scale factor or parametrized
# fixture can never compare an example against a baseline from another corpus
_BASELINES: dict[tuple[str, str], object] = {}


def _baseline(key, spark, sf_dir):
    cache_key = (key, sf_dir)
    if cache_key not in _BASELINES:
        _BASELINES[cache_key] = canonicalize(
            registry.QUERIES[key](spark, sf_dir).toPandas()
        )
    return _BASELINES[cache_key]


@settings(
    max_examples=_EXAMPLES or 6,
    deadline=None,
    derandomize=_DERANDOMIZE,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    key=st.sampled_from(_M_KEYS),
    seed=st.integers(0, 2**31 - 1),
    nparts=st.integers(1, 7),
)
def test_curation_deterministic_under_reordered_input(spark, sf_dir, key, seed, nparts):
    docs = load_table(spark, sf_dir, "documents")
    base = scratch_dir("fuzz_curation_relayout")
    (
        docs.orderBy(F.rand(seed))
        .repartition(nparts)
        .write.mode("overwrite")
        .parquet(f"{base}/documents.parquet")
    )
    relaid = canonicalize(registry.QUERIES[key](spark, base).toPandas())
    assert relaid.equals(_baseline(key, spark, sf_dir)), (
        f"{key}: output changed under reordered input (seed={seed}, nparts={nparts})"
    )
