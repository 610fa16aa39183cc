"""Semantic gates for §2.BN (embedding-space audits).

Oracle parity hash-checks every key; these re-derive the audits from
the raw vectors in Python, pinning the suite's exactness device:
Python's left-fold float sum executes the SAME FP sequence as Spark's
``aggregate`` and DuckDB's ``list_reduce`` (doubles, in array order),
so every per-row fixed-point value must match bit-for-bit — and every
cross-row statistic is integer arithmetic over those.
"""

from __future__ import annotations

import math

import duckdb

from recommendersystems_bigdata_spark import registry

registry.load_all()


def _vectors(sf_dir):
    return duckdb.sql(
        f"SELECT vec_id, label, embedding FROM '{sf_dir}/embeddings.parquet'"
        f" ORDER BY vec_id"
    ).fetchall()


def _norm2(vec):
    acc = 0.0
    for x in vec:
        acc = acc + float(x) * float(x)  # the engines' exact fold order
    return acc


def _conc_bp(vec):
    n2 = _norm2(vec)
    if n2 == 0:
        return 0
    mx = max(float(x) * float(x) for x in vec)
    return math.floor(10000 * mx / n2)


def test_norm_audit_bitexact_and_partitions(spark, sf_dir):
    vecs = _vectors(sf_dir)
    norms = [math.floor(1_000_000 * _norm2(v)) for _, _, v in vecs]
    census: dict[int, list[int]] = {}
    for e6 in norms:
        census.setdefault(e6 // 1000, []).append(e6)
    rows = registry.QUERIES["q_emb_norm_audit"](spark, sf_dir).collect()
    assert {r["norm2_milli"] for r in rows} == set(census)
    assert sum(r["vectors"] for r in rows) == len(vecs)
    for r in rows:
        es = census[r["norm2_milli"]]
        assert r["vectors"] == len(es)
        assert (r["min_norm2_e6"], r["max_norm2_e6"]) == (min(es), max(es))
        assert r["share_bp"] == (10_000 * len(es)) // len(vecs)
        assert r["unit_band"] == (998 <= r["norm2_milli"] <= 1001)


def test_dead_dims_per_dimension_counts(spark, sf_dir):
    vecs = _vectors(sf_dir)
    dims = len(vecs[0][2])
    rows = registry.QUERIES["q_emb_dead_dims"](spark, sf_dir).collect()
    assert [r["dim"] for r in rows] == list(range(dims))
    for r in rows:
        xs = [float(v[r["dim"]]) for _, _, v in vecs]
        nz = sum(1 for x in xs if abs(x) < 0.01)
        assert (r["n"], r["near_zero"]) == (len(xs), nz)
        assert r["min_e6"] == min(math.floor(1_000_000 * x) for x in xs)
        assert r["max_e6"] == max(math.floor(1_000_000 * x) for x in xs)
        assert r["zero_share_bp"] == (10_000 * nz) // len(xs)
        assert r["dead"] == (r["zero_share_bp"] >= 9950)


def test_concentration_census_recomposes(spark, sf_dir):
    vecs = _vectors(sf_dir)
    bps = [_conc_bp(v) for _, _, v in vecs]
    census: dict[int, int] = {}
    for bp in bps:
        b = 500 * (bp // 500)
        census[b] = census.get(b, 0) + 1
    rows = registry.QUERIES["q_emb_concentration_screen"](
        spark, sf_dir
    ).collect()
    assert {r["bucket_lo_bp"]: r["vectors"] for r in rows} == census
    for r in rows:
        assert r["share_bp"] == (10_000 * r["vectors"]) // len(vecs)
        assert r["peaky"] == (r["bucket_lo_bp"] >= 2500)


def test_label_balance_integer_means(spark, sf_dir):
    vecs = _vectors(sf_dir)
    by_label: dict[int, list] = {}
    for _, label, v in vecs:
        by_label.setdefault(label, []).append(v)
    rows = registry.QUERIES["q_emb_label_balance"](spark, sf_dir).collect()
    assert [r["label"] for r in rows] == sorted(by_label)
    for r in rows:
        vs = by_label[r["label"]]
        norms = [math.floor(1_000_000 * _norm2(v)) for v in vs]
        peaky = sum(1 for v in vs if _conc_bp(v) >= 2500)
        assert r["vectors"] == len(vs)
        assert r["share_bp"] == (10_000 * len(vs)) // len(vecs)
        assert r["mean_norm2_e6"] == sum(norms) // len(norms)
        assert (r["peaky"], r["peaky_bp"]) == (
            peaky, (10_000 * peaky) // len(vs),
        )
