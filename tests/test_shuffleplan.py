"""Semantic gates for §2.CB (shuffle-plan advisor).

Oracle parity hash-checks every key; these pin the math:

1. cb1's three census rows match a pure-Python recompute (counts,
   imbalance bp, cleared 5× heavy-key rule).
2. cb2's salt rows recompose, and the planning guarantee holds:
   salt ≥ 1 and post-salt max ≤ target — Hypothesis-proved for ANY
   (n_key, target), i.e. ceil(n/ceil(n/t)) ≤ t.
3. cb3's byte model matches an exact Python recompute per dim.
4. cb4's buckets sum to N and the load column recomposes.
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from recommendersystems_bigdata_spark import registry

registry.load_all()


def _counts(sf_dir, col):
    rows = duckdb.sql(
        f"""SELECT {col}, count(*) FROM '{sf_dir}/lineitem.parquet'
        GROUP BY 1"""
    ).fetchall()
    return {int(k): int(n) for k, n in rows}


def test_key_imbalance_census(spark, sf_dir):
    rows = registry.QUERIES["q_shuffle_key_imbalance"](
        spark, sf_dir
    ).collect()
    assert [r["key_col"] for r in rows] == [
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
    ]
    for r in rows:
        per = _counts(sf_dir, r["key_col"])
        n, k = sum(per.values()), len(per)
        mx = max(per.values())
        assert (r["n_rows"], r["n_keys"], r["max_key_rows"]) == (n, k, mx)
        assert r["mean_key_rows"] == n // k
        assert r["imbalance_bp"] == (10_000 * mx * k) // n
        assert r["heavy_keys"] == sum(
            1 for v in per.values() if v * k > 5 * n
        )


def test_salt_advisor_recomposes(spark, sf_dir):
    per = _counts(sf_dir, "l_partkey")
    n = sum(per.values())
    target = (n + 199) // 200
    top = sorted(per.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    rows = registry.QUERIES["q_shuffle_salt_advisor"](
        spark, sf_dir
    ).collect()
    assert [(r["l_partkey"], r["n_key"]) for r in rows] == top
    for i, r in enumerate(rows):
        assert r["heavy_rank"] == i + 1
        assert r["target_rows_per_task"] == target
        salt = (r["n_key"] + target - 1) // target
        assert r["salt"] == salt
        assert r["post_salt_max_rows"] == (r["n_key"] + salt - 1) // salt
        # the planning guarantee
        assert r["post_salt_max_rows"] <= target


@settings(max_examples=500, deadline=None)
@given(st.integers(1, 10**12), st.integers(1, 10**9))
def test_salt_guarantee_for_any_key(n_key, target):
    """ceil(n/ceil(n/t)) ≤ t for all positive n, t — the salt advisor
    can never under-provision."""
    salt = (n_key + target - 1) // target
    assert salt >= 1
    assert (n_key + salt - 1) // salt <= target


_WIDTHS = {
    "region": "4 + length(r_name)",
    "nation": "4 + length(n_name) + 4",
    "customer": "8 + length(c_name) + 4 + 8 + length(c_mktsegment)",
    "supplier": "8 + length(s_name) + 4 + 8",
    "part": (
        "8 + length(p_name) + length(p_brand) + length(p_type) + 4 + 8"
    ),
}


def test_broadcast_advisor_byte_model(spark, sf_dir):
    rows = registry.QUERIES["q_broadcast_advisor"](
        spark, sf_dir
    ).collect()
    assert [r["dim_table"] for r in rows] == sorted(_WIDTHS)
    for r in rows:
        t = r["dim_table"]
        (n, b) = duckdb.sql(
            f"""SELECT count(*), sum({_WIDTHS[t]})
            FROM '{sf_dir}/{t}.parquet'"""
        ).fetchone()
        assert (r["n_rows"], r["payload_bytes"]) == (int(n), int(b))
        assert r["verdict"] == (
            "broadcast" if int(b) < 10 * 1024 * 1024 else "shuffle"
        )


def test_partition_histogram_recomposes(spark, sf_dir):
    per = _counts(sf_dir, "l_suppkey")
    buckets = {}
    for k, v in per.items():
        buckets[k % 32] = buckets.get(k % 32, 0) + v
    n = sum(buckets.values())
    rows = registry.QUERIES["q_shuffle_partition_histogram"](
        spark, sf_dir
    ).collect()
    assert [r["bucket"] for r in rows] == sorted(buckets)
    assert sum(r["n_rows"] for r in rows) == n
    for r in rows:
        assert r["n_rows"] == buckets[r["bucket"]]
        assert r["share_bp"] == (10_000 * r["n_rows"]) // n
        assert r["load_vs_mean_bp"] == (10_000 * r["n_rows"] * 32) // n
