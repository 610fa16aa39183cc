"""Semantic gates for §2.CC (intra-document repetition screens).

Oracle parity hash-checks every key; these pin the math:

1. cc1/cc2's per-doc rows equal a Counter-based Python recompute of
   the published spelling (exact equality — both are integers).
2. cc3's HOF scan equals the positional recompute.
3. cc4's screen recomposes from cc1's shares with the documented
   threshold.
4. Degenerate docs (one token — no bigrams) publish zero counts and
   NULL shares in the engine, matching the guard.
5. Hypothesis: spelling identities over arbitrary token lists —
   dup_instances = n_grams − singletons, shares bounded by 10⁴, and
   the top gram is always counted inside dup when it repeats.
"""

from __future__ import annotations

from collections import Counter

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from recommendersystems_bigdata_spark import registry

registry.load_all()


def _docs(sf_dir):
    return {
        int(i): t.split(" ")
        for i, t in duckdb.sql(
            f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    }


def _census_py(toks, n):
    grams = [
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    ]
    c = Counter(grams)
    n_grams = len(grams)
    dup = sum(v for v in c.values() if v >= 2)
    top = max(c.values()) if c else 0
    return {
        "n_tok": len(toks),
        "n_grams": n_grams,
        "distinct_grams": len(c),
        "dup_instances": dup,
        "dup_share_bp": (10_000 * dup) // n_grams if n_grams else None,
        "top_share_bp": (10_000 * top) // n_grams if n_grams else None,
    }


def test_bigram_census_matches_counter(spark, sf_dir):
    docs = _docs(sf_dir)
    rows = registry.QUERIES["q_rep_bigram_census"](
        spark, sf_dir
    ).collect()
    assert [r["doc_id"] for r in rows] == sorted(docs)
    for r in rows:
        want = _census_py(docs[r["doc_id"]], 2)
        for col, val in want.items():
            assert r[col] == val, (r["doc_id"], col)


def test_trigram_census_matches_counter(spark, sf_dir):
    docs = _docs(sf_dir)
    rows = registry.QUERIES["q_rep_trigram_coverage"](
        spark, sf_dir
    ).collect()
    for r in rows:
        want = _census_py(docs[r["doc_id"]], 3)
        for col, val in want.items():
            assert r[col] == val, (r["doc_id"], col)


def test_immediate_repeats_positional(spark, sf_dir):
    docs = _docs(sf_dir)
    rows = registry.QUERIES["q_rep_immediate_repeats"](
        spark, sf_dir
    ).collect()
    for r in rows:
        t = docs[r["doc_id"]]
        rep = [i for i in range(len(t) - 1) if t[i] == t[i + 1]]
        assert r["n_tok"] == len(t)
        assert r["repeats"] == len(rep)
        if len(t) < 2:
            assert r["repeat_share_bp"] is None
        else:
            assert r["repeat_share_bp"] == (10_000 * len(rep)) // (
                len(t) - 1
            )
        assert r["stuttered_tokens"] == len({t[i] for i in rep})


def test_screen_recomposes_from_census(spark, sf_dir):
    docs = _docs(sf_dir)
    src = dict(
        duckdb.sql(
            f"SELECT doc_id, source FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    )
    per_source = {}
    for d, toks in docs.items():
        cen = _census_py(toks, 2)
        sh = cen["dup_share_bp"]
        s = src[d]
        cnt, flg, tot = per_source.get(s, (0, 0, 0))
        per_source[s] = (
            cnt + 1,
            flg + (1 if sh is not None and sh > 1000 else 0),
            tot + (sh or 0),
        )
    rows = registry.QUERIES["q_rep_screen_by_source"](
        spark, sf_dir
    ).collect()
    assert [r["source"] for r in rows] == sorted(per_source)
    for r in rows:
        cnt, flg, tot = per_source[r["source"]]
        assert (r["docs"], r["flagged"]) == (cnt, flg)
        assert r["flagged_share_bp"] == (10_000 * flg) // cnt
        assert r["mean_dup_share_bp"] == tot // cnt


def test_gramless_doc_publishes_null_shares(spark, tmp_path):
    spark.createDataFrame(
        [(0, "alone", "en", "srcX", 5), (1, "a b a b", "en", "srcX", 7)],
        schema="doc_id bigint, text string, lang string,"
        " source string, n_chars bigint",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = registry.QUERIES["q_rep_bigram_census"](
        spark, str(tmp_path)
    ).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[0]["n_grams"] == 0
    assert by_id[0]["dup_share_bp"] is None
    assert by_id[0]["top_share_bp"] is None
    # "a b a b": grams = [ab, ba, ab] → dup = 2 (the two ab instances)
    assert by_id[1]["n_grams"] == 3
    assert by_id[1]["dup_instances"] == 2
    assert by_id[1]["dup_share_bp"] == (10_000 * 2) // 3


@settings(max_examples=300, deadline=None)
@given(st.lists(st.sampled_from("abcde"), min_size=1, max_size=60))
def test_spelling_identities_for_any_tokens(toks):
    cen = _census_py(toks, 2)
    c = Counter(
        " ".join(toks[i : i + 2]) for i in range(len(toks) - 1)
    )
    singles = sum(1 for v in c.values() if v == 1)
    assert cen["dup_instances"] == cen["n_grams"] - singles
    if cen["n_grams"]:
        assert 0 <= cen["dup_share_bp"] <= 10_000
        assert 0 < cen["top_share_bp"] <= 10_000
        top = max(c.values())
        if top >= 2:
            assert cen["dup_instances"] >= top
