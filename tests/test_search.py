"""Semantic gates for the §2.X search/retrieval family (beyond oracle
parity): brute-force Python references over the collected sf0.001 corpus
(500 docs — cheap to hold), so a tokenization or adjacency slip that
happened to agree with an equally-wrong oracle SQL spelling still fails.
Also pins the non-empty result sets (a hash match on the empty set is the
weakest possible pass — the q_join_anti lesson from round 6).
"""

from __future__ import annotations

import pytest

from recommendersystems_bigdata_spark import registry
from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.ml.search import (
    _MUST,
    _MUST_NOT,
    _PHRASE,
    _RANK_TERMS,
)

registry.load_all()


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    rows = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    return {r["doc_id"]: [t for t in r["text"].split(" ") if t] for r in rows}


def test_boolean_matches_python_reference(spark, sf_dir, corpus):
    expected = {
        d
        for d, toks in corpus.items()
        if all(m in toks for m in _MUST) and _MUST_NOT not in toks
    }
    got = {
        r["doc_id"]
        for r in registry.QUERIES["q_search_boolean"](spark, sf_dir).collect()
    }
    assert got == expected
    assert got, "boolean query must be non-empty at the test SF"


def test_phrase_hits_match_python_reference(spark, sf_dir, corpus):
    a, b = _PHRASE
    expected = {}
    for d, toks in corpus.items():
        hits = sum(
            1 for i in range(len(toks) - 1) if toks[i] == a and toks[i + 1] == b
        )
        if hits:
            expected[d] = hits
    got = {
        r["doc_id"]: r["hits"]
        for r in registry.QUERIES["q_search_phrase"](spark, sf_dir).collect()
    }
    assert got == expected
    assert got, "phrase query must be non-empty at the test SF"


def test_postings_share_and_df_consistency(spark, sf_dir, corpus):
    n_docs = len(corpus)
    rows = registry.QUERIES["q_search_postings"](spark, sf_dir).collect()
    assert len(rows) == 20
    dfs = [r["df"] for r in rows]
    assert dfs == sorted(dfs, reverse=True)
    for r in rows:
        expected_df = sum(1 for toks in corpus.values() if r["token"] in toks)
        assert r["df"] == expected_df, r["token"]
        assert r["doc_share_bp"] == (r["df"] * 10000) // n_docs
        assert r["top_doc_tf"] == corpus[r["top_doc_id"]].count(r["token"])


def test_bm25_rare_term_dominates_ranking(spark, sf_dir, corpus):
    """The log-free idf proxy must preserve rareness ordering: every
    top-10 doc for the {common, rare} query contains the rare term (its
    idf is ~65x the common term's, dwarfing any tf/length advantage)."""
    rare = _RANK_TERMS[1]
    rows = registry.QUERIES["q_search_bm25ish"](spark, sf_dir).collect()
    assert len(rows) == 10
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert rare in corpus[r["doc_id"]], r
