"""Semantic gates for §2.AO (corpus lexical statistics).

Oracle parity hash-checks every key; these rebuild each statistic from
the raw token stream in pure Python (Counter-based) and pin:

1. ao1's lift formula, support filter, and (lift DESC, pair) tie-break.
2. ao2's window-≤2 pair counts — exactly distances 1 and 2, ordered.
3. ao3's per-source vocab/hapax/dis counts and truncated share.
4. ao4's per-language length histogram conserves the token stream and
   its shares never overshoot 10000 bp.
5. ao5's rank products and pct-of-top (rank 1 is exactly 10000 bp).
"""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb

from recommendersystems_bigdata_spark import registry

registry.load_all()


def _doc_tokens(sf_dir: str):
    rows = duckdb.sql(
        f"SELECT source, lang, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    return [
        (src, lang, [t for t in text.split(" ") if t])
        for src, lang, text in rows
    ]


def test_bigram_lift_matches_python(spark, sf_dir):
    docs = _doc_tokens(sf_dir)
    uni: Counter = Counter()
    bi: Counter = Counter()
    for _src, _lang, tl in docs:
        uni.update(tl)
        bi.update(zip(tl, tl[1:]))
    n_tok = sum(uni.values())
    scored = [
        (
            10000 * c_xy * n_tok // (uni[w1] * uni[w2]),
            w1,
            w2,
            c_xy,
        )
        for (w1, w2), c_xy in bi.items()
        if c_xy >= 5
    ]
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    expect = [
        (w1, w2, c_xy, uni[w1], uni[w2], lift)
        for lift, w1, w2, c_xy in scored[:20]
    ]
    got = [
        (r["w1"], r["w2"], r["c_xy"], r["c_x"], r["c_y"], r["lift_bp"])
        for r in registry.QUERIES["q_colloc_bigram_lift"](
            spark, sf_dir
        ).collect()
    ]
    assert got == expect


def test_skipgram_counts_match_python(spark, sf_dir):
    pairs: Counter = Counter()
    for _src, _lang, tl in _doc_tokens(sf_dir):
        pairs.update(zip(tl, tl[1:]))
        pairs.update(zip(tl, tl[2:]))
    ranked = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    expect = [(w1, w2, n) for (w1, w2), n in ranked]
    got = [
        (r["w1"], r["w2"], r["n"])
        for r in registry.QUERIES["q_skipgram_cooccur"](
            spark, sf_dir
        ).collect()
    ]
    assert got == expect


def test_hapax_census_matches_python(spark, sf_dir):
    per_source: dict[str, Counter] = defaultdict(Counter)
    for src, _lang, tl in _doc_tokens(sf_dir):
        per_source[src].update(tl)
    expect = {}
    for src, freq in per_source.items():
        vocab = len(freq)
        hapax = sum(1 for c in freq.values() if c == 1)
        dis = sum(1 for c in freq.values() if c == 2)
        expect[src] = (vocab, hapax, dis, 10000 * hapax // vocab)
    got = {
        r["source"]: (
            r["vocab"],
            r["hapax"],
            r["dis_legomena"],
            r["hapax_share_bp"],
        )
        for r in registry.QUERIES["q_text_hapax_rate"](
            spark, sf_dir
        ).collect()
    }
    assert got == expect


def test_word_length_profile_conserves_stream(spark, sf_dir):
    stream: dict[str, Counter] = defaultdict(Counter)
    types: dict[tuple[str, int], set] = defaultdict(set)
    for _src, lang, tl in _doc_tokens(sf_dir):
        for t in tl:
            stream[lang][len(t)] += 1
            types[(lang, len(t))].add(t)
    rows = registry.QUERIES["q_word_length_profile"](spark, sf_dir).collect()
    per_lang_share: dict[str, int] = defaultdict(int)
    seen = set()
    for r in rows:
        key = (r["lang"], r["wlen"])
        seen.add(key)
        assert r["n_occurrences"] == stream[r["lang"]][r["wlen"]]
        assert r["n_types"] == len(types[key])
        per_lang_share[r["lang"]] += r["share_bp"]
    assert seen == set(types)
    for lang, share in per_lang_share.items():
        n_bands = sum(1 for k in types if k[0] == lang)
        assert share <= 10000
        assert share >= 10000 - n_bands  # truncation loses < 1bp per band


def test_zipf_table_matches_python(spark, sf_dir):
    uni: Counter = Counter()
    for _src, _lang, tl in _doc_tokens(sf_dir):
        uni.update(tl)
    ranked = sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    top_n = ranked[0][1]
    expect = [
        (i, tok, n, i * n, 10000 * n // top_n)
        for i, (tok, n) in enumerate(ranked, start=1)
    ]
    got = [
        (r["rank"], r["tok"], r["n"], r["zipf_product"], r["pct_of_top_bp"])
        for r in registry.QUERIES["q_text_zipf_ranktable"](
            spark, sf_dir
        ).collect()
    ]
    assert got == expect
    assert got[0][4] == 10000
