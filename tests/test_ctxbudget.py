"""Semantic gates for §2.BL (context-window budget analytics).

Oracle parity hash-checks every key; these pin the math against an
independent Python recomputation from raw token counts (same
whitespace convention as §2.K):

1. bl1's one-pass conditional sums equal the per-length definitions
   (docs over, exact tokens lost) and conserve: kept + lost = total.
2. bl2's rungs partition the corpus; pad/trunc recompose per doc;
   slots = docs×cap bounds the kept+pad identity.
3. bl3's fan-out census conserves documents and input tokens, and
   chunks×32 = input + slack per row.
4. bl4's coverage is monotone and ends at exactly 10000 bp.
"""

from __future__ import annotations

import duckdb

from recommendersystems_bigdata_spark import registry
from recommendersystems_bigdata_spark.ml.ctxbudget import (
    _CHUNK,
    _CTX_LENGTHS,
    _LADDER,
)

registry.load_all()


def _toks(sf_dir):
    return [
        int(t)
        for (t,) in duckdb.sql(
            f"""
            SELECT len(list_filter(string_split(text, ' '), t -> t <> ''))
            FROM '{sf_dir}/documents.parquet'
            """
        ).fetchall()
    ]


def _cap(tok):
    for c in _LADDER:
        if tok <= c:
            return c
    return 256


def test_truncation_loss_exact_and_conserving(spark, sf_dir):
    toks = _toks(sf_dir)
    total = sum(toks)
    rows = registry.QUERIES["q_ctx_truncation_loss"](spark, sf_dir).collect()
    assert [r["ctx_len"] for r in rows] == list(_CTX_LENGTHS)
    for r in rows:
        L = r["ctx_len"]
        lost = sum(max(t - L, 0) for t in toks)
        kept = sum(min(t, L) for t in toks)
        assert r["docs_over"] == sum(1 for t in toks if t > L)
        assert r["tokens_lost"] == lost
        assert r["tokens_total"] == total
        assert kept + lost == total  # conservation
        assert r["loss_bp"] == (10_000 * lost) // total
        assert r["docs_over_bp"] == (10_000 * r["docs_over"]) // len(toks)


def test_padding_waste_partitions_and_recomposes(spark, sf_dir):
    toks = _toks(sf_dir)
    rows = registry.QUERIES["q_ctx_padding_waste"](spark, sf_dir).collect()
    assert sum(r["docs"] for r in rows) == len(toks)
    by_cap: dict[int, list[int]] = {}
    for t in toks:
        by_cap.setdefault(_cap(t), []).append(t)
    assert {r["bucket_cap"] for r in rows} == set(by_cap)
    for r in rows:
        ts = by_cap[r["bucket_cap"]]
        cap = r["bucket_cap"]
        kept = sum(min(t, cap) for t in ts)
        pad = sum(max(cap - t, 0) for t in ts)
        assert (r["docs"], r["tokens_kept"], r["pad_tokens"]) == (
            len(ts), kept, pad,
        )
        assert r["trunc_tokens"] == sum(max(t - cap, 0) for t in ts)
        assert kept + pad == len(ts) * cap  # slots identity
        assert r["pad_share_bp"] == (10_000 * pad) // (len(ts) * cap)


def test_chunk_fanout_conserves(spark, sf_dir):
    toks = _toks(sf_dir)
    rows = registry.QUERIES["q_ctx_chunk_fanout"](spark, sf_dir).collect()
    chunks = [max(1, (t + _CHUNK - 1) // _CHUNK) for t in toks]
    assert sum(r["docs"] for r in rows) == len(toks)
    assert sum(r["input_tokens"] for r in rows) == sum(toks)
    total_chunks = sum(chunks)
    for r in rows:
        assert (
            r["chunks"] * _CHUNK * r["docs"]
            == r["input_tokens"] + r["slack_tokens"]
        )
        assert r["chunk_share_bp"] == (
            10_000 * r["chunks"] * r["docs"]
        ) // total_chunks


def test_length_coverage_monotone_to_10000(spark, sf_dir):
    rows = registry.QUERIES["q_ctx_length_coverage"](spark, sf_dir).collect()
    caps = [r["cap"] for r in rows]
    assert caps == sorted(caps)
    dc = [r["doc_coverage_bp"] for r in rows]
    tc = [r["token_coverage_bp"] for r in rows]
    assert dc == sorted(dc) and tc == sorted(tc)
    assert dc[-1] == 10_000 and tc[-1] == 10_000
    # token coverage lags doc coverage everywhere below the top rung:
    # longer docs carry disproportionate tokens
    for d, t in zip(dc[:-1], tc[:-1]):
        assert t <= d
