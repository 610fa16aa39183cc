"""Semantic gates for the i14/i15 streaming additions.

Oracle parity hash-checks both keys; these pin the watermark-gated
OUTER emission mechanics and the dedup guarantee directly:

1. i14's matched subset equals the batch inner interval join exactly
   (outer never invents or loses a match), and its null-padded rows are
   EXACTLY the match-less events whose one-hour horizon closed before
   the final watermark — no early null (would be contradicted by a
   late match), no missing closure.
2. i15 emits every event exactly once despite double delivery — no
   duplicate survives, nothing is lost.
"""

from __future__ import annotations

import duckdb

from recommendersystems_bigdata_spark import registry

registry.load_all()


def _batch_inner_pairs(sf_dir):
    return set(
        duckdb.sql(
            f"""
            SELECT l.event_id, r.event_id
            FROM '{sf_dir}/events.parquet' l
            JOIN '{sf_dir}/events.parquet' r
              ON l.user_id = r.user_id
             AND r.event_id <> l.event_id
             AND r.ts >= l.ts
             AND r.ts <= l.ts + INTERVAL 1 HOUR
            """
        ).fetchall()
    )


def test_left_outer_matches_and_closed_nulls(spark, sf_dir):
    rows = registry.QUERIES["q_stream_stream_left_outer"](
        spark, sf_dir
    ).collect()
    matched = {(r["l_id"], r["r_id"]) for r in rows if r["r_id"] is not None}
    nulls = {r["l_id"] for r in rows if r["r_id"] is None}
    assert matched == _batch_inner_pairs(sf_dir)
    expect_nulls = {
        i
        for (i,) in duckdb.sql(
            f"""
            SELECT l.event_id FROM '{sf_dir}/events.parquet' l
            WHERE NOT EXISTS (
              SELECT 1 FROM '{sf_dir}/events.parquet' r
              WHERE r.user_id = l.user_id
                AND r.event_id <> l.event_id
                AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 1 HOUR
            )
            AND l.ts + INTERVAL 1 HOUR
                < (SELECT max(ts) - INTERVAL 1 HOUR
                   FROM '{sf_dir}/events.parquet')
            """
        ).fetchall()
    }
    assert nulls == expect_nulls
    # an event is either matched or null-padded, never both
    assert not (nulls & {l for l, _r in matched})


def test_dedup_within_watermark_is_exact(spark, sf_dir):
    rows = registry.QUERIES["q_stream_dedup_within_watermark"](
        spark, sf_dir
    ).collect()
    ids = [r["event_id"] for r in rows]
    assert len(ids) == len(set(ids)), "a duplicate survived"
    expect = {
        i: (u, t)
        for i, u, t in duckdb.sql(
            f"SELECT event_id, user_id, event_type"
            f" FROM '{sf_dir}/events.parquet'"
        ).fetchall()
    }
    got = {r["event_id"]: (r["user_id"], r["event_type"]) for r in rows}
    assert got == expect
