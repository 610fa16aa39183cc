"""Semantic gates for §2.AG (workday/calendar) and §2.AH (sketch algebra).

Oracle parity hash-checks every key; these pin the arithmetic claims the
SQL twin shares with the Spark spelling (and so can't falsify):

1. The closed-form business-day count equals a literal loop over the
   day range, for every (start dow, length) — hypothesis-fuzzed.
2. The epoch-arithmetic weekday (Monday=0) agrees with Python's
   ``date.weekday()`` across a fuzzed date range — i.e. the formula,
   not an engine convention, defines the suite's day-of-week.
3. KMV estimator correctness-by-construction: on the corpus, the
   bottom-k membership estimate equals the exact value computed over
   the same bottom-k set by an independent Python pass (catches a
   wrong tie-break or off-by-one in the rank window).
4. The 62-bit bitmap pack/unpack round-trips arbitrary id sets.
"""

from __future__ import annotations

from datetime import date, timedelta

from hypothesis import given, settings, strategies as st

from recommendersystems_bigdata_spark import registry

registry.load_all()


def _biz_closed(e1: int, n: int) -> int:
    w, r = n // 7, n % 7
    d = (e1 + 3) % 7
    return 5 * w + r - max(0, min(d + r, 7) - max(d, 5))


@settings(max_examples=500, deadline=None)
@given(e1=st.integers(min_value=0, max_value=40000), n=st.integers(min_value=0, max_value=5000))
def test_business_day_closed_form_matches_loop(e1, n):
    """ag1's closed form == the literal 'count weekdays in [e1, e1+n)'
    loop (loop capped via 7-periodicity for large n)."""
    full, rem = n // 7 * 5, n % 7
    loop = full + sum(1 for i in range(rem) if ((e1 + n - rem + i) + 3) % 7 <= 4)
    assert _biz_closed(e1, n) == loop


@settings(max_examples=300, deadline=None)
@given(days=st.integers(min_value=0, max_value=40000))
def test_epoch_dow_matches_python_weekday(days):
    """(epoch_day + 3) % 7 == datetime.date.weekday() (Monday=0)."""
    d = date(1970, 1, 1) + timedelta(days=days)
    assert (days + 3) % 7 == d.weekday()


def test_kmv_estimates_match_python_reference(spark, sf_dir):
    """ah1's per-pair (k_eff, jaccard_est_bp) equals an independent
    Python construction of the same bottom-k-by-md5 sketch."""
    import duckdb
    from hashlib import md5

    rows = duckdb.sql(
        f"SELECT DISTINCT user_id, event_type FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    members: dict[str, set[int]] = {}
    for uid, t in rows:
        members.setdefault(t, set()).add(uid)
    got = {
        (r["ta"], r["tb"]): (r["k_eff"], r["jaccard_est_bp"])
        for r in registry.QUERIES["q_kmv_jaccard_matrix"](spark, sf_dir).collect()
    }
    types = sorted(members)
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            union = members[ta] | members[tb]
            ranked = sorted(union, key=lambda u: (md5(str(u).encode()).hexdigest(), u))
            k_eff = min(64, len(union))
            bottom = set(ranked[:k_eff])
            k_both = len(bottom & members[ta] & members[tb])
            assert got[(ta, tb)] == (k_eff, 10000 * k_both // k_eff), (ta, tb)


@settings(max_examples=300, deadline=None)
@given(ids=st.sets(st.integers(min_value=0, max_value=5000), max_size=200))
def test_bitmap_words_roundtrip(ids):
    """ah3's 62-bit packing: OR-aggregated words reproduce exactly the
    packed id set (cardinality via popcount, membership via bit test)."""
    words: dict[int, int] = {}
    for i in ids:
        words[i // 62] = words.get(i // 62, 0) | (1 << (i % 62))
    assert sum(bin(w).count("1") for w in words.values()) == len(ids)
    unpacked = {
        wid * 62 + b for wid, w in words.items() for b in range(62) if w >> b & 1
    }
    assert unpacked == ids
