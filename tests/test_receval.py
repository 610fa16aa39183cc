"""Semantic gates for the §2.AC recommender-evaluation family (beyond
oracle parity): brute-force Python references over the collected
sf0.001 orders/lineitem tables, including a full reimplementation of
the co-occurrence rec list — a rec-list definition slip that happened
to agree with an equally-wrong oracle spelling still fails here.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

from recommendersystems_bigdata_spark import registry
from recommendersystems_bigdata_spark.catalog import load_tables

registry.load_all()


def _interactions(spark, sf_dir):
    """(order_parts, user_items, order_seq): the three base relations."""
    orders, lineitem = load_tables(spark, sf_dir, "orders", "lineitem")
    li = lineitem.select("l_orderkey", "l_partkey").collect()
    od = orders.select("o_custkey", "o_orderkey", "o_orderdate").collect()
    order_parts = defaultdict(set)
    for r in li:
        order_parts[r["l_orderkey"]].add(r["l_partkey"])
    cust_of = {r["o_orderkey"]: r["o_custkey"] for r in od}
    user_items = defaultdict(set)
    for ok, parts in order_parts.items():
        if ok in cust_of:
            for p in parts:
                user_items[cust_of[ok]].add(p)
    order_seq = defaultdict(list)
    for r in od:
        order_seq[r["o_custkey"]].append((r["o_orderdate"], r["o_orderkey"]))
    for v in order_seq.values():
        v.sort()
    return order_parts, user_items, order_seq


def _ref_recs(order_parts, user_items):
    """q_item_recs_cooccur's top-3 list, recomputed independently."""
    co = defaultdict(int)
    for parts in order_parts.values():
        for a in parts:
            for b in parts:
                if a != b:
                    co[(a, b)] += 1
    co = {k: v for k, v in co.items() if v >= 2}
    by_i = defaultdict(list)
    for (i, j), c in co.items():
        by_i[i].append((-c, j))
    neighbors = {i: sorted(v)[:10] for i, v in by_i.items()}
    recs = {}
    for u, items in user_items.items():
        score = defaultdict(int)
        for i in items:
            for negc, j in neighbors.get(i, ()):
                if j not in items:
                    score[j] += -negc
        top = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        if top:
            recs[u] = [j for j, _ in top]
    return recs


def test_catalog_coverage_and_gini_match_reference(spark, sf_dir):
    order_parts, user_items, _ = _interactions(spark, sf_dir)
    recs = _ref_recs(order_parts, user_items)
    exposure = defaultdict(int)
    for items in recs.values():
        for j in items:
            exposure[j] += 1
    total_slots = sum(exposure.values())
    n_rec = len(exposure)
    parts = load_tables(spark, sf_dir, "part")[0].count()
    row = registry.QUERIES["q_rec_catalog_coverage"](spark, sf_dir).collect()[0]
    assert row["n_catalog"] == parts
    assert row["n_recommended"] == n_rec
    assert row["coverage_bp"] == (10000 * n_rec) // parts
    assert row["total_slots"] == total_slots
    assert row["max_exposure"] == max(exposure.values())
    assert row["max_exposure_bp"] == (10000 * max(exposure.values())) // total_slots
    # Gini over the same exposure counts (ascending by (slots, item))
    ranked = sorted(exposure.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(ranked)
    total = sum(s for _, s in ranked)
    weighted = sum((i + 1) * s for i, (_, s) in enumerate(ranked))
    import math

    gini = math.floor(
        (2.0 * weighted - (n + 1.0) * total) / (float(n) * total) * 1_000_000
    )
    g = registry.QUERIES["q_rec_exposure_gini"](spark, sf_dir).collect()[0]
    assert (g["n_items"], g["total_slots"], g["gini_x1e6"]) == (n, total, gini)


def test_popularity_bias_matches_reference(spark, sf_dir):
    order_parts, user_items, _ = _interactions(spark, sf_dir)
    recs = _ref_recs(order_parts, user_items)
    pop = defaultdict(int)
    for items in user_items.values():
        for p in items:
            pop[p] += 1
    cat_sum, n_items = sum(pop.values()), len(pop)
    rec_sum = sum(pop[j] for items in recs.values() for j in items)
    n_slots = sum(len(items) for items in recs.values())
    row = registry.QUERIES["q_rec_popularity_bias"](spark, sf_dir).collect()[0]
    assert row["n_bought_items"] == n_items
    assert row["catalog_pop_sum"] == cat_sum
    assert row["n_rec_slots"] == n_slots
    assert row["rec_pop_sum"] == rec_sum
    assert row["bias_bp"] == (10000 * rec_sum * n_items) // (n_slots * cat_sum)
    assert row["bias_bp"] > 10000  # co-occurrence recs skew popular


def test_next_part_transitions_match_reference(spark, sf_dir):
    order_parts, _, order_seq = _interactions(spark, sf_dir)
    trans = defaultdict(int)
    for seq in order_seq.values():
        for (_, ok_i), (_, ok_j) in zip(seq, seq[1:]):
            for a in order_parts.get(ok_i, ()):
                for b in order_parts.get(ok_j, ()):
                    if a != b:
                        trans[(a, b)] += 1
    top3 = defaultdict(list)
    for (a, b), c in trans.items():
        top3[a].append((-c, b))
    expected = {}
    for a, v in top3.items():
        for rank, (negc, b) in enumerate(sorted(v)[:3], start=1):
            expected[(a, b)] = (-negc, rank)
    rows = registry.QUERIES["q_rec_next_part_transitions"](spark, sf_dir).collect()
    got = {(r["from_part"], r["to_part"]): (r["n_transitions"], r["rank"]) for r in rows}
    assert got == expected
    assert got, "no transitions — corpus degenerate"


def test_negative_sampling_matches_reference(spark, sf_dir):
    order_parts, user_items, _ = _interactions(spark, sf_dir)
    panel = sorted(user_items, key=lambda u: (-len(user_items[u]), u))[:20]
    catalog = set()
    for parts in order_parts.values():
        catalog.update(parts)
    expected = []
    for u in sorted(panel):
        cand = [
            (hashlib.md5(f"{u}:{p}".encode()).hexdigest(), p)
            for p in catalog
            if p not in user_items[u]
        ]
        for rank, (_, p) in enumerate(sorted(cand)[:3], start=1):
            expected.append((u, p, rank))
    rows = registry.QUERIES["q_rec_negative_sampling"](spark, sf_dir).collect()
    got = [(r["user_id"], r["neg_item"], r["rank"]) for r in rows]
    assert got == expected
    # negatives must be genuinely unowned
    for u, p, _ in got:
        assert p not in user_items[u]
