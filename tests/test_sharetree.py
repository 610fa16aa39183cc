"""Semantic gates for §2.BV (share-of-parent rollup trees).

Oracle parity hash-checks every key; these pin the tree algebra:

1. bv1: levels recompose exactly — child revenues sum to their parent
   at every edge, and shares are the exact truncated bp of the actual
   parent.
2. bv2: the dominant child is the true (rev desc, name asc) max and
   the majority flag matches 2·child > parent.
3. bv3: the conservation row — every level publishes the SAME total.
4. bv4: the top-10 paths equal the independently ranked leaf list and
   chained shares use the right denominators.
"""

from __future__ import annotations

import duckdb

from recommendersystems_bigdata_spark import registry

registry.load_all()


def _leaf(sf_dir):
    rows = duckdb.sql(
        f"""
        SELECT r.r_name, n.n_name, c.c_mktsegment,
               CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT)
        FROM '{sf_dir}/orders.parquet' o
        JOIN '{sf_dir}/customer.parquet' c ON o.o_custkey = c.c_custkey
        JOIN '{sf_dir}/nation.parquet' n ON c.c_nationkey = n.n_nationkey
        JOIN '{sf_dir}/region.parquet' r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1, 2, 3
        """
    ).fetchall()
    return {(rn, nn, seg): int(rev) for rn, nn, seg, rev in rows}


def _rollups(leaf):
    nat, reg = {}, {}
    for (rn, nn, _), rev in leaf.items():
        nat[(rn, nn)] = nat.get((rn, nn), 0) + rev
        reg[rn] = reg.get(rn, 0) + rev
    return nat, reg, sum(leaf.values())


def test_tree_recomposes(spark, sf_dir):
    leaf = _leaf(sf_dir)
    nat, reg, tot = _rollups(leaf)
    rows = registry.QUERIES["q_share_tree"](spark, sf_dir).collect()
    by_level = {}
    for r in rows:
        by_level.setdefault(r["level"], []).append(r)
    assert len(by_level[1]) == len(reg)
    assert len(by_level[2]) == len(nat)
    assert len(by_level[3]) == len(leaf)
    for r in by_level[1]:
        assert r["rev_cents"] == reg[r["r_name"]]
        assert r["share_parent_bp"] == (10_000 * r["rev_cents"]) // tot
        assert r["share_total_bp"] == r["share_parent_bp"]
    for r in by_level[2]:
        assert r["rev_cents"] == nat[(r["r_name"], r["n_name"])]
        assert (
            r["share_parent_bp"]
            == (10_000 * r["rev_cents"]) // reg[r["r_name"]]
        )
    for r in by_level[3]:
        key = (r["r_name"], r["n_name"], r["segment"])
        assert r["rev_cents"] == leaf[key]
        assert (
            r["share_parent_bp"]
            == (10_000 * r["rev_cents"]) // nat[(r["r_name"], r["n_name"])]
        )
        assert r["share_total_bp"] == (10_000 * r["rev_cents"]) // tot
    # edge conservation: children sum exactly to each parent
    for rn in reg:
        assert sum(v for (r2, _), v in nat.items() if r2 == rn) == reg[rn]


def test_dominant_child_is_max(spark, sf_dir):
    leaf = _leaf(sf_dir)
    nat, reg, tot = _rollups(leaf)
    kids = {"ALL": [(v, k) for k, v in reg.items()]}
    for (rn, nn), v in nat.items():
        kids.setdefault(rn, []).append((v, nn))
    for (rn, nn, seg), v in leaf.items():
        kids.setdefault(nn, []).append((v, seg))
    parents = {"ALL": tot}
    parents.update(reg)
    parents.update({nn: v for (_, nn), v in nat.items()})
    rows = registry.QUERIES["q_tree_dominant_child"](spark, sf_dir).collect()
    assert {r["parent"] for r in rows} == set(kids)
    for r in rows:
        # deterministic tiebreak: rev desc, name asc
        top = sorted(kids[r["parent"]], key=lambda t: (-t[0], t[1]))[0]
        assert (r["top_child"], r["child_cents"]) == (top[1], top[0])
        assert r["parent_cents"] == parents[r["parent"]]
        assert r["share_bp"] == (10_000 * top[0]) // parents[r["parent"]]
        assert r["concentrated"] == (2 * top[0] > parents[r["parent"]])


def test_level_profile_conservation(spark, sf_dir):
    leaf = _leaf(sf_dir)
    nat, reg, tot = _rollups(leaf)
    rows = registry.QUERIES["q_tree_level_profile"](spark, sf_dir).collect()
    assert [r["level"] for r in rows] == [1, 2, 3]
    assert {r["level_total_cents"] for r in rows} == {tot}
    assert [r["nodes"] for r in rows] == [len(reg), len(nat), len(leaf)]
    shares = {
        1: [(10_000 * v) // tot for v in reg.values()],
        2: [(10_000 * v) // reg[rn] for (rn, _), v in nat.items()],
        3: [(10_000 * v) // nat[(rn, nn)] for (rn, nn, _), v in leaf.items()],
    }
    for r in rows:
        sp = shares[r["level"]]
        assert r["min_share_bp"] == min(sp)
        assert r["max_share_bp"] == max(sp)
        assert r["mean_share_bp"] == sum(sp) // len(sp)


def test_leaf_paths_top10(spark, sf_dir):
    leaf = _leaf(sf_dir)
    nat, reg, tot = _rollups(leaf)
    ranked = sorted(
        leaf.items(), key=lambda kv: (-kv[1], ">".join(kv[0]))
    )[:10]
    rows = registry.QUERIES["q_tree_leaf_paths"](spark, sf_dir).collect()
    assert [r["path"] for r in rows] == [">".join(k) for k, _ in ranked]
    for r, ((rn, nn, seg), v) in zip(rows, ranked):
        assert r["rev_cents"] == v
        assert r["share_nation_bp"] == (10_000 * v) // nat[(rn, nn)]
        assert r["share_region_bp"] == (10_000 * v) // reg[rn]
        assert r["share_total_bp"] == (10_000 * v) // tot
