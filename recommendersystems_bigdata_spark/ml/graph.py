"""Graph analytics over the item co-purchase graph (SURVEY.md §2.N):
fixed-iteration integer-scaled PageRank and the degree distribution.

Both operators run on the same graph the triangle counter
(ml/recommender.py q_graph_triangles) analyzes: parts are nodes, and an
undirected edge connects two parts that co-occur in ≥2 distinct orders.
The edge build is the expensive leg at 100 TB (a per-basket fact
self-join, shuffling on part id); the analytics on the aggregated graph
are edge-linear per iteration.

Determinism discipline (the repo-wide integer-exactness rule): PageRank
is usually a float fixpoint, which is NOT reproducible across engines —
partial-sum order changes the low bits, and rank ties then break
differently. Here every iteration is pure 64-bit integer arithmetic
(micro-scaled ranks, floor-division shares, cross-multiplied damping),
so Spark and DuckDB produce bit-identical ranks, a rerun on a different
partition layout produces bit-identical ranks, and the oracle check is
an exact hash match rather than a tolerance band.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_tables
from recommendersystems_bigdata_spark.registry import query

# Shared oracle prefix: the co-purchase edge set, directed both ways, with
# out-degrees. Matches the q_graph_triangles edge definition exactly.
# Built as BODY + explicit WITH/WITH RECURSIVE prefixes (never a string
# .replace over the shared text — a future edit introducing another 'WITH'
# substring in the prefix would silently corrupt the recursive variant).
_EDGE_CTES_BODY = """li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS co
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    e AS (SELECT pa, pb FROM pairs WHERE co >= 2),
    ed AS (SELECT pa AS src, pb AS dst FROM e
           UNION ALL SELECT pb AS src, pa AS dst FROM e),
    od AS (SELECT src, count(*) AS od FROM ed GROUP BY src),
    nodes AS (SELECT src AS part, od AS degree FROM od)
"""

_EDGE_CTES = "\n    WITH " + _EDGE_CTES_BODY
_EDGE_CTES_RECURSIVE = "\n    WITH RECURSIVE " + _EDGE_CTES_BODY

_PR_ITERS = 3


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected co-purchase edges (pa < pb, co-ordered ≥ 2), checkpointed
    so the two downstream passes (degree + analytics) don't re-run the
    basket self-join."""
    (raw,) = load_tables(spark, sf_dir, "lineitem")
    li = raw.select("l_orderkey", "l_partkey").distinct()
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .agg(F.count(F.lit(1)).alias("co"))
    )
    return pairs.filter(F.col("co") >= 2).select("pa", "pb").localCheckpoint()


def pagerank_micros(edges: DataFrame, iters: int = _PR_ITERS) -> DataFrame:
    """Fixed-iteration integer PageRank over an undirected edge list.

    ``edges`` holds one row per undirected edge ``(pa, pb)``. Ranks are
    micro-scaled longs: every node starts at 1_000_000 (mass N, not 1, so
    no N-divide is needed), and each synchronous step computes

        r'(v) = 150_000 + (85 * Σ_{u~v} (r(u) div deg(u))) div 100

    i.e. damping d = 0.85 with a per-node restart mass of 0.15, all in
    64-bit integer arithmetic (floor division; every operand positive, so
    Spark's truncating ``div`` and DuckDB's flooring ``//`` agree). The
    symmetrized graph has no dangling nodes by construction — every node
    carries at least one edge, so no leaked-mass correction term exists.

    Scale design: the edge+degree frame is checkpointed once and reused by
    all iterations; each iteration is one hash join (ranks onto edges, key
    = node id) and one groupBy(dst) — both shuffle on node id, so at a
    fixed partitioning the rank table co-locates with the edge partitions
    round over round. Per-iteration ``localCheckpoint`` cuts the lineage so
    the k-th plan doesn't replay k-1 rounds (same pattern as the
    label-propagation clusterer, ml/dedup.py). Iteration count is FIXED
    (k=3), not convergence-tested: a data-dependent stopping rule would
    make the operator's output depend on float residuals; a fixed horizon
    keeps it deterministic and lets the oracle unroll the same k steps as
    plain SQL.
    """
    ed = edges.selectExpr("pa AS src", "pb AS dst").union(
        edges.selectExpr("pb AS src", "pa AS dst")
    )
    outdeg = ed.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    # src, dst, od — the static per-iteration operand, checkpointed once.
    ed_od = ed.join(outdeg, "src").localCheckpoint()
    nodes = outdeg.select(F.col("src").alias("part"), F.col("od").alias("degree"))
    r = nodes.select("part", F.lit(1_000_000).cast("long").alias("r"))
    for _ in range(iters):
        contrib = (
            ed_od.join(r.withColumnRenamed("part", "src"), "src")
            .select("dst", F.expr("r div od").alias("share"))
            .groupBy("dst")
            .agg(F.sum("share").alias("c"))
        )
        r = (
            nodes.select("part")
            .join(contrib.withColumnRenamed("dst", "part"), "part", "left")
            .select(
                "part",
                (F.lit(150_000) + F.expr("(85 * coalesce(c, CAST(0 AS BIGINT))) div 100"))
                .cast("long")
                .alias("r"),
            )
            .localCheckpoint()
        )
    return nodes.join(r, "part").select(
        "part", "degree", F.col("r").alias("rank_micros")
    )


@query(
    "q_graph_pagerank",
    oracle=_EDGE_CTES
    + """,
    r0 AS (SELECT part, CAST(1000000 AS BIGINT) AS r FROM nodes),
    r1 AS (SELECT n.part, CAST(150000 + (85 * coalesce(c.c, 0)) // 100 AS BIGINT) AS r
           FROM nodes n LEFT JOIN (
             SELECT ed.dst AS part, sum(r0.r // od.od) AS c
             FROM ed JOIN r0 ON ed.src = r0.part JOIN od ON ed.src = od.src
             GROUP BY ed.dst) c USING (part)),
    r2 AS (SELECT n.part, CAST(150000 + (85 * coalesce(c.c, 0)) // 100 AS BIGINT) AS r
           FROM nodes n LEFT JOIN (
             SELECT ed.dst AS part, sum(r1.r // od.od) AS c
             FROM ed JOIN r1 ON ed.src = r1.part JOIN od ON ed.src = od.src
             GROUP BY ed.dst) c USING (part)),
    r3 AS (SELECT n.part, CAST(150000 + (85 * coalesce(c.c, 0)) // 100 AS BIGINT) AS r
           FROM nodes n LEFT JOIN (
             SELECT ed.dst AS part, sum(r2.r // od.od) AS c
             FROM ed JOIN r2 ON ed.src = r2.part JOIN od ON ed.src = od.src
             GROUP BY ed.dst) c USING (part))
    SELECT n.part, n.degree, r3.r AS rank_micros
    FROM nodes n JOIN r3 USING (part)
    """,
)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n1 — item-importance ranking: 3-iteration integer PageRank over the
    co-purchase graph. The item-graph centrality signal recommenders use
    for popularity-debiased ranking, computed with bit-identical results
    on any engine or partition layout (see pagerank_micros).

    The DuckDB oracle unrolls the same three integer steps as a CTE chain
    — no recursion, no tolerance: the hash compare is exact."""
    return pagerank_micros(copurchase_edges(spark, sf_dir))


def min_label_components(edges: DataFrame) -> DataFrame:
    """Connected components of an undirected ``(pa, pb)`` edge list via
    iterative min-label propagation: returns ``(part, label)`` with label
    = min node id in the component. Driver loop with per-round
    ``localCheckpoint`` (lineage-cut), same pattern as the near-dup
    clusterer (ml/dedup.py); rounds ~ component diameter, each round one
    edge join + one min groupBy, both shuffling on node id. Labels are
    integers, so the stopping rule ("no label decreased") is exact."""
    ed = edges.selectExpr("pa AS src", "pb AS dst").union(
        edges.selectExpr("pb AS src", "pa AS dst")
    ).localCheckpoint()
    nodes = ed.select(F.col("src").alias("part")).distinct()
    labels = nodes.select("part", F.col("part").alias("label"))
    while True:
        msgs = ed.join(labels.withColumnRenamed("part", "src"), "src").select(
            F.col("dst").alias("part"), "label"
        )
        new_labels = (
            labels.union(msgs).groupBy("part").agg(F.min("label").alias("label"))
        ).localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "part")
            .filter(F.col("n.label") < F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def star_round(e: DataFrame) -> DataFrame:
    """One large-star + small-star contraction round over a canonical
    ``(big, small)`` edge frame; returns the next round's canonical frame
    (not checkpointed — the loop owns materialization).

    Plan shape (pinned in tests/test_plans.py): exactly the two
    whole-partition window-min exchanges plus the output distinct — NO
    join. The neighborhood min is a window over the node key — one
    exchange that both computes the min and leaves every (u, v) row
    annotated with it, where a groupBy+join spelling pays a second
    exchange (or a rebuilt hash side) to re-attach the min. Same
    co-partitioning, same skew bound (a hub's neighborhood lands in one
    task either way). The large-star intermediate is NOT distinct'd:
    duplicates can't change the small-star min and the final distinct
    dedupes the output, so deduping it would only add an exchange.
    """
    # large-star: symmetric neighborhoods, min includes self.
    sym = e.selectExpr("big AS u", "small AS v").union(
        e.selectExpr("small AS u", "big AS v")
    )
    wu = Window.partitionBy("u")
    large = (
        sym.withColumn("m", F.least(F.col("u"), F.min("v").over(wu)))
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("big"), F.col("m").alias("small"))
        .filter(F.col("big") != F.col("small"))
    )
    # small-star: (big → smaller neighbors ∪ self) re-attach to min.
    wb = Window.partitionBy("big")
    return (
        large.withColumn("m", F.min("small").over(wb))
        .selectExpr(
            "CASE WHEN small = m THEN big ELSE small END AS big",
            "m AS small",
        )
        .filter(F.col("big") != F.col("small"))
        .distinct()
    )


def star_components(
    edge_pairs: DataFrame, stats: dict | None = None
) -> DataFrame:
    """Connected components via alternating large-star/small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14): returns ``(part, label)`` with label = min node id
    in the component, for every node incident to an edge.

    Input is an undirected unique edge list ``(src, dst)`` (either
    orientation, one row per edge). Per round:

    * **large-star** — symmetrize, group by node, attach every strictly
      LARGER neighbor to ``m = min(neighborhood ∪ {self})``;
    * **small-star** — orient every edge (max → min), group by the max
      side, attach the node and its smaller neighbors to their min.

    Both steps preserve connectivity and only ever re-attach nodes to
    smaller ids, so the fixpoint is a forest of stars rooted at each
    component's MINIMUM — the same labeling :func:`min_label_components`
    computes. The difference is the convergence law: min-label needs
    rounds ~ component DIAMETER (a 100 TB web-ish graph with a long path
    pays diameter-many shuffles), star contraction needs O(log² n) worst
    case and ~log₂(diameter)+c observed (pinned on a 64-node path in
    tests/test_graph.py) because every round halves star depth the way
    pointer-jumping does. Each round is two whole-partition window-min
    exchanges + one distinct, all on node id (round 7: the windows
    replaced groupBy-then-join pairs — one exchange each instead of two,
    same co-partitioning and skew bound; and the large-star intermediate
    is NOT distinct'd, since the small-star min is duplicate-insensitive
    and the round's final distinct dedupes the output); per-round
    ``localCheckpoint`` cuts lineage exactly like the min-label loop.

    Stopping rule — exact, two-tier (round 7; fused round 11): each
    round fingerprints the edge set as ``(count, sum(xxhash64(big,
    small)) in decimal(38,0))`` — a commutative exact integer pair,
    layout/order-invariant, overflow-free — and since round 11 the
    fingerprint rides the round's ``localCheckpoint`` materialization
    as an ``observe`` observation, so the whole round is ONE Spark job
    (the round-7 spelling paid a separate aggregate job per round; at
    sf0.1 the loop is scheduler-bound and the fusion halves its job
    count, at 100 TB it removes one full edge-set pass per round).
    Only when the fingerprint equals the previous round's does the loop
    run the exact ``exceptAll`` set-difference confirmation (equal
    cardinality + empty one-sided difference ⊢ set equality, so a hash
    collision can never terminate early — it only costs one extra
    confirmation join). The round-7 two-tier design itself replaced two
    count jobs + a per-candidate-round join (~35% of loop wall time on
    a 146-edge graph), and at 100 TB the saved ``exceptAll`` rounds are
    full shuffle joins of the edge set.

    ``stats``, when given, receives ``{"rounds": n}`` for round-count
    assertions.
    """
    def checkpoint_with_fingerprint(df: DataFrame) -> tuple[DataFrame, tuple]:
        """Materialize a canonical edge frame AND read its (count, exact
        hash-sum) fingerprint out of the SAME job: the metrics ride the
        ``localCheckpoint`` materialization as an ``observe`` observation,
        so each contraction round costs ONE Spark job, not a checkpoint
        job plus a fingerprint-aggregate job (round 11; guide §1/§2 —
        at sf0.1 the loop is scheduler-bound and this halves its job
        count, on a cluster it removes one full pass over the edge set
        per round). The pair is a commutative exact integer fingerprint:
        layout/order-invariant, overflow-free in decimal(38,0)."""
        obs = Observation()
        out = df.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("big", "small").cast("decimal(38,0)")).alias("h"),
        ).localCheckpoint()
        row = obs.get  # the checkpoint already ran the job; this just reads
        return out, (row["n"], row["h"])

    # Canonical orientation (big, small), deduped: the contraction state.
    e, prev_fp = checkpoint_with_fingerprint(
        edge_pairs.select(
            F.greatest("src", "dst").alias("big"), F.least("src", "dst").alias("small")
        )
        .filter(F.col("big") != F.col("small"))
        .distinct()
    )
    # Every node ever seen (isolated-in-contraction roots still need rows).
    # Plain lineage (round 11): nodes is consumed exactly ONCE (the
    # roots anti-join after the loop) and derives from the CHECKPOINTED
    # initial edge frame, so materializing it bought nothing — the old
    # localCheckpoint here was one whole eager job per invocation.
    nodes = (
        e.select(F.col("big").alias("part"))
        .union(e.select(F.col("small").alias("part")))
        .distinct()
    )
    rounds = 0
    while True:
        rounds += 1
        # Two-tier exact stop: cheap exact fingerprint per round (fused
        # into the round's checkpoint job); on a fingerprint match,
        # confirm set equality exactly (equal counts + empty one-sided
        # difference) so a hash collision can only cost a wasted
        # confirmation join, never a wrong early stop.
        small, fp = checkpoint_with_fingerprint(star_round(e))
        if fp == prev_fp and small.exceptAll(e).limit(1).count() == 0:
            e = small
            break
        prev_fp = fp
        e = small
    if stats is not None:
        stats["rounds"] = rounds
    # Fixpoint is a star forest oriented (child=big → root=small): child
    # labels read off the edges, roots (and nodes contracted to
    # themselves) label themselves.
    child = e.select(F.col("big").alias("part"), F.col("small").alias("label"))
    roots = nodes.join(child, "part", "left_anti").select(
        "part", F.col("part").alias("label")
    )
    return child.union(roots)


@query(
    "q_graph_components",
    oracle=_EDGE_CTES_RECURSIVE
    + """,
    walk(part, label) AS (
      SELECT part, part FROM nodes
      UNION
      SELECT e.dst, w.label FROM walk w JOIN ed e ON e.src = w.part
      WHERE w.label < e.dst
    ),
    comp AS (SELECT part, min(label) AS component_id FROM walk GROUP BY part),
    sizes AS (SELECT component_id, count(*) AS component_size
              FROM comp GROUP BY component_id)
    SELECT c.part, c.component_id, s.component_size
    FROM comp c JOIN sizes s USING (component_id)
    """,
)
def q_graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n3 — connected components of the co-purchase graph: assortment
    clusters (sets of parts transitively linked by co-purchase), labeled
    by min part id, with component sizes. The structure signal between
    per-node centrality (n1) and global shape (n2): a recommender shards
    its item graph by component, and a merchandiser reads the giant
    component's share directly off this table.

    Spark side: alternating large-star/small-star contraction
    (:func:`star_components`) — rounds ~ log of the component diameter
    rather than the diameter itself, the kernel a 100 TB web-ish graph
    needs; the min-label propagator (:func:`min_label_components`)
    remains as the small-diameter alternative and the two are pinned
    label-identical on random graphs in tests/test_graph.py (cutover
    criterion in SCALE.md §2.N). Labels are integers and the stopping
    rule is exact set equality — no float residual. The DuckDB oracle
    computes min reachable label with a recursive CTE; integer labels
    make the hash compare exact."""
    labels = star_components(
        copurchase_edges(spark, sf_dir).selectExpr("pa AS src", "pb AS dst")
    )
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("component_size"))
    return labels.join(sizes, "label").select(
        "part", F.col("label").alias("component_id"), "component_size"
    )


@query(
    "q_graph_degree_distribution",
    oracle=_EDGE_CTES
    + """,
    tot AS (SELECT count(*) AS n_total FROM nodes)
    SELECT CAST(1 << (length(bin(degree)) - 1) AS BIGINT) AS bucket_lo,
           count(*) AS n_parts,
           CAST((count(*) * 10000) // max(tot.n_total) AS BIGINT) AS share_bp
    FROM nodes, tot
    GROUP BY 1
    """,
)
def q_graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n2 — power-of-2 degree histogram of the co-purchase graph: the
    skew pre-flight for every graph operator here (a heavy tail in this
    table is the signal to switch the wedge join to degree-ordered
    orientation, and to salt the PageRank contribution groupBy).

    Bucketing is integer-exact on both engines: floor(log2(degree)) is
    computed as length-of-binary-string minus one — log2 via floats
    rounds wrong at exact powers of two on engines that lower it to
    ln(x)/ln(2). The share is a basis-point integer cross-multiply, not a
    rounded float ratio. Scale: one groupBy on a key with ≤ 64 distinct
    values after the degree aggregation; the 1-row total broadcasts."""
    e = copurchase_edges(spark, sf_dir)
    deg = (
        e.select(F.col("pa").alias("part"))
        .union(e.select(F.col("pb").alias("part")))
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    total = deg.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        deg.select((F.length(F.bin(F.col("degree"))) - 1).cast("int").alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .join(F.broadcast(total), how="cross")
        .select(
            F.expr("CAST(shiftleft(CAST(1 AS BIGINT), k) AS BIGINT)").alias("bucket_lo"),
            "n_parts",
            F.expr("CAST((n_parts * 10000) div n_total AS BIGINT)").alias("share_bp"),
        )
    )


_BFS_HOPS = 4


def bfs_hops(edges: DataFrame, seeds: DataFrame, max_hops: int = _BFS_HOPS) -> DataFrame:
    """Multi-source breadth-first hop distance over an undirected
    ``(pa, pb)`` edge list, bounded at ``max_hops``: returns
    ``(part, hops)`` for every node reachable from the seed set within
    the bound, ``hops`` = exact minimum hop count (seeds at 0).

    Frontier algorithm: round h joins ONLY the newly-reached frontier
    onto the edge list and anti-joins the visited set, so per-round work
    is proportional to the frontier's edge boundary, not the whole graph
    — the textbook distributed-BFS shape (each round = one hash join on
    node id + one distinct + one anti join, all shuffling on node id, so
    a fixed partitioning co-locates them round over round). The horizon
    is CAPPED at ``max_hops``, matching the oracle's recursion bound, and
    the loop breaks as soon as a round's frontier comes back empty: the
    emptiness probe is one job over the already-checkpointed frontier,
    where letting the loop run to the horizon would pay the full
    join+distinct+anti-join round (each round ends in an EAGER
    ``localCheckpoint``, so an "empty no-op round" still launches real
    jobs — the round-7 docstring's claim that AQE absorbs them was
    wrong). Output is unaffected by the early exit — an empty frontier
    can never reach new nodes — so the oracle compare is identical.
    Per-round ``localCheckpoint`` cuts lineage exactly as pagerank_micros
    does. Hop distances are integers — the hash compare is exact."""
    ed = edges.selectExpr("pa AS src", "pb AS dst").union(
        edges.selectExpr("pb AS src", "pa AS dst")
    ).localCheckpoint()
    visited = seeds.select("part", F.lit(0).cast("long").alias("hops"))
    frontier = visited.select("part").localCheckpoint()
    for h in range(1, max_hops + 1):
        reached = (
            ed.join(frontier.withColumnRenamed("part", "src"), "src")
            .select(F.col("dst").alias("part"))
            .distinct()
            .join(visited, "part", "left_anti")
            .localCheckpoint()
        )
        if reached.isEmpty():
            break
        visited = visited.union(
            reached.select("part", F.lit(h).cast("long").alias("hops"))
        ).localCheckpoint()
        frontier = reached
    return visited


@query(
    "q_graph_bfs_reach",
    oracle=_EDGE_CTES_RECURSIVE
    + """,
    seeds AS (SELECT part FROM nodes WHERE part % 17 = 0),
    walk(part, hops) AS (
      SELECT part, 0 FROM seeds
      UNION
      SELECT e.dst, w.hops + 1 FROM walk w JOIN ed e ON e.src = w.part
      WHERE w.hops < 4
    ),
    dist AS (SELECT part, min(hops) AS hops FROM walk GROUP BY part)
    SELECT n.part, CAST(coalesce(d.hops, -1) AS BIGINT) AS hops
    FROM nodes n LEFT JOIN dist d USING (part)
    """,
)
def q_graph_bfs_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n4 — multi-source bounded BFS: exact hop distance from a seed item
    set over the co-purchase graph, horizon 4; unreachable-within-horizon
    nodes report −1. The neighborhood-expansion primitive behind
    "items within k recommendation hops of the catalog anchors" and the
    reachability leg of graph-based dedup triage — and the third
    iteration archetype in §2.N next to the fixpoint contraction (n3)
    and the fixed-iteration numeric loop (n1): fixed-horizon frontier
    expansion with per-round state growth.

    Seeds are the graph nodes with part id ≡ 0 (mod 17) — deterministic
    and non-empty at every test SF. The DuckDB oracle walks the same
    edges with a bounded recursive CTE in (part, hops)-state space
    (UNION-dedup keeps it at ≤ |V|·(H+1) states, never path-enumeration)
    and takes min hops per node; integer distances make the compare an
    exact hash match.

    Scale design: see :func:`bfs_hops` — frontier-proportional rounds,
    H fixed at 4 so the oracle and the engine share the horizon. The
    final left join re-attaches never-reached nodes map-side from the
    broadcastable node list at test SFs; at 100 TB it's one more shuffle
    on node id, co-partitioned with the BFS output."""
    edges = copurchase_edges(spark, sf_dir)
    ed_nodes = edges.select(F.col("pa").alias("part")).union(
        edges.select(F.col("pb").alias("part"))
    ).distinct()
    seeds = ed_nodes.filter(F.col("part") % 17 == 0)
    dist = bfs_hops(edges, seeds)
    return ed_nodes.join(dist, "part", "left").select(
        "part", F.coalesce(F.col("hops"), F.lit(-1)).cast("long").alias("hops")
    )


_KCORE_K = 2
_KCORE_ROUNDS = 3


def kcore_peel(edges: DataFrame, k: int = _KCORE_K, rounds: int = _KCORE_ROUNDS) -> DataFrame:
    """Bounded k-core peel over an undirected ``(pa, pb)`` edge list:
    ``rounds`` synchronous peel steps, each dropping every node whose
    degree in the CURRENT subgraph is < k and every edge touching one;
    returns ``(part, core_degree)`` for the surviving subgraph's nodes
    with their within-subgraph degree.

    The horizon is FIXED (matching the oracle's unrolled CTE chain), with
    the BFS-style early exit: if a round drops no node the subgraph is
    already stable, every remaining round is the identity, and the
    output equals the full-horizon output — so breaking early never
    changes the result, it only skips the per-round job overhead an
    eager ``localCheckpoint`` would still pay (see :func:`bfs_hops`).

    Scale design: each round is one degree groupBy + two semi-joins
    (edge endpoints against the kept-node set), all shuffling on node
    id, so a fixed partitioning co-locates round over round;
    ``localCheckpoint`` cuts lineage per round. The dropped-node probe
    is one count on the ≤|V|-row degree frame. Peel-to-fixpoint is the
    same loop with the horizon removed; the fixed horizon keeps the
    operator's output oracle-checkable as plain unrolled SQL, exactly
    the n1/n4 discipline."""
    e = edges.select("pa", "pb").localCheckpoint()
    for _ in range(rounds):
        ed = e.selectExpr("pa AS src", "pb AS dst").union(
            e.selectExpr("pb AS src", "pa AS dst")
        )
        deg = ed.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        kept = deg.filter(F.col("d") >= k).select(F.col("src").alias("part"))
        kept = kept.localCheckpoint()
        n_before = deg.count()
        n_after = kept.count()
        e = (
            e.join(kept.withColumnRenamed("part", "pa"), "pa", "left_semi")
            .join(kept.withColumnRenamed("part", "pb"), "pb", "left_semi")
            .select("pa", "pb")
            .localCheckpoint()
        )
        if n_after == n_before:
            break
    ed = e.selectExpr("pa AS src", "pb AS dst").union(
        e.selectExpr("pb AS src", "pa AS dst")
    )
    return ed.groupBy(F.col("src").alias("part")).agg(
        F.count(F.lit(1)).alias("core_degree")
    )


@query(
    "q_graph_kcore",
    oracle=_EDGE_CTES
    + """,
    k1 AS (SELECT src AS part FROM od WHERE od >= 2),
    e1 AS (SELECT e.pa, e.pb FROM e
           JOIN k1 a ON e.pa = a.part JOIN k1 b ON e.pb = b.part),
    ed1 AS (SELECT pa AS src, pb AS dst FROM e1
            UNION ALL SELECT pb, pa FROM e1),
    d1 AS (SELECT src, count(*) AS d FROM ed1 GROUP BY 1),
    k2 AS (SELECT src AS part FROM d1 WHERE d >= 2),
    e2 AS (SELECT e1.pa, e1.pb FROM e1
           JOIN k2 a ON e1.pa = a.part JOIN k2 b ON e1.pb = b.part),
    ed2 AS (SELECT pa AS src, pb AS dst FROM e2
            UNION ALL SELECT pb, pa FROM e2),
    d2 AS (SELECT src, count(*) AS d FROM ed2 GROUP BY 1),
    k3 AS (SELECT src AS part FROM d2 WHERE d >= 2),
    e3 AS (SELECT e2.pa, e2.pb FROM e2
           JOIN k3 a ON e2.pa = a.part JOIN k3 b ON e2.pb = b.part),
    ed3 AS (SELECT pa AS src, pb AS dst FROM e3
            UNION ALL SELECT pb, pa FROM e3)
    SELECT src AS part, count(*) AS core_degree
    FROM ed3
    GROUP BY 1
    """,
)
def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n6 — bounded 2-core peel of the co-purchase graph: three
    synchronous rounds of "drop every node with fewer than 2 surviving
    co-purchase partners", reporting the surviving nodes with their
    within-core degree. The density filter that strips pendant/fringe
    items before community detection or graph-partitioned serving — the
    co-purchase analogue of trimming leaf pages before PageRank — and
    §2.N's fourth iterative archetype: state-SHRINKING peel, next to the
    fixed numeric loop (n1), fixpoint contraction (n3), and growing
    frontier (n4). Degrees and survivals are integers, so the hash
    compare is exact; the DuckDB oracle unrolls the same three peels as
    a CTE chain.

    Scale design: see :func:`kcore_peel` — per-round cost is one degree
    aggregation plus two node-id semi-joins over the SHRINKING edge set
    (monotone: never regrows), with the early exit once stable."""
    return kcore_peel(copurchase_edges(spark, sf_dir))


_CN_MIN_COMMON = 2


@query(
    "q_graph_common_neighbors",
    oracle=_EDGE_CTES
    + f""",
    wedges AS (
      SELECT x.dst AS a, y.dst AS b, count(*) AS common_cnt
      FROM ed x JOIN ed y ON x.src = y.src AND x.dst < y.dst
      GROUP BY 1, 2
    ),
    cand AS (
      SELECT w.a, w.b, w.common_cnt FROM wedges w
      WHERE w.common_cnt >= {_CN_MIN_COMMON}
        AND NOT EXISTS (SELECT 1 FROM e WHERE e.pa = w.a AND e.pb = w.b)
    )
    SELECT c.a AS part_a, c.b AS part_b, c.common_cnt,
           da.od AS degree_a, db.od AS degree_b,
           CAST((10000 * c.common_cnt) // (da.od + db.od - c.common_cnt)
                AS BIGINT) AS jaccard_bp
    FROM cand c JOIN od da ON da.src = c.a JOIN od db ON db.src = c.b
    """,
)
def q_graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n5 — common-neighbor link prediction over the co-purchase graph:
    every UNLINKED part pair sharing ≥ 2 common neighbors, with the pair's
    common count, both degrees, and the neighbor-set Jaccard in integer
    basis points (common div (deg_a + deg_b − common)). This is the
    classic "people who bought X and Y also bought…" edge-completion
    signal: high-Jaccard unlinked pairs are the recommendations a
    co-occurrence recommender is about to learn, and the same wedge
    census is the input to triangle-dense community seeding.

    Determinism: counts, degrees, and the Jaccard cross-multiply are all
    integers (truncating div on non-negative operands matches DuckDB
    ``//``), so the hash compare is exact.

    Scale design: the wedge self-join groups the directed edge list on
    the SHARED MIDDLE node — per-middle work is deg², so the operator's
    100 TB cost is Σ deg(v)², the same skew profile q_graph_triangles
    (k20) carries; the standard mitigation (cap or sample neighbors of
    super-hub middles above a degree bound, biasing pair counts only for
    pairs that already have ≫ threshold support) drops in as one filter
    on the degree-annotated edge frame, and n2's degree histogram is the
    pre-flight that decides whether it's needed. The unlinked-only
    restriction is a LEFT ANTI join against the (pa < pb) canonical edge
    set — same key shuffle the wedge groupBy already established; degree
    re-attachment is two joins against the ≤|V|-row degree frame. Output
    is support-thresholded (≥ 2 common) so the emitted pair set stays
    sparse."""
    edges = copurchase_edges(spark, sf_dir)
    ed = edges.selectExpr("pa AS src", "pb AS dst").union(
        edges.selectExpr("pb AS src", "pa AS dst")
    ).localCheckpoint()
    deg = ed.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    x, y = ed.alias("x"), ed.alias("y")
    wedges = (
        x.join(
            y,
            (F.col("x.src") == F.col("y.src")) & (F.col("x.dst") < F.col("y.dst")),
        )
        .groupBy(F.col("x.dst").alias("a"), F.col("y.dst").alias("b"))
        .agg(F.count(F.lit(1)).alias("common_cnt"))
        .filter(F.col("common_cnt") >= _CN_MIN_COMMON)
    )
    unlinked = wedges.join(
        edges,
        (wedges["a"] == edges["pa"]) & (wedges["b"] == edges["pb"]),
        "left_anti",
    )
    da = deg.selectExpr("src AS a", "od AS degree_a")
    db = deg.selectExpr("src AS b", "od AS degree_b")
    return (
        unlinked.join(da, "a")
        .join(db, "b")
        .select(
            F.col("a").alias("part_a"),
            F.col("b").alias("part_b"),
            "common_cnt",
            "degree_a",
            "degree_b",
            F.expr(
                "CAST((10000 * common_cnt) div (degree_a + degree_b - common_cnt)"
                " AS BIGINT)"
            ).alias("jaccard_bp"),
        )
    )
