"""Recommender-system operators (SURVEY.md §2.K k1–k8) — the reference
project's core domain, re-expressed Spark-first.

The interaction matrix is a DataFrame (user, item, strength); everything
downstream — popularity, item-item co-occurrence, splits, evaluation — is
joins + aggregates + windows, so the whole pipeline is oracle-checkable
except ALS itself (iterative MLlib, seeded, gated on metrics in tests).

Scale: interactions aggregate (user, item) partials map-side; co-occurrence
shuffles on the order key (bounded items/order ⇒ bounded pair fan-out);
ranking metrics join per-user top-k against truth — every shape is the one
a 1000-executor cluster partitions cleanly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_tables
from recommendersystems_bigdata_spark.registry import query

_INTERACTIONS_SQL = """
    SELECT o_custkey AS user_id, l_partkey AS item_id,
           round(sum(l_quantity), 2) AS strength,
           count(*) AS n_interactions
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_custkey, l_partkey
"""


def interactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user, item, strength) implicit-feedback matrix from orders⋈lineitem."""
    orders, lineitem = load_tables(spark, sf_dir, "orders", "lineitem")
    return (
        orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("o_custkey").alias("user_id"), F.col("l_partkey").alias("item_id"))
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("strength"),
            F.count(F.lit(1)).alias("n_interactions"),
        )
    )


@query("q_interactions", oracle=_INTERACTIONS_SQL)
def q_interactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k1 — the interaction-matrix feature build (ALS's input)."""
    return interactions(spark, sf_dir)


@query(
    "q_popularity_topk",
    oracle="""
    SELECT item_id, n_buyers, total_qty, CAST(rn AS BIGINT) AS rank
    FROM (
      SELECT l_partkey AS item_id,
             count(DISTINCT o_custkey) AS n_buyers,
             round(sum(l_quantity), 2) AS total_qty,
             row_number() OVER (ORDER BY count(DISTINCT o_custkey) DESC, l_partkey ASC) AS rn
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY l_partkey
    ) WHERE rn <= 20
    """,
)
def q_popularity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k2 — popularity baseline: top-20 items by distinct buyers."""
    orders, lineitem = load_tables(spark, sf_dir, "orders", "lineitem")
    pop = (
        orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("l_partkey").alias("item_id"))
        .agg(
            F.countDistinct("o_custkey").alias("n_buyers"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
    )
    # limit-first (TakeOrderedAndProject): only 20 rows reach the ranking
    # window, never the full item catalog.
    top = pop.orderBy(F.col("n_buyers").desc(), F.col("item_id").asc()).limit(20)
    w = Window.orderBy(F.col("n_buyers").desc(), F.col("item_id").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "item_id", "n_buyers", "total_qty", "rank"
    )


@query(
    "q_cooccurrence_sim",
    oracle="""
    WITH item_orders AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pair_counts AS (
      SELECT a.l_partkey AS item_a, b.l_partkey AS item_b, count(*) AS co
      FROM item_orders a JOIN item_orders b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
    ),
    item_counts AS (
      SELECT l_partkey, count(*) AS n_ord FROM item_orders GROUP BY l_partkey
    )
    SELECT item_a, item_b, co,
           CAST(co AS DOUBLE) / (ia.n_ord + ib.n_ord - co) AS jaccard
    FROM pair_counts
    JOIN item_counts ia ON item_a = ia.l_partkey
    JOIN item_counts ib ON item_b = ib.l_partkey
    WHERE co >= 2
    """,
)
def q_cooccurrence_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k3 — item-item Jaccard similarity from order co-occurrence (the
    item-based CF neighborhood model, shuffled on the order key)."""
    (lineitem,) = load_tables(spark, sf_dir, "lineitem")
    # Pinned (round 11): item_orders feeds both self-join legs AND the
    # per-item counts; unpinned, Catalyst re-ran the scan+distinct for
    # each consumer (4 lineitem scans in the plan).
    item_orders = lineitem.select("l_orderkey", "l_partkey").distinct().localCheckpoint()
    a, b = item_orders.alias("a"), item_orders.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("item_a"), F.col("b.l_partkey").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= 2)
    )
    counts = item_orders.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_ord"))
    ia = counts.select(F.col("l_partkey").alias("item_a"), F.col("n_ord").alias("na"))
    ib = counts.select(F.col("l_partkey").alias("item_b"), F.col("n_ord").alias("nb"))
    return (
        pairs.join(ia, "item_a")
        .join(ib, "item_b")
        .select(
            "item_a",
            "item_b",
            "co",
            (F.col("co").cast("double") / (F.col("na") + F.col("nb") - F.col("co"))).alias(
                "jaccard"
            ),
        )
    )


_SPLIT_SQL = """
    SELECT o_custkey AS user_id, o_orderkey, o_orderdate,
           CASE WHEN rn = 1 THEN 'test' ELSE 'train' END AS split
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    )
"""


@query("q_split_leave_latest", oracle=_SPLIT_SQL)
def q_split_leave_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k4 — leave-latest-out split: each user's most recent order is test.

    The standard temporal eval protocol; window rank, fully deterministic
    (date ties broken by orderkey).
    """
    (orders,) = load_tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return orders.select(
        F.col("o_custkey").alias("user_id"),
        "o_orderkey",
        "o_orderdate",
        F.when(F.row_number().over(w) == 1, "test").otherwise("train").alias("split"),
    )


@query("q_split_random")
def q_split_random(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k4b — seeded randomSplit 80/20 (rows-only: the sampler is
    engine-specific). Returns per-split interaction counts."""
    inter = interactions(spark, sf_dir)
    train, test = inter.randomSplit([0.8, 0.2], seed=42)
    return train.agg(
        F.lit("train").alias("split"), F.count(F.lit(1)).alias("n")
    ).unionByName(test.agg(F.lit("test").alias("split"), F.count(F.lit(1)).alias("n")))


def _train_test_items(spark: SparkSession, sf_dir: str):
    """(train interactions, per-user test truth items) from the temporal split."""
    orders, lineitem = load_tables(spark, sf_dir, "orders", "lineitem")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    tagged = orders.withColumn("rn", F.row_number().over(w))
    li = lineitem.select("l_orderkey", "l_partkey", "l_quantity")
    train = (
        tagged.filter(F.col("rn") > 1)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("o_custkey").alias("user_id"), F.col("l_partkey").alias("item_id"))
        .agg(F.round(F.sum("l_quantity"), 2).alias("strength"))
    )
    truth = (
        tagged.filter(F.col("rn") == 1)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.col("o_custkey").alias("user_id"), F.col("l_partkey").alias("item_id"))
        .distinct()
    )
    return train, truth


@query(
    "q_rmse",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ),
    train AS (
      SELECT o_custkey AS user_id, l_partkey AS item_id,
             round(sum(l_quantity), 2) AS strength
      FROM ranked JOIN lineitem ON o_orderkey = l_orderkey
      WHERE rn > 1 GROUP BY o_custkey, l_partkey
    ),
    test AS (
      SELECT o_custkey AS user_id, l_partkey AS item_id,
             round(sum(l_quantity), 2) AS strength
      FROM ranked JOIN lineitem ON o_orderkey = l_orderkey
      WHERE rn = 1 GROUP BY o_custkey, l_partkey
    ),
    item_means AS (SELECT item_id, avg(strength) AS item_mean FROM train GROUP BY item_id),
    global_mean AS (SELECT avg(strength) AS g FROM train)
    SELECT round(sqrt(avg(pow(test.strength - coalesce(item_means.item_mean, g), 2))), 4) AS rmse,
           count(*) AS n_test
    FROM test
    LEFT JOIN item_means USING (item_id)
    CROSS JOIN global_mean
    """,
)
def q_rmse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k7 — RMSE of the item-mean baseline on the temporal test split.

    The predictor is deterministic (train item means, global-mean
    fallback), so the whole evaluation is SQL-oracle-checkable — the
    pattern also used to gate ALS (tests/test_ml.py) where the model
    itself can't be hashed.
    """
    orders, lineitem = load_tables(spark, sf_dir, "orders", "lineitem")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    ranked = orders.withColumn("rn", F.row_number().over(w))
    li = lineitem.select("l_orderkey", "l_partkey", "l_quantity")

    def split_strength(cond):
        return (
            ranked.filter(cond)
            .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy(F.col("o_custkey").alias("user_id"), F.col("l_partkey").alias("item_id"))
            .agg(F.round(F.sum("l_quantity"), 2).alias("strength"))
        )

    train = split_strength(F.col("rn") > 1)
    test = split_strength(F.col("rn") == 1)
    item_means = train.groupBy("item_id").agg(F.avg("strength").alias("item_mean"))
    global_mean = train.agg(F.avg("strength").alias("g"))
    err = F.col("strength") - F.coalesce(F.col("item_mean"), F.col("g"))
    return (
        test.join(F.broadcast(item_means), "item_id", "left")
        .crossJoin(F.broadcast(global_mean))
        .agg(
            F.round(F.sqrt(F.avg(F.pow(err, 2))), 4).alias("rmse"),
            F.count(F.lit(1)).alias("n_test"),
        )
    )


@query(
    "q_ranking_metrics",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ),
    train AS (
      SELECT DISTINCT o_custkey AS user_id, l_partkey AS item_id
      FROM ranked JOIN lineitem ON o_orderkey = l_orderkey WHERE rn > 1
    ),
    truth AS (
      SELECT DISTINCT o_custkey AS user_id, l_partkey AS item_id
      FROM ranked JOIN lineitem ON o_orderkey = l_orderkey WHERE rn = 1
    ),
    pop AS (
      SELECT item_id, row_number() OVER (ORDER BY count(*) DESC, item_id ASC) AS pop_rank
      FROM train GROUP BY item_id
    ),
    recs AS (
      SELECT user_id, item_id, rec_rank FROM (
        SELECT u.user_id, p.item_id,
               row_number() OVER (PARTITION BY u.user_id ORDER BY p.pop_rank ASC) AS rec_rank
        FROM (SELECT DISTINCT user_id FROM truth) u
        CROSS JOIN pop p
        WHERE NOT EXISTS (SELECT 1 FROM train t
                          WHERE t.user_id = u.user_id AND t.item_id = p.item_id)
          AND p.pop_rank <= 100
      ) WHERE rec_rank <= 5
    ),
    hits AS (
      SELECT r.user_id, r.rec_rank,
             CASE WHEN t.item_id IS NOT NULL THEN 1.0 ELSE 0.0 END AS hit
      FROM recs r LEFT JOIN truth t ON r.user_id = t.user_id AND r.item_id = t.item_id
    ),
    hits2 AS (
      SELECT user_id, rec_rank, hit,
             sum(hit) OVER (PARTITION BY user_id ORDER BY rec_rank
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / rec_rank
               AS prec_at_rank
      FROM hits
    ),
    per_user AS (
      SELECT h.user_id,
             sum(h.hit) / 5.0 AS precision_at_5,
             sum(h.hit) / least(tc.n_truth, 5) AS recall_at_5,
             sum(h.hit * h.prec_at_rank) / least(tc.n_truth, 5) AS ap_at_5
      FROM hits2 h
      JOIN (SELECT user_id, count(*) AS n_truth FROM truth GROUP BY user_id) tc
        ON h.user_id = tc.user_id
      GROUP BY h.user_id, tc.n_truth
    )
    SELECT round(avg(precision_at_5), 6) AS precision_at_5,
           round(avg(recall_at_5), 6) AS recall_at_5,
           round(avg(ap_at_5), 6) AS map_at_5,
           count(*) AS n_users
    FROM per_user
    """,
)
def q_ranking_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k8 — precision@5 / recall@5 / MAP@5, DataFrame-native.

    Recommender = popularity baseline filtered per user to unseen items
    (deterministic ⇒ oracle-checkable; the same metric queries evaluate
    ALS output in tests). MAP uses running-hit-count / rank within each
    user's rec list — a window over an already-aggregated 5-row/user
    relation.
    """
    orders, lineitem = load_tables(spark, sf_dir, "orders", "lineitem")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    ranked = orders.withColumn("rn", F.row_number().over(w))
    li = lineitem.select("l_orderkey", "l_partkey")

    def split_items(cond):
        return (
            ranked.filter(cond)
            .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
            .select(F.col("o_custkey").alias("user_id"), F.col("l_partkey").alias("item_id"))
            .distinct()
        )

    # Pinned (round 11): train feeds the popularity rollup AND the unseen
    # anti-join; truth feeds the user list, the hit join AND the per-user
    # truth counts — unpinned, Catalyst re-ran the orders-window ⋈
    # lineitem + distinct pipeline for every consumer (~5 fact passes).
    train = split_items(F.col("rn") > 1).localCheckpoint()
    truth = split_items(F.col("rn") == 1).localCheckpoint()

    # limit-first (TakeOrderedAndProject): the popularity list is capped at
    # 100 before the ranking window, so no full-catalog single-partition pass.
    pop_w = Window.orderBy(F.col("cnt").desc(), F.col("item_id").asc())
    pop = (
        train.groupBy("item_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("item_id").asc())
        .limit(100)
        .withColumn("pop_rank", F.row_number().over(pop_w))
        .select("item_id", "pop_rank")
    )
    users = truth.select("user_id").distinct()
    rec_w = Window.partitionBy("user_id").orderBy(F.col("pop_rank").asc())
    recs = (
        users.crossJoin(F.broadcast(pop))
        .join(train, ["user_id", "item_id"], "left_anti")  # unseen items only
        .withColumn("rec_rank", F.row_number().over(rec_w))
        .filter(F.col("rec_rank") <= 5)
    )
    hits = recs.join(
        truth.withColumn("hit_flag", F.lit(1.0)), ["user_id", "item_id"], "left"
    ).select("user_id", "rec_rank", F.coalesce("hit_flag", F.lit(0.0)).alias("hit"))

    cum_w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("rec_rank").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hits = hits.withColumn("prec_at_rank", F.sum("hit").over(cum_w) / F.col("rec_rank"))
    truth_counts = truth.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_truth"))
    per_user = (
        hits.join(truth_counts, "user_id")
        .groupBy("user_id", "n_truth")
        .agg(
            (F.sum("hit") / 5.0).alias("precision_at_5"),
            (F.sum("hit") / F.least(F.col("n_truth"), F.lit(5))).alias("recall_at_5"),
            (
                F.sum(F.col("hit") * F.col("prec_at_rank"))
                / F.least(F.col("n_truth"), F.lit(5))
            ).alias("ap_at_5"),
        )
    )
    return per_user.agg(
        F.round(F.avg("precision_at_5"), 6).alias("precision_at_5"),
        F.round(F.avg("recall_at_5"), 6).alias("recall_at_5"),
        F.round(F.avg("ap_at_5"), 6).alias("map_at_5"),
        F.count(F.lit(1)).alias("n_users"),
    )


def train_als(spark: SparkSession, sf_dir: str, implicit: bool = True):
    """k5 — seeded ALS on the interaction matrix (coldStartStrategy=drop)."""
    from pyspark.ml.recommendation import ALS

    inter = interactions(spark, sf_dir).select(
        F.col("user_id").cast("int").alias("user"),
        F.col("item_id").cast("int").alias("item"),
        F.col("strength").cast("float").alias("rating"),
    )
    als = ALS(
        rank=10,
        maxIter=8,
        regParam=0.1,
        implicitPrefs=implicit,
        alpha=1.0,
        userCol="user",
        itemCol="item",
        ratingCol="rating",
        coldStartStrategy="drop",
        seed=42,
    )
    return als.fit(inter), inter


@query("q_als_recommend")
def q_als_recommend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k5+k6 — ALS training + top-5 recommendations per user (rows-only:
    factor initialization makes scores engine/partitioning-specific).

    recommendForAllUsers is the blocked factor-product top-k — the
    distributed path; per-user subsets use recommendForUserSubset.
    """
    model, _ = train_als(spark, sf_dir, implicit=True)
    recs = model.recommendForAllUsers(5)
    return recs.select(
        F.col("user").cast("long").alias("user_id"),
        F.posexplode("recommendations").alias("pos", "rec"),
    ).select(
        "user_id",
        (F.col("pos") + 1).cast("long").alias("rec_rank"),
        F.col("rec.item").cast("long").alias("item_id"),
        F.round(F.col("rec.rating").cast("double"), 4).alias("score"),
    )


@query(
    "q_graph_triangles",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS co
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    e AS (SELECT pa, pb FROM pairs WHERE co >= 2),
    deg AS (
      SELECT part, count(*) AS degree FROM (
        SELECT pa AS part FROM e UNION ALL SELECT pb AS part FROM e
      ) GROUP BY part
    ),
    tri AS (
      SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
      FROM e e1 JOIN e e2 ON e1.pb = e2.pa
                JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
    ),
    tri_per_node AS (
      SELECT part, count(*) AS n_triangles FROM (
        SELECT a AS part FROM tri UNION ALL
        SELECT b AS part FROM tri UNION ALL
        SELECT c AS part FROM tri
      ) GROUP BY part
    )
    SELECT d.part, d.degree, coalesce(t.n_triangles, 0) AS n_triangles
    FROM deg d LEFT JOIN tri_per_node t ON d.part = t.part
    """,
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph analytics over the item co-occurrence graph: per-part degree
    and triangle participation (triads of parts that all co-occur ≥2
    orders pairwise) — the community-density signal item-graph
    recommenders use, and the canonical multi-way-join scale pattern.

    Scale design (the two standard triangle-counting defenses):

    * **distinct-first** — baskets are distinct-ed to (order, part) before
      the self-join, so duplicate lineitems of the same part in one order
      can't multiply pair counts (same pattern as q_basket_lift); `co` is
      exactly "number of orders containing both parts".
    * **degree-ordered orientation** — edges are directed from the
      (degree, id)-smaller endpoint to the larger before the wedge join,
      so every hub's wedge fan-out is C(out-degree, 2) with out-degree
      bounded by neighbors of HIGHER degree. This is the classic
      O(m^1.5)-wedge guarantee: an id-ordered orientation lets one hub
      with d neighbors of larger id produce O(d²) wedges, while the
      degree ordering caps total wedges at O(m^1.5) regardless of skew —
      the difference between a survivable and an exploding plan on a
      power-law co-occurrence graph at 100 TB. The orientation is a total
      order, hence acyclic, hence each triangle has exactly one node with
      two out-edges inside it: enumerated exactly once, no 6× overcount.

    All counts integer-exact. At 100 TB the co-occurrence build dominates
    (fact self-join per order basket); edges/wedges shuffle on part id.
    """
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
    e = pairs.filter(F.col("co") >= 2).select("pa", "pb").localCheckpoint()
    deg = (
        e.select(F.col("pa").alias("part"))
        .union(e.select(F.col("pb").alias("part")))
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    # Orient each undirected edge from the (degree, id)-smaller endpoint to
    # the larger; keep the head's rank so a wedge's two out-neighbors can be
    # canonically ordered without re-joining deg.
    da = deg.select(F.col("part").alias("pa"), F.col("degree").alias("deg_a"))
    db = deg.select(F.col("part").alias("pb"), F.col("degree").alias("deg_b"))
    ranked = e.join(da, "pa").join(db, "pb")
    a_first = F.struct(F.col("deg_a"), F.col("pa")) < F.struct(F.col("deg_b"), F.col("pb"))
    directed = ranked.select(
        F.when(a_first, F.col("pa")).otherwise(F.col("pb")).alias("src"),
        F.when(a_first, F.col("pb")).otherwise(F.col("pa")).alias("dst"),
        F.when(a_first, F.col("deg_b")).otherwise(F.col("deg_a")).alias("dst_deg"),
    ).localCheckpoint()
    d1, d2, d3 = directed.alias("d1"), directed.alias("d2"), directed.alias("d3")
    tri = (
        d1.join(
            d2,
            (F.col("d1.src") == F.col("d2.src"))
            & (
                F.struct(F.col("d1.dst_deg"), F.col("d1.dst"))
                < F.struct(F.col("d2.dst_deg"), F.col("d2.dst"))
            ),
        )
        .join(d3, (F.col("d3.src") == F.col("d1.dst")) & (F.col("d3.dst") == F.col("d2.dst")))
        .select(F.col("d1.src").alias("a"), F.col("d1.dst").alias("b"), F.col("d2.dst").alias("c"))
    )
    tri_per_node = (
        tri.select(F.col("a").alias("part"))
        .union(tri.select(F.col("b").alias("part")))
        .union(tri.select(F.col("c").alias("part")))
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return deg.join(tri_per_node, "part", "left").select(
        "part", "degree", F.coalesce("n_triangles", F.lit(0)).alias("n_triangles")
    )


@query(
    "q_basket_lift",
    oracle="""
    WITH n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM lineitem),
    item AS (
      SELECT l_partkey, count(DISTINCT l_orderkey) AS n_item FROM lineitem GROUP BY l_partkey
    ),
    pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS co
      FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
      JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING count(*) >= 2
    )
    SELECT pa, pb, co,
           round(CAST(co AS DOUBLE) / n.n_orders, 6) AS support,
           round(CAST(co AS DOUBLE) / ia.n_item, 4) AS confidence,
           round(CAST(co AS DOUBLE) * n.n_orders / (ia.n_item * ib.n_item), 4) AS lift
    FROM pairs
    JOIN item ia ON pairs.pa = ia.l_partkey
    JOIN item ib ON pairs.pb = ib.l_partkey
    CROSS JOIN n
    """,
)
def q_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules: support / confidence / lift for
    part pairs co-bought in ≥2 orders — the statistics behind
    "frequently bought together". All inputs are exact integer counts,
    so the ratios are bit-identical across engines before rounding. The
    per-item counts table broadcasts; the pair build is the c11
    self-join (shuffle on orderkey, output bounded by basket width²)."""
    (li,) = load_tables(spark, sf_dir, "lineitem")
    # Pinned (round 11): basket feeds the order count, the per-item
    # counts, and both self-join legs — unpinned, each consumer re-ran
    # the scan+distinct (4 lineitem passes, one of them just for the
    # 1-value order count).
    basket = li.select("l_orderkey", "l_partkey").distinct().localCheckpoint()
    n_orders = basket.select("l_orderkey").distinct().count()
    item = basket.groupBy("l_partkey").agg(F.countDistinct("l_orderkey").alias("n_item"))
    a, b = basket.alias("a"), basket.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= 2)
    )
    ia = F.broadcast(item.select(F.col("l_partkey").alias("pa"), F.col("n_item").alias("n_a")))
    ib = F.broadcast(item.select(F.col("l_partkey").alias("pb"), F.col("n_item").alias("n_b")))
    co_d = F.col("co").cast("double")
    return (
        pairs.join(ia, "pa")
        .join(ib, "pb")
        .select(
            "pa",
            "pb",
            "co",
            F.round(co_d / n_orders, 6).alias("support"),
            F.round(co_d / F.col("n_a"), 4).alias("confidence"),
            F.round(co_d * n_orders / (F.col("n_a") * F.col("n_b")), 4).alias("lift"),
        )
    )


@query(
    "q_user_user_cf",
    oracle="""
    WITH user_items AS (
      SELECT DISTINCT o_custkey AS user_id, l_partkey AS item_id
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    pair_counts AS (
      SELECT a.user_id AS user_a, b.user_id AS user_b, count(*) AS co
      FROM user_items a JOIN user_items b
        ON a.item_id = b.item_id AND a.user_id < b.user_id
      GROUP BY a.user_id, b.user_id
    ),
    user_counts AS (
      SELECT user_id, count(*) AS n_items FROM user_items GROUP BY user_id
    ),
    scored AS (
      SELECT user_a, user_b, co,
             CAST(floor(CAST(co AS DOUBLE) * 1000000
                        / sqrt(CAST(ua.n_items * ub.n_items AS DOUBLE))) AS BIGINT)
               AS cosine_x1e6
      FROM pair_counts
      JOIN user_counts ua ON user_a = ua.user_id
      JOIN user_counts ub ON user_b = ub.user_id
      WHERE co >= 5
    )
    SELECT user_a, user_b, co, cosine_x1e6, CAST(rn AS BIGINT) AS rank
    FROM (
      SELECT *, row_number() OVER (ORDER BY cosine_x1e6 DESC, user_a, user_b) AS rn
      FROM scored
    ) WHERE rn <= 50
    """,
)
def q_user_user_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-user collaborative-filtering neighborhood: cosine similarity
    between users' binary item-ownership vectors, top-50 pairs.

    cos(u,v) = |I_u ∩ I_v| / sqrt(|I_u|·|I_v|) — the numerator is an
    integer co-count from a posting-list self-join on the item key (the
    same shuffle shape as item-item k3, transposed), so every input to
    the final divide is exact and the floor-scaled score matches the
    oracle bit-for-bit (sqrt/÷ are single correctly-rounded IEEE ops).

    Scale: the item-key self-join fans out quadratically in item
    popularity — at 100 TB the co≥5 floor moves before the join as a
    per-item top-M neighbor cap (as q_item_recs_cooccur does) or the
    head items get the salted-join treatment (l8); the final global
    top-50 is a TakeOrderedAndProject, no total sort.
    """
    orders, lineitem = load_tables(spark, sf_dir, "orders", "lineitem")
    # Pinned (round 11): user_items feeds both self-join legs AND the
    # per-user counts (same multi-consumer re-run as q_item_recs_cooccur).
    user_items = (
        orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.col("o_custkey").alias("user_id"), F.col("l_partkey").alias("item_id"))
        .distinct()
        .localCheckpoint()
    )
    a, b = user_items.alias("a"), user_items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.item_id") == F.col("b.item_id"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .groupBy(F.col("a.user_id").alias("user_a"), F.col("b.user_id").alias("user_b"))
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= 5)
    )
    counts = user_items.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_items"))
    ua = F.broadcast(counts.select(F.col("user_id").alias("user_a"), F.col("n_items").alias("na")))
    ub = F.broadcast(counts.select(F.col("user_id").alias("user_b"), F.col("n_items").alias("nb")))
    cos = F.floor(
        F.col("co").cast("double") * 1_000_000
        / F.sqrt((F.col("na") * F.col("nb")).cast("double"))
    ).cast("long")
    scored = (
        pairs.join(ua, "user_a")
        .join(ub, "user_b")
        .select("user_a", "user_b", "co", cos.alias("cosine_x1e6"))
    )
    # limit-first (TakeOrderedAndProject): only 50 rows reach the ranking
    # window — the pair table itself grows quadratically in dense blocks.
    top = scored.orderBy(F.col("cosine_x1e6").desc(), "user_a", "user_b").limit(50)
    w = Window.orderBy(F.col("cosine_x1e6").desc(), "user_a", "user_b")
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


@query(
    "q_item_recs_cooccur",
    oracle="""
    WITH item_orders AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    co AS (
      SELECT a.l_partkey AS item_i, b.l_partkey AS item_j, count(*) AS co
      FROM item_orders a JOIN item_orders b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
      HAVING count(*) >= 2
    ),
    neighbors AS (
      SELECT item_i, item_j, co
      FROM (
        SELECT *, row_number() OVER (PARTITION BY item_i
                                     ORDER BY co DESC, item_j) AS nr
        FROM co
      ) WHERE nr <= 10
    ),
    user_items AS (
      SELECT DISTINCT o_custkey AS user_id, l_partkey AS item_id
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    scores AS (
      SELECT ui.user_id, n.item_j AS rec_item,
             CAST(sum(n.co) AS BIGINT) AS score, count(*) AS n_sources
      FROM user_items ui JOIN neighbors n ON ui.item_id = n.item_i
      WHERE NOT EXISTS (SELECT 1 FROM user_items o
                        WHERE o.user_id = ui.user_id AND o.item_id = n.item_j)
      GROUP BY ui.user_id, n.item_j
    )
    SELECT user_id, rec_item, score, n_sources, CAST(rn AS BIGINT) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY score DESC, rec_item) AS rn
      FROM scores
    ) WHERE rn <= 3
    """,
)
def q_item_recs_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 recommendations per user from the item-item co-occurrence
    neighborhood — the non-iterative, fully oracle-checkable counterpart
    to ALS recommendForAllUsers (k6): score(u, j) = Σ_{i∈I_u} co(i, j)
    over each owned item's top-10 neighbor list, already-owned items
    anti-joined away.

    Scale: capping neighbors at 10 per item BEFORE the user join bounds
    the candidate fan-out at 10·|I_u| rows per user regardless of item
    popularity — the cap is the standard candidate-generation trick that
    keeps this join linear in the interaction count at 100 TB. The
    neighbor list is small (items × 10) and broadcast; the anti-join and
    scoring shuffle on user_id only.
    """
    orders, lineitem = load_tables(spark, sf_dir, "orders", "lineitem")
    item_orders = lineitem.select("l_orderkey", "l_partkey").distinct()
    a, b = item_orders.alias("a"), item_orders.alias("b")
    # co(i,j) is symmetric: generate each unordered pair ONCE (< instead
    # of <>, halving the dominant Σ|parts per order|² fan-out) and mirror
    # the far-smaller aggregated pair table afterwards — same relation,
    # half the join/aggregate work (the oracle keeps the <> spelling to
    # stay an independent derivation).
    co_half = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("item_i"), F.col("b.l_partkey").alias("item_j"))
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= 2)
    )
    # mirror in place with explode (NOT a union of two co_half reads —
    # Catalyst would re-run the whole pair pipeline once per branch)
    co = co_half.select(
        F.explode(
            F.array(
                F.struct(F.col("item_i").alias("i"), F.col("item_j").alias("j")),
                F.struct(F.col("item_j").alias("i"), F.col("item_i").alias("j")),
            )
        ).alias("p"),
        "co",
    ).select(F.col("p.i").alias("item_i"), F.col("p.j").alias("item_j"), "co")
    wn = Window.partitionBy("item_i").orderBy(F.col("co").desc(), "item_j")
    neighbors = co.withColumn("nr", F.row_number().over(wn)).filter(F.col("nr") <= 10).drop("nr")
    # Pinned (round 11): user_items feeds BOTH the candidate join and the
    # owned anti-join, and Catalyst re-ran the orders⋈lineitem+distinct
    # subtree for each consumer (two full fact joins in the plan). The
    # pinned relation is the 16-byte-per-row interaction table — the
    # standard materialize-interactions-once discipline at 100 TB.
    user_items = (
        orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.col("o_custkey").alias("user_id"), F.col("l_partkey").alias("item_id"))
        .distinct()
        .localCheckpoint()
    )
    cand = user_items.join(F.broadcast(neighbors), F.col("item_id") == F.col("item_i"))
    owned = user_items.select("user_id", F.col("item_id").alias("rec_item"))
    scores = (
        cand.select("user_id", F.col("item_j").alias("rec_item"), "co")
        .join(owned, ["user_id", "rec_item"], "left_anti")
        .groupBy("user_id", "rec_item")
        .agg(F.sum("co").alias("score"), F.count(F.lit(1)).alias("n_sources"))
    )
    wr = Window.partitionBy("user_id").orderBy(F.col("score").desc(), "rec_item")
    return (
        scores.withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("user_id", "rec_item", "score", "n_sources", "rank")
    )


@query(
    "q_cross_sell_brands",
    oracle="""
    WITH order_brands AS (
      SELECT DISTINCT l_orderkey, p_brand
      FROM lineitem JOIN part ON l_partkey = p_partkey
    )
    SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, count(*) AS n_orders
    FROM order_brands a JOIN order_brands b
      ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
    GROUP BY a.p_brand, b.p_brand
    """,
)
def q_cross_sell_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand-level cross-sell matrix: orders containing both brands, for
    every brand pair — the co-occurrence graph (k3) rolled up to the
    dimension level where merchandising actually reads it.

    Scale: distinct-ing (order, brand) BEFORE the self-join caps the
    per-order fan-out at brands-per-order (≤25), not lineitems²; the
    part dimension broadcasts; output is at most brands² rows.
    """
    lineitem, part = load_tables(spark, sf_dir, "lineitem", "part")
    order_brands = (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    a, b = order_brands.alias("a"), order_brands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(F.col("a.p_brand").alias("brand_a"), F.col("b.p_brand").alias("brand_b"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
