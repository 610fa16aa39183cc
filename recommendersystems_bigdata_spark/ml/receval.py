"""Recommender evaluation & training-prep (SURVEY.md §2.AC, round 9).

The measurement layer around the recommender itself (§2.K): catalog
coverage and exposure concentration of the served top-3 lists (the
"does the recommender only ever show 50 items" audit), popularity-bias
lift vs the purchased catalog, next-item transition mining from real
order sequences (the Markov candidate generator), and deterministic
hash-based negative sampling (the training-pair prep every implicit-
feedback model run needs). §2.K k7/k8 grade ACCURACY; these grade the
SYSTEM — coverage, bias, and reproducible training inputs.

The rec list under evaluation is q_item_recs_cooccur's deterministic
top-3 (score-desc, item-asc ties) — fully SQL-expressible, so every
metric here is hash-checkable end to end, unlike ALS factors.

Exactness discipline: counts and rank sums are BIGINT; shares/lifts are
truncated-division basis points (Spark `div` == DuckDB `//`); the Gini
uses q_gini_concentration's adjudicated spelling (integer rank products,
ONE final float divide of identical integers, floor-scaled 1e6); the
negative sampler orders by md5 hex (identical in both engines — the
q_sample_bottomk pattern). Popularity-bias cross-multiplies integer
sums; exact while rec_pop_sum * n_catalog < 2^63 (~10^9 slots x 10^9
buyers needs a panel subsample — documented, not hidden).

Spark-first shape, sized for 100 TB:
- The rec list is computed once per query and pinned with a
  localCheckpoint (|users| x 3 rows — interaction-bounded, the §2.AA
  single-derivation discipline); metric branches reuse it instead of
  re-running the co-occurrence self-join.
- Exposure/popularity rollups are groupBys on the bounded rec/catalog
  relations; global ranks use functions/ranks.global_row_number (the
  two-pass distributed rank, no single-partition funnel).
- The negative sampler restricts to a top-20 user panel (broadcast) so
  the candidate grid is |panel| x |catalog|; the full-corpus variant is
  the same expression with a per-user hash threshold instead of a
  bottom-k window (noted in the docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table, load_tables
from recommendersystems_bigdata_spark.functions.ranks import global_row_number
from recommendersystems_bigdata_spark.ml.recommender import q_item_recs_cooccur
from recommendersystems_bigdata_spark.registry import query

# the deterministic top-3 rec list (q_item_recs_cooccur's oracle CTE chain,
# verbatim) — every §2.AC oracle evaluates the SAME list the Spark side
# reuses via the registered function
_RECS_SQL = """
item_orders AS (
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
         CAST(sum(n.co) AS BIGINT) AS score
  FROM user_items ui JOIN neighbors n ON ui.item_id = n.item_i
  WHERE NOT EXISTS (SELECT 1 FROM user_items o
                    WHERE o.user_id = ui.user_id AND o.item_id = n.item_j)
  GROUP BY ui.user_id, n.item_j
),
recs AS (
  SELECT user_id, rec_item
  FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY score DESC, rec_item) AS rn
    FROM scores
  ) WHERE rn <= 3
)
"""


def _recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, rec_item): the deterministic top-3 list, checkpointed so
    metric branches don't re-run the co-occurrence self-join."""
    return (
        q_item_recs_cooccur(spark, sf_dir)
        .select("user_id", "rec_item")
        .localCheckpoint()
    )


@query(
    "q_rec_catalog_coverage",
    oracle=f"""
    WITH {_RECS_SQL},
    exposure AS (
      SELECT rec_item, CAST(count(*) AS BIGINT) AS slots
      FROM recs GROUP BY 1
    ),
    cat AS (SELECT CAST(count(*) AS BIGINT) AS n_catalog FROM part),
    ex AS (
      SELECT CAST(count(*) AS BIGINT) AS n_recommended,
             CAST(sum(slots) AS BIGINT) AS total_slots,
             CAST(max(slots) AS BIGINT) AS max_exposure
      FROM exposure
    )
    SELECT cat.n_catalog, ex.n_recommended,
           (10000 * ex.n_recommended) // cat.n_catalog AS coverage_bp,
           ex.total_slots, ex.max_exposure,
           (10000 * ex.max_exposure) // ex.total_slots AS max_exposure_bp
    FROM cat, ex
    """,
)
def q_rec_catalog_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AC ac1 — catalog coverage of the served top-3 lists: how many
    distinct catalog parts ever appear in any user's recommendations
    (coverage bp) and how concentrated the hottest item is (its share of
    all rec slots, bp). A recommender that covers 2% of the catalog is a
    popularity loop regardless of its precision.

    Scale: the rec list is interaction-bounded and checkpointed; the
    exposure rollup is one groupBy on it; catalog size is a broadcast
    1-row aggregate of the part dimension."""
    recs = _recs(spark, sf_dir)
    part = load_table(spark, sf_dir, "part")
    exposure = (
        recs.groupBy("rec_item")
        .agg(F.count(F.lit(1)).cast("long").alias("slots"))
        .localCheckpoint()  # <= |catalog| rows; both branches reuse it
    )
    cat = part.agg(F.count(F.lit(1)).cast("long").alias("n_catalog"))
    ex = exposure.agg(
        F.count(F.lit(1)).cast("long").alias("n_recommended"),
        F.sum("slots").cast("long").alias("total_slots"),
        F.max("slots").cast("long").alias("max_exposure"),
    )
    return ex.crossJoin(F.broadcast(cat)).select(
        "n_catalog",
        "n_recommended",
        F.expr("(10000 * n_recommended) div n_catalog").alias("coverage_bp"),
        "total_slots",
        "max_exposure",
        F.expr("(10000 * max_exposure) div total_slots").alias("max_exposure_bp"),
    )


@query(
    "q_rec_exposure_gini",
    oracle=f"""
    WITH {_RECS_SQL},
    exposure AS (
      SELECT rec_item, CAST(count(*) AS BIGINT) AS slots
      FROM recs GROUP BY 1
    ),
    ranked AS (
      SELECT slots, row_number() OVER (ORDER BY slots, rec_item) AS i
      FROM exposure
    ),
    sums AS (
      SELECT count(*) AS n, CAST(sum(slots) AS BIGINT) AS total,
             CAST(sum(i * slots) AS BIGINT) AS weighted
      FROM ranked
    )
    SELECT n AS n_items, total AS total_slots,
           CAST(floor((2.0 * weighted - (n + 1.0) * total)
                      / (CAST(n AS DOUBLE) * total) * 1000000) AS BIGINT)
             AS gini_x1e6
    FROM sums
    """,
)
def q_rec_exposure_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AC ac2 — Gini coefficient of recommendation exposure across the
    items that get recommended at all (0 = every recommended item served
    equally, →1 = one item takes every slot) — the fairness-of-exposure
    number marketplace recommenders report next to precision. Same
    adjudicated integer spelling as q_gini_concentration (d15): rank
    products in BIGINT, one final float divide, floor-scaled 1e6.

    Scale: exposure is a groupBy on the checkpointed rec list; the rank
    is the two-pass distributed global_row_number, not a single-partition
    window."""
    recs = _recs(spark, sf_dir)
    exposure = recs.groupBy("rec_item").agg(
        F.count(F.lit(1)).cast("long").alias("slots")
    )
    ranked = global_row_number(
        exposure, [F.col("slots").asc(), F.col("rec_item").asc()], "i"
    ).select("slots", "i")
    sums = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("slots").cast("long").alias("total"),
        F.sum(F.col("i") * F.col("slots")).cast("long").alias("weighted"),
    )
    gini = (
        (2.0 * F.col("weighted") - (F.col("n") + 1.0) * F.col("total"))
        / (F.col("n").cast("double") * F.col("total"))
        * 1_000_000
    )
    return sums.select(
        F.col("n").alias("n_items"),
        F.col("total").alias("total_slots"),
        F.floor(gini).cast("long").alias("gini_x1e6"),
    )


@query(
    "q_rec_popularity_bias",
    oracle=f"""
    WITH {_RECS_SQL},
    pop AS (
      SELECT item_id, CAST(count(*) AS BIGINT) AS buyers
      FROM user_items GROUP BY 1
    ),
    cat AS (
      SELECT CAST(count(*) AS BIGINT) AS n_bought_items,
             CAST(sum(buyers) AS BIGINT) AS catalog_pop_sum
      FROM pop
    ),
    rec_side AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rec_slots,
             CAST(sum(p.buyers) AS BIGINT) AS rec_pop_sum
      FROM recs r JOIN pop p ON p.item_id = r.rec_item
    )
    SELECT cat.n_bought_items, cat.catalog_pop_sum,
           rec_side.n_rec_slots, rec_side.rec_pop_sum,
           (10000 * rec_side.rec_pop_sum * cat.n_bought_items)
             // (rec_side.n_rec_slots * cat.catalog_pop_sum) AS bias_bp
    FROM cat, rec_side
    """,
)
def q_rec_popularity_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AC ac3 — popularity-bias lift: mean buyer-count of recommended
    slots over mean buyer-count of the purchased catalog, as one
    cross-multiplied integer ratio in bp (10000 = unbiased; above =
    the recommender amplifies popular items). The number that tells you
    whether "personalization" is just a bestseller list.

    Scale: popularity is one groupBy on the (user, item) interaction
    relation; both sides collapse to 1-row aggregates before the
    cross-multiply. Exact while rec_pop_sum * n_bought_items < 2^63 —
    past ~10^9 slots x 10^9 items, evaluate on a fixed user panel (the
    ac5 panel pattern)."""
    recs = _recs(spark, sf_dir)
    orders, lineitem = load_tables(spark, sf_dir, "orders", "lineitem")
    user_items = (
        orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.col("o_custkey").alias("user_id"), F.col("l_partkey").alias("item_id"))
        .distinct()
    )
    pop = user_items.groupBy("item_id").agg(
        F.count(F.lit(1)).cast("long").alias("buyers")
    ).localCheckpoint()  # <= |catalog| rows; both sides below reuse it
    cat = pop.agg(
        F.count(F.lit(1)).cast("long").alias("n_bought_items"),
        F.sum("buyers").cast("long").alias("catalog_pop_sum"),
    )
    rec_side = (
        recs.join(pop, recs["rec_item"] == pop["item_id"])
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rec_slots"),
            F.sum("buyers").cast("long").alias("rec_pop_sum"),
        )
    )
    return rec_side.crossJoin(F.broadcast(cat)).select(
        "n_bought_items",
        "catalog_pop_sum",
        "n_rec_slots",
        "rec_pop_sum",
        F.expr(
            "(10000 * rec_pop_sum * n_bought_items)"
            " div (n_rec_slots * catalog_pop_sum)"
        ).alias("bias_bp"),
    )


@query(
    "q_rec_next_part_transitions",
    oracle="""
    WITH seq AS (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ),
    consec AS (
      SELECT a.o_orderkey AS ok_i, b.o_orderkey AS ok_j
      FROM seq a JOIN seq b
        ON a.o_custkey = b.o_custkey AND b.rn = a.rn + 1
    ),
    op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    trans AS (
      SELECT pi.l_partkey AS from_part, pj.l_partkey AS to_part,
             CAST(count(*) AS BIGINT) AS n_transitions
      FROM consec c
      JOIN op pi ON pi.l_orderkey = c.ok_i
      JOIN op pj ON pj.l_orderkey = c.ok_j
      WHERE pi.l_partkey <> pj.l_partkey
      GROUP BY 1, 2
    )
    SELECT from_part, to_part, n_transitions, CAST(rn AS BIGINT) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY from_part
                                   ORDER BY n_transitions DESC, to_part) AS rn
      FROM trans
    ) WHERE rn <= 3
    """,
)
def q_rec_next_part_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AC ac4 — next-item transition mining: for every part, the top-3
    parts that appear in the SAME customer's NEXT order (consecutive by
    order date, key tiebreak), with transition counts — the first-order
    Markov candidate generator session-based recommenders bootstrap
    from, and the natural A/B partner for the co-occurrence neighbors
    (which ignore order).

    Scale: consecutive order pairs come from ONE lead() window over the
    custkey partition — no self-join of the sequence against itself, so
    orders is scanned once (a (custkey, rn+1) equi-join spelling costs a
    second scan; the oracle keeps that spelling to stay independent);
    the part fan-out is |parts per order|^2 (~tens) per transition,
    grouped with map-side combine. All shuffles key on
    custkey/orderkey/part — the joins any spelling needs."""
    orders, lineitem = load_tables(spark, sf_dir, "orders", "lineitem")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    consec = (
        orders.select(
            F.col("o_orderkey").alias("ok_i"),
            F.lead("o_orderkey").over(w).alias("ok_j"),
        )
        .where(F.col("ok_j").isNotNull())
    )
    op = lineitem.select("l_orderkey", "l_partkey").distinct()
    pi = op.selectExpr("l_orderkey AS ok_i", "l_partkey AS from_part")
    pj = op.selectExpr("l_orderkey AS ok_j", "l_partkey AS to_part")
    trans = (
        consec.join(pi, "ok_i")
        .join(pj, "ok_j")
        .where(F.col("from_part") != F.col("to_part"))
        .groupBy("from_part", "to_part")
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    )
    wr = Window.partitionBy("from_part").orderBy(
        F.col("n_transitions").desc(), "to_part"
    )
    return (
        trans.withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("from_part", "to_part", "n_transitions", "rank")
    )


_NEG_PANEL = 20
_NEG_K = 3


@query(
    "q_rec_negative_sampling",
    oracle=f"""
    WITH user_items AS (
      SELECT DISTINCT o_custkey AS user_id, l_partkey AS item_id
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    panel AS (
      SELECT user_id FROM (
        SELECT user_id, count(*) AS n_items FROM user_items GROUP BY 1
        ORDER BY n_items DESC, user_id LIMIT {_NEG_PANEL}
      )
    ),
    catalog AS (SELECT DISTINCT l_partkey AS item_id FROM lineitem),
    cand AS (
      SELECT p.user_id, c.item_id,
             md5(concat(CAST(p.user_id AS VARCHAR), ':',
                        CAST(c.item_id AS VARCHAR))) AS h
      FROM panel p JOIN catalog c ON TRUE
      WHERE NOT EXISTS (SELECT 1 FROM user_items o
                        WHERE o.user_id = p.user_id AND o.item_id = c.item_id)
    )
    SELECT user_id, item_id AS neg_item, CAST(rn AS BIGINT) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY h, item_id) AS rn
      FROM cand
    ) WHERE rn <= {_NEG_K}
    ORDER BY user_id, rank
    """,
)
def q_rec_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.AC ac5 — deterministic negative sampling for implicit-feedback
    training: for the 20 most-active users (distinct items, key
    tiebreak), the 3 unpurchased catalog items whose
    md5(user:item) hashes lowest — a pure function of the key sets, so
    the training pairs are identical under re-partition, re-run, engine
    swap, and corpus append (the q_sample_bottomk bottom-k property, per
    user). RNG-based samplers can't be hash-verified; this can.

    Scale: the panel is a broadcast 20-row TakeOrdered; the
    candidate grid is |panel| x |catalog| with the owned pairs
    anti-joined away, and the per-user bottom-k is one window over that
    bounded grid. The full-corpus variant replaces the window with a
    per-user hash THRESHOLD (keep h < k/|catalog| scaled), which is the
    same expression map-side — the panel spelling is the
    oracle-checkable miniature."""
    orders, lineitem = load_tables(spark, sf_dir, "orders", "lineitem")
    user_items = (
        orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.col("o_custkey").alias("user_id"), F.col("l_partkey").alias("item_id"))
        .distinct()
        .localCheckpoint()  # reused: panel ranking + ownership anti-join
    )
    panel = (
        user_items.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_items"))
        .orderBy(F.desc("n_items"), "user_id")
        .limit(_NEG_PANEL)
        .select("user_id")
    )
    catalog = lineitem.select(F.col("l_partkey").alias("item_id")).distinct()
    cand = (
        F.broadcast(panel)
        .crossJoin(catalog)
        .join(user_items, ["user_id", "item_id"], "left_anti")
        .withColumn(
            "h",
            F.md5(
                F.concat(
                    F.col("user_id").cast("string"),
                    F.lit(":"),
                    F.col("item_id").cast("string"),
                )
            ),
        )
    )
    wr = Window.partitionBy("user_id").orderBy("h", "item_id")
    return (
        cand.withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= _NEG_K)
        .select("user_id", F.col("item_id").alias("neg_item"), "rank")
        .orderBy("user_id", "rank")
    )
