"""Feature engineering for model training (SURVEY.md §2.W, round 9).

The tabular-feature layer that sits between the raw corpus and a trainer:
categorical encodings (leave-one-out target encoding, frequency encoding,
smoothed odds encoding), the hashing trick, crossed categories,
rare-category collapsing, and point-in-time-correct per-entity history
features. MLlib's HashingTF/StandardScaler side is covered by the k-series;
these are the EXACT, SQL-oracle-checked spellings a feature store would
materialize — every encoding is a pure function of the input relation, so
train-time and serve-time computation provably agree (the whole point of
hash-checking them cross-engine).

Exactness discipline: encodings are integer basis points via truncating
division (target/frequency/odds), money is integer cents, durations are
integer days from microsecond arithmetic, and the hashing trick maps md5
hex nibbles through ``strpos`` arithmetic — every engine with md5 and
integer division reproduces the exact feature values.

Spark-first shape: each encoder is one partial-aggregated groupBy over
category cardinality (not row count) plus, where a row-level frame is
produced, a broadcast join-back of the tiny encoding table; the
point-in-time features are a single per-entity window — the canonical
"no-future-leakage" shape that at 100 TB replaces a correlated subquery
per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.registry import query

_US_PER_DAY = 86_400_000_000
# Hashing-trick bucket count (w3) — deliberately far below |categories| so
# collisions are visible and the census exercises them.
_N_BUCKETS = 8
# Rare-category threshold (w7): crosses below 1% corpus share collapse.
_RARE_BP = 100


@query(
    "q_feat_target_encode_loo",
    oracle="""
    WITH t AS (
      SELECT o_orderpriority AS category,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders
    ),
    g AS (
      SELECT category AS cat, sum(y) AS sum_y, count(*) AS n_rows
      FROM t GROUP BY category
    )
    SELECT DISTINCT t.category, t.y,
           CAST(g.n_rows AS BIGINT) AS n_rows,
           CAST(((g.sum_y - t.y) * 10000) // (g.n_rows - 1) AS BIGINT) AS loo_bp
    FROM t JOIN g ON t.category = g.cat
    WHERE g.n_rows > 1
    ORDER BY t.category, t.y
    """,
)
def q_feat_target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.W w1 — leave-one-out target encoding: encode ``o_orderpriority``
    by the mean of the binary target (order finalized, status 'F')
    computed over the OTHER rows of the same category —
    ``(Σy − y_i)·10⁴ div (n − 1)`` in exact basis points. LOO is the
    standard leakage guard for target encoding (the naive mean leaks each
    row's own label); within a category the encoding takes exactly one
    value per label, so the distinct (category, y) frame IS the full
    codebook.

    Scale: one partial-aggregated groupBy over |categories| keys, then a
    broadcast join-back of the tiny stats table onto the fact and a
    |categories|×2-row distinct — no row-level output, no second fact
    shuffle."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("category"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    g = orders.groupBy("category").agg(
        F.sum("y").alias("sum_y"), F.count(F.lit(1)).alias("n_rows")
    )
    return (
        orders.join(F.broadcast(g.filter(F.col("n_rows") > 1)), "category")
        .select(
            "category",
            "y",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.expr("CAST(((sum_y - y) * 10000) div (n_rows - 1) AS BIGINT)").alias(
                "loo_bp"
            ),
        )
        .distinct()
        .orderBy("category", "y")
    )


@query(
    "q_feat_freq_encode",
    oracle="""
    SELECT p_brand, count(*) AS n_rows,
           CAST((count(*) * 10000) // (SELECT count(*) FROM part) AS BIGINT)
             AS freq_bp
    FROM part GROUP BY p_brand ORDER BY p_brand
    """,
)
def q_feat_freq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.W w2 — frequency encoding: each brand's corpus share in exact
    basis points. The cheapest useful categorical encoding (rank-
    preserving, unsupervised, no leakage risk) and the codebook the
    serving side re-derives bit-identically from the same table.

    Scale: one |brands|-key partial-aggregated groupBy plus a broadcast
    1-row total — the denominator never shuffles the fact twice."""
    part = load_table(spark, sf_dir, "part")
    total = part.agg(F.count(F.lit(1)).alias("total"))
    return (
        part.groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .crossJoin(F.broadcast(total))
        .select(
            "p_brand",
            "n_rows",
            F.expr("CAST((n_rows * 10000) div total AS BIGINT)").alias("freq_bp"),
        )
        .orderBy("p_brand")
    )


@query(
    "q_feat_hash_bucket",
    oracle=f"""
    WITH b AS (
      SELECT p_brand,
             ((strpos('0123456789abcdef', substring(md5(p_brand), 1, 1)) - 1) * 16
              + strpos('0123456789abcdef', substring(md5(p_brand), 2, 1)) - 1)
             % {_N_BUCKETS} AS bucket
      FROM part
    )
    SELECT bucket, count(DISTINCT p_brand) AS n_categories,
           count(*) AS n_rows
    FROM b GROUP BY bucket ORDER BY bucket
    """,
)
def q_feat_hash_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.W w3 — the hashing trick, exactly: brands map to 8 buckets via
    the first md5 byte (two hex nibbles decoded with ``strpos``
    arithmetic — no engine-specific hex-to-int builtin), and the census
    reports the collision structure (categories per bucket, rows per
    bucket). Hashing-trick collisions are a *modelling* tradeoff; this
    makes them auditable, and the md5-nibble spelling is the repo's
    engine-portable hash idiom (b9/b10) applied to feature space.

    Scale: pure map-side hash + a |buckets|-key partial-aggregated
    groupBy; distinct-category counts shuffle (bucket, brand) pairs,
    bounded by category cardinality, not rows."""
    part = load_table(spark, sf_dir, "part")
    h = F.md5(F.col("p_brand"))
    nib = lambda i: F.instr(F.lit("0123456789abcdef"), F.substring(h, i, 1)) - 1  # noqa: E731
    b = part.select(
        "p_brand", ((nib(1) * 16 + nib(2)) % _N_BUCKETS).cast("long").alias("bucket")
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.countDistinct("p_brand").alias("n_categories"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("bucket")
    )


@query(
    "q_feat_cross",
    oracle="""
    SELECT concat(CAST(c_nationkey AS VARCHAR), '_', c_mktsegment) AS cross_id,
           count(*) AS n_rows,
           CAST((count(*) * 10000) // (SELECT count(*) FROM customer) AS BIGINT)
             AS share_bp
    FROM customer GROUP BY 1 ORDER BY cross_id
    """,
)
def q_feat_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.W w4 — crossed categorical feature: nation × market segment as
    a single composite category with its support census (count + exact
    share). Crossing is how linear models and trees get interaction
    signal; the support census is what decides whether a cross is dense
    enough to keep or should fall through to w7's rare-collapse.

    Scale: map-side concat + one partial-aggregated groupBy over
    |nations|·|segments| keys; broadcast 1-row denominator."""
    cust = load_table(spark, sf_dir, "customer")
    total = cust.agg(F.count(F.lit(1)).alias("total"))
    return (
        cust.select(
            F.concat_ws("_", F.col("c_nationkey").cast("string"), "c_mktsegment").alias(
                "cross_id"
            )
        )
        .groupBy("cross_id")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .crossJoin(F.broadcast(total))
        .select(
            "cross_id",
            "n_rows",
            F.expr("CAST((n_rows * 10000) div total AS BIGINT)").alias("share_bp"),
        )
        .orderBy("cross_id")
    )


@query(
    "q_feat_history_pit",
    oracle=f"""
    SELECT o_orderkey, o_custkey,
           CAST(coalesce(count(*) OVER h, 0) AS BIGINT) AS n_prior,
           CAST(coalesce(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                         OVER h, 0) AS BIGINT) AS prior_cents,
           CAST((epoch_us(o_orderdate) - epoch_us(lag(o_orderdate) OVER o))
                // {_US_PER_DAY} AS BIGINT) AS days_since_prior
    FROM orders
    WINDOW h AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           o AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_orderkey
    """,
)
def q_feat_history_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.W w5 — point-in-time-correct history features: for every order,
    the customer's PRIOR order count, prior spend in exact cents, and
    integer days since the previous order (NULL on the first) — computed
    with a strictly-preceding window frame so no row ever sees its own or
    future data. This is the training-set shape for churn/LTV models and
    the no-leakage twin of an as-of feature join.

    Scale: ONE o_custkey shuffle serves both the cumulative frame and the
    lag — at 100 TB this replaces the per-row correlated subquery (a
    fact×fact join) with a single sort-based window. Output is |orders|
    rows by design: it IS the feature table."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    h = w.rowsBetween(Window.unboundedPreceding, -1)
    cents = F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
    gap_us = F.unix_micros(F.col("o_orderdate").cast("timestamp")) - F.unix_micros(
        F.lag("o_orderdate").over(w).cast("timestamp")
    )
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            F.coalesce(F.count(F.lit(1)).over(h), F.lit(0)).cast("long").alias("n_prior"),
            F.coalesce(F.sum(cents).over(h), F.lit(0)).cast("long").alias("prior_cents"),
            gap_us.alias("gap_us"),
        )
        .select(
            "o_orderkey",
            "o_custkey",
            "n_prior",
            "prior_cents",
            F.expr(f"CAST(gap_us div {_US_PER_DAY} AS BIGINT)").alias(
                "days_since_prior"
            ),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q_feat_odds_smooth",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_rows,
           CAST(sum(CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           CAST(sum(CASE WHEN c_acctbal > 5000 THEN 0 ELSE 1 END) AS BIGINT) AS n_neg,
           CAST(((sum(CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END) + 1) * 10000)
                // (sum(CASE WHEN c_acctbal > 5000 THEN 0 ELSE 1 END) + 1)
                AS BIGINT) AS odds_bp
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def q_feat_odds_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.W w6 — add-one-smoothed odds encoding: per market segment, the
    Laplace-smoothed odds of a high-balance customer,
    ``(pos+1)·10⁴ div (neg+1)`` in exact basis points. The
    weight-of-evidence alternative that needs no logarithm, so it stays
    integer-exact and hash-checkable while preserving WoE's ordering
    (log is monotone in the odds).

    Scale: one conditional-sum partial-aggregated groupBy over
    |segments| keys riding a 2-column pruned scan."""
    cust = load_table(spark, sf_dir, "customer")
    pos = F.sum(F.when(F.col("c_acctbal") > 5000, 1).otherwise(0))
    neg = F.sum(F.when(F.col("c_acctbal") > 5000, 0).otherwise(1))
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            pos.alias("n_pos"),
            neg.alias("n_neg"),
        )
        .select(
            "c_mktsegment",
            "n_rows",
            "n_pos",
            "n_neg",
            F.expr("CAST(((n_pos + 1) * 10000) div (n_neg + 1) AS BIGINT)").alias(
                "odds_bp"
            ),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q_feat_rare_collapse",
    oracle=f"""
    WITH x AS (
      SELECT concat(p_brand, '|', p_type) AS cross_id, count(*) AS n
      FROM part GROUP BY 1
    ),
    tot AS (SELECT count(*) AS total FROM part),
    lab AS (
      SELECT CASE WHEN (x.n * 10000) // tot.total >= {_RARE_BP}
                  THEN x.cross_id ELSE 'OTHER' END AS label,
             x.n
      FROM x, tot
    )
    SELECT label, CAST(sum(n) AS BIGINT) AS n_rows,
           count(*) AS n_source_categories
    FROM lab GROUP BY label ORDER BY label
    """,
)
def q_feat_rare_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.W w7 — rare-category collapse: brand×type crosses below 1%
    corpus share fold into 'OTHER' before one-hot/embedding, and the
    census reports each surviving label's row mass plus how many source
    categories it absorbed. This is the cardinality cap that keeps w4's
    crosses from exploding a model's input width — and because the
    threshold is a share, the labeling rule is scale-free.

    Scale: the first groupBy is over cross cardinality; the relabel +
    second groupBy touch only the |crosses|-row codebook with a broadcast
    1-row total — the fact is scanned once."""
    part = load_table(spark, sf_dir, "part")
    x = (
        part.select(F.concat_ws("|", "p_brand", "p_type").alias("cross_id"))
        .groupBy("cross_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = part.agg(F.count(F.lit(1)).alias("total"))
    lab = x.crossJoin(F.broadcast(total)).select(
        F.when(
            F.expr(f"(n * 10000) div total >= {_RARE_BP}"), F.col("cross_id")
        )
        .otherwise("OTHER")
        .alias("label"),
        "n",
    )
    return (
        lab.groupBy("label")
        .agg(
            F.sum("n").cast("long").alias("n_rows"),
            F.count(F.lit(1)).alias("n_source_categories"),
        )
        .orderBy("label")
    )
