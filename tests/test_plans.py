"""Physical-plan assertions (SURVEY.md §4, §2 d13).

Correctness tests prove the right rows come back; these prove the right
*plan* produces them — the properties that decide whether the same query
survives a 100 TB deployment: filters pushed into the parquet scan,
columns pruned, small dims broadcast, aggregates split partial→final,
top-k lowered to TakeOrderedAndProject, and the Python boundary using
Arrow rather than per-row pickling.
"""

from __future__ import annotations

import pytest

from recommendersystems_bigdata_spark import registry
from recommendersystems_bigdata_spark.plans import full_explain, physical_plan

registry.load_all()


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    def run(key):
        return registry.QUERIES[key](spark, sf_dir)

    return run


def test_filter_pushdown_reaches_scan(q):
    plan = full_explain(q("q_filter_compound"))
    assert "PushedFilters: [" in plan
    # at least one real predicate pushed, not an empty list
    assert "PushedFilters: []" not in plan


def test_column_pruning_on_pricing_summary(q):
    plan = full_explain(q("q_agg_pricing_summary"))
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema, plan
    # lineitem has 16 columns; the flagship aggregate needs 7 — pruned scan
    # must not read unrelated ones
    assert "l_comment" not in read_schema[0]
    assert "l_suppkey" not in read_schema[0]


def test_partial_then_final_aggregate(q):
    plan = physical_plan(q("q_agg_pricing_summary"))
    assert plan.count("HashAggregate") >= 2, plan
    assert "Exchange" in plan


def test_broadcast_join_on_dims(spark, q):
    """c7's hints must broadcast the three true dims while the
    orders⋈lineitem fact–fact leg stays a shuffle join (sort-merge or
    shuffled-hash) — broadcasting a fact table is a driver OOM at 100 TB.

    Size-based auto-broadcast is disabled for the assertion: at sf0.001
    AQE would broadcast *everything* by size estimate, masking which sides
    carry an explicit hint. With thresholds at -1, only hinted sides
    broadcast — exactly the behavior a stale-stats 100 TB run gets.
    """
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        df = q("q_join_broadcast")
        df.collect()  # finalize AQE so join strategies are settled
        plan = physical_plan(df)
        assert plan.count("BroadcastHashJoin") >= 3, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    finally:
        # conf.get(k, None) returns None for any conf never explicitly set
        # (even ones with built-in defaults) — restoring must UNSET those,
        # not skip them, or the -1 thresholds leak into the shared session
        # and break every later broadcast-plan assertion.
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_semi_and_anti_join_strategies(q):
    assert "LeftSemi" in physical_plan(q("q_join_semi"))
    assert "LeftAnti" in physical_plan(q("q_join_anti"))


def test_topk_lowered_to_take_ordered(q):
    plan = physical_plan(q("q_topk_global"))
    assert "TakeOrderedAndProject" in plan


def test_whole_stage_codegen_active(q):
    df = q("q_agg_pricing_summary")
    df.collect()  # AQE only finalizes (and codegens) the plan on execution
    plan = physical_plan(df)
    assert "*(" in plan, "no WholeStageCodegen stages in flagship plan"


def test_python_udf_uses_batch_eval(q):
    plan = physical_plan(q("q_udf_python"))
    assert "BatchEvalPython" in plan


def test_pandas_udf_uses_arrow_eval(q):
    plan = physical_plan(q("q_udf_pandas_scalar"))
    assert "ArrowEvalPython" in plan


def test_grouped_map_uses_arrow(q):
    plan = physical_plan(q("q_udtf_grouped_map"))
    assert "FlatMapGroupsInPandas" in plan


def test_theta_join_keeps_equi_conjunct(q):
    """c8 must hash-partition on the equi key — a BroadcastNestedLoopJoin
    here would be quadratic at scale."""
    plan = physical_plan(q("q_join_theta_range"))
    assert "BroadcastNestedLoopJoin" not in plan


def test_aqe_enabled(q):
    plan = physical_plan(q("q_join_star_multiway"))
    assert "AdaptiveSparkPlan" in plan


def test_hll_sketch_merge_accuracy(spark, sf_dir):
    """Merged per-day HLL sketches must estimate per-type distinct users
    within HLL(lgK=14) error bounds of the exact count (≲1% at these
    cardinalities; 5% gate leaves slack)."""
    from pyspark.sql import functions as F

    from recommendersystems_bigdata_spark import registry
    from recommendersystems_bigdata_spark.catalog import load_table

    approx = {
        r.event_type: r.approx_users
        for r in registry.QUERIES["q_agg_hll_sketch_merge"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, n in exact.items():
        assert abs(approx[et] - n) <= max(1, 0.05 * n), (et, approx[et], n)


def test_pipeline_map_ops_are_shuffle_free(q):
    """redact / chunk / repetition are pure map-side transforms: one
    codegen'd pass over the scan, no Exchange anywhere — the property
    that makes them free at 100 TB."""
    for key in ("q_text_redact", "q_text_chunk", "q_text_repetition"):
        plan = physical_plan(q(key))
        assert "Exchange" not in plan, f"{key} shuffles:\n{plan}"


def test_contamination_eval_side_broadcasts(q):
    """the eval-set gram table must broadcast; the corpus side must not
    shuffle for the join itself (only the final per-doc aggregate may)."""
    plan = physical_plan(q("q_contamination_check"))
    assert "BroadcastHashJoin" in plan, plan


def test_docs_pack_partitions_by_shard(q):
    """packing's cumulative sum must be windowed per language shard, not a
    single global ordering."""
    df = q("q_docs_pack")
    plan = full_explain(df)
    assert "lang" in plan
    # a global window sort would show a SinglePartition exchange feeding Window
    import re
    assert not re.search(r"Exchange SinglePartition[\s\S]{0,200}Window", plan), plan


def test_approx_percentile_error_gate(q):
    """q_agg_approx_percentile must land within 2% of the exact d10
    percentiles — the accuracy contract that justifies swapping the exact
    sort for the mergeable sketch at scale."""
    approx = {
        r["o_orderpriority"]: (r["p50_approx"], r["p90_approx"])
        for r in q("q_agg_approx_percentile").collect()
    }
    exact = {
        r["o_orderpriority"]: (r["median_price"], r["p90_price"])
        for r in q("q_agg_percentile").collect()
    }
    assert approx.keys() == exact.keys()
    for k, (a50, a90) in approx.items():
        e50, e90 = exact[k]
        assert abs(a50 - e50) / e50 < 0.02, (k, a50, e50)
        assert abs(a90 - e90) / e90 < 0.02, (k, a90, e90)


def test_basket_lift_broadcasts_item_counts(q):
    """the per-item count tables must broadcast; only the pair build and
    its aggregate may shuffle."""
    plan = physical_plan(q("q_basket_lift"))
    assert "BroadcastHashJoin" in plan, plan


def test_minhash_signature_single_aggregation(q):
    """the signature is one groupBy(doc_id) over map-side token hashing:
    exactly one aggregation exchange, no joins."""
    plan = physical_plan(q("q_minhash_signatures"))
    assert "Join" not in plan, plan
    assert plan.count("Exchange") <= 2, plan  # partial->final agg exchange (+AQE read)


def test_lm_score_vocab_broadcasts(q):
    """the unigram frequency table is the only shared state and must
    broadcast — the corpus side may not shuffle for the join."""
    plan = physical_plan(q("q_text_lm_score"))
    assert "BroadcastHashJoin" in plan, plan


def test_ann_candidate_generation_stays_bucketed(q):
    """both ANN paths must generate candidates via equi joins: the LSH
    similarity join keys on hash-table entries and the IVF probe join
    broadcasts the bounded (query × nprobe) table — a nested-loop join in
    either means candidate generation degenerated to all-pairs."""
    assert "BroadcastNestedLoopJoin" not in physical_plan(q("q_ann_lsh"))
    ivf_plan = physical_plan(q("q_ann_ivf"))
    assert "BroadcastNestedLoopJoin" not in ivf_plan
    assert "BroadcastHashJoin" in ivf_plan, ivf_plan


def test_lsh_join_avoids_nested_loop(q):
    """the LSH candidate join must stay an equi hash/sort-merge join on
    the band keys — a BroadcastNestedLoopJoin here would mean the
    bucketing degenerated to all-pairs (the SCALE.md measured hazard)."""
    plan = physical_plan(q("q_dedup_lsh_join"))
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_band_candidates_stay_bucketed(spark, sf_dir):
    """band_candidates is the shared candidate generator for BOTH the
    pairwise verifier and the clustering operator — its plan must be
    band-key equi joins only, never a nested loop or cartesian product."""
    from recommendersystems_bigdata_spark.ml.dedup import band_candidates

    plan = physical_plan(band_candidates(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_item_recs_neighbor_list_broadcasts(q):
    """the capped top-10 neighbor list is the small side and must
    broadcast into the user-items join — candidate generation may not
    shuffle the interaction table against the neighbor table."""
    plan = physical_plan(q("q_item_recs_cooccur"))
    assert "BroadcastHashJoin" in plan, plan


def test_skew_report_total_broadcasts(q):
    """the 1-row total joins via broadcast (nested-loop on a 1-row side
    is fine too) — never a shuffle of the per-key aggregate."""
    plan = physical_plan(q("q_skew_report"))
    assert "Exchange hashpartitioning(l_partkey" not in plan or "Broadcast" in plan, plan


def test_feature_minmax_single_scan_shape(q):
    """bounds come from a 1-row aggregate broadcast back over the scan;
    the projection itself is map-only (no hash-partition exchange on the
    output side)."""
    plan = physical_plan(q("q_feature_minmax"))
    assert "Broadcast" in plan, plan


def test_knn_vote_query_side_broadcasts(q):
    """the bounded query batch must broadcast against the corpus scan —
    k9's contract, inherited by the classification wrapper."""
    plan = physical_plan(q("q_knn_label_vote"))
    assert "Broadcast" in plan, plan


def test_anomaly_mad_medians_broadcast(q):
    """both per-type median tables are tiny and must broadcast back over
    the events scan."""
    plan = physical_plan(q("q_anomaly_mad"))
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_apply_deletes_broadcast_anti_join(q):
    """the tombstone batch must broadcast; the base scan may not shuffle
    for the anti-join."""
    plan = physical_plan(q("q_apply_deletes"))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_tpch_classics_broadcast_dims_and_take_ordered(q):
    """Q3/Q10 must lower their top-k to TakeOrderedAndProject and
    broadcast their dimension sides; Q5's six-way join must broadcast
    supplier/nation/region (no shuffle for any dim)."""
    for key in ("q_tpch_q3_shipping", "q_tpch_q10_returns"):
        plan = physical_plan(q(key))
        assert "TakeOrderedAndProject" in plan, f"{key}:\n{plan}"
        assert "BroadcastHashJoin" in plan, f"{key}:\n{plan}"
    plan = physical_plan(q("q_tpch_q5_local_volume"))
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_tpch_date_filters_push_to_scan(q):
    """the order-date range predicates must reach the parquet scan as
    PushedFilters, not run as post-scan filters only."""
    plan = physical_plan(q("q_tpch_q10_returns"))
    assert "PushedFilters: [" in plan, plan


def test_bloom_positions_broadcast(q):
    """the Bloom position set must broadcast into the probe join — the
    entire point of the pattern is that the probe side never shuffles."""
    plan = physical_plan(q("q_bloom_prefilter"))
    assert "BroadcastHashJoin" in plan, plan


def test_countmin_sketch_cells_broadcast(q):
    """the 4×256 sketch grid joins the probes via broadcast; the token
    scan aggregates with map-side partials (partial+final HashAggregate)."""
    plan = physical_plan(q("q_countmin_heavy_hitters"))
    assert "BroadcastHashJoin" in plan, plan
    assert "HashAggregate" in plan, plan


def test_drift_contingency_is_tiny_window(q):
    """the chi-square window totals must run over the aggregated
    contingency cells, never the raw events — no window operator may
    consume an un-aggregated events-sized input."""
    df = q("q_drift_chi2")
    plan = physical_plan(df)
    # windows appear after the cells aggregate: a HashAggregate must feed
    # the Window (appear below it in the top-down plan text)
    assert "Window" in plan and "HashAggregate" in plan, plan
    assert plan.index("Window") < plan.rindex("HashAggregate"), plan


def test_triangle_wedge_joins_stay_equi(q):
    """the degree-oriented triangle enumeration must hash-join: the wedge
    join is equi on src (the (deg,id)-order filter is a post-condition)
    and the closing-edge join is equi on (src, dst). A nested-loop
    anywhere means enumeration degenerated to all-pairs — the exact skew
    hazard the degree orientation exists to prevent."""
    plan = physical_plan(q("q_graph_triangles"))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_topk_rankings_lower_to_take_ordered(q):
    """limit-first top-k queries must plan TakeOrderedAndProject (each
    partition keeps a local top-k, the driver merges) — the ranking
    window may only ever see the k surviving rows, never the full
    aggregate, which grows with the corpus."""
    for key in (
        "q_skew_report",
        "q_top_bigrams",
        "q_boilerplate_segments",
        "q_countmin_heavy_hitters",
        "q_popularity_topk",
        "q_user_user_cf",
    ):
        plan = physical_plan(q(key))
        assert "TakeOrderedAndProject" in plan, (key, plan)


def test_global_rankings_avoid_single_partition_data_pass(q):
    """queries using the distributed global rank/ntile/cumsum
    (functions/ranks.py) must not funnel the data through an Exchange
    SinglePartition: the only single-partition stages allowed are the
    bounded offset/total aggregates (one row per shuffle partition).
    ntile specifically must be lowered to arithmetic — no ntile window
    function may survive in the physical plan."""
    for key, max_sp in (
        ("q_win_ntile", 2),
        ("q_rfm_segmentation", 6),  # three ntiles: one offsets+total pair each
        ("q_quantile_binning", 2),
        ("q_decile_lift", 4),  # + the 10-row decile cum window + grand total
        ("q_gini_concentration", 2),  # offsets window + final 1-row aggregate
        ("q_abc_pareto", 2),
    ):
        plan = physical_plan(q(key))
        assert plan.count("SinglePartition") <= max_sp, (key, plan)
        assert "ntile(" not in plan, (key, plan)


def test_skyline_sweep_is_distributed(q):
    """§2.BS: the prefix-max sweep must use the ranks.py two-pass device —
    the census data pass stays range-partitioned and the only
    SinglePartition stage is the bounded per-partition offsets frame
    (one per peel for bs3); the offsets join back by broadcast. bs1's
    top-level plan additionally must not fall back to a quadratic join."""
    plan = physical_plan(q("q_skyline_price_size"))
    assert plan.count("SinglePartition") <= 1, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan  # offsets rejoin
    layers = physical_plan(q("q_skyline_layers"))
    assert layers.count("SinglePartition") <= 3, layers
    assert "BroadcastNestedLoopJoin" not in layers, layers


def test_skyline_dominance_counts_windows_are_partitioned(q):
    """§2.BS bs2: the four grid cumulations must be PARTITIONED windows
    (by size / by price) — never a global single-partition window over
    the grid."""
    plan = physical_plan(q("q_skyline_dominance_counts"))
    assert "SinglePartition" not in plan, plan


def test_seasonal_mk_pairs_join_on_month(q):
    """§2.BT bt4: the seasonal pair join must be keyed on the calendar
    month (an equi-join the planner can hash/merge), not a nested loop
    over all month pairs."""
    plan = physical_plan(q("q_seasonal_mann_kendall"))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_peerbench_windows_are_nation_partitioned(q):
    """§2.BU: every peer ranking must be a PARTITIONED window over the
    supplier census — no single-partition exchange, no nested loop;
    the nation dim and per-nation reductions join by broadcast."""
    for key in (
        "q_peer_rank_percentile",
        "q_peer_median_gap",
        "q_peer_quartile_bands",
        "q_peer_leader_margin",
    ):
        plan = physical_plan(q(key))
        assert "SinglePartition" not in plan, (key, plan)
        assert "BroadcastNestedLoopJoin" not in plan, (key, plan)
        assert "CartesianProduct" not in plan, (key, plan)
        assert "BroadcastHashJoin" in plan, (key, plan)


def test_calibration_census_side_decomposition(q):
    """§2.BY: every calibration audit reduces the ONE checkpointed
    (year, bin) census — partial→final fact aggregation, the 5×5 bin
    join and model attach broadcast, no cartesian, no fact-sized
    nested loop (the two 1-row total broadcasts are adjudicated in
    _BNLJ_ALLOWED)."""
    for key in (
        "q_calib_reliability",
        "q_calib_brier_decomp",
        "q_calib_skill_score",
        "q_calib_drift_by_year",
    ):
        plan = physical_plan(q(key))
        assert "CartesianProduct" not in plan, (key, plan)
        assert plan.count("HashAggregate") >= 2, (key, plan)
        assert "SortMergeJoin" not in plan, (key, plan)
        # the fact was scanned exactly once, at census-checkpoint time:
        # the published query reads the ≤35-row materialization only
        assert "Scan parquet" not in plan, (key, plan)


def test_seqab_census_side_boundaries(q):
    """§2.CD: one orders pass to the (month, arm) census; the 12-look
    expansion and every boundary compare are census-side (no
    cartesian beyond the adjudicated tiny broadcasts; ≥2 aggregate
    pairs = map-side combine on the fact)."""
    for key in (
        "q_seqab_variant_census",
        "q_seqab_look_table",
        "q_seqab_stop_summary",
        "q_seqab_final_effect",
    ):
        plan = physical_plan(q(key))
        assert "CartesianProduct" not in plan, (key, plan)
        assert plan.count("HashAggregate") >= 2, (key, plan)


def test_newsvendor_partitioned_rank_picks(q):
    """§2.CE: ranks are windows PARTITIONED BY BRAND over the
    checkpointed census (zero parquet scans downstream; the only
    single-partition exchanges are the 1-row calendar aggregates —
    the rank window itself hash-partitions on brand, asserted via
    its hashpartitioning argument); ce4's pooled rank (≤ |months|
    rows) may single-partition."""
    for key in (
        "q_news_demand_quantiles",
        "q_news_fill_rate_backtest",
        "q_news_critical_fractile",
    ):
        plan = physical_plan(q(key))
        assert "CartesianProduct" not in plan, (key, plan)
        assert "Scan parquet" not in plan, (key, plan)
        assert "hashpartitioning(brand" in plan, (key, plan)
    pool = physical_plan(q("q_news_pool_stock_saving"))
    assert "CartesianProduct" not in pool, pool
    assert "Scan parquet" not in pool, pool


def test_repetition_explode_pipeline_and_hof_scan(q):
    """§2.CC: cc1/cc2 are the canonical explode → partial-agg
    pipeline (Generate + ≥2 HashAggregate pairs, map-side combine on
    (doc, gram)); cc3 must be a pure HOF projection — NO Generate, NO
    join, nothing fact-shuffled before the output sort."""
    for key in ("q_rep_bigram_census", "q_rep_trigram_coverage"):
        plan = physical_plan(q(key))
        assert "Generate" in plan, (key, plan)
        assert plan.count("HashAggregate") >= 2, (key, plan)
        assert "CartesianProduct" not in plan, (key, plan)
        assert "BroadcastNestedLoopJoin" not in plan, (key, plan)
    hof = physical_plan(q("q_rep_immediate_repeats"))
    assert "Generate" not in hof, hof
    assert "Join" not in hof, hof
    screen = physical_plan(q("q_rep_screen_by_source"))
    assert "CartesianProduct" not in screen, screen
    assert "BroadcastNestedLoopJoin" not in screen, screen


def test_shuffleplan_partial_agg_and_topk(q):
    """§2.CB: every advisor census is a partial→final aggregate (the
    per-key counts combine map-side); cb2's top-10 lowers to
    TakeOrderedAndProject, never a global sort; no cartesian beyond
    the adjudicated 1-row broadcasts."""
    for key in (
        "q_shuffle_key_imbalance",
        "q_shuffle_salt_advisor",
        "q_broadcast_advisor",
        "q_shuffle_partition_histogram",
    ):
        plan = physical_plan(q(key))
        assert "CartesianProduct" not in plan, (key, plan)
        assert plan.count("HashAggregate") >= 2, (key, plan)
    salt = physical_plan(q("q_shuffle_salt_advisor"))
    assert "TakeOrderedAndProject" in salt, salt


def test_leadlag_calendar_side_arithmetic(q):
    """§2.CA: every screen reads the ONE checkpointed calendar census
    (zero parquet scans downstream); the shifted lookups are
    equi-joins on the lagged date (no cartesian beyond the 14-row lag
    broadcast in _BNLJ_ALLOWED); only ca3's top-1 over 14 rows may
    single-partition."""
    for key in (
        "q_leadlag_daily_series",
        "q_leadlag_xcorr_table",
        "q_leadlag_diff_xcorr",
    ):
        plan = physical_plan(q(key))
        assert "CartesianProduct" not in plan, (key, plan)
        assert "Scan parquet" not in plan, (key, plan)
        assert "SinglePartition" not in plan or key == "q_leadlag_daily_series", (
            key,
            plan,
        )
    best = physical_plan(q("q_leadlag_best_lag"))
    assert "CartesianProduct" not in best, best
    assert "Scan parquet" not in best, best


def test_pooling_census_side_statistics(q):
    """§2.BZ: every pooling statistic reduces the ONE checkpointed
    (brand, nation, month) census — zero parquet scans downstream, no
    cartesian (the 1-row calendar broadcasts are adjudicated in
    _BNLJ_ALLOWED), and bz4's pair enumeration is an equi-join on
    brand, never a nested loop over series."""
    for key in (
        "q_pool_demand_census",
        "q_pool_benefit_by_brand",
        "q_pool_cv2_ladder",
        "q_pool_complementary_pairs",
    ):
        plan = physical_plan(q(key))
        assert "CartesianProduct" not in plan, (key, plan)
        assert "Scan parquet" not in plan, (key, plan)
        assert plan.count("HashAggregate") >= 2, (key, plan)


def test_fingerprint_is_one_pass_partial_agg(q):
    """§2.BW: every fingerprint must be a partial→final aggregate (the
    mod-M checksum combines map-side) with no nested loop and no
    single-partition data pass; bw2's fact⋈fact leg must be a shuffle
    join on the order key, never a broadcast of a fact."""
    for key in (
        "q_fingerprint_orders",
        "q_fingerprint_by_month",
    ):
        plan = physical_plan(q(key))
        assert plan.count("HashAggregate") >= 2, (key, plan)
        assert "SinglePartition" not in plan, (key, plan)
        assert "BroadcastNestedLoopJoin" not in plan, (key, plan)
    rec = physical_plan(q("q_fingerprint_reconcile"))
    assert "SortMergeJoin" in rec or "ShuffledHashJoin" in rec, rec
    assert "BroadcastNestedLoopJoin" not in rec, rec
    tot = physical_plan(q("q_fingerprint_total"))
    assert tot.count("SinglePartition") <= 2, tot  # the two 1-row finals


def test_tree_leaf_paths_lowers_to_topk(q):
    """§2.BV bv4: the top-10 leaf paths must lower to
    TakeOrderedAndProject, not a full census sort."""
    plan = physical_plan(q("q_tree_leaf_paths"))
    assert "TakeOrderedAndProject" in plan, plan


def test_topk_rank_windows_run_after_limit(q):
    """The global top-k queries must lower their sort+limit to
    TakeOrderedAndProject and feed the rank window FROM the limited frame
    (Window parent of TakeOrderedAndProject in the tree): the unpartitioned
    window then runs over k rows by construction, never over the
    data-sized aggregate — pinning this shape kills the
    'WindowExec: No Partition Defined' class as a regression vector."""
    for key in (
        "q_top_bigrams",
        "q_boilerplate_segments",
        "q_countmin_heavy_hitters",
        "q_skew_report",
        "q_user_user_cf",
        "q_events_pathing",
    ):
        plan = physical_plan(q(key))
        assert "TakeOrderedAndProject" in plan, f"{key}:\n{plan}"
        wi = plan.find("Window")
        ti = plan.find("TakeOrderedAndProject")
        # Window absent is fine too (Catalyst prunes the rank entirely when
        # the output doesn't use it, e.g. q_countmin_heavy_hitters); what
        # must never appear is a window BELOW the limit, i.e. over the
        # data-sized frame.
        assert wi == -1 or wi < ti, (
            f"{key}: rank window is not above the limited frame\n{plan}"
        )


# ---------------------------------------------------------------------------
# Whole-registry scale-killer sweep
# ---------------------------------------------------------------------------

# Adjudicated exceptions (SCALE.md "Whole-registry plan audit"): every entry
# must name WHY the node is bounded. A new key appearing here requires the
# same adjudication.
_BNLJ_ALLOWED = {
    # 1-row global-total broadcasts (the ntile/ratio pattern): the nested
    # loop's build side is a single aggregate row, so it is O(n·1).
    "q_win_ntile", "q_rfm_segmentation", "q_quantile_binning",
    "q_decile_lift", "q_gini_concentration", "q_abc_pareto",
    "q_win_ratio_to_report", "q_agg_zscore_outliers", "q_agg_iqr_outliers",
    "q_anomaly_mad", "q_drift_chi2", "q_ab_test_proportions",
    "q_feature_minmax", "q_curate_mix_rebalance", "q_agg_moments",
    "q_vocab_growth", "q_dedup_density_estimate", "q_dedup_rate_report",
    "q_embedding_outliers", "q_embedding_truncation", "q_kfold_split",
    "q_text_lm_score", "q_repeat_purchase_rate", "q_skew_report",
    "q_graph_degree_distribution",  # 1-row node-count total vs ≤64 buckets
    "q_tcloseness_audit",  # 1-row corpus-total broadcast vs classes×bands
    "q_distinct_kmv",  # 1-row kth-hash agg × 1-row exact-count agg combine
    "q_backlog_aging",  # 1-row as-of max-date broadcast vs the filtered fact
    "q_calib_brier_decomp",  # 1-row score-total broadcast vs the 5-bin join
    "q_calib_skill_score",   # 1-row climatology broadcast vs the 5-bin join
    "q_pool_demand_census",        # 1-row calendar broadcast vs the census
    "q_pool_benefit_by_brand",     # 1-row calendar broadcast vs the census
    "q_pool_cv2_ladder",           # 1-row calendar broadcast vs the census
    "q_pool_complementary_pairs",  # 1-row calendar broadcast vs ≤300 pairs
    "q_leadlag_xcorr_table",  # 14-row lag relation vs the bounded spine
    "q_leadlag_best_lag",     # 14-row lag relation vs the bounded spine
    "q_leadlag_diff_xcorr",   # 14-row lag relation vs the bounded spine
    "q_shuffle_key_imbalance",       # 1-row key-total broadcast vs per-key agg
    "q_shuffle_salt_advisor",        # 1-row target broadcast vs the top-10
    "q_shuffle_partition_histogram",  # 1-row total broadcast vs ≤32 buckets
    "q_seqab_look_table",    # 12-row look relation vs the 24-row census
    "q_seqab_stop_summary",  # same + 1-row first-crossing attach
    "q_news_demand_quantiles",   # 5-level/1-row calendar broadcasts vs census
    "q_news_fill_rate_backtest",  # 1-row calendar broadcast vs census
    "q_news_critical_fractile",   # 4-row cost relation vs census
    "q_news_pool_stock_saving",   # 1-row picks vs the 1-row brand total
    "q_feat_freq_encode",   # 1-row corpus-total broadcast vs |brands| rows
    "q_feat_cross",         # 1-row corpus-total broadcast vs |crosses| rows
    "q_feat_rare_collapse",  # 1-row corpus-total broadcast vs the codebook
    "q_percentile_cont_exact",  # |flags|x3-row position frame broadcast
    # scalar-subquery shape: the build side is ONE row (a global threshold,
    # mean, count, or max-timestamp) broadcast against the corpus
    "q_subquery_in",      # acctbal ≥ scalar threshold row
    "q_tpch_q11_important_value",  # 1-row bloc-total broadcast vs per-part sums
    "q_tpch_q22_idle_customers",   # 1-row (n_pos, sum_pos) threshold broadcast
    "q_rmse",             # global error aggregate row
    "q_tfidf_topterm",    # corpus doc-count row for the IDF term
    "q_user_inactivity",  # as-of (max ts) row
    "q_ranking_metrics",  # global user/metric total rows
    # genuinely tiny fixed-size side (≤ a handful of rows by construction)
    "q_join_cross_topn",  # §2 c9: deliberate bounded cross join, LIMIT'd
    "q_resample_ffill",   # calendar spine × key list, both bounded
    "q_interval_concurrency",  # type-cardinality-bounded event types
    "q_rolling_active_users",  # day spine bounded by (dmin, dmax) row
    "q_knn_label_vote",   # fixed 20-query set broadcast vs candidates
    "q_curate_dedup_sensitivity",  # 4-row threshold table broadcast
    "q_search_postings",  # 1-row corpus doc-count broadcast vs |vocab| rows
    "q_search_bm25ish",   # 1-row (avgdl, n_docs) corpus-stats broadcast
    # §2.AA: 1-row totals / 6-row lag list broadcast against the
    # checkpointed calendar-bounded series (≤ |months| / |ship days|)
    "q_ts_autocorr",
    "q_ts_cusum_changepoint",
    "q_ts_seasonality",
    "q_ts_drawdown",
    # §2.Y: 1-row group totals and the 1-row grand-median row (selected
    # by the c >= (n+1) div 2 theta probe) broadcast against the
    # cent-GRID-bounded distinct-value relation — never against the fact
    "q_ranks_mannwhitney",
    "q_ranks_kendall_binned",
    "q_ranks_ks_distance",
    "q_ranks_median_test",
    # §2.AB: 1-row totals broadcast against the checkpointed |tenures| /
    # 9-digit bounded relations
    "q_churn_hazard",
    "q_benford_audit",
    # §2.AC: 1-row catalog/exposure totals (ac1/ac3); ac5's nested loop
    # IS the intended bounded grid — a broadcast 20-row TakeOrdered
    # panel crossed with the catalog for candidate generation
    "q_rec_catalog_coverage",
    "q_rec_popularity_bias",
    "q_rec_negative_sampling",
    # §2.AF af3: the nearest-hub fan-out broadcasts the HUB DIMENSION —
    # small by definition (fulfillment hubs, not a fact) — and the
    # per-customer argmin prunes the fan-out before any shuffle
    "q_geo_nearest_hub",
    # §2.AH ah1/ah2: the pair fan-out broadcasts a ≤20-row literal
    # type-pair grid over the bounded per-user membership relation
    "q_kmv_jaccard_matrix",
    "q_kmv_containment_matrix",
    # §2.AL al2/al5: 1-row revenue-total broadcast vs the 3-row band /
    # tier census — O(3·1)
    "q_single_source_exposure",
    "q_acctbal_risk_tiers",
    # §2.BS bs2/bs4: bounded-by-construction census fan-outs — bs2
    # crosses the ≤|dollar levels| price list with the ≤50 size list to
    # densify the grid; bs4's anti-join is the ~150-cell (brand, type)
    # census against itself (22.5k pairs at any SF)
    "q_skyline_dominance_counts",
    "q_skyline_brand_type",
    # §2.BT bt2/bt3: the pair join is the ≤|months|-row census against
    # itself (≤ ~3.4k pairs forever) plus 1-row total broadcasts
    "q_theil_sen_trend",
    "q_mann_kendall_trend",
    # §2.BV: 1-row grand-total broadcasts against the ≤125-cell leaf
    # census and its ≤25/≤5-row level rollups
    "q_share_tree",
    "q_tree_dominant_child",
    "q_tree_level_profile",
    "q_tree_leaf_paths",
    # §2.BX: the 10×10 densify cross join (two ≤10-row distinct decile
    # lists) and 1-row grand-total broadcasts over the 100-cell grid
    "q_dependence_grid",
    "q_dependence_chi2",
    "q_dependence_lift_map",
    # §2.AO ao1: 1-row corpus token-count broadcast vs the support-
    # filtered bigram head
    "q_colloc_bigram_lift",
    # §2.AR: ranks.global_ntile's 1-row total + bounded offset-table
    # broadcasts (two tilings), against the |customers|-bounded percust
    # relation — never against a fact
    "q_tier_migration_matrix",
    "q_tier_stickiness",
    "q_value_migration",
    "q_tier_bounds",
    # §2.AU au2: 1-row census-total broadcast vs the 25-nation census
    "q_apportion_hamilton",
    # §2.AV: 1-row year-total broadcast vs the 25-brand census (av4);
    # av3's two legs are 1-row aggregate × 1-row aggregate combines
    "q_bridge_mix_shift",
    "q_bridge_waterfall",
    # §2.AX: 1-row (n, T) totals broadcast vs the per-customer spend
    # relation (ax2) / the bounded 10- and 100-row percentile censuses
    "q_lorenz_deciles",
    "q_hoover_index",
    "q_concentration_curve",
    # §2.AY: 1-row world-trade total broadcast vs the ≤625-row matrix /
    # ≤25-row region-block census
    "q_trade_matrix",
    "q_trade_region_blocks",
    # §2.AZ: 1-row gap/customer totals broadcast vs the 6-row bucket /
    # 4-row regularity census
    "q_interpurchase_gaps",
    "q_cadence_regularity",
    # §2.BA: 1-row order-total broadcast vs the 5-row segment census
    "q_segment_mix_weights",
    "q_aov_mix_decomposition",
    # §2.BB: 1-row order/value totals broadcast vs the 5-priority census
    "q_priority_value_premium",
    # §2.BC: 1-row threshold/total broadcasts vs the pinned censuses
    # (bc1: 10th-value threshold; bc2: census total + head sum; bc3:
    # rank + dense thresholds + row count)
    "q_top_parts_with_ties",
    "q_top_brands_plus_other",
    "q_rank_cut_semantics",
    # §2.BF: the 1-row corpus-max-date broadcast attaches to the
    # per-customer subject relation (an O(n) map-side attach, the same
    # device as §2.AB's tenure censoring); bf3 adds the 1-row × 1-row
    # totals × curve combine
    "q_survival_life_table",
    "q_survival_km_curve",
    "q_survival_summary",
    "q_survival_by_segment",
    # §2.BG: the 1-row (total, nonempty) stats broadcast vs the ≤648-
    # cell census (the threshold compare)
    "q_hotspot_cells",
    # §2.BH bh4: the 1-row delta-total broadcast vs the 25-brand census
    "q_yoy_brand_contribution",
    # §2.BI: 1-row center/limit broadcasts vs the ≤84-row month census
    # (bi4 additionally combines its two 1-row scorecard legs)
    "q_spc_pchart_returns",
    "q_spc_xmr_revenue",
    "q_spc_runs_rules",
    "q_spc_summary",
    # §2.BJ: 1-row grand-total / statistic broadcasts vs the 9-digit /
    # ≤100-pair / ≤5-band censuses
    "q_benford_first_digit",
    "q_digit_pair_uniformity",
    "q_price_endings",
    # §2.BK: the 1-row month-count M (and quantity/revenue totals)
    # broadcast onto the part-catalog-sized moment relation
    "q_xyz_cv_classes",
    "q_demand_intermittency",
    "q_abc_xyz_matrix",
    "q_demand_class_summary",
    # §2.BL: 1-row chunk/doc/token totals broadcast vs the ≤8-row
    # ladder censuses
    "q_ctx_chunk_fanout",
    "q_ctx_length_coverage",
    # §2.BN: 1-row vector-total broadcasts vs the bounded norm /
    # concentration / label censuses
    "q_emb_norm_audit",
    "q_emb_concentration_screen",
    "q_emb_label_balance",
    # §2.BO: the 1-row grand-total broadcast vs the 5-segment census
    "q_anova_segment_effects",
    # §2.BP: 1-row pooled-sign / year-span broadcasts vs the bounded
    # (segment, year) census
    "q_simpson_reversal_audit",
    "q_segment_trend_table",
    # §2.BQ: 1-row year-span broadcasts onto the customer-year census
    "q_revenue_retention_bridge",
    "q_nrr_grr_by_year",
    "q_expansion_accounts_topk",
    "q_retention_mix_by_segment",
    # §2.BR: 1-row order/revenue totals vs the ≤7-row size censuses
    "q_order_size_census",
    "q_size_value_mix",
}
_CARTESIAN_ALLOWED = {
    "q_als_recommend",  # inside MLlib recommendForAllUsers factor ranking
    "q_join_cross_topn",  # the §2 cross-join operator itself
}

# Building a streaming query EXECUTES the stream (memory-sink batch run);
# sink queries write files. Both are exercised by their own tests — the
# static plan sweep covers every other key.
_SWEEP_EXCLUDED_MODULES = {
    "recommendersystems_bigdata_spark.streaming.stream_queries",
}


def _sweep_keys():
    registry.load_all()
    return sorted(
        k for k, fn in registry.QUERIES.items()
        if fn.__module__ not in _SWEEP_EXCLUDED_MODULES
    )


@pytest.mark.parametrize("key", _sweep_keys())
def test_no_unadjudicated_scale_killers(q, key):
    """No engine-authored plan may contain a CartesianProduct or a
    BroadcastNestedLoopJoin unless the key is on the adjudicated
    allowlist naming why the node's input is bounded. This is the blanket
    guard that keeps the per-query plan audits from regressing silently."""
    plan = physical_plan(q(key))
    if "CartesianProduct" in plan:
        assert key in _CARTESIAN_ALLOWED, f"{key}: unadjudicated CartesianProduct\n{plan}"
    if "BroadcastNestedLoopJoin" in plan:
        assert key in _BNLJ_ALLOWED, f"{key}: unadjudicated BroadcastNestedLoopJoin\n{plan}"
    # Row-pickled Python UDFs are the slow path; the ONLY key allowed to
    # carry one is j1 (q_udf_python), whose point IS the row-at-a-time
    # contract. Everything else must be JVM-native or Arrow-batched
    # (ArrowEvalPython / mapInPandas / FlatMapGroupsInPandas).
    if "BatchEvalPython" in plan:
        assert key == "q_udf_python", f"{key}: row-pickled Python UDF\n{plan}"


def test_global_shuffle_offset_join_is_broadcast(q):
    """m9/m10: the two-pass rank's range shuffle sits BEFORE the ranks.py
    localCheckpoint (lineage-truncated, so not in this plan — pinned
    instead by tests/test_ranks.py); what the post-checkpoint plan must
    show is that the per-partition offset table joins back by BROADCAST
    (no second corpus shuffle) and the only SinglePartition exchange is
    the offset frame, whose input is one row per shuffle partition."""
    for key in ("q_curate_global_shuffle", "q_curate_interleave"):
        plan = physical_plan(q(key))
        assert "BroadcastHashJoin" in plan, f"{key}:\n{plan}"
        assert plan.count("Exchange SinglePartition") <= 1, f"{key}:\n{plan}"
        # the corpus side is a checkpoint scan — no re-shuffle of the data
        assert "Exchange hashpartitioning(doc_id" not in plan, f"{key}:\n{plan}"


def test_daily_sink_readback_prunes_partitions(q):
    """a5b: the date-partitioned sink's read-back must prune directories at
    PLANNING time — the week filter appears as PartitionFilters on the
    scan, and no data filter needs pushing (the partition column never
    lives in the data files). This is the property that makes a 30-day
    window query on a 100 TB event lake scan 30 directories, not 10 000."""
    plan = full_explain(q("q_sink_partitioned_daily"))
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf, plan
    line = pf[0]
    assert "event_date" in line and ">=" in line and "<=" in line, line


def test_daily_sink_supports_dynamic_partition_pruning(spark, sf_dir):
    """a5b's DPP twin: when the week arrives through a JOINED dimension
    (the production shape — a date dim row-filtered at runtime) instead of
    a literal, Spark must insert a dynamicpruning subquery into the scan's
    PartitionFilters, so only the dim-selected directories are read. The
    result must equal the literal-filter spelling."""
    from pyspark.sql import functions as F

    from recommendersystems_bigdata_spark.catalog import load_table
    from recommendersystems_bigdata_spark.plans import full_explain
    from recommendersystems_bigdata_spark.tmpdirs import scratch_dir

    ev = load_table(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
    base = scratch_dir("plan_dpp")
    ev.repartition("event_date").write.mode("overwrite").partitionBy(
        "event_date"
    ).parquet(f"{base}/ed")
    back = spark.read.parquet(f"{base}/ed")

    dim = spark.createDataFrame(
        [(f"2024-01-{d:02d}", "wk2" if d < 15 else "wk3") for d in range(8, 22)],
        "d STRING, wk STRING",
    ).select(F.to_date("d").alias("event_date"), "wk")
    joined = (
        back.join(F.broadcast(dim.filter(F.col("wk") == "wk2")), "event_date")
        .groupBy("event_date")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = full_explain(joined)
    assert "dynamicpruning" in plan, plan

    via_dpp = {(str(r["event_date"]), r["n"]) for r in joined.collect()}
    via_literal = {
        (str(r["event_date"]), r["n"])
        for r in back.filter(
            F.col("event_date").between(F.lit("2024-01-08"), F.lit("2024-01-14"))
        )
        .groupBy("event_date")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert via_dpp == via_literal and via_dpp


def test_star_round_plan_is_two_windows_no_join(spark):
    """n3/l15 kernel (round-7 lowering): one contraction round must plan
    as exactly the two whole-partition window-min exchanges plus the
    output-distinct exchange — and NO join operator. A regression back to
    the groupBy+join spelling doubles the per-round shuffles of the edge
    set, which at 100 TB is the round's entire cost."""
    from recommendersystems_bigdata_spark.ml.graph import star_round

    e = spark.createDataFrame(
        [(2, 1), (3, 2), (5, 4)], "big INT, small INT"
    )
    plan = physical_plan(star_round(e))
    assert plan.count("Window") == 2, plan
    for join_op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                    "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert join_op not in plan, plan
    # 2 window exchanges + 1 distinct exchange (+ the distinct's partial agg)
    assert plan.count("Exchange hashpartitioning") <= 3, plan


def test_bottomk_sample_lowered_to_take_ordered(q):
    """b9: the deterministic bottom-k sample must plan as
    TakeOrderedAndProject — per-partition top-k + driver merge, NO global
    sort and NO shuffle. A regression to a full Sort would make the
    sample cost a corpus-wide exchange at 100 TB."""
    plan = physical_plan(q("q_sample_bottomk"))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange" not in plan, plan


def test_hash_split_census_is_one_exchange(q):
    """b10: the split census is map-side hash+CASE plus one 3-key
    partial→final aggregate — exactly one shuffle."""
    plan = physical_plan(q("q_sample_hash_split"))
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_privacy_audits_partial_aggregate(q):
    """o1/o2: the release-gate audits must partial-aggregate map-side so
    shuffle volume is class-count-bound, not row-count-bound."""
    for key in ("q_kanonymity_audit", "q_ldiversity_audit"):
        plan = physical_plan(q(key))
        assert "HashAggregate" in plan, plan
        for join_op in ("SortMergeJoin", "CartesianProduct",
                        "BroadcastNestedLoopJoin"):
            assert join_op not in plan, plan


def test_bfs_round_avoids_nested_loop(spark):
    """n4: every BFS round is equi-join + anti-join on node id — no
    nested-loop/cartesian operator may appear in a frontier expansion."""
    from recommendersystems_bigdata_spark.ml.graph import bfs_hops

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "pa INT, pb INT"
    )
    seeds = spark.createDataFrame([(1,)], "part INT")
    df = bfs_hops(edges, seeds, max_hops=2)
    plan = physical_plan(df)
    for join_op in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert join_op not in plan, plan
    got = {(r["part"], r["hops"]) for r in df.collect()}
    assert got == {(1, 0), (2, 1), (3, 2)}, got


def test_xml_roundtrip_reads_with_explicit_schema(q):
    """a15: the XML read-back must use the user-supplied schema — the scan
    node carries exactly the four declared typed columns (an inference
    pass would both double the 100 TB scan and type `cents` per-file).
    The write leg runs inside the query; the assertion reads the final
    plan's FileScan xml line."""
    df = q("q_io_xml_roundtrip")
    plan = full_explain(df)
    assert "FileScan xml" in plan, plan
    scan_lines = [ln for ln in plan.splitlines() if "FileScan xml" in ln]
    assert any("cents" in ln and "bigint" in ln for ln in scan_lines), plan


def test_snapshot_diff_is_single_full_outer_merge_join(q):
    """a16: the CDC diff must stay ONE full-outer sort-merge join on the
    primary key — a plan that degrades to a nested-loop (non-equi
    condition) or duplicates the join would not survive two 100 TB
    snapshots."""
    plan = physical_plan(q("q_snapshot_diff"))
    assert plan.count("SortMergeJoin") == 1, plan
    assert "FullOuter" in plan, plan
    for join_op in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert join_op not in plan, plan


def test_variant_extract_is_map_side_single_exchange(q):
    """a17: parse_json + typed variant_get + partial agg must plan as one
    map-side pipeline with exactly one shuffle (the ≤40-key final agg)."""
    plan = physical_plan(q("q_variant_extract"))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "variant_get" in plan.lower(), plan


def test_merge_into_is_single_key_equi_join(q):
    """a18: the MERGE apply is one full-outer equi join on the primary
    key — no nested-loop operator, and exactly one join of any kind."""
    plan = physical_plan(q("q_merge_into"))
    assert "FullOuter" in plan, plan
    for join_op in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert join_op not in plan, plan


def test_incremental_agg_is_join_free_partial_final(q):
    """a19: state build + merge is groupBy-only — partial→final aggregates
    on both legs and NO join anywhere (the merge is a union + groupBy)."""
    plan = physical_plan(q("q_incremental_agg"))
    assert "HashAggregate" in plan, plan
    for join_op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                    "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert join_op not in plan, plan


def test_new_privacy_audits_avoid_row_joins(q):
    """o3: the recursive (c,l) audit is groupBy + bounded window + groupBy,
    join-free; o4's only non-equi operator is the documented 1-row
    broadcast total (global band distribution + corpus size)."""
    plan3 = physical_plan(q("q_cl_diversity_audit"))
    for join_op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                    "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert join_op not in plan3, plan3
    assert "Window" in plan3, plan3
    plan4 = physical_plan(q("q_tcloseness_audit"))
    assert "SortMergeJoin" not in plan4, plan4
    assert "CartesianProduct" not in plan4, plan4


def test_common_neighbors_wedge_join_is_equi(q):
    """n5: the wedge self-join keys on the shared middle node (equi) with
    the dst ordering as a residual condition — never a nested loop; the
    unlinked restriction stays a LEFT ANTI equi join."""
    plan = physical_plan(q("q_graph_common_neighbors"))
    for join_op in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert join_op not in plan, plan
    assert "LeftAnti" in plan, plan


def test_kcore_rounds_are_semi_joins(q):
    """n6: every peel round is a degree groupBy + two node-id LEFT SEMI
    joins — no nested-loop operator, no full outer anywhere."""
    plan = physical_plan(q("q_graph_kcore"))
    for join_op in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert join_op not in plan, plan


def test_generalization_audit_is_one_expand_pass(q):
    """o5: the lattice sweep must be ONE grouping-sets aggregation (a
    single Expand feeding partial/final aggregates) over a broadcast
    nation dim — never one scan per level and never a shuffled dim
    join."""
    plan = physical_plan(q("q_qi_generalization_audit"))
    assert plan.count("Expand") == 1, plan
    assert "BroadcastHashJoin" in plan, plan
    for join_op in ("SortMergeJoin", "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert join_op not in plan, plan


def test_fuzzy_join_is_blocked_not_nested(q):
    """p1: candidates must come from the deletion-key equi-join — a
    BroadcastNestedLoopJoin here IS the brute-force distance matrix the
    operator exists to avoid."""
    plan = physical_plan(q("q_fuzzy_join_symspell"))
    for join_op in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert join_op not in plan, plan


def test_containment_uses_posting_list_join(q):
    """p2: the lang-blocked posting-list self-join — never a cartesian
    pair enumeration."""
    plan = physical_plan(q("q_dedup_containment"))
    for join_op in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert join_op not in plan, plan


def test_tpch_q6_is_pushed_scan_single_agg(q):
    """c19: Q6 is the pure scan probe — the date/quantity predicates must
    reach the parquet scan and the only exchange is the partial→final
    aggregate's 1-row-per-task merge. A join or extra shuffle here means
    the scan path regressed."""
    plan = full_explain(q("q_tpch_q6_forecast"))
    assert "PushedFilters: [" in plan and "PushedFilters: []" not in plan
    phys = physical_plan(q("q_tpch_q6_forecast"))
    assert "Join" not in phys, phys
    assert phys.count("HashAggregate") >= 2, phys


def test_tpch_q14_fact_never_shuffles_before_agg(q):
    """c24: part broadcasts whole (the per-partkey type lookup), so the
    lineitem fact's ONLY exchange is the year-keyed aggregate merge — no
    sort-merge join, no nested loop."""
    phys = physical_plan(q("q_tpch_q14_promo_share"))
    assert "BroadcastHashJoin" in phys, phys
    for bad in ("SortMergeJoin", "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in phys, phys


def test_tpch_q15_has_no_global_sort_or_window(q):
    """c25: the ties-at-max filter must be the broadcast 1-row max join —
    never a global Sort + Window over a single partition (the classic
    accidental scale-killer for "equal to max" queries)."""
    phys = physical_plan(q("q_tpch_q15_top_supplier"))
    assert "Window" not in phys, phys
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in phys, phys


def test_tpch_q17_correlated_avg_is_broadcast_joins(q):
    """c26: the per-part average joins back as a broadcast hash join on
    the part key (both joins), and the integer cross-multiplied compare
    keeps everything join-key equi — no nested loop anywhere."""
    phys = physical_plan(q("q_tpch_q17_small_qty"))
    assert phys.count("BroadcastHashJoin") >= 2, phys
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in phys, phys


def test_rollup_multires_is_expand_plus_one_exchange(q):
    """§2.Q q1: all three rollup resolutions must come out of ONE
    grouping-sets pass — an Expand feeding a partial aggregate before a
    single exchange. A regression to three scans (or an un-partial'd
    Expand shuffling 3x the corpus) triples the 100 TB refresh cost."""
    phys = physical_plan(q("q_rollup_multires"))
    assert "Expand" in phys, phys
    assert phys.count("Exchange hashpartitioning") == 1, phys
    assert phys.count("HashAggregate") >= 2, phys  # partial -> final


def test_ewma_lags_share_one_window_sort(q):
    """§2.Q q2: the three lags must share one window (one exchange, one
    sort) — per-lag windows would re-sort the stream three times."""
    phys = physical_plan(q("q_ewma_binary_decay"))
    assert phys.count("Exchange hashpartitioning") == 1, phys
    assert phys.count("Window") == 1, phys


def test_time_weighted_avg_reuses_user_partitioning(q):
    """§2.Q q4: the lead() window and the per-user aggregate hash on the
    same key, so the whole step-integral is ONE exchange with the
    aggregate split partial->final after the window."""
    phys = physical_plan(q("q_time_weighted_avg"))
    assert phys.count("Exchange hashpartitioning") == 1, phys
    assert phys.count("HashAggregate") >= 2, phys


def test_downsample_m4_is_one_exchange(q):
    """§2.Q q5: both row_number directions and the final (user, bucket)
    aggregate share one hash partitioning — the bucket is materialized
    before the windows precisely so Catalyst can unify the three
    (partitioning over the raw date_trunc expression measured as a
    second full exchange of the corpus)."""
    phys = physical_plan(q("q_downsample_m4"))
    assert phys.count("Exchange hashpartitioning") == 1, phys
    assert phys.count("Window") == 2, phys
    for bad in ("SortMergeJoin", "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in phys, phys


def test_tpch_q2_window_min_single_fact_scan(q):
    """c27: the per-part regional min must be a window over the reduced
    (part, supplier) pair frame — the aggregate + join-back spelling made
    Catalyst duplicate the whole lineitem subtree (two fact scans, five
    exchanges) because the min-equality filter got pulled back into a
    two-key join. Pins: one fact scan, two hash exchanges, one window,
    no sort-merge join."""
    phys = physical_plan(q("q_tpch_q2_min_cost_supplier"))
    assert phys.count("lineitem.parquet") == 1, phys
    assert phys.count("Exchange hashpartitioning") == 2, phys
    assert phys.count("Window") == 1, phys
    assert "SortMergeJoin" not in phys, phys


def test_tpch_q4_exists_lowers_to_semi_join(q):
    """c28: the correlated EXISTS (equi key + cross-table date predicate)
    must lower to a LEFT SEMI join — each order emits at most once, no
    count-then-dedup, no nested loop — and the quarter filter must reach
    the orders scan."""
    phys = physical_plan(q("q_tpch_q4_order_priority"))
    assert "LeftSemi" in phys, phys
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in phys, phys
    plan = full_explain(q("q_tpch_q4_order_priority"))
    assert "PushedFilters: [" in plan and "o_orderdate" in plan, plan


def test_tpch_q12_lateness_inside_orderkey_join(q):
    """c30: the fact⋈fact join stays keyed on l_orderkey with the
    cross-table lateness predicate as the join residual — no nested loop
    — and the shipdate-year range reaches the lineitem scan."""
    phys = physical_plan(q("q_tpch_q12_late_priority"))
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in phys, phys
    plan = full_explain(q("q_tpch_q12_late_priority"))
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400], plan


def test_tpch_q16_blacklist_is_broadcast_anti(q):
    """c31: the NOT IN blacklist must lower to a broadcast anti-join
    (key non-null by schema, so the null-poisoning rewrite is not
    needed); the class dim broadcasts with its three predicates."""
    phys = physical_plan(q("q_tpch_q16_supplier_cnt"))
    assert "LeftAnti" in phys and "Broadcast" in phys, phys
    for bad in ("SortMergeJoin", "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in phys, phys


def test_tpch_q19_disjunction_pushes_both_sides(q):
    """c32: the OR-of-conjunctions must keep the p_partkey equi-join
    (broadcast, no nested loop) while each side's residual union pushes
    to its scan — the quantity-range union onto lineitem, the
    brand/size union onto part."""
    phys = physical_plan(q("q_tpch_q19_disjunctive_rev"))
    assert "BroadcastHashJoin" in phys, phys
    for bad in ("SortMergeJoin", "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in phys, phys
    plan = full_explain(q("q_tpch_q19_disjunctive_rev"))
    assert "l_quantity" in plan and "p_brand" in plan, plan


def test_tpch_q20_threshold_join_on_reduced_pairs(q):
    """c33: the correlated-aggregate threshold is a per-part window over
    the reduced (part, supplier) pair frame — an aggregate + join-back
    duplicates the fact scan (the c27 lesson). Pins: one fact scan, one
    window, no nested loop."""
    phys = physical_plan(q("q_tpch_q20_concentrated_suppliers"))
    assert phys.count("lineitem.parquet") == 1, phys
    assert phys.count("Window") == 1, phys
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in phys, phys


def test_tpch_q21_no_fact_self_join(q):
    """c34: the EXISTS + NOT EXISTS pair must NOT become self-joins of
    the fact — the lowering is one (order, supplier) aggregate plus one
    per-order window over the reduced pair frame. Pins: a single
    lineitem scan, a window that consumes an aggregate (not raw lines),
    and no nested loop."""
    phys = physical_plan(q("q_tpch_q21_sole_late_supplier"))
    assert phys.count("lineitem.parquet") == 1, phys
    assert "Window" in phys and "HashAggregate" in phys, phys
    assert phys.index("Window") < phys.rindex("HashAggregate"), phys
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in phys, phys


def test_tpch_q22_not_exists_is_anti_join(q):
    """c35: the NOT EXISTS lowers to an anti-join against the date-pruned
    orders; the scalar threshold is the adjudicated 1-row broadcast (the
    only nested loop allowed); the order-date cutoff reaches the scan."""
    phys = physical_plan(q("q_tpch_q22_idle_customers"))
    assert "LeftAnti" in phys, phys
    plan = full_explain(q("q_tpch_q22_idle_customers"))
    assert "o_orderdate" in plan.split("PushedFilters")[1][:600] or \
        "o_orderdate" in plan, plan


def test_incr_retract_merge_is_exchange_free(q):
    """§2.R i1: the retraction merge is two co-partitioned branch
    aggregates (snapshot + negated delete batch) whose merge aggregate
    sits directly on the Union with NO third hash exchange, and no join
    anywhere — what keeps delete-maintenance O(touched groups)."""
    phys = physical_plan(q("q_incr_retract_orders"))
    assert phys.count("Exchange hashpartitioning") == 2, phys
    assert "Union" in phys and "Join" not in phys, phys


def test_counter_reset_shares_one_user_exchange(q):
    """§2.Q q6: the cumulative-sum window, the lag window and the final
    per-user aggregate all hash on user_id — one exchange for the whole
    reset-accounting pipeline, O(1) state per row."""
    phys = physical_plan(q("q_counter_reset_increase"))
    assert phys.count("Exchange hashpartitioning") == 1, phys
    for bad in ("SortMergeJoin", "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in phys, phys


def test_gapfill_grid_is_bounded_and_joined_on_key(q):
    """§2.Q q7: the day grid comes from a per-user sequence explode
    (bounded by the user's span, never a cartesian calendar), the
    grid⋈daily join stays equi on (user, day), and both carry windows
    run on the user partitioning — no nested loop anywhere."""
    phys = physical_plan(q("q_gapfill_interpolate"))
    assert "Generate explode" in phys or "Generate" in phys, phys
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in phys, phys


def test_ppjoin_candidates_from_prefix_only(q):
    """p3: candidate pairs must come from the PREFIX posting lists (the
    frequency-ranked Window feeds the self-join), the verify join stays
    candidate-bounded equi, and nothing lowers to a nested loop."""
    phys = physical_plan(q("q_ppjoin_jaccard"))
    assert "Window" in phys, phys
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in phys, phys


def test_attribution_join_keeps_user_equi_conjunct(q):
    """§2.S: the conversion⋈touch lookback join must hash-partition on
    the user_id equi conjunct with the time range as residual (the c8
    rule) — never a nested loop — and the per-conversion rankings run
    over the paired frame, not raw events."""
    for key in ("q_attribution_multitouch", "q_attribution_lag",
                "q_attribution_time_decay"):
        phys = physical_plan(q(key))
        for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
            assert bad not in phys, f"{key}:\n{phys}"
        assert "Window" in phys, f"{key}:\n{phys}"


def test_trend_slope_single_exchange(q):
    """§2.Q q8: the min-day window and the sufficient-statistics
    aggregate share the user_id partitioning — one exchange for the
    whole regression, stats partial-aggregated map-side."""
    phys = physical_plan(q("q_trend_slope"))
    assert phys.count("Exchange hashpartitioning") == 1, phys
    assert phys.count("HashAggregate") >= 2, phys
    for bad in ("SortMergeJoin", "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in phys, phys


def test_expect_ranges_single_pruned_scan(q):
    """§2.T t1: the five range rules ride ONE scan — conditional partial
    sums into a partial→final global aggregate, the rule pivot is a
    Generate (stack) over the 1-row frame, and the scan reads only the
    five audited columns (no keys, no flags)."""
    plan = full_explain(q("q_expect_ranges"))
    phys = physical_plan(q("q_expect_ranges"))
    assert phys.count("HashAggregate") >= 2, phys
    assert "Generate" in phys, phys
    for bad in ("SortMergeJoin", "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in phys, phys
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema, plan
    assert "l_partkey" not in read_schema[0]
    assert "l_returnflag" not in read_schema[0]


def test_range_frame_single_hash_exchange(q):
    """§2.U u1: the 30-day rolling sum needs exactly one hash-partition
    exchange (on o_custkey) and a RANGE-frame window — same-day rows
    share a frame by value, not by row position."""
    phys = physical_plan(q("q_win_range_frame"))
    assert phys.count("Exchange hashpartitioning") == 1, phys
    assert "Window" in phys, phys
    # the frame is value-based: Spark prints a RangeFrame specification
    assert "RangeFrame" in phys, phys
    for bad in ("SortMergeJoin", "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in phys, phys


def test_kmv_bottom_k_lowers_to_take_ordered(q):
    """§2.U u5: the k smallest hashes must lower to
    TakeOrderedAndProject (mergeable per-shard bottom-k — the b9
    pattern), never a global Sort."""
    phys = physical_plan(q("q_distinct_kmv"))
    assert "TakeOrderedAndProject" in phys, phys


def test_point_in_interval_join_is_equi_bucketed(q):
    """§2.U u7: the interval join must be an EQUI hash/sort-merge join on
    (user, bucket) with the range as residual — the bucket explode is a
    Generate — never the nested-loop a naive BETWEEN theta join
    produces (the c8 rule)."""
    phys = physical_plan(q("q_join_point_in_interval"))
    assert "Generate" in phys, phys
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in phys, phys


def test_pattern_funnel_filter_pushed_before_shuffle(q):
    """§2.U u4: the funnel-type filter must reach the parquet scan
    (PushedFilters carries event_type), so the user-window shuffle moves
    only funnel events; one hash exchange powers both lead() columns."""
    plan = full_explain(q("q_pattern_funnel_strict"))
    phys = physical_plan(q("q_pattern_funnel_strict"))
    assert "event_type" in "".join(
        ln for ln in plan.splitlines() if "PushedFilters" in ln
    ), plan
    assert phys.count("Exchange hashpartitioning") <= 2, phys  # window + distinct agg
    assert "Window" in phys, phys


def test_weighted_median_windows_distinct_values_only(q):
    """§2.U u2: the cumulative-weight window runs AFTER the (flag, cents)
    pre-aggregate — partial→final HashAggregate below the Window — so
    the sort covers distinct prices, not raw rows, and no join exists."""
    phys = physical_plan(q("q_weighted_median"))
    assert phys.count("HashAggregate") >= 2, phys
    assert "Window" in phys, phys
    for bad in ("SortMergeJoin", "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in phys, phys


def test_bitmap_distinct_no_expand(q):
    """§2.U u9: the bitmap roll-up must NOT plan the Expand node a naive
    multi-distinct aggregate produces — two mergeable partial→final
    HashAggregates (or Sort+ObjectHashAggregate for the binary state),
    no raw-id re-shuffle beyond the (type, bucket) grouping."""
    phys = physical_plan(q("q_bitmap_distinct"))
    assert "Expand" not in phys, phys
    for bad in ("SortMergeJoin", "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in phys, phys


def test_topk_movers_lowers_to_take_ordered(q):
    """§2.U u10: the global top-10 by absolute swing must lower to
    TakeOrderedAndProject (per-partition top-10 merge), never a global
    Sort of every (part, week) delta."""
    phys = physical_plan(q("q_topk_movers"))
    assert "TakeOrderedAndProject" in phys, phys
    assert "Window" in phys, phys


def test_percentile_cont_single_rank_sort(q):
    """§2.U u8: the CDF lowering — the fact collapses to distinct
    (flag, cents) values through a partial→final HashAggregate BELOW the
    one cumulative window, and the |flags|·3 position frame resolves via
    ONE broadcast hash join; exactly one Window (never the double-sorted
    row_number-per-join-side shape this replaced), no nested loop."""
    phys = physical_plan(q("q_percentile_cont_exact"))
    assert phys.count("Window") == 1, phys
    assert phys.count("HashAggregate") >= 2, phys
    assert "BroadcastHashJoin" in phys, phys
    for bad in ("CartesianProduct",):
        assert bad not in phys, phys


def test_seq_purchase_context_take_ordered(q):
    """§2.V v2: the anchored-context top-10 must lower to
    TakeOrderedAndProject over the bounded context census — one user_id
    window exchange plus the census aggregate, never a global Sort."""
    phys = physical_plan(q("q_seq_purchase_context"))
    assert "TakeOrderedAndProject" in phys, phys
    assert "Window" in phys, phys
    for bad in ("SortMergeJoin", "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in phys, phys


def test_seq_signature_single_user_exchange(q):
    """§2.V v1: the per-user signature aggregation is ONE user_id
    exchange — the collect_list state and the count/distinct aggregates
    ride the same shuffle, and no join appears anywhere."""
    phys = physical_plan(q("q_seq_user_signature"))
    assert phys.count("Exchange hashpartitioning") <= 2, phys
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert bad not in phys, phys


def test_feat_history_pit_window_no_join(q):
    """§2.W w5: the point-in-time feature table must be a single
    per-customer Window (cumulative frame + lag share one sort), with NO
    join — the whole point of the window spelling is replacing the
    correlated fact×fact subquery."""
    phys = physical_plan(q("q_feat_history_pit"))
    assert "Window" in phys, phys
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in phys, phys


def test_feat_target_encode_broadcasts_codebook(q):
    """§2.W w1: the LOO join-back must broadcast the |categories|-row
    stats table onto the fact — a shuffled fact-side join here would be
    a 100 TB regression."""
    phys = physical_plan(q("q_feat_target_encode_loo"))
    assert "BroadcastHashJoin" in phys, phys
    assert "SortMergeJoin" not in phys, phys


def test_search_boolean_and_phrase_zero_shuffle_scan(q):
    """§2.X x2/x3: boolean retrieval and positional phrase search must be
    zero-shuffle scans — per-doc term frequencies / adjacent-pair counts
    are array HOFs evaluated map-side; the only allowed exchange is the
    final ordering of the selectivity-bounded hit set (rangepartitioning),
    never a hash shuffle, join, or token explode."""
    for key in ("q_search_boolean", "q_search_phrase"):
        phys = physical_plan(q(key))
        assert "Exchange hashpartitioning" not in phys, phys
        assert "Generate" not in phys, phys  # no explode: HOFs only
        for bad in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                    "CartesianProduct", "BroadcastNestedLoopJoin"):
            assert bad not in phys, phys


def test_search_topk_filters_terms_before_shuffle(q):
    """§2.X x4: the query-term filter must run BEFORE the (doc, term)
    partial aggregate — the exchanged relation is bounded by hits for the
    query's terms, not corpus tokens. The filter therefore sits under the
    first Exchange in the plan tree (on the Generate side)."""
    phys = physical_plan(q("q_search_topk_per_term"))
    first_exchange = phys.index("Exchange hashpartitioning")
    gen = phys.index("Generate")
    deepest_filter = phys.rindex("Filter")
    assert gen > first_exchange and deepest_filter > first_exchange, phys


def test_search_bm25_broadcasts_stats_no_fact_join(q):
    """§2.X x5: corpus stats broadcast back onto the hit-bounded tf
    relation as the adjudicated 1-row cross join, df is a WINDOW COUNT
    over the same hit-bounded tf rows (round 11 — the former
    groupBy+broadcast-join df leg recomputed the whole
    scan→tokenize→explode subtree, a third parquet scan in the plan),
    document length rides the partial agg as a group key, and the
    final cut lowers to TakeOrderedAndProject. No sort-merge join, and
    exactly TWO scans of documents (tf + corpus stats) — a third scan
    means the df leg regressed to re-aggregation."""
    phys = physical_plan(q("q_search_bm25ish"))
    assert "SortMergeJoin" not in phys, phys
    assert "TakeOrderedAndProject" in phys, phys
    assert "Window" in phys, phys
    assert phys.count("Scan parquet") == 2, phys


def test_recursive_closure_partial_aggregates_no_nested_loop(q):
    """§2.Z z1/z2: the recursive closure must execute as a UnionLoop whose
    per-level rollup partial-aggregates before the exchange, with no
    nested-loop/cartesian operator anywhere — each iteration is an
    equi-join of the child relation against the frontier on the parent
    key, and the closure collapses map-side."""
    for key in ("q_rec_hierarchy_levels", "q_rec_subtree_rollup"):
        phys = physical_plan(q(key))
        assert "UnionLoop" in phys, phys
        assert "partial_" in phys, phys  # map-side combine on the closure
        for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
            assert bad not in phys, phys


def test_recursive_path_anchor_outside_loop(q):
    """§2.Z z3: the top-20 anchor must be materialized BEFORE the
    recursion (TakeOrdered + 20-row localCheckpoint), so the UnionLoop
    contains NO table scan — a plain ORDER BY ... LIMIT anchor inside the
    loop plans as a corpus-wide global Sort in Spark 4.1, the exact plan
    this pin refuses at 100 TB."""
    phys = physical_plan(q("q_rec_path_to_root"))
    assert "UnionLoop" in phys, phys
    assert "parquet" not in phys, phys  # no fact scan inside the recursion
    assert "Sort [c_acctbal" not in phys, phys  # no global sort smuggled back


def test_tsdiag_single_fact_pass(q):
    """§2.AA aa1/aa2/aa4: the fact table is collapsed ONCE into the
    checkpointed calendar-bounded series (Catalyst does not reuse common
    subplans — without the checkpoint aa1 planned SIX orders scans), so
    the final plan must contain NO parquet scan and NO fact-sized hash
    exchange at all: every operator downstream runs on the |months| /
    |ship days| LocalTableScan, broadcast or single-partition."""
    for key in ("q_ts_autocorr", "q_ts_cusum_changepoint", "q_ts_drawdown"):
        phys = physical_plan(q(key))
        assert "parquet" not in phys, (key, phys)
        # aa1 keeps ONE hash exchange: the 6-key final aggregate of the
        # |months|x6 pair join — series-sized, not fact-sized
        allowed = 1 if key == "q_ts_autocorr" else 0
        assert phys.count("Exchange hashpartitioning") <= allowed, (key, phys)
        assert "SortMergeJoin" not in phys, (key, phys)


def test_tsdiag_drawdown_topk_lowered(q):
    """§2.AA aa4: the global answer must lower to TakeOrderedAndProject
    (limit=1) over the checkpointed |ship days| series, never a global
    sort."""
    phys = physical_plan(q("q_ts_drawdown"))
    assert "TakeOrderedAndProject" in phys, phys


def test_month_spine_folded_no_unionloop(q):
    """§2.Z z4 (round 12): the month spine is a strict arithmetic
    progression from a 1-row seed, so it must fold into ONE
    `explode(sequence(lo, hi, ...))` over the checkpointed bounds —
    NO UnionLoop (the old spelling paid one Spark job per calendar
    month, ~80 pure-overhead driver round-trips), and the bounds stay
    materialized before the plan (no orders scan under the generate).
    The only allowed parquet scan is the per_month aggregate branch."""
    phys = physical_plan(q("q_rec_month_spine"))
    assert "UnionLoop" not in phys, phys
    assert "Generate explode(sequence(" in phys, phys
    assert phys.count("Scan parquet") == 1, phys  # per_month only


def test_lifecycle_bounded_after_checkpoint(q):
    """§2.AB ab1/ab2/ab3: after the fact collapses into the checkpointed
    bounded relation (cohort cells / tenure histogram / 9 digits), the
    final plan must contain no parquet scan and no sort-merge join; ab1
    keeps one series-sized hash exchange (the per-cohort running-sum
    window), ab2/ab3 none."""
    for key, allowed in (
        ("q_ltv_cohort_curve", 1),
        ("q_churn_hazard", 0),
        ("q_benford_audit", 0),
    ):
        phys = physical_plan(q(key))
        assert "parquet" not in phys, (key, phys)
        assert phys.count("Exchange hashpartitioning") <= allowed, (key, phys)
        assert "SortMergeJoin" not in phys, (key, phys)


def test_lifecycle_cohort_is_window_not_selfjoin(q):
    """§2.AB ab5: the cohort month must come from a window min over the
    customer partition — ONE custkey exchange plus the month groupBy
    exchange, one fact scan, and no join of the fact against its own
    aggregate (the groupBy-then-join-back spelling costs a second
    scan)."""
    phys = physical_plan(q("q_new_vs_returning"))
    assert phys.count("FileScan") == 1, phys
    assert phys.count("Exchange hashpartitioning") == 2, phys
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert bad not in phys, phys


def test_next_part_transitions_single_orders_scan(q):
    """§2.AC ac4: consecutive order pairs must come from one lead()
    window, not a sequence self-join — exactly one orders scan; the two
    lineitem scans are the genuine part fan-out join's two sides."""
    phys = physical_plan(q("q_rec_next_part_transitions"))
    assert phys.count("orders.parquet") == 1, phys
    assert phys.count("lineitem.parquet") == 2, phys
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in phys, phys


def test_integrity_audits_single_shuffle(q):
    """§2.AD: each audit pays exactly the one shuffle its question
    requires — ad1 the priority-ending groupBy plus a bounded-relation
    share window, ad2 the composite-key groupBy alone, ad3 nothing but
    the (pre-checkpoint) two-pass rank, with the lag window and TopK
    running on the checkpointed |runs| relation."""
    for key, max_hash in (
        ("q_audit_round_amounts", 2),
        ("q_audit_duplicate_candidates", 1),
        ("q_audit_keyspace_gaps", 0),
    ):
        phys = physical_plan(q(key))
        assert phys.count("Exchange hashpartitioning") <= max_hash, (key, phys)
        for bad in ("SortMergeJoin", "CartesianProduct", "BroadcastNestedLoopJoin"):
            assert bad not in phys, (key, phys)
    assert "TakeOrderedAndProject" in physical_plan(q("q_audit_keyspace_gaps"))


def test_inventory_windows_share_part_partitioning(q):
    """§2.AE ae1: the running-balance window and the per-part summary
    groupBy hash-partition on the SAME key, so the whole query pays ONE
    hash exchange — and no spelling of it joins anything."""
    phys = physical_plan(q("q_inv_running_balance"))
    assert phys.count("Exchange hashpartitioning") <= 1, phys
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "BroadcastNestedLoopJoin",
                "CartesianProduct"):
        assert bad not in phys, phys


def test_fifo_allocation_is_equi_join(q):
    """§2.AE ae2: the FIFO interval-overlap match must lower to an
    EQUI-join on the part key (broadcast at test scale, sort-merge at
    100 TB) with the overlap predicate as a residual — never a nested
    loop or cartesian over the interval sets."""
    phys = physical_plan(q("q_inv_fifo_allocation"))
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in phys, phys
    assert any(j in phys for j in
               ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")), phys


def test_geo_pairs_candidates_from_cell_equi_join(q):
    """§2.AF af2: within-radius pairs must come from the 3×3 stencil's
    cell-id EQUI-join (two Generate fan-outs feed it), with the exact
    distance as a residual and the global top-20 lowered to
    TakeOrderedAndProject — the all-pairs spelling (nested loop /
    cartesian) must not appear anywhere."""
    phys = physical_plan(q("q_geo_nearest_pairs"))
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in phys, phys
    assert any(j in phys for j in
               ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")), phys
    assert phys.count("Generate") >= 1, phys
    assert "TakeOrderedAndProject" in phys, phys


def test_geo_hub_fanout_and_coverage_broadcast(q):
    """§2.AF af3/af5: the hub side is the SMALL dimension — af3's
    every-customer×every-hub fan-out is a deliberate broadcast nested
    loop over |hubs| rows (documented; never fact×fact), and af5's
    stencil join must be a broadcast EQUI-join on cell ids with no
    cartesian anywhere."""
    phys3 = physical_plan(q("q_geo_nearest_hub"))
    assert "BroadcastNestedLoopJoin" in phys3, phys3  # the |hubs| fan-out
    assert "CartesianProduct" not in phys3, phys3
    assert "SortMergeJoin" not in phys3, phys3
    # the argmin must be the partial-aggregable min(struct) — a Window
    # here means the fan-out shuffles before collapsing (the 10×-probe
    # regression this spelling replaced)
    assert "Window" not in phys3, phys3
    phys5 = physical_plan(q("q_geo_coverage"))
    assert "BroadcastHashJoin" in phys5, phys5
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in phys5, phys5


def test_pricing_censuses_single_shuffle_no_join(q):
    """§2.AI ai1/ai2/ai5: pure fact-census pricing cuts pay exactly the
    hash exchanges their groupBys require (partial→final) and join
    nothing. ai1 deliberately spells its distinct-price count as two
    explicit aggregation levels — the countDistinct spelling would add
    an Expand that doubles the map-side rows before the first exchange,
    so the plan must be Expand-free; its top-100 lowers to
    TakeOrderedAndProject."""
    for key, max_hash in (
        ("q_price_spread_audit", 2),  # (part, price) level, then part
        ("q_discount_band_impact", 1),
        ("q_tax_burden_profile", 1),
    ):
        phys = physical_plan(q(key))
        assert phys.count("Exchange hashpartitioning") <= max_hash, (key, phys)
        for bad in ("SortMergeJoin", "BroadcastHashJoin",
                    "BroadcastNestedLoopJoin", "CartesianProduct", "Expand"):
            assert bad not in phys, (key, phys)
        assert phys.count("HashAggregate") >= 2, (key, phys)
    assert "TakeOrderedAndProject" in physical_plan(q("q_price_spread_audit"))


def test_brand_cuts_broadcast_part_dim(q):
    """§2.AI ai3 / §2.AJ aj3: the part dimension is hint-broadcast, so
    the fact is never shuffled for the join — the only hash exchange is
    the |brands| groupBy; a SortMergeJoin here would shuffle the full
    fact on partkey at 100 TB."""
    for key in ("q_margin_by_brand", "q_return_rate_by_brand"):
        phys = physical_plan(q(key))
        assert "BroadcastHashJoin" in phys, (key, phys)
        for bad in ("SortMergeJoin", "BroadcastNestedLoopJoin",
                    "CartesianProduct"):
            assert bad not in phys, (key, phys)


def test_laspeyres_joins_bounded_relations_only(q):
    """§2.AI ai4: the fact is scanned ONCE into the checkpointed
    (part, year) relation — without the localCheckpoint pin Catalyst
    re-derived it on the base side, the 1-row min-year scalar and the
    index side (3 fact scans, the 10×-probe killer this spelling
    avoids). Everything downstream is equi-joins over that bounded
    relation: the base-year scalar broadcasts, no nested loop, no
    cartesian, and no lineitem scan survives in the final plan."""
    phys = physical_plan(q("q_price_index_laspeyres"))
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in phys, phys
    # one broadcast for the 1-row base-year scalar; the py⋈base leg may
    # be broadcast or shuffled (both sides are |parts|-bounded)
    assert "BroadcastHashJoin" in phys, phys
    # the fact feeds the checkpoint exactly once, upstream of this plan
    assert "lineitem" not in phys, phys


def test_fulfillment_order_shape_single_fact_pass(q):
    """§2.AJ aj1/aj2/aj4/aj5: the suite's design rule — collapse the
    fact to |orders| rows via ONE partial-aggregated orderkey shuffle
    first. aj2/aj5 join nothing; aj1/aj4 then equi-join the bounded
    per-order relation to orders (never a nested loop)."""
    for key in ("q_multi_supplier_orders", "q_linenumber_contiguity_audit"):
        phys = physical_plan(q(key))
        for bad in ("SortMergeJoin", "BroadcastHashJoin",
                    "BroadcastNestedLoopJoin", "CartesianProduct"):
            assert bad not in phys, (key, phys)
        assert phys.count("HashAggregate") >= 2, (key, phys)
    for key in ("q_order_fill_span", "q_order_value_waterfall"):
        phys = physical_plan(q(key))
        for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
            assert bad not in phys, (key, phys)
        assert any(j in phys for j in
                   ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")), (key, phys)
        assert phys.count("HashAggregate") >= 2, (key, phys)
    # aj1's distinct-ship-day count is the explicit two-level spelling —
    # the countDistinct Expand doubled the fact and probed 10.7× at 10×
    assert "Expand" not in physical_plan(q("q_order_fill_span"))


def test_nullsafe_join_is_broadcast_equi(q):
    """§2.AK ak1: <=> must reach Catalyst as an EQUI-join key
    (EqualNullSafe) — a BroadcastHashJoin over the hinted 25-row dim,
    never the nested-loop fallback a non-equi null-handling spelling
    would produce."""
    phys = physical_plan(q("q_nullsafe_dim_match"))
    assert "BroadcastHashJoin" in phys, phys
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct",
                "SortMergeJoin"):
        assert bad not in phys, phys


def test_lateral_tokens_generate_prunes_and_caps(q):
    """§2.AK ak2: the LATERAL VIEW lowers to a Generate over a
    single-column pruned scan (only `text` read), and the rank window
    runs over the bounded (pos, token) census AFTER partial/final
    aggregation — the fact-side plan has no join at all."""
    plan = full_explain(q("q_lateral_token_positions"))
    assert "Generate" in plan, plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "text" in read_schema[0], plan
    for unread in ("doc_id", "lang", "source", "n_chars"):
        assert unread not in read_schema[0], plan
    phys = physical_plan(q("q_lateral_token_positions"))
    for bad in ("SortMergeJoin", "BroadcastHashJoin",
                "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in phys, phys
    assert phys.count("HashAggregate") >= 2, phys


def test_values_dim_broadcasts_localrelation(q):
    """§2.AK ak3: the inline VALUES dim is a LocalRelation that
    broadcasts; the only shuffle joins are the per-order collapse and
    the orders equi-join — no nested loop anywhere."""
    phys = physical_plan(q("q_values_sla_breach"))
    assert "BroadcastHashJoin" in phys, phys
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in phys, phys
    assert "LocalTableScan" in phys or "LocalRelation" in phys, phys


def test_sqlsurface_censuses_no_join_single_shuffle(q):
    """§2.AK ak4/ak5/ak6: the clamp audit, try_divide census and
    GROUP BY ALL census are one-groupBy fact passes — no join, the
    day-of-month filter pushed (ak4 reads a filtered scan), censuses
    partial→final."""
    for key in ("q_eom_clamp_audit", "q_try_divide_guards",
                "q_groupby_all_census"):
        phys = physical_plan(q(key))
        for bad in ("SortMergeJoin", "BroadcastHashJoin",
                    "BroadcastNestedLoopJoin", "CartesianProduct"):
            assert bad not in phys, (key, phys)
        assert phys.count("HashAggregate") >= 2, (key, phys)


def test_procurement_fact_pays_one_shuffle_dims_broadcast(q):
    """§2.AL al1/al3: the supplier dim is hint-broadcast onto the fact
    (never a fact shuffle for the join) and the share/rank windows run
    AFTER the (nation, supplier) partial agg — al3's three windows
    share one nation partitioning, so the bounded relation pays a
    single exchange+sort."""
    for key in ("q_supply_hhi_by_nation", "q_supplier_pareto_depth"):
        phys = physical_plan(q(key))
        assert "BroadcastHashJoin" in phys, (key, phys)
        for bad in ("SortMergeJoin", "BroadcastNestedLoopJoin",
                    "CartesianProduct"):
            assert bad not in phys, (key, phys)
        assert phys.count("HashAggregate") >= 2, (key, phys)
    # al3: one window sort partitioning (nk) — not one per window
    phys3 = physical_plan(q("q_supplier_pareto_depth"))
    assert phys3.count("Window") <= 2, phys3


def test_single_source_two_level_agg_expand_free(q):
    """§2.AL al2: the distinct-supplier count is the explicit two-level
    (part, supplier) → part aggregation — no Expand, no join beyond the
    broadcast 1-row total."""
    phys = physical_plan(q("q_single_source_exposure"))
    for bad in ("Expand", "SortMergeJoin", "CartesianProduct"):
        assert bad not in phys, phys
    assert phys.count("HashAggregate") >= 2, phys


def test_degree_profile_reuses_checkpointed_edges(q):
    """§2.AL al4: the distinct edge set is pinned with localCheckpoint —
    the final plan must NOT contain a lineitem scan (both degree sides
    read the checkpoint, the fact was scanned exactly once upstream)."""
    phys = physical_plan(q("q_supplier_part_degree"))
    assert "lineitem" not in phys, phys
    for bad in ("SortMergeJoin", "BroadcastHashJoin",
                "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in phys, phys


def test_acctbal_tiers_left_join_under_dim(q):
    """§2.AL al5: the per-supplier revenue rollup joins UNDER the dim
    via an equi-join (broadcast at test scale) — zero-revenue suppliers
    survive; no nested loop beyond the 1-row total broadcast."""
    phys = physical_plan(q("q_acctbal_risk_tiers"))
    for bad in ("CartesianProduct",):
        assert bad not in phys, phys
    assert any(j in phys for j in
               ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")), phys


def test_forecast_fact_pass_pinned_by_checkpoint(q):
    """§2.AM: the monthly segment×month aggregate is localCheckpoint-
    pinned; the final plan must NOT re-scan orders (the spine bounds and
    the actual-join both branch from the checkpoint), and the spine join
    stays an equi-join over the bounded relation — never a nested loop."""
    for key in ("q_fc_snaive_backtest", "q_fc_accuracy_summary"):
        phys = physical_plan(q(key))
        assert "orders" not in phys, (key, phys)
        for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
            assert bad not in phys, (key, phys)
    # am4's lag + two cumulative windows share ONE segment partitioning:
    # at most one exchange feeds the window stack
    phys4 = physical_plan(q("q_fc_tracking_signal"))
    assert phys4.count("Window") <= 3, phys4
    assert "orders" not in phys4, phys4


def test_bag_ops_are_count_rewrites_not_joins(q):
    """§2.AN an1/an2: Catalyst rewrites exceptAll/intersectAll to a
    +1/-1 count aggregate + Generate re-replication — the plan must
    carry NO join of any kind and exactly one aggregate pair."""
    for key in ("q_bag_except_all", "q_bag_intersect_all"):
        phys = physical_plan(q(key))
        for bad in ("SortMergeJoin", "BroadcastHashJoin",
                    "ShuffledHashJoin", "BroadcastNestedLoopJoin",
                    "CartesianProduct"):
            assert bad not in phys, (key, phys)
        assert "Generate" in phys, (key, phys)
        assert phys.count("HashAggregate") >= 2, (key, phys)
    # an3 is a pure map-side concat: no exchange at all
    phys3 = physical_plan(q("q_union_byname_missing"))
    assert "Exchange" not in phys3, phys3


def test_distinct_on_is_partial_min_struct_no_window(q):
    """§2.AN an4: DISTINCT ON lowers to a commutative min(struct(...))
    aggregation with a MAP-SIDE partial (partial_min before the
    exchange) — never a row_number window (a full per-key fact sort);
    the scan is pruned to the 4 needed columns."""
    phys = physical_plan(q("q_distinct_on_first_ship"))
    assert "Window" not in phys, phys
    assert "partial_min" in phys, phys
    read_schema = [ln for ln in phys.splitlines() if "ReadSchema" in ln]
    assert read_schema and "l_suppkey" not in read_schema[0], phys


def test_lexstats_jvm_side_topk_lowered(q):
    """§2.AO: n-gram/pair generation is JVM-side (Generate, never a
    Python UDF) and every global top-k lowers to TakeOrderedAndProject
    before any rank window."""
    for key in ("q_colloc_bigram_lift", "q_skipgram_cooccur",
                "q_text_zipf_ranktable"):
        phys = physical_plan(q(key))
        assert "BatchEvalPython" not in phys, (key, phys)
        assert "Generate" in phys, (key, phys)
        assert "TakeOrderedAndProject" in phys, (key, phys)


def test_robust_cdf_windows_after_single_census(q):
    """§2.AP: every robust statistic runs on the (segment, cents)
    distinct-value CDF — one partial-aggregated fact shuffle (customer
    dim broadcast), then ≤2 window nodes over the bounded census and a
    bounded rollup; no sort-merge join, no row-level rank window over
    the fact."""
    for key in ("q_trimmed_mean", "q_tail_dominance", "q_decile_means"):
        phys = physical_plan(q(key))
        assert "BroadcastHashJoin" in phys, (key, phys)
        for bad in ("SortMergeJoin", "CartesianProduct"):
            assert bad not in phys, (key, phys)
        assert phys.count("HashAggregate") >= 4, (key, phys)  # census + rollup, partial+final each
        assert phys.count("Window") <= 2, (key, phys)


def test_migration_ntile_distributed_not_global_window(q):
    """§2.AR: the era quintiles come from ranks.global_ntile — the plan
    must contain NO ntile window function, and the only SinglePartition
    exchanges are the two bounded per-partition offset tables + totals
    (≤2 per tiling)."""
    phys = physical_plan(q("q_tier_migration_matrix"))
    assert "ntile(" not in phys, phys
    assert phys.count("SinglePartition") <= 4, phys
    assert "CartesianProduct" not in phys, phys


def test_winsurface_single_window_partitioning(q):
    """§2.AQ: aq1/aq4/aq5 are one custkey exchange + sort with all frame
    aggregates sharing it (≤3 Window nodes, no join); aq3's GROUPS
    emulation joins the bounded (ck, day) census back via an equi-join,
    never a nested loop."""
    for key, max_win in (("q_win_nth_values", 3),
                         ("q_win_exclude_current", 1),
                         ("q_win_filter_clause", 2)):
        phys = physical_plan(q(key))
        assert phys.count("Window") <= max_win, (key, phys)
        for bad in ("SortMergeJoin", "BroadcastHashJoin",
                    "BroadcastNestedLoopJoin", "CartesianProduct"):
            assert bad not in phys, (key, phys)
    phys3 = physical_plan(q("q_win_groups_frame"))
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in phys3, phys3
    assert any(j in phys3 for j in
               ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")), phys3


def test_contingency_one_fact_join_conditional_census(q):
    """§2.AS: the outcome flag costs exactly one fact⋈fact equi-join
    (lineitem⋈orders) with the flag partial-aggregated map-side; the
    2×2 census is conditional aggregation — no Expand, no window, no
    second fact pass."""
    phys = physical_plan(q("q_contingency_2x2"))
    joins = (phys.count("SortMergeJoin") + phys.count("ShuffledHashJoin")
             + phys.count("BroadcastHashJoin"))
    assert joins <= 2, phys  # fact⋈fact + the dim left join
    for bad in ("Expand", "Window", "CartesianProduct",
                "BroadcastNestedLoopJoin"):
        assert bad not in phys, phys
    assert phys.count("HashAggregate") >= 4, phys  # flag + census, partial+final


def test_systematic_sample_rank_is_distributed(q):
    """§2.AT at1: the systematic rank comes from global_row_number —
    no ntile/global row_number window over the customer relation; the
    only SinglePartition is the bounded per-partition offsets table."""
    phys = physical_plan(q("q_sample_systematic"))
    assert phys.count("SinglePartition") <= 1, phys
    assert "BatchEvalPython" not in phys, phys


def test_coordinated_sample_filters_dim_mapside(q):
    """§2.AT at3: the 1/16 hash bucket filters the DIM side before the
    parent-key equi-join — the fact is never hashed; no nested loop."""
    phys = physical_plan(q("q_sample_coordinated"))
    assert "md5" in phys, phys
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in phys, phys


def test_proration_windows_share_orderkey_partitioning(q):
    """§2.AU au1: weight sum, remainder rank and leftover all ride ONE
    orderkey partitioning (≤3 Window nodes, no extra exchange between
    them) and the header joins on the same key — no iteration, no
    driver loop."""
    phys = physical_plan(q("q_prorate_largest_remainder"))
    assert phys.count("Window") <= 3, phys
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in phys, phys


def test_dhondt_explode_bounded_by_seats(q):
    """§2.AU au3: the divisor fan-out is a Generate over the bounded
    census (|nations|×100 rows), and the award rank's SinglePartition
    window runs over that bounded relation only."""
    phys = physical_plan(q("q_apportion_dhondt"))
    assert "Generate" in phys, phys
    assert phys.count("SinglePartition") <= 1, phys
    assert "BatchEvalPython" not in phys, phys


def test_bridge_census_pinned_single_fact_pass(q):
    """§2.AV: the (part, year) census is localCheckpoint-pinned, so the
    matched y0/y1 branches never re-scan lineitem (av1/av2 plans carry
    ZERO parquet fact scans); av4 reads the fact exactly once with the
    ship-date range pushed. The only nested loops anywhere are the
    adjudicated 1-row broadcast totals."""
    for key in ("q_bridge_pvm_brand", "q_bridge_new_lost"):
        phys = physical_plan(q(key))
        assert "lineitem" not in phys, (key, phys)
        assert "Scan ExistingRDD" in phys, (key, phys)
        for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
            assert bad not in phys, (key, phys)
    plan4 = full_explain(q("q_bridge_mix_shift"))
    pushed = [ln for ln in plan4.splitlines() if "PushedFilters" in ln
              and "l_shipdate" in ln]
    assert pushed, plan4
    phys4 = physical_plan(q("q_bridge_mix_shift"))
    assert phys4.count("BroadcastNestedLoopJoin") <= 1, phys4  # 1-row totals
    assert "CartesianProduct" not in phys4, phys4


def test_backlog_pipe_pinned_and_bounded_windows(q):
    """§2.AW: aw1's per-order pipe is checkpoint-pinned (no fact scan in
    the final plan) and its only window/SinglePartition runs over the
    bounded month census; aw2/aw3 are one orders⋈lineitem-agg join and
    a census — no window over the fact; aw4's month fan-out is a
    JVM-side Generate, never a range join or nested loop."""
    phys1 = physical_plan(q("q_backlog_monthly"))
    assert "lineitem" not in phys1 and "orders" not in phys1, phys1
    assert phys1.count("Window") <= 1, phys1
    assert phys1.count("SinglePartition") <= 1, phys1
    for key in ("q_wip_aging_snapshot", "q_littles_law_check",
                "q_backlog_oldest_open"):
        phys = physical_plan(q(key))
        joins = (phys.count("SortMergeJoin") + phys.count("ShuffledHashJoin")
                 + phys.count("BroadcastHashJoin"))
        assert joins == 1, (key, phys)  # orders ⋈ per-order last-ship only
        assert "Window" not in phys, (key, phys)
        for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
            assert bad not in phys, (key, phys)
    assert "Generate" in physical_plan(q("q_backlog_oldest_open"))


def test_inequality_distributed_ntile_bounded_scaling(q):
    """§2.AX: percentile tiles come from ranks.global_ntile — NO ntile
    window function in any plan; the per-customer relation and the
    bounded censuses are checkpoint-pinned, so SinglePartition appears
    at most twice (per-partition offsets + the bounded census window)
    and the only nested loop is the adjudicated 1-row totals join; the
    128-bit share scaling runs after the census (no decimal math on the
    fact side of ax1/ax3)."""
    for key in ("q_lorenz_deciles", "q_concentration_curve"):
        phys = physical_plan(q(key))
        assert "ntile(" not in phys, (key, phys)
        assert phys.count("SinglePartition") <= 2, (key, phys)
        assert phys.count("Window") <= 1, (key, phys)
        assert phys.count("BroadcastNestedLoopJoin") <= 1, (key, phys)
        assert "CartesianProduct" not in phys, (key, phys)
    phys2 = physical_plan(q("q_hoover_index"))
    assert "Window" not in phys2, phys2
    assert "orders" not in phys2, phys2  # spend relation is pinned
    assert phys2.count("BroadcastNestedLoopJoin") <= 1, phys2


def test_tradeflow_census_pinned_and_topk_lowered(q):
    """§2.AY: ay1/ay2 run on the localCheckpoint-pinned flow census —
    no parquet fact scan in their final plans; ay4's top-10 lowers to
    TakeOrderedAndProject straight off the census build (no global
    sort, no rank window)."""
    for key in ("q_trade_matrix", "q_trade_balance"):
        phys = physical_plan(q(key))
        assert "lineitem" not in phys and "orders" not in phys, (key, phys)
        assert "Scan ExistingRDD" in phys, (key, phys)
        assert "CartesianProduct" not in phys, (key, phys)
    phys4 = physical_plan(q("q_trade_top_corridors"))
    assert "TakeOrderedAndProject" in phys4, phys4
    assert "Window" not in phys4, phys4
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in phys4, phys4


def test_cadence_single_keyed_window_and_censuses(q):
    """§2.AZ: the gap relation costs ONE per-custkey exchange (the lag
    and index windows share the (ck; od, ok) partitioning — ≤2 Window
    nodes, no join before the censuses); az2 adds only the bounded
    (segment, gap) CDF windows; the only nested loops are the 1-row
    broadcast totals."""
    for key, max_win in (("q_interpurchase_gaps", 2),
                         ("q_cadence_regularity", 2),
                         ("q_cadence_trend", 2),
                         ("q_cadence_quartiles_by_segment", 3)):
        phys = physical_plan(q(key))
        assert phys.count("Window") <= max_win, (key, phys)
        assert phys.count("BroadcastNestedLoopJoin") <= 1, (key, phys)
        assert "CartesianProduct" not in phys, (key, phys)
        assert "BatchEvalPython" not in phys, (key, phys)


def test_standardize_bounded_censuses(q):
    """§2.BA: ba3's nation×segment census is checkpoint-pinned — the
    segment standard derives from it with no second fact scan; ba1/ba2/
    ba4 are one shuffle join to a 5-row census with the only nested
    loop the adjudicated 1-row totals."""
    phys3 = physical_plan(q("q_standardized_return_rate"))
    assert "lineitem" not in phys3 and "orders" not in phys3, phys3
    assert "Scan ExistingRDD" in phys3, phys3
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in phys3, phys3
    for key in ("q_segment_mix_weights", "q_mix_adjusted_aov",
                "q_aov_mix_decomposition"):
        phys = physical_plan(q(key))
        assert "Window" not in phys, (key, phys)
        assert phys.count("BroadcastNestedLoopJoin") <= 1, (key, phys)
        assert "CartesianProduct" not in phys, (key, phys)


def test_priority_sla_single_fact_pass(q):
    """§2.BB: bb1/bb2 cost ONE orders⋈first-ship join; bb1's CDF rank
    windows run over the bounded (priority, day) census (≤2 Window
    nodes); bb3/bb4 never read lineitem — one orders census each, the
    only nested loop the 1-row totals."""
    for key, max_win in (("q_priority_latency_quartiles", 2),
                         ("q_priority_sla_attainment", 0)):
        phys = physical_plan(q(key))
        joins = (phys.count("SortMergeJoin") + phys.count("ShuffledHashJoin")
                 + phys.count("BroadcastHashJoin"))
        assert joins == 1, (key, phys)
        assert phys.count("Window") <= max_win, (key, phys)
        for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
            assert bad not in phys, (key, phys)
    for key in ("q_priority_mix_monthly", "q_priority_value_premium"):
        phys = physical_plan(q(key))
        assert "lineitem" not in phys, (key, phys)
        assert "Window" not in phys, (key, phys)
        assert phys.count("BroadcastNestedLoopJoin") <= 1, (key, phys)
        assert "CartesianProduct" not in phys, (key, phys)


def test_rankedreports_no_global_rank_over_census(q):
    """§2.BC: bc1's WITH-TIES membership and bc3's three cut counts
    derive from TakeOrderedAndProject + broadcast thresholds — the only
    SinglePartition windows run over the tie-inclusive head (bounded),
    never the census; bc2's head+OTHER is TakeOrdered + 1-row
    subtraction; bc4's rank window partitions by nation."""
    for key in ("q_top_parts_with_ties", "q_rank_cut_semantics",
                "q_top_brands_plus_other"):
        phys = physical_plan(q(key))
        assert "TakeOrderedAndProject" in phys, (key, phys)
        assert "Scan ExistingRDD" in phys, (key, phys)
        assert "CartesianProduct" not in phys, (key, phys)
        assert phys.count("SinglePartition") <= 2, (key, phys)
    phys4 = physical_plan(q("q_nation_top3_customers"))
    assert "SinglePartition" not in phys4, phys4
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in phys4, phys4


def test_regression_single_pass_census_math(q):
    """§2.BD: bd1/bd2 cost ONE lineitem⋈part join partial-aggregated to
    the 25-row moment census (partial→final HashAggregate pair) — every
    128-bit centered-moment product runs census-side, never windowed,
    never a second fact pass; bd4's parameter table joins the fact as a
    BROADCAST and both top-k stages are keyed windows (no
    SinglePartition exchange anywhere)."""
    for key in ("q_ols_brand_price_curve", "q_corr_quantity_price"):
        phys = physical_plan(q(key))
        joins = (phys.count("SortMergeJoin") + phys.count("ShuffledHashJoin")
                 + phys.count("BroadcastHashJoin"))
        assert joins == 1, (key, phys)
        assert phys.count("HashAggregate") >= 2, (key, phys)
        assert "Window" not in phys, (key, phys)
        for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
            assert bad not in phys, (key, phys)
    phys4 = physical_plan(q("q_ols_residual_outliers"))
    assert "BroadcastHashJoin" in phys4, phys4
    assert "SinglePartition" not in phys4, phys4
    # exactly two rank windows (local salted + global top-k), both
    # rank-limit-pushed (Spark 4 inserts WindowGroupLimit pairs, so the
    # row_number never materializes a full partition sort result)
    assert phys4.count("Window [") == 2, phys4
    assert "WindowGroupLimit" in phys4, phys4


def test_eventstudy_scenario_map_broadcast(q):
    """§2.BE: the 4-row scenario map must join the fact by BROADCAST on
    ship-year (a re-shuffle of lineitem on year would be a 100 TB
    catastrophe for an 8-row answer); be1/be2/be4 collapse through a
    partial→final aggregate pair with no window; be3's only window runs
    over the 50-row brand×year census, partitioned (no SinglePartition
    exchange)."""
    for key in ("q_did_cells", "q_did_effect", "q_did_discount_depth"):
        phys = physical_plan(q(key))
        assert "BroadcastHashJoin" in phys, (key, phys)
        assert phys.count("HashAggregate") >= 2, (key, phys)
        assert "Window" not in phys, (key, phys)
        for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
            assert bad not in phys, (key, phys)
    phys3 = physical_plan(q("q_event_abnormal_brand_share"))
    assert "Window" in phys3, phys3
    assert "SinglePartition" not in phys3, phys3


def test_survival_census_recursion(q):
    """§2.BF: the fact cost is ONE orders pass (the round-11
    collect_set probe — no orders⋈firsts self-join); the actuarial
    fold (bf2/bf3/bf4) runs as a single aggregate() higher-order
    expression over the packed census — NO UnionLoop anywhere (the
    round-10 recursion launched one Spark job per observed month;
    round 11 removed the loop, OPTIMIZATION_r11.md §q_survival_km_curve).
    The life table's suffix window is census-side."""
    phys1 = physical_plan(q("q_survival_life_table"))
    assert phys1.count("HashAggregate") >= 2, phys1
    assert "UnionLoop" not in phys1, phys1  # bf1 is recursion-free
    assert "SortMergeJoin" not in phys1, phys1  # one-pass probe, no self-join
    phys2 = physical_plan(q("q_survival_km_curve"))
    assert "UnionLoop" not in phys2, phys2  # the fold replaced the loop
    assert "aggregate(" in phys2, phys2  # the HOF fold is in the plan
    for key in ("q_survival_summary", "q_survival_by_segment"):
        phys = physical_plan(q(key))
        assert "UnionLoop" not in phys, (key, phys)
        assert "CartesianProduct" not in phys, (key, phys)


def test_hotspot_stencil_equi_join_and_bounded_cc(q):
    """§2.BG: adjacency comes from the stencil EXPLODE + equi-join on
    the neighbor cell id — never an inequality nested loop (bg1's only
    BNLJ is the adjudicated 1-row stats attach); the CC loop's lineage
    is checkpoint-cut, so the cluster rollup plan reads the bounded
    label scan, not a replay of the iteration."""
    phys1 = physical_plan(q("q_hotspot_cells"))
    assert phys1.count("BroadcastNestedLoopJoin") <= 1, phys1
    for key in ("q_hotspot_clusters", "q_hotspot_largest_cluster",
                "q_hotspot_size_classes"):
        phys = physical_plan(q(key))
        assert "Scan ExistingRDD" in phys, (key, phys)  # checkpoint-cut
        for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
            assert bad not in phys, (key, phys)


def test_periodcmp_census_side_alignment(q):
    """§2.BH: bh1/bh2 cost ONE fact aggregation each — the SPLY/YTD
    self-joins run on the ≤84-row month census (broadcast hash join of
    census vs census, or SMJ of two bounded sides), never a second
    fact pass; bh3's ordered window is census-bounded; bh4's only
    nested loop is the adjudicated 1-row total."""
    for key in ("q_sply_monthly", "q_ytd_comparison"):
        phys = physical_plan(q(key))
        assert phys.count("HashAggregate") >= 2, (key, phys)
        for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
            assert bad not in phys, (key, phys)
    phys4 = physical_plan(q("q_yoy_brand_contribution"))
    assert phys4.count("BroadcastNestedLoopJoin") <= 1, phys4
    assert "CartesianProduct" not in phys4, phys4


def test_spc_single_fact_pass_censuses(q):
    """§2.BI: each chart costs ONE partial-aggregated fact pass to the
    month census; centers/limits ride 1-row broadcasts (the
    adjudicated nested loops); no fact-sized window anywhere — every
    Window's input is the bounded census."""
    for key in ("q_spc_pchart_returns", "q_spc_xmr_revenue",
                "q_spc_runs_rules"):
        phys = physical_plan(q(key))
        assert phys.count("HashAggregate") >= 2, (key, phys)
        assert "CartesianProduct" not in phys, (key, phys)
        joins = phys.count("SortMergeJoin") + phys.count("ShuffledHashJoin")
        assert joins == 0, (key, phys)  # censuses combine by broadcast only


def test_benford_single_fact_pass_censuses(q):
    """§2.BJ: every digit screen costs ONE partial-aggregated fact pass
    to a bounded census (9 digits, suppliers×9, ≤100 pairs, ≤5 bands);
    totals ride 1-row broadcasts (the adjudicated nested loops); bj2's
    per-supplier total is a census-side window — no second fact
    aggregation and no fact-sized window; bj4's band map reaches the
    fact by BROADCAST hash join, never a shuffled dim join."""
    for key in ("q_benford_first_digit", "q_benford_mad_screen",
                "q_digit_pair_uniformity"):
        phys = physical_plan(q(key))
        assert phys.count("HashAggregate") >= 2, (key, phys)
        assert "CartesianProduct" not in phys, (key, phys)
        joins = phys.count("SortMergeJoin") + phys.count("ShuffledHashJoin")
        assert joins == 0, (key, phys)
    phys2 = physical_plan(q("q_benford_mad_screen"))
    assert "BroadcastNestedLoopJoin" not in phys2, phys2  # window, no total
    phys4 = physical_plan(q("q_price_endings"))
    assert "BroadcastHashJoin" in phys4, phys4  # band map broadcasts
    assert "CartesianProduct" not in phys4, phys4


def test_abcxyz_census_reduction_and_keyed_join(q):
    """§2.BK: bk1/bk2/bk4 cost ONE fact pass to the (part, month)
    census plus a census-side reduction — at least two partial/final
    aggregate pairs, no fact-sized window, the month count M attached
    by the adjudicated 1-row broadcast; bk3's ABC⋈XYZ join is KEYED on
    the part (hash or merge of two part-sized relations — never a
    nested loop over the catalog)."""
    for key in ("q_xyz_cv_classes", "q_demand_intermittency",
                "q_demand_class_summary"):
        phys = physical_plan(q(key))
        assert phys.count("HashAggregate") >= 4, (key, phys)
        assert "CartesianProduct" not in phys, (key, phys)
        # bk4 replays the moment subtree (and its 1-row M attach) on
        # both its total and group legs, plus its own 1-row quantity
        # total — every nested loop is a 1-row broadcast
        cap = 3 if key == "q_demand_class_summary" else 1
        assert phys.count("BroadcastNestedLoopJoin") <= cap, (key, phys)
        assert "Window" not in phys, (key, phys)
    phys3 = physical_plan(q("q_abc_xyz_matrix"))
    assert "CartesianProduct" not in phys3, phys3
    keyed = (
        phys3.count("SortMergeJoin") + phys3.count("ShuffledHashJoin")
        + phys3.count("BroadcastHashJoin")
    )
    assert keyed >= 1, phys3
    # three 1-row attaches: the ABC leg's grand total, the XYZ leg's
    # month count M, and the revenue total for the share column
    assert phys3.count("BroadcastNestedLoopJoin") <= 3, phys3


def test_ctxbudget_map_side_census_no_explode(q):
    """§2.BL: every budget query is a map-side token-count projection
    (size(filter(split ...)) — the token relation NEVER explodes) into
    a bounded census; bl1 computes all four candidate lengths in one
    aggregate row (no per-length rescan: exactly one fact scan); the
    only window (bl4) runs on the census."""
    for key in ("q_ctx_truncation_loss", "q_ctx_padding_waste",
                "q_ctx_chunk_fanout", "q_ctx_length_coverage"):
        phys = physical_plan(q(key))
        if key == "q_ctx_truncation_loss":
            # bl1's stack() unpivot lowers to ONE Generate over the
            # 1-row aggregate — the 4-row unpivot, not a token explode
            assert phys.count("Generate") == 1, (key, phys)
            assert phys.index("Generate") < phys.index("HashAggregate"), (
                key, phys,
            )  # Generate sits ABOVE the aggregate, fed by its 1 row
        else:
            assert "Generate" not in phys, (key, phys)  # no explode
        assert "CartesianProduct" not in phys, (key, phys)
        if key in ("q_ctx_chunk_fanout", "q_ctx_length_coverage"):
            # census localCheckpoint cut the lineage: the one fact scan
            # ran at checkpoint time; the visible plan reads the pinned
            # bounded census, never parquet
            assert phys.count("Scan parquet") == 0, (key, phys)
            assert "Scan ExistingRDD" in phys, (key, phys)
        else:
            assert phys.count("Scan parquet") == 1, (key, phys)
        joins = phys.count("SortMergeJoin") + phys.count("ShuffledHashJoin")
        assert joins == 0, (key, phys)


def test_botscreen_user_keyed_shapes(q):
    """§2.BM: every screen's wide operations are keyed BY USER — the
    burst RANGE frame, the gap lag, and the reductions all share the
    user_id partitioning (no global window: every Window node carries
    a user_id partition spec); bm2's mode join is census-vs-census on
    the user key; nothing nested-loops."""
    for key in ("q_burst_rate_screen", "q_metronome_screen",
                "q_duty_cycle_profile", "q_traffic_screen_summary"):
        phys = physical_plan(q(key))
        assert "CartesianProduct" not in phys, (key, phys)
        assert "BroadcastNestedLoopJoin" not in phys, (key, phys)
    for key in ("q_burst_rate_screen", "q_metronome_screen"):
        plan = full_explain(q(key))
        for ln in plan.splitlines():
            if "windowspecdefinition" in ln.lower():
                assert "user_id" in ln, (key, ln)


def test_vecaudit_fold_census_shapes(q):
    """§2.BN: bn1/bn3/bn4 are ONE map-side fold pass into a bounded
    census — exactly one parquet scan (round 11: the former
    1-row-broadcast totals re-ran the fact-wide fold, two scans + two
    fold passes; the total is now an unpartitioned window over the
    bounded census), no joins at all; bn2's 64× posexplode
    partial-aggregates immediately (Generate feeds an aggregate, and
    the shuffle carries 64 dimension groups, never the exploded
    relation — pinned by the partial/final pair)."""
    for key in ("q_emb_norm_audit", "q_emb_concentration_screen",
                "q_emb_label_balance"):
        phys = physical_plan(q(key))
        assert "CartesianProduct" not in phys, (key, phys)
        assert "BroadcastNestedLoopJoin" not in phys, (key, phys)
        # the bounded-census total window is the ONLY window
        assert phys.count("Window") <= 2, (key, phys)
        joins = phys.count("SortMergeJoin") + phys.count("ShuffledHashJoin")
        assert joins == 0, (key, phys)
        assert phys.count("Scan parquet") == 1, (key, phys)
    phys2 = physical_plan(q("q_emb_dead_dims"))
    assert "Generate" in phys2, phys2
    assert phys2.count("HashAggregate") >= 2, phys2  # partial + final
    assert "BroadcastNestedLoopJoin" not in phys2, phys2


def test_anova_broadcast_dim_attach_and_census_reduction(q):
    """§2.BO: the segment/nation groupings attach dim attributes to
    orders UNHINTED — at test SF the 2-column dim sits under the
    auto-broadcast threshold so the plan must show a BroadcastHashJoin
    (at 100 TB AQE shuffle-joins instead; forcing the hint measured
    36× at the 100× probe); every decomposition is census-side (≥2
    aggregate pairs); no cartesian anywhere."""
    for key in ("q_anova_groups", "q_anova_decomposition",
                "q_anova_segment_effects"):
        phys = physical_plan(q(key))
        assert "BroadcastHashJoin" in phys, (key, phys)
        assert "CartesianProduct" not in phys, (key, phys)
        assert phys.count("HashAggregate") >= 2, (key, phys)
        joins = phys.count("SortMergeJoin") + phys.count("ShuffledHashJoin")
        assert joins == 0, (key, phys)
    phys4 = physical_plan(q("q_variance_explained_ladder"))
    assert "CartesianProduct" not in phys4, phys4


def test_simpson_census_side_reductions(q):
    """§2.BP: every audit reduces the (segment, year) census — one
    orders pass with an AQE-decided dim attach (BroadcastHashJoin at
    test SF), then census-side arithmetic only; pooled rows are the
    adjudicated 1-row broadcasts."""
    for key in ("q_trend_sign_by_segment", "q_simpson_reversal_audit",
                "q_weighted_unweighted_gap", "q_segment_trend_table"):
        phys = physical_plan(q(key))
        assert "BroadcastHashJoin" in phys, (key, phys)
        assert "CartesianProduct" not in phys, (key, phys)
        assert phys.count("HashAggregate") >= 2, (key, phys)
        joins = phys.count("SortMergeJoin") + phys.count("ShuffledHashJoin")
        assert joins == 0, (key, phys)
        assert "Window" not in phys, (key, phys)


def test_revretention_customer_keyed_self_join(q):
    """§2.BQ: the pair alignment is a CUSTOMER-KEYED join of the
    pinned (customer, year) census against itself (both sides read the
    checkpoint — Scan ExistingRDD, one fact scan total happened at pin
    time); no cartesian; the year-span lookup is the adjudicated 1-row
    broadcast; bq4's segment attach joins the customer dim keyed."""
    for key in ("q_revenue_retention_bridge", "q_nrr_grr_by_year",
                "q_expansion_accounts_topk", "q_retention_mix_by_segment"):
        phys = physical_plan(q(key))
        assert "CartesianProduct" not in phys, (key, phys)
        assert "Scan ExistingRDD" in phys, (key, phys)  # pinned census
        assert phys.count("Scan parquet") <= 1, (key, phys)  # bq4's dim
    phys3 = physical_plan(q("q_expansion_accounts_topk"))
    assert "TakeOrderedAndProject" in phys3, phys3  # no global sort


def test_basketshape_order_keyed_censuses(q):
    """§2.BR: every census reduces a per-order relation keyed on the
    order (one fact pass), then collapses to ≤7 rows; br2's brand
    attach is an unhinted dim join (broadcast at test SF); br4 is a
    pure map-side census — no join at all."""
    for key in ("q_order_size_census", "q_basket_breadth_profile",
                "q_size_value_mix", "q_line_position_profile"):
        phys = physical_plan(q(key))
        assert "CartesianProduct" not in phys, (key, phys)
        assert phys.count("HashAggregate") >= 2, (key, phys)
        assert "Window" not in phys, (key, phys)
    phys2 = physical_plan(q("q_basket_breadth_profile"))
    assert "BroadcastHashJoin" in phys2, phys2
    phys4 = physical_plan(q("q_line_position_profile"))
    joins = (phys4.count("SortMergeJoin") + phys4.count("ShuffledHashJoin")
             + phys4.count("BroadcastHashJoin"))
    assert joins == 0, phys4
