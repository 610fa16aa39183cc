"""Partition-layout invariance of rounded-aggregate outputs.

``round(sum(double), 2)`` depends on the double partial-sum order, which
is set by the scan-split layout — so two configurations of
``spark.sql.files.maxPartitionBytes`` can produce DIFFERENT rounded
cents from the same data (the hazard adjudicated in SCALE.md "Deep
randomized fuzz sweeps": at sf0.01 the flagship's R/F disc-price group
sits 0.0001 from its boundary, inside a 15k-row group's worst-case
summation error). The revenue measures were rewritten to exact integer
micros (functions/exactmath.py); this test pins the property the
rewrite bought: bit-identical output under a radically different input
split layout AND a different shuffle-partition count.
"""

from __future__ import annotations

import pytest

from recommendersystems_bigdata_spark import registry
from recommendersystems_bigdata_spark.oracle import canonicalize

HARDENED = (
    "q_agg_pricing_summary",
    "q_agg_conditional",
    "q_join_star_multiway",
    "q_tpch_q5_local_volume",
    # round-8 TPC-H extension: integer-bps shares (a float quotient here
    # would be the layout lottery), the exact-e4 ties-at-max compare, and
    # the cross-multiplied correlated-avg filter
    "q_tpch_q6_forecast",
    "q_tpch_q8_market_share",
    "q_tpch_q14_promo_share",
    "q_tpch_q15_top_supplier",
    "q_tpch_q17_small_qty",
    # round-8 time-series suite: integer-exact EWMA / time-weighted
    # average / multi-resolution rollup — the e2/e4 integer sums and
    # truncating divides must be bit-identical on any scan split
    "q_rollup_multires",
    "q_ewma_binary_decay",
    "q_time_weighted_avg",
    "q_downsample_m4",
    # round-8 TPC-H adaptation suite: the exact-e2 min-equality tie set
    # (c27), the cross-multiplied integer thresholds (c29/c33/c35), and
    # the e4 revenue with integer half-up rounding (c32)
    "q_tpch_q2_min_cost_supplier",
    "q_tpch_q11_important_value",
    "q_tpch_q19_disjunctive_rev",
    "q_tpch_q20_concentrated_suppliers",
    "q_tpch_q22_idle_customers",
    # round-8 incremental maintenance: the retraction merge must equal
    # the recompute on every layout — the whole point is exact integer
    # group arithmetic
    "q_incr_retract_orders",
    # round-8 time-series late pair: integer counter-reset accounting and
    # the truncating-div linear interpolation
    "q_counter_reset_increase",
    "q_gapfill_interpolate",
    # round-8 attribution: integer basis-point credit split and the
    # truncating-div microsecond lag mean
    "q_attribution_multitouch",
    "q_attribution_lag",
    "q_attribution_time_decay",
    # round-8 exact-rational OLS slope: pure integer sufficient statistics
    "q_trend_slope",
    # round-9 quality/analytics suite: integer-bp violation rates, the
    # exact weighted-median crossing, integer-ppm Gini impurity, and the
    # deterministic KMV estimate (bottom-k merge must be layout-blind)
    "q_expect_ranges",
    "q_cross_table_consistency",
    "q_weighted_median",
    "q_gini_impurity",
    "q_distinct_kmv",
    "q_win_range_frame",
    # round-9 second batch: integer-interpolated percentiles, exact-e4
    # weekly deltas under a deterministic top-k cut, exact-cents aging
    "q_percentile_cont_exact",
    "q_topk_movers",
    "q_backlog_aging",
    # round-9 third batch — sequence mining: the ordered collect_list
    # signature must be identical on any scan split (array_sort pins it),
    # and the bp rates are truncating-div integers; feature engineering:
    # the LOO/odds codebooks and the strictly-preceding PIT frame must
    # not depend on partition layout
    "q_seq_user_signature",
    "q_seq_error_recovery",
    "q_seq_switch_rate",
    "q_feat_target_encode_loo",
    "q_feat_odds_smooth",
    "q_feat_history_pit",
    "q_feat_rare_collapse",
    # round-9 fourth/fifth batches — recursive closure rollups (the
    # UnionLoop's union order must not leak into the exact-cent sums)
    # and the time-series diagnostics (integer ACF/CUSUM/drawdown sums
    # and truncating-div bp must be scan-split-blind)
    "q_rec_hierarchy_levels",
    "q_rec_subtree_rollup",
    "q_ts_autocorr",
    "q_ts_cusum_changepoint",
    "q_ts_drawdown",
    # round-9 sixth batch — growth accounting: exact-cent cohort/tenure
    # sums and truncating-div bp must be scan-split-blind
    "q_ltv_cohort_curve",
    "q_churn_hazard",
    "q_benford_audit",
    "q_seasonal_residual_outliers",
    "q_new_vs_returning",
    # round-9 seventh batch — recommender evaluation: the deterministic
    # rec list, its exposure/bias rollups, and the md5 negative sample
    # must be identical on any scan split
    "q_rec_catalog_coverage",
    "q_rec_exposure_gini",
    "q_rec_popularity_bias",
    "q_rec_next_part_transitions",
    "q_rec_negative_sampling",
    # round-9 eighth batch — integrity audits: cent-remainder classes,
    # composite-key duplicate groups, and the two-pass-ranked gap table
    # must be identical on any scan split
    "q_audit_round_amounts",
    "q_audit_duplicate_candidates",
    "q_audit_keyspace_gaps",
)


@pytest.mark.parametrize("key", HARDENED)
def test_hardened_aggregates_are_layout_invariant(spark, sf_dir, key):
    registry.load_all()
    fn = registry.QUERIES[key]
    old_bytes = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "131072")  # 128 KB
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = canonicalize(fn(spark, sf_dir).toPandas())
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_bytes)
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        b = canonicalize(fn(spark, sf_dir).toPandas())
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_bytes)
        spark.conf.set("spark.sql.shuffle.partitions", old_shuffle)
    assert a.equals(b), f"{key}: output changed with partition layout"
