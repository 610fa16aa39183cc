"""Twin-spelling + determinism self-checks (SURVEY.md §5 Layers 2-3).

Twin check: every oracle is written in ANSI-leaning SQL; for the dialect-
portable subset, the *same string* must also run on Spark SQL (entry point
3) and hash-match the DataFrame spelling — a DuckDB-independent
self-consistency gate. PORTABLE_KEYS is curated: a key listed here that
stops parsing on Spark is a test failure, not a skip.

Determinism lint: every registered query, run twice in one session, must
produce identical normalized results — catches hidden collect_list /
sample / ntile / map-ordering nondeterminism that an oracle diff at a
single point in time can miss.
"""

from __future__ import annotations

import pytest

from recommendersystems_bigdata_spark import registry
from recommendersystems_bigdata_spark.catalog import register_views
from recommendersystems_bigdata_spark.oracle import compare_frames

registry.load_all()

# Oracle strings known to be valid in BOTH DuckDB and Spark SQL. Curated,
# not discovered — silent skips would hide regressions.
PORTABLE_KEYS = sorted(
    [
        "q_project_compute",
        "q_filter_compound",
        "q_distinct",
        "q_join_inner_equi",
        # q_join_star_multiway / q_agg_pricing_summary / q_agg_conditional
        # excluded since the exact-revenue hardening: their oracles use
        # DuckDB's `//` integer division (Spark spells it `div`); the
        # stronger tests/test_layout_invariance.py covers them instead
        "q_join_left_outer",
        "q_join_semi",
        "q_join_anti",
        "q_join_self_cooccur",
        "q_agg_count_distinct",
        "q_agg_having",
        "q_agg_min_max_by",
        "q_win_rownum_topk",
        "q_win_rank_dense",
        "q_win_lag_lead",
        "q_win_running_sum",
        "q_win_first_last",
        "q_win_percent_cume",
        "q_sort_multikey",
        "q_topk_global",
        "q_union_all",
        "q_union_distinct",
        "q_intersect",
        "q_except",
        "q_date_parts",
        "q_math",
        "q_pivot_wide",
        "q_unpivot_long",
        # q_cond excluded: its oracle uses DuckDB's 1-arg numeric trunc();
        # Spark's trunc() is the 2-arg date version
        "q_interactions",
        "q_popularity_topk",
        "q_cooccurrence_sim",
        "q_split_leave_latest",
        "q_udaf_pandas_agg",
        "q_agg_histogram",
        "q_agg_moments",
        "q_events_transition",
        "q_events_funnel",
        "q_upsert_latest",
        "q_agg_zscore_outliers",
        "q_graph_triangles",
        # round-9: division-free oracles (no DuckDB `//`, no epoch_us)
        "q_dup_key_audit",
        "q_weighted_median",
    ]
)


@pytest.fixture(scope="module", autouse=True)
def views(spark, sf_dir):
    register_views(spark, sf_dir)


@pytest.mark.parametrize("key", PORTABLE_KEYS)
def test_sql_spelling_matches_dataframe(spark, sf_dir, key):
    df_pdf = registry.QUERIES[key](spark, sf_dir).toPandas()
    sql_pdf = spark.sql(registry.ORACLES[key]).toPandas()
    res = compare_frames(key, df_pdf, sql_pdf)
    assert res.ok, f"DataFrame vs spark.sql spelling diverge: {res.message()}"


@pytest.mark.slow  # one-session double-run; the committed VERIFY double
# sweeps check the stronger two-JVM determinism for all keys every round
@pytest.mark.parametrize("key", sorted(registry.QUERIES))
def test_determinism_two_runs(spark, sf_dir, key):
    if key in NONDETERMINISTIC_BY_DESIGN:
        pytest.skip("documented nondeterministic output shape")
    fn = registry.QUERIES[key]
    a = fn(spark, sf_dir).toPandas()
    b = fn(spark, sf_dir).toPandas()
    res = compare_frames(key, a, b)
    assert res.ok, f"two same-session runs differ: {res.message()}"


# Keys whose *values* are stable but whose documented contract is only
# rows-level (kept out of the determinism hash): none currently — every
# registered query, including seeded sampling/ALS/LSH, must repeat exactly
# within a session.
NONDETERMINISTIC_BY_DESIGN: frozenset[str] = frozenset()
