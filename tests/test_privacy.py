"""§2.O privacy-audit behavior gates beyond oracle parity: the QI
parameterization must actually work for non-default column lists, and
each audit's report must satisfy its defining arithmetic invariants
(which oracle hash-matching alone would also catch, but these pin the
SEMANTICS against an independent spelling, not another SQL engine).
"""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from recommendersystems_bigdata_spark import registry
from recommendersystems_bigdata_spark.catalog import load_table
from recommendersystems_bigdata_spark.ml.privacy import (
    _BAND_DUCK,
    _with_band,
    cl_diversity_report,
    kanonymity_report,
    ldiversity_report,
    tcloseness_report,
)

registry.load_all()


def test_kanonymity_report_accepts_custom_qi(spark, sf_dir):
    """The QI tuple is a real parameter: a single-column QI audit must
    match an independently-computed census."""
    cust = load_table(spark, sf_dir, "customer")
    got = {
        r["c_mktsegment"]: (r["group_size"], r["risky"])
        for r in kanonymity_report(cust, ("c_mktsegment",), k=40).collect()
    }
    con = duckdb.connect()
    try:
        expect = {
            seg: (n, int(n < 40))
            for seg, n in con.execute(
                f"SELECT c_mktsegment, count(*) FROM "
                f"read_parquet('{sf_dir}/customer.parquet') GROUP BY 1"
            ).fetchall()
        }
    finally:
        con.close()
    assert got == expect


def test_ldiversity_distinct_bands_bounded_by_group_size(spark, sf_dir):
    for r in ldiversity_report(
        _with_band(load_table(spark, sf_dir, "customer")), ("c_nationkey",)
    ).collect():
        assert 1 <= r["l_distinct"] <= r["group_size"]


def test_cl_diversity_order_statistics_invariants(spark, sf_dir):
    """top1 is the class max, top1 ≥ top2, the three parts sum to the
    class size, and the flag equals its defining inequality."""
    rep = cl_diversity_report(
        _with_band(load_table(spark, sf_dir, "customer")),
        ("c_nationkey", "c_mktsegment"),
        c=3,
    )
    for r in rep.collect():
        assert r["top1_count"] >= r["top2_count"] >= 0
        assert r["top1_count"] + r["top2_count"] + r["tail_count"] == r["group_size"]
        assert r["cl_ok"] == int(r["top1_count"] < 3 * r["tail_count"])


def test_tcloseness_bounds_and_breach_consistency(spark, sf_dir):
    """TVD in basis points is bounded by [0, 10000] and the breach flag
    equals its threshold comparison; a degenerate one-class partition has
    distance 0 by definition (its distribution IS the corpus's)."""
    banded = _with_band(load_table(spark, sf_dir, "customer"))
    for r in tcloseness_report(banded, ("c_nationkey", "c_mktsegment")).collect():
        assert 0 <= r["tvd_bp"] <= 10000
        assert r["breach"] == int(r["tvd_bp"] > 2000)
    one_class = tcloseness_report(banded.withColumn("one", F.lit(1)), ("one",)).collect()
    assert len(one_class) == 1 and one_class[0]["tvd_bp"] == 0


def test_generalization_audit_is_monotone_up_the_lattice(spark, sf_dir):
    """Coarser QI levels can only merge classes: risky rows and class
    counts must be non-increasing from L0 to L2, and every level's
    suppressed rows < the corpus size."""
    rows = {
        r["level"]: r
        for r in registry.QUERIES["q_qi_generalization_audit"](
            spark, sf_dir
        ).collect()
    }
    assert set(rows) == {"L0_nation_segment", "L1_region_segment", "L2_segment"}
    l0, l1, l2 = (
        rows["L0_nation_segment"], rows["L1_region_segment"], rows["L2_segment"]
    )
    assert l0["n_classes"] >= l1["n_classes"] >= l2["n_classes"]
    assert l0["n_suppressed_rows"] >= l1["n_suppressed_rows"] >= l2["n_suppressed_rows"]
    assert l0["min_class_size"] <= l1["min_class_size"] <= l2["min_class_size"]
