"""scratch_dir generation contract (ADVICE r6): a result produced from
call N must stay readable across subsequent calls of the same tag, and
occupancy must stay bounded by KEEP_GENERATIONS."""

from __future__ import annotations

import os

from recommendersystems_bigdata_spark import tmpdirs


def test_prior_generation_survives_next_call():
    a = tmpdirs.scratch_dir("unit_gen")
    open(os.path.join(a, "x.txt"), "w").write("gen0")
    b = tmpdirs.scratch_dir("unit_gen")
    assert a != b
    # the file written in generation 0 is still readable after call 1
    assert open(os.path.join(a, "x.txt")).read() == "gen0"


def test_occupancy_bounded_by_keep_generations():
    tag = "unit_bound"
    paths = [tmpdirs.scratch_dir(tag) for _ in range(tmpdirs.KEEP_GENERATIONS + 3)]
    live = [p for p in paths if os.path.isdir(p)]
    assert len(live) == tmpdirs.KEEP_GENERATIONS
    # the survivors are exactly the most recent generations
    assert live == paths[-tmpdirs.KEEP_GENERATIONS:]


def test_lazy_dataframe_from_previous_call_still_actionable(spark):
    """The real hazard: a lazy roundtrip DataFrame held across a re-run of
    the same query must still materialize (no FileNotFoundException)."""
    d1 = tmpdirs.scratch_dir("unit_lazy")
    spark.range(5).write.mode("overwrite").parquet(f"{d1}/t")
    held = spark.read.parquet(f"{d1}/t")
    d2 = tmpdirs.scratch_dir("unit_lazy")
    spark.range(7).write.mode("overwrite").parquet(f"{d2}/t")
    assert held.count() == 5
