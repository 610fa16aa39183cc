"""Plan report CLI: summarize scale-relevant plan properties per query.

    python -m recommendersystems_bigdata_spark.plans.report [key ...]

With no arguments, reports the bench headline set. For each query prints
one line: join strategies, shuffle-exchange count, pushed filters, and
whether whole-stage codegen fused any stages — the checklist from
SURVEY.md §4 in greppable form.
"""

from __future__ import annotations

import os
import sys

from recommendersystems_bigdata_spark import registry
from recommendersystems_bigdata_spark.plans.inspect import (
    count_join_side_exchanges,
    final_plan,
    pushed_filters,
)
from recommendersystems_bigdata_spark.session import get_spark

HEADLINE = (
    "q_agg_pricing_summary",
    "q_join_star_multiway",
    "q_win_rownum_topk",
    "q_cosine_topk",
    "q_session_window",
    "q_str_split_explode",
    "q_interactions",
)


def main() -> None:
    keys = sys.argv[1:] or list(HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    registry.load_all()
    spark = get_spark(app_name="plan-report")
    spark.sparkContext.setLogLevel("ERROR")
    for key in keys:
        df = registry.QUERIES[key](spark, sf_dir)
        # collect() executes THIS DataFrame's queryExecution, finalizing its
        # adaptive plan (a sink write would plan a separate execution)
        df.collect()
        plan = final_plan(df)
        joins = sorted(
            {
                j
                for j in (
                    "BroadcastHashJoin",
                    "SortMergeJoin",
                    "ShuffledHashJoin",
                    "BroadcastNestedLoopJoin",
                )
                if j in plan
            }
        )
        print(
            f"{key}: joins={joins or ['none']} "
            f"shuffles={count_join_side_exchanges(plan)} "
            f"pushed_filters={len(pushed_filters(df))} "
            f"codegen={'yes' if '*(' in plan else 'no'}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
