"""Physical-plan inspection utilities (SURVEY.md §4)."""

from recommendersystems_bigdata_spark.plans.inspect import (  # noqa: F401
    count_join_side_exchanges,
    final_plan,
    full_explain,
    physical_plan,
    pushed_filters,
)
