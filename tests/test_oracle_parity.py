"""Layer-2 oracle parity: every SQL-oracle query hash-matches DuckDB locally.

This mirrors the driver's CORRECTNESS harness (SURVEY.md §5) at sf0.001 so
regressions are caught per-commit, not per-round.
"""

from __future__ import annotations

import pytest

from recommendersystems_bigdata_spark import registry
from recommendersystems_bigdata_spark.oracle import check_query

registry.load_all()
ORACLE_KEYS = sorted(registry.ORACLES)
ROWS_ONLY_KEYS = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_oracle_parity(spark, sf_dir, key):
    res = check_query(spark, key, sf_dir)
    assert res.ok, res.message()


@pytest.mark.parametrize("key", ROWS_ONLY_KEYS)
def test_rows_only_runs(spark, sf_dir, key):
    """Rows-only keys must produce actual rows — `count() >= 0` is vacuous
    and let 3 zero-emitting streaming queries pass for two rounds. Every
    rows-only operator has non-empty output on the sf0.001 corpus."""
    df = registry.QUERIES[key](spark, sf_dir)
    assert df.count() > 0, f"{key} produced 0 rows"
    assert len(df.schema.fields) > 0
