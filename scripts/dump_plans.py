"""Dump ``explain("formatted")`` for named query keys to plans/<tag>/.

Usage::

    python scripts/dump_plans.py <tag> <suffix> [key ...]

Writes ``plans/<tag>/<key>_<suffix>.txt`` for each key (default: the
bench headline set). The judge reads these files to check plan claims
(Exchange counts, join strategies, PushedFilters, Python-eval nodes)
against OPTIMIZATION_r*.md, so they are committed artifacts.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recommendersystems_bigdata_spark import registry  # noqa: E402
from recommendersystems_bigdata_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    keys = sys.argv[3:]
    if not keys:
        import bench

        keys = list(bench.HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    registry.load_all()
    spark = get_spark(app_name=f"plans_{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    for key in keys:
        df = registry.QUERIES[key](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{key}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
