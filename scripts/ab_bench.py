"""Same-session A/B bench: HEAD vs a pinned older tree (round-6 demand #1).

Loads the query registry twice — once from an older git worktree, once from
the live repo — into ONE Python process and ONE SparkSession, then times the
disputed queries in strictly alternating order (H,O,H,O,...). Alternation
plus a shared JVM removes every machine/session-level confound (JIT state,
page cache, CPU frequency, background load drift between sessions), so any
median gap that survives is CODE cost.

Usage:
    cd /tmp && python /root/repo/scripts/ab_bench.py OLD_TREE [QUERY ...]

Prints one JSON line: per-query {head: [...], old: [...], head_median,
old_median, ratio}.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

REPO = "/root/repo"
PKG = "recommendersystems_bigdata_spark"
DEFAULT_QUERIES = ("q_dedup_lsh_join", "q_str_split_explode", "q_interactions")
N = 3


def _load_queries(tree: str) -> dict:
    """Import ``tree``'s registry, return its QUERIES dict, purge modules.

    Function objects keep their own __globals__, so the returned callables
    stay valid after the purge; purging just lets the OTHER tree's modules
    import fresh under the same package name.
    """
    for mod in [m for m in sys.modules if m == PKG or m.startswith(PKG + ".")]:
        del sys.modules[mod]
    sys.path.insert(0, tree)
    try:
        import importlib

        registry = importlib.import_module(f"{PKG}.registry")
        registry.load_all()
        queries = dict(registry.QUERIES)
    finally:
        sys.path.remove(tree)
        for mod in [m for m in sys.modules if m == PKG or m.startswith(PKG + ".")]:
            del sys.modules[mod]
    return queries


def main() -> int:
    old_tree = sys.argv[1]
    names = sys.argv[2:] or list(DEFAULT_QUERIES)
    sf_dir = "/root/testdata/sf0.1"

    old_q = _load_queries(old_tree)
    head_q = _load_queries(REPO)

    sys.path.insert(0, REPO)
    from recommendersystems_bigdata_spark.session import get_spark

    spark = get_spark(app_name="ab_bench", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    def run(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    out: dict[str, dict] = {}
    for name in names:
        # Untimed warmup, one per side.
        run(head_q[name])
        run(old_q[name])
        h_times, o_times = [], []
        for _ in range(N):
            h_times.append(run(head_q[name]))
            o_times.append(run(old_q[name]))
        hm, om = statistics.median(h_times), statistics.median(o_times)
        out[name] = {
            "head": [round(t, 3) for t in h_times],
            "old": [round(t, 3) for t in o_times],
            "head_median": round(hm, 3),
            "old_median": round(om, 3),
            "ratio_head_over_old": round(hm / om, 3),
        }
    print(json.dumps({"old_tree": old_tree, "n": N, "queries": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
