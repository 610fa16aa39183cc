"""Same-session A/B bench: HEAD vs a pinned older tree (round-6 demand #1).

Loads the query registry twice — once from an older git worktree, once from
the live repo — into ONE Python process and ONE SparkSession, then times the
disputed queries in strictly alternating order (H,O,H,O,...). Alternation
plus a shared JVM removes every machine/session-level confound (JIT state,
page cache, CPU frequency, background load drift between sessions), so any
median gap that survives is CODE cost.

Cross-tree hygiene (ADVICE r6): each tree's imported module set is kept as
a SNAPSHOT, and every individual run executes with its OWN tree's modules
swapped into ``sys.modules`` and its tree first on ``sys.path``. A query
function with a lazy in-function package import (e.g. q_dedup_clusters's
``from ...ml.graph import star_components``) therefore resolves against
the tree being timed — from the module cache, so no import work lands in
the timed region — instead of silently importing HEAD's module while
being measured as "old".

Usage:
    cd /tmp && python /root/repo/scripts/ab_bench.py OLD_TREE [QUERY ...]

Prints one JSON line: per-query {head: [...], old: [...], head_median,
old_median, ratio}.
"""

from __future__ import annotations

import contextlib
import json
import statistics
import sys
import time

REPO = "/root/repo"
PKG = "recommendersystems_bigdata_spark"
DEFAULT_QUERIES = (
    "q_dedup_lsh_join",
    "q_str_split_explode",
    "q_interactions",
    "q_dedup_clusters",  # iterative driver-loop path (headline since r7)
)
N = 3


def _pop_pkg_modules() -> dict:
    """Remove every package module from sys.modules; return the removed set."""
    out = {}
    for mod in [m for m in sys.modules if m == PKG or m.startswith(PKG + ".")]:
        out[mod] = sys.modules.pop(mod)
    return out


@contextlib.contextmanager
def _tree_active(tree: str, snapshot: dict):
    """Swap ``tree``'s module snapshot into sys.modules and put the tree
    first on sys.path, so any import triggered during the run binds to
    this tree (cache-hit for everything already loaded)."""
    _pop_pkg_modules()
    sys.modules.update(snapshot)
    sys.path.insert(0, tree)
    try:
        yield
    finally:
        sys.path.remove(tree)
        # fold any module lazily imported DURING the run back into the
        # snapshot, so later activations of this tree cache-hit it
        snapshot.update(_pop_pkg_modules())


def _load_queries(tree: str) -> tuple[dict, dict]:
    """Import ``tree``'s registry; return (QUERIES dict, module snapshot).

    Function objects keep their own __globals__, so the returned callables
    stay valid after the snapshot is popped out of sys.modules; the
    snapshot is swapped back in around each of the tree's timed runs so
    lazy intra-package imports inside a query resolve to the same tree.
    Runs as ``_tree_active`` with an empty starting snapshot — the
    finally-clause fold captures every module the registry import pulled
    in — so the swap discipline lives in exactly one place.
    """
    import importlib

    snapshot: dict = {}
    with _tree_active(tree, snapshot):
        registry = importlib.import_module(f"{PKG}.registry")
        registry.load_all()
        queries = dict(registry.QUERIES)
    return queries, snapshot


def main() -> int:
    old_tree = sys.argv[1]
    names = sys.argv[2:] or list(DEFAULT_QUERIES)
    sf_dir = "/root/testdata/sf0.1"

    old_q, old_mods = _load_queries(old_tree)
    head_q, head_mods = _load_queries(REPO)

    # Fail fast on queries either tree lacks (e.g. a key newer than the old
    # tree): a KeyError after minutes of timed runs would discard every
    # completed measurement.
    missing = [n for n in names if n not in old_q or n not in head_q]
    if missing:
        avail = sorted(set(old_q) & set(head_q))
        print(
            f"ab_bench: not in both trees: {missing} "
            f"(benchable: {len(avail)} shared keys)",
            file=sys.stderr,
        )
        return 2

    with _tree_active(REPO, head_mods):
        from recommendersystems_bigdata_spark.session import get_spark

        spark = get_spark(app_name="ab_bench", shuffle_partitions=8)
        spark.sparkContext.setLogLevel("ERROR")

    def run(fn, tree: str, snapshot: dict) -> float:
        with _tree_active(tree, snapshot):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

    out: dict[str, dict] = {}
    for name in names:
        # Untimed warmup, one per side.
        run(head_q[name], REPO, head_mods)
        run(old_q[name], old_tree, old_mods)
        h_times, o_times = [], []
        for _ in range(N):
            h_times.append(run(head_q[name], REPO, head_mods))
            o_times.append(run(old_q[name], old_tree, old_mods))
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
