"""§2.P record-matching behavior gates beyond oracle parity.

The p1 oracle certifies blocked ≡ brute-force on the corpus; these pin
the MECHANISM — the actual Spark `deletion_keys` SQL expression against
a Python reference, and symmetric-delete completeness (every pair
within Levenshtein 1 shares a blocking key) on hypothesis-generated
strings, including the 1-based-substring edge cases (first char, last
char, length-1 strings) a refactor would be most likely to break.
"""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from recommendersystems_bigdata_spark.ml.matching import deletion_keys

_DERANDOMIZE = os.environ.get("FUZZ_DEEP") is None
_EXAMPLES = int(os.environ.get("FUZZ_EXAMPLES", "0"))


def _py_keys(s: str) -> set[str]:
    return {s} | {s[:i] + s[i + 1 :] for i in range(len(s))}


def _lev1(a: str, b: str) -> bool:
    """True iff Levenshtein(a, b) ≤ 1 (equal, one sub, one ins/del)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) == 1
    s, t = (a, b) if la < lb else (b, a)  # s shorter
    return any(t[:i] + t[i + 1 :] == s for i in range(len(t)))


_ALPHA = "ab#1"  # tiny alphabet → frequent near-collisions


@settings(
    max_examples=_EXAMPLES or 15, deadline=None, derandomize=_DERANDOMIZE,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(strings=st.lists(st.text(_ALPHA, min_size=1, max_size=8),
                        min_size=2, max_size=30, unique=True))
def test_deletion_keys_expression_matches_python_reference(spark, strings):
    rows = spark.createDataFrame([(s,) for s in strings], "s STRING").select(
        "s", F.expr(deletion_keys("s")).alias("ks")
    ).collect()
    for r in rows:
        assert set(r["ks"]) == _py_keys(r["s"]), r["s"]


@settings(
    max_examples=_EXAMPLES or 15, deadline=None, derandomize=_DERANDOMIZE,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(strings=st.lists(st.text(_ALPHA, min_size=1, max_size=7),
                        min_size=2, max_size=25, unique=True))
def test_symmetric_delete_blocking_is_complete_at_distance_1(spark, strings):
    """Completeness: any pair within Levenshtein 1 must share a blocking
    key (the property that lets p1 skip the brute-force matrix). Checked
    with the REAL Spark expression, against a Python Levenshtein."""
    keys = {
        r["s"]: set(r["ks"])
        for r in spark.createDataFrame([(s,) for s in strings], "s STRING")
        .select("s", F.expr(deletion_keys("s")).alias("ks"))
        .collect()
    }
    for i, a in enumerate(strings):
        for b in strings[i + 1 :]:
            if _lev1(a, b):
                assert keys[a] & keys[b], (a, b)
