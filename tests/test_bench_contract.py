"""Printed-line budget for the bench driver contract.

The round driver captures only a bounded tail (~2000 chars observed) of
bench stdout and parses the JSON metric line out of it. Rounds 9 and 10
shipped a line longer than that (the raw ``runs`` series rode along) and
the driver recorded ``"parsed": null`` — no bench numbers at all. These
tests pin the worst-case printed-line length well under the observed
capture so adding headline queries can't silently re-break the parse.
"""

from __future__ import annotations

import json

import bench

# Observed driver tail capture is 2000 chars (BENCH_r01..r10.json all have
# len(tail) <= 2000); keep headroom for a few extra queries per round.
_LINE_BUDGET = 1800


def _worst_case_payload() -> dict:
    # Widest realistic rendering: every median "999.999" (7 chars), every
    # subtotal too.
    medians = {name: 999.999 for name in bench.HEADLINE}
    return {
        "metric": "headline_wall_sec",
        "value": 99999.999,
        "unit": "sec",
        "queries": medians,
        "sf": 1000.0,
        "r3_comparable_7q_sec": 99999.999,
        "r6_comparable_10q_sec": 99999.999,
        "r8_comparable_11q_sec": 99999.999,
        "r9_comparable_12q_sec": 99999.999,
        "r9_comparable_13q_sec": 99999.999,
        "r9_comparable_14q_sec": 99999.999,
        "r9_comparable_15q_sec": 99999.999,
        "r10_comparable_16q_sec": 99999.999,
    }


def test_printed_line_fits_driver_tail_capture():
    line = json.dumps(_worst_case_payload())
    assert len(line) <= _LINE_BUDGET, (
        f"bench JSON line would be {len(line)} chars; the driver only "
        f"captures ~2000 and rounds 9-10 lost their bench numbers this way. "
        f"Move detail to the runs sidecar, not stdout."
    )


def test_runs_not_in_printed_payload():
    # The raw series must never ride the printed line again.
    assert "runs" not in _worst_case_payload()
    src = open(bench.__file__).read()
    # The only json.dumps printed must be the compact payload.
    assert 'print(json.dumps(payload))' in src
