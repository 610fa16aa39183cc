"""Session-scoped scratch directories for roundtrip/sink operators.

The roundtrip queries (CSV/JSON/ORC/text roundtrips, partitioned and
compacted sinks, corrupt-JSON and schema-evolution ingests, streaming
file sources/sinks and checkpoints) write files and return DataFrames
that READ those files back, so a ``try/finally rmtree`` inside the query
would delete data the caller's action still needs. Instead every scratch
dir lives under ONE per-process root that is

* **generation-numbered per call site** — ``scratch_dir(tag)`` returns a
  FRESH ``<root>/<tag>/g<seq>`` directory each call, so a lazy DataFrame
  returned by call N keeps reading valid files even after call N+1 of the
  same query rewrites its inputs (the hazard a wipe-in-place had:
  holding one roundtrip result across a re-run of the same query raised
  FileNotFoundException or silently read rewritten data). Fresh
  generations also keep streaming checkpoints fresh — a reused
  checkpoint dir would make a re-run resume the previous run's state;
* **bounded in occupancy** — only the last :data:`KEEP_GENERATIONS`
  generations of each tag survive; older ones are pruned LAGGED (call
  N deletes generation N-KEEP), which preserves the call-then-act
  contract for any result the caller still holds from the recent past
  while a long sweep loop (benchmark series, 200-key full-surface runs)
  stays at O(KEEP) disk instead of accumulating every generation;
* **removed at interpreter exit** via ``atexit`` — the process that
  created the data is the only consumer (single-node roundtrip checks;
  a cluster deployment would point these at a real warehouse path).

Contract: a DataFrame produced from generation N stays actionable while
at most ``KEEP_GENERATIONS - 1`` further calls of the same tag happen.
Sequential harness use (call → act → next call) never comes close.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_ROOT: str | None = None
_SEQ: dict[str, int] = {}

# Generations of one tag kept on disk simultaneously. 4 covers every real
# caller (the bench warm-up + 3 timed series hold at most one prior lazy
# result; pytest/sweeps act immediately) with bounded footprint.
KEEP_GENERATIONS = 4


def scratch_dir(tag: str) -> str:
    """A fresh scratch directory for ``tag`` (new generation per call)."""
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="rsbd_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    seq = _SEQ.get(tag, 0)
    _SEQ[tag] = seq + 1
    path = os.path.join(_ROOT, tag, f"g{seq:05d}")
    # Lagged prune: the generation KEEP_GENERATIONS behind this one can no
    # longer be referenced under the documented contract.
    stale = seq - KEEP_GENERATIONS
    if stale >= 0:
        shutil.rmtree(
            os.path.join(_ROOT, tag, f"g{stale:05d}"), ignore_errors=True
        )
    os.makedirs(path)
    return path
