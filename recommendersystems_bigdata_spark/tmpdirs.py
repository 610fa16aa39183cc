"""Session-scoped scratch directories for roundtrip/sink operators.

The roundtrip queries (CSV/JSON/ORC/text roundtrips, partitioned and
compacted sinks, corrupt-JSON and schema-evolution ingests, streaming
file sources/sinks and checkpoints) write files and return DataFrames
that READ those files back, so a ``try/finally rmtree`` inside the query
would delete data the caller's action still needs. Instead every scratch
dir lives under ONE per-process root that is

* **reused per call site** — ``scratch_dir(tag)`` returns the same path
  for the same tag, recreated empty, so repeated calls in a long session
  (benchmark loops, full-surface sweeps) overwrite instead of
  accumulating dozens of ``rsbd_*`` orphans under ``/tmp``; wiping also
  keeps streaming checkpoints fresh — a stale checkpoint would otherwise
  make a re-run resume someone else's state;
* **removed at interpreter exit** via ``atexit`` — the process that
  created the data is the only consumer (single-node roundtrip checks;
  a cluster deployment would point these at a real warehouse path).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_ROOT: str | None = None


def scratch_dir(tag: str) -> str:
    """A stable scratch directory for ``tag``, recreated EMPTY each call."""
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="rsbd_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    path = os.path.join(_ROOT, tag)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    return path
