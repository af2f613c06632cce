"""Per-process scratch directories with guaranteed cleanup.

Query constructors that stage fixture files (zone roundtrips, CSV/
JSON/ORC sinks, txn-table scenarios) previously called
``tempfile.mkdtemp`` directly and never removed the result, so
repeated bench/correctness runs accumulated ``/tmp/zones_*`` etc.
(ADVICE r04 item 1). All of them now allocate under ONE lazily
created per-process root that ``atexit`` removes wholesale — each
call still gets a fresh, collision-free subdirectory, but nothing
outlives the process.

The root lives in the system temp dir; cleanup is best-effort
(``ignore_errors``) because executors may still hold open handles on
interpreter teardown in pathological aborts — a re-run then reuses
nothing (fresh root per process) and the previous root is at worst
one directory, not an unbounded accumulation.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_ROOT: str | None = None


def _cleanup() -> None:
    global _ROOT
    if _ROOT is not None:
        shutil.rmtree(_ROOT, ignore_errors=True)
        _ROOT = None


def scratch_root() -> str:
    """The per-process scratch root (created on first use, removed
    at interpreter exit)."""
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="adls_scratch_")
        atexit.register(_cleanup)
    return _ROOT


def scratch_dir(prefix: str = "d_") -> str:
    """A fresh subdirectory under :func:`scratch_root` — drop-in for
    ``tempfile.mkdtemp(prefix=...)`` minus the leak."""
    return tempfile.mkdtemp(prefix=prefix, dir=scratch_root())
