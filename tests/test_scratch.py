"""Scratch-dir lifecycle (ADVICE r04 item 1): fixture temp dirs must
collect under one per-process root that is removed at exit, instead
of leaking a /tmp/zones_* per query construction."""

from __future__ import annotations

import os

from aws_datalake_spark import scratch


def test_scratch_dirs_nest_under_one_root_and_cleanup_removes_all():
    a = scratch.scratch_dir(prefix="zones_")
    b = scratch.scratch_dir(prefix="zones_")
    root = scratch.scratch_root()
    assert a != b
    assert os.path.dirname(a) == root and os.path.dirname(b) == root
    assert os.path.isdir(a) and os.path.isdir(b)
    scratch._cleanup()
    assert not os.path.exists(root)
    # root regenerates lazily after cleanup (fresh path, still works)
    c = scratch.scratch_dir()
    assert os.path.isdir(c) and os.path.dirname(c) == scratch.scratch_root()


def test_no_raw_mkdtemp_left_in_query_modules():
    """Pin the fix: no query module may call tempfile.mkdtemp
    directly — everything goes through scratch_dir."""
    import pathlib

    import aws_datalake_spark.queries as q

    pkg = pathlib.Path(q.__file__).parent
    offenders = [
        p.name
        for p in pkg.glob("*.py")
        if "mkdtemp" in p.read_text()
    ]
    assert offenders == []
