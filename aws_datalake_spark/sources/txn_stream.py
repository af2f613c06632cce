"""`spark.read/readStream.format("txn_table")` — the transaction-log
table (sources/txn_table.py) surfaced as a real Spark DataSource
(pyspark 4 Python DataSource API), closing the loop: a table written
by `stream_append_sink` is itself a streaming source.

Streaming semantics mirror Delta's: the OFFSET is the committed
version, so each micro-batch is exactly the rows of a commit range —
`readBetweenOffsets` replays a checkpointed range bit-for-bit
(exactly-once into an idempotent sink). Append commits stream their
added rows; data-CHANGING commits (merge / delete / overwrite) are
skipped under `skip_change_commits=true` (the default, matching
Delta's skipChangeCommits) and raise otherwise; layout-only rewrites
(compact / zorder) are always skipped — their added files carry no
new rows, streaming them would duplicate.

Scale posture: planning reads only the log (no LIST); the batch
reader plans ONE InputPartition PER DATA FILE, so a snapshot scan
parallelizes across executors; per-partition reads are pyarrow
(Arrow-native, no JVM round trip in the Python worker).
"""

from __future__ import annotations

import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from aws_datalake_spark.sources import txn_table as tt

_CHANGE_OPS = {"merge", "delete", "overwrite"}
_LAYOUT_OPS = {"compact", "zorder"}


def _root(options: dict) -> str:
    root = options.get("path") or options.get("root")
    if not root:
        raise ValueError("txn_table source: pass .load(<table root>)")
    return root


def _ddl_schema(root: str) -> str:
    fields = tt.table_schema(root)
    if fields is None:
        raise ValueError(
            f"txn_table source: {root!r} has no logged schema "
            "(write at least one commit first)"
        )
    return ", ".join(f"`{n}` {t}" for n, t in fields)


def _file_rows(path: str, cols: list[str]) -> Iterator[tuple]:
    import pyarrow.parquet as pq

    tbl = pq.read_table(path)
    present = set(tbl.column_names)
    data = [
        tbl.column(c).to_pylist() if c in present else [None] * tbl.num_rows
        for c in cols
    ]
    return zip(*data) if data else iter(())


class _FilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class _TxnBatchReader(DataSourceReader):
    """Snapshot scan: one partition per live data file (file list
    from the log, never a directory LIST)."""

    def __init__(self, options: dict) -> None:
        self.root = _root(options)
        version = options.get("version")
        snap = tt.snapshot(self.root, int(version) if version else None)
        self.files = sorted(snap["files"])
        self.cols = [n for n, _ in tt.table_schema(self.root)]

    def partitions(self) -> list[_FilePartition]:
        return [
            _FilePartition(os.path.join(self.root, f)) for f in self.files
        ] or [_FilePartition("")]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        if not partition.path:
            return iter(())
        return _file_rows(partition.path, self.cols)


class _TxnStreamReader(SimpleDataSourceStreamReader):
    """Version-offset micro-batches over the commit log."""

    def __init__(self, options: dict) -> None:
        self.root = _root(options)
        self.skip_changes = (
            str(options.get("skip_change_commits", "true")).lower() == "true"
        )
        self.start_version = int(options.get("start_version", 0))
        self.cols = [n for n, _ in tt.table_schema(self.root)]

    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        latest = tt.snapshot(self.root)["version"]
        s = int(start["version"])
        if latest <= s:
            return iter(()), {"version": s}
        # materialized list: the Simple stream reader API pickles the
        # returned rows (driver-fed micro-batches by design; a
        # partition-planning DataSourceStreamReader is the upgrade
        # path if commit batches outgrow the driver)
        return iter(list(self._rows(s, latest))), {"version": latest}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter(list(self._rows(int(start["version"]), int(end["version"])))) 

    def _rows(self, s: int, e: int) -> Iterator[tuple]:
        for v in tt._list_versions(self.root):
            if not (s < v <= e):
                continue
            commit = tt._read_commit(self.root, v)
            op = commit.get("op", "?")
            if op in _LAYOUT_OPS:
                continue  # same rows, new layout: streaming would dup
            if op in _CHANGE_OPS:
                if self.skip_changes:
                    continue
                raise RuntimeError(
                    f"txn_table stream: commit v{v} is a data-changing "
                    f"{op!r}; set skip_change_commits=true to skip (Delta "
                    "skipChangeCommits semantics) or restream the snapshot"
                )
            for add in commit.get("add", []):
                yield from _file_rows(
                    os.path.join(self.root, add["path"]), self.cols
                )


class TxnTableDataSource(DataSource):
    """Batch: ``spark.read.format("txn_table").load(root)`` (option
    ``version`` for time travel). Stream: ``spark.readStream.format(
    "txn_table").load(root)`` (options ``start_version``,
    ``skip_change_commits``)."""

    @classmethod
    def name(cls) -> str:
        return "txn_table"

    def schema(self) -> str:
        return _ddl_schema(_root(self.options))

    def reader(self, schema) -> _TxnBatchReader:
        return _TxnBatchReader(self.options)

    def simpleStreamReader(self, schema) -> _TxnStreamReader:
        return _TxnStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(TxnTableDataSource)
