"""Paginated-API source (SURVEY.md S1-S3) as a real Spark DataSource.

The reference fetches GAM pages in a driver-side offset/limit loop
(/root/reference/ingestion.py:259-272) and a keyed two-phase scan
(/root/reference/ingestion.py:189-223). The Spark-native shape is a
custom Python DataSource (pyspark 4 `spark.dataSource.register`):
each page range is an InputPartition, so pages download in PARALLEL
across executors instead of serially on the driver, and a source-side
predicate (the reference's PQL ``WHERE endDateTime > :now``,
ingestion.py:144-179 — S2) is applied at fetch time so filtered rows
never cross the wire.

The remote service is simulated deterministically (this container has
no network); the Spark plumbing — schema, options, partition planning,
per-partition iterators — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


def _fake_record(i: int) -> tuple[int, str, str, int]:
    """Deterministic stand-in for one remote API record."""
    h = hashlib.md5(f"api|{i}".encode()).hexdigest()
    return (i, f"entity_{h[:8]}", "ACTIVE" if i % 3 else "PAUSED", int(h[:6], 16))


class PageRange(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


def _file_record(custkey: int, name: str, acctbal: float) -> tuple[int, str, str, int]:
    """API record served by the file-backed fixture service: maps a
    customer row onto the API's (id, name, status, metric) shape —
    status plays the reference's entity-state field, metric is the
    balance in integer cents (half-away rounding, matching SQL
    ROUND; the doubles are exact 2-dp values so the product sits
    within float error of an integer)."""
    cents = int(acctbal * 100 + (0.5 if acctbal >= 0 else -0.5))
    return (custkey, name, "ACTIVE" if acctbal >= 0 else "PAUSED", cents)


class _PagedReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        # file-backed fixture mode (option `path`): the "remote API"
        # serves pages of a parquet table, so the scan is
        # oracle-checkable with plain SQL over the same table; without
        # `path` the md5-synth mode below stands in
        self.path = options.get("path")
        self.total = int(options.get("total_rows", 1000))
        self.page_size = int(options.get("page_size", 100))
        self.pages_target = int(options.get("pages_target", 0))
        # S2: server-side predicate — only ACTIVE rows leave the "API"
        self.active_only = options.get("active_only", "false").lower() == "true"
        # S3: keyed scan — restrict to an id allow-list (comma list)
        keys = options.get("keys")
        self.keys: Sequence[int] | None = (
            [int(k) for k in keys.split(",")] if keys else None
        )

    def _n_rows(self) -> int:
        if self.path is None:
            return self.total
        import pyarrow.parquet as pq

        # footer metadata only — no data read at planning time
        return pq.ParquetFile(self.path).metadata.num_rows

    def partitions(self) -> list[PageRange]:
        """One InputPartition per page: Spark schedules page fetches
        concurrently across executor slots (vs the reference's serial
        driver loop). With ``pages_target`` the page size grows with
        the table so the page COUNT stays ~target (a few × cores) at
        any SF — thousands of sub-second Python partitions would be
        pure scheduler overhead; ``page_size`` remains the floor."""
        total = self._n_rows()
        page = self.page_size
        if self.pages_target:
            page = max(page, -(-total // self.pages_target))
        return [
            PageRange(lo, min(lo + page, total))
            for lo in range(0, total, page)
        ]

    def _page(self, start: int, end: int) -> Iterator[tuple]:
        """The fixture service's page fetch. File mode reads ONLY the
        row groups overlapping [start, end) — row-group row counts
        come from footer metadata, so a page fetch decodes data
        proportional to its page (+ at most one row group of
        overhang), not the whole file; a stand-in for an HTTP
        offset/limit fetch."""
        if self.path is None:
            for i in range(start, end):
                yield _fake_record(i)
            return
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(self.path)
        cols = ["c_custkey", "c_name", "c_acctbal"]
        rg_lo = 0
        for g in range(pf.metadata.num_row_groups):
            rg_hi = rg_lo + pf.metadata.row_group(g).num_rows
            if rg_hi > start and rg_lo < end:
                tbl = pf.read_row_group(g, columns=cols)
                sl = tbl.slice(
                    max(0, start - rg_lo),
                    min(end, rg_hi) - max(start, rg_lo),
                )
                for k, n, b in zip(
                    sl.column(0).to_pylist(),
                    sl.column(1).to_pylist(),
                    sl.column(2).to_pylist(),
                ):
                    yield _file_record(k, n, b)
            rg_lo = rg_hi
            if rg_lo >= end:
                break

    def read(self, partition: PageRange) -> Iterator[tuple]:
        for rec in self._page(partition.start, partition.end):
            if self.active_only and rec[2] != "ACTIVE":
                continue
            if self.keys is not None and rec[0] not in self.keys:
                continue
            yield rec


class _PagedStreamReader(SimpleDataSourceStreamReader):
    """Streaming form of the paginated scan: the reference polls the
    API daily in a cron loop (ingestion.py:228-233 date-driven runs);
    the Spark-native shape is a streaming source whose OFFSET is the
    API cursor position. Each micro-batch reads the next page window;
    `readBetweenOffsets` replays a committed range exactly, so
    checkpoint recovery re-fetches precisely the in-flight pages —
    exactly-once into an idempotent sink."""

    def __init__(self, options: dict) -> None:
        self.total = int(options.get("total_rows", 1000))
        self.batch_rows = int(options.get("rows_per_batch", 100))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        pos = int(start["pos"])
        end = min(pos + self.batch_rows, self.total)
        return iter([_fake_record(i) for i in range(pos, end)]), {"pos": end}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter([_fake_record(i) for i in range(int(start["pos"]), int(end["pos"]))])


class PaginatedApiDataSource(DataSource):
    """``spark.read.format("paged_api")`` — options: path (file-backed
    fixture service over a parquet table; omitted → md5 synth),
    total_rows, page_size, active_only (S2 pushdown), keys (S3 keyed
    scan).
    ``spark.readStream.format("paged_api")`` — options: total_rows,
    rows_per_batch (cursor-offset micro-batches)."""

    @classmethod
    def name(cls) -> str:
        return "paged_api"

    def schema(self) -> StructType:
        return StructType(
            [
                StructField("id", LongType()),
                StructField("name", StringType()),
                StructField("status", StringType()),
                StructField("metric", LongType()),
            ]
        )

    def reader(self, schema: StructType) -> _PagedReader:
        return _PagedReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> _PagedStreamReader:
        return _PagedStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(PaginatedApiDataSource)
