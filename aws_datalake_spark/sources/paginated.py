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


class _PagedReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.total = int(options.get("total_rows", 1000))
        self.page_size = int(options.get("page_size", 100))
        # S2: server-side predicate — only ACTIVE rows leave the "API"
        self.active_only = options.get("active_only", "false").lower() == "true"
        # S3: keyed scan — restrict to an id allow-list (comma list)
        keys = options.get("keys")
        self.keys: Sequence[int] | None = (
            [int(k) for k in keys.split(",")] if keys else None
        )

    def partitions(self) -> list[PageRange]:
        """One InputPartition per page: Spark schedules page fetches
        concurrently across executor slots (vs the reference's serial
        driver loop)."""
        return [
            PageRange(lo, min(lo + self.page_size, self.total))
            for lo in range(0, self.total, self.page_size)
        ]

    def read(self, partition: PageRange) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            rec = _fake_record(i)
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
    """``spark.read.format("paged_api")`` — options: total_rows,
    page_size, active_only (S2 pushdown), keys (S3 keyed scan).
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
