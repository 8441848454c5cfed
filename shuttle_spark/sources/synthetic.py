"""Custom Python DataSource: deterministic synthetic event generator.

The reference extends storage through a FileSystem SPI loaded by
ServiceLoader (/root/reference/src/main/java/com/oppo/shuttle/rss/storage/fs/
FileSystem.java:30-110); Spark 4's Python DataSource API is the engine-side
twin of that extension point — this module registers ``synthetic_events`` as
a first-class format usable from both ``spark.read`` and
``spark.readStream``:

    register(spark)
    df = spark.read.format("synthetic_events").option("rows", 100000).load()
    s  = spark.readStream.format("synthetic_events").load()

Rows are a pure function of event_id (splitmix64 bit mixing), so any
(rows, users, partitions) configuration is bit-reproducible across runs,
executors and batch/stream — which is what makes the source usable in
correctness harnesses, not just demos.  Batch reads split the id range into
``partitions`` independent InputPartitions (real scan parallelism);
streaming emits ``rows_per_batch`` ids per micro-batch with replayable
offsets (start/end id), so recovery re-reads identical data — the
exactly-once contract the reference implements with attempt lineage.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator, Sequence

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

SCHEMA = (
    "event_id bigint, user_id bigint, event_type string, ts timestamp,"
    " value double"
)

_EVENT_TYPES = ("view", "click", "purchase", "signup", "error")
_EPOCH = dt.datetime(2024, 1, 1)


def _mix64(x: int) -> int:
    """splitmix64 finalizer — cheap, high-quality, dependency-free."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def _row(event_id: int, users: int) -> tuple:
    h = _mix64(event_id)
    return (
        event_id,
        h % users,
        _EVENT_TYPES[(h >> 8) % len(_EVENT_TYPES)],
        _EPOCH + dt.timedelta(seconds=event_id * 7 + (h >> 16) % 7),
        round(((h >> 24) % 100_000) / 100.0, 2),
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int, users: int):
        self.start, self.end, self.users = start, end, users


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 10_000))
        self.users = int(options.get("users", 100))
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self) -> Sequence[InputPartition]:
        step = max(1, self.rows // self.n_parts)
        bounds = list(range(0, self.rows, step)) + [self.rows]
        return [
            _RangePartition(a, b, self.users)
            for a, b in zip(bounds, bounds[1:])
            if a < b
        ]

    def read(self, part: _RangePartition) -> Iterator[tuple]:
        for i in range(part.start, part.end):
            yield _row(i, part.users)


class _StreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.users = int(options.get("users", 100))
        self.rows_per_batch = int(options.get("rows_per_batch", 1000))
        self.max_rows = int(options.get("max_rows", 10_000))
        self._emitted = 0

    def initialOffset(self) -> dict:
        return {"id": 0}

    def latestOffset(self) -> dict:
        self._emitted = min(self._emitted + self.rows_per_batch, self.max_rows)
        return {"id": self._emitted}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        return [_RangePartition(start["id"], end["id"], self.users)]

    def read(self, part: _RangePartition) -> Iterator[tuple]:
        for i in range(part.start, part.end):
            yield _row(i, part.users)

    def commit(self, end: dict) -> None:
        pass  # offsets are pure id ranges; nothing to clean up


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> _BatchReader:
        return _BatchReader(self.options)

    def streamReader(self, schema) -> _StreamReader:
        return _StreamReader(self.options)


def register(spark: SparkSession) -> None:
    """Idempotently register the format with this session."""
    spark.dataSource.register(SyntheticEventsDataSource)
