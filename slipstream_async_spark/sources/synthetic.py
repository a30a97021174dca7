"""Custom Python DataSource (Spark 4): a deterministic event generator,
batch + streaming.

The reference lets any async generator be a source — its cookbook wires a
streaming HTTP API (Wikipedia recent changes, docs/source/cookbook.rst:59-81)
and an interval timer (cookbook.rst:18-27) straight into handlers. The
Spark-native equivalent of "arbitrary programmatic source" is the Python
``DataSource`` API: declare schema + partitioning, and the engine
schedules reads across executors, tracks offsets, and recovers from
checkpoints — everything the reference's hand-rolled generators can't do.

This source generates a deterministic, seeded event stream (the stand-in
for an external feed in tests — swap ``_row`` for an HTTP fetch in a real
connector):

- **batch**: ``spark.read.format("synthetic_events").option("numRows", n)``
  — rows split across ``numPartitions`` independent InputPartitions; each
  partition generates exactly its slice (no driver materialization, no
  cross-partition coordination — scales to any n).
- **streaming**: ``spark.readStream.format("synthetic_events")`` — offsets
  are row indices; each micro-batch advances by ``rowsPerBatch`` up to
  ``maxRows`` (bounded so ``processAllAvailable`` terminates in tests;
  leave ``maxRows`` unset for an endless feed). Offset bookkeeping is
  Spark's: restart from a checkpoint resumes at the committed row index —
  the analog of the reference's Topic.seek (slipstream/core.py:368-423).

Register once per session::

    spark.dataSource.register(SyntheticEventsDataSource)
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_EVENT_TYPES = ("view", "click", "cart", "purchase")
_BASE_TS = datetime(2024, 1, 1)


def _mix(i: int, seed: int) -> int:
    """splitmix64-style deterministic hash of a row index."""
    z = (i + seed + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


def _row(i: int, seed: int):
    h = _mix(i, seed)
    return (
        i,
        _BASE_TS + timedelta(seconds=i),
        h % 1000,
        _EVENT_TYPES[(h >> 10) % 4],
        round(((h >> 12) % 100000) / 100.0, 2),
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _SyntheticBatchReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("numRows", 1000))
        self.parts = int(options.get("numPartitions", 8))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        step = max(1, -(-self.n // self.parts))
        return [
            _RangePartition(s, min(s + step, self.n))
            for s in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield _row(i, self.seed)


class _SyntheticStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.rows_per_batch = int(options.get("rowsPerBatch", 100))
        self.max_rows = int(options.get("maxRows", -1))
        self.parts = int(options.get("numPartitions", 4))
        self.seed = int(options.get("seed", 42))
        self._latest = 0

    def initialOffset(self):
        return {"index": 0}

    def latestOffset(self):
        self._latest += self.rows_per_batch
        if self.max_rows >= 0:
            self._latest = min(self._latest, self.max_rows)
        return {"index": self._latest}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["index"], end["index"]
        if hi <= lo:
            return [_RangePartition(lo, lo)]
        step = max(1, -(-(hi - lo) // self.parts))
        return [
            _RangePartition(s, min(s + step, hi)) for s in range(lo, hi, step)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield _row(i, self.seed)

    def commit(self, end: dict) -> None:
        pass  # offsets are self-describing; nothing external to ack

    def stop(self) -> None:
        pass


class SyntheticEventsDataSource(DataSource):
    """``format("synthetic_events")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return (
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double"
        )

    def reader(self, schema) -> DataSourceReader:
        return _SyntheticBatchReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _SyntheticStreamReader(self.options)
