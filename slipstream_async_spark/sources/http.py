"""HTTP-polling Python DataSource (S10): batch + streaming reads over a
line-oriented HTTP endpoint.

The reference's cookbook wires a streaming HTTP API straight into a
handler as a hand-rolled async generator (docs/source/cookbook.rst:59-81
— the Wikipedia recent-changes feed). The Spark-native form is a Python
``DataSource``: the engine owns scheduling, offset tracking, and
checkpoint recovery, and the fetch runs on executors, not the driver.

Design:

- **Envelope, not parsing.** Rows are ``(seq bigint, poll bigint, body
  string)`` — one row per response line (JSON-lines friendly). Parsing
  is the caller's job via ``from_json``, exactly like the Kafka
  envelope: the source stays schema-stable no matter what the endpoint
  returns.
- **batch**: ``spark.read.format("http_poll").option("url", u)`` — one
  fetch, one partition (an HTTP body is one stream; splitting it would
  re-fetch per partition).
- **streaming**: ``spark.readStream.format("http_poll")`` — each
  micro-batch is one poll; the offset is the poll counter, so a restart
  from a checkpoint does not re-issue committed polls. ``maxPolls``
  bounds the stream so ``availableNow`` triggers terminate in tests;
  leave it unset for an endless feed.

  Exactly-once applies to poll SCHEDULING, not content: ``read()``
  fetches the live endpoint, so a task retry or a replay of a
  WAL'd-but-uncommitted batch re-fetches and can observe different
  content for the same poll offset (a live feed is not a replayable
  log). If replays must return identical rows, spool each poll's
  payload to durable storage (e.g. under the checkpoint dir) and serve
  retries from the spool — that trades a write per poll for Kafka-like
  replay stability.
- ``timeoutSec`` bounds each fetch; a failed poll raises into Spark's
  normal task-retry machinery rather than being swallowed.

Register once per session::

    spark.dataSource.register(HttpPollDataSource)

Supports any scheme ``urllib`` understands — including ``file://``,
which the tests use so no network egress is needed.
"""

from __future__ import annotations

import urllib.request

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_SCHEMA = "seq bigint, poll bigint, body string"


def _fetch_lines(url: str, timeout: float) -> list[str]:
    with urllib.request.urlopen(url, timeout=timeout) as resp:  # noqa: S310
        text = resp.read().decode("utf-8", errors="replace")
    return [ln for ln in text.splitlines() if ln.strip()]


class _PollPartition(InputPartition):
    def __init__(self, poll: int):
        self.poll = poll


class _HttpBatchReader(DataSourceReader):
    def __init__(self, options):
        self.url = options["url"]
        self.timeout = float(options.get("timeoutSec", 10))

    def partitions(self):
        return [_PollPartition(0)]

    def read(self, partition: _PollPartition):
        for i, line in enumerate(_fetch_lines(self.url, self.timeout)):
            yield (i, partition.poll, line)


class _HttpStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.url = options["url"]
        self.timeout = float(options.get("timeoutSec", 10))
        self.max_polls = int(options.get("maxPolls", -1))
        self._latest = 0

    def initialOffset(self):
        return {"poll": 0}

    def latestOffset(self):
        # Never regress below the current counter: after a checkpoint
        # restore, commit()/partitions() fast-forward _latest to the
        # committed poll, and a (possibly lowered) maxPolls cap must not
        # clamp BELOW it — a regressed offset would be written to the
        # offset log and re-issue committed polls on a later restart.
        target = self._latest + 1
        if self.max_polls >= 0:
            target = min(target, self.max_polls)
        self._latest = max(self._latest, target)
        return {"poll": self._latest}

    def partitions(self, start: dict, end: dict):
        # On restart, a FRESH reader's counter is 0 while the restored
        # checkpoint offset is ahead; fast-forward so the next
        # latestOffset() resumes from the committed poll instead of
        # re-issuing (or rewinding past) already-committed polls.
        self._latest = max(self._latest, start["poll"], end["poll"])
        # One partition per pending poll; the fetch itself runs in the
        # executor task, so the driver never touches the payload. An
        # empty range yields a no-op sentinel partition (poll=-1), NOT a
        # re-issue of an already-committed poll.
        return [_PollPartition(p) for p in range(start["poll"], end["poll"])] or [
            _PollPartition(-1)
        ]

    def commit(self, end: dict) -> None:
        self._latest = max(self._latest, end["poll"])

    def read(self, partition: _PollPartition):
        if partition.poll < 0:
            return
        for i, line in enumerate(_fetch_lines(self.url, self.timeout)):
            yield (i, partition.poll, line)

    def stop(self) -> None:
        pass


class HttpPollDataSource(DataSource):
    """``format("http_poll")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "http_poll"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _HttpBatchReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _HttpStreamReader(self.options)
