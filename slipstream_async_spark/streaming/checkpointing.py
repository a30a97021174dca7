"""Checkpoint/Dependency: event-time downtime detection across streams.

Reference semantics reproduced (slipstream/checkpointing.py, fresh
implementation):

- A *dependent* stream consumes enrichment produced from one or more
  *dependency* streams. Each dependency tracks a **checkpoint marker**
  (its latest event time, via ``heartbeat``); the dependent tracks a
  **state marker** (its latest event time, via ``check_pulse``).
- **Downtime** (T2): default check ``dependent_marker -
  dependency_marker > downtime_threshold`` (reference default 10
  minutes, checkpointing.py:53, 87-111) — the dependency has fallen
  behind, so the dependent's output is being enriched with stale data.
- **Recovery** (T3): default check ``dependency_marker >
  dependent_marker`` (checkpointing.py:113-131).
- On downtime: ``downtime_callback`` fires and the dependency is marked
  down (T4's PAUSE signal — in Spark, the callback typically stops the
  dependent query or flips it to a drain mode; a stream-stream join with
  watermarks buffers automatically, making hard pause optional).
- On full recovery: ``recovery_callback`` fires (T5's RESUME +
  seek-reprocess — in Spark, restart the dependent from recorded offsets
  and let an idempotent upsert sink compact corrections; see
  StateTable.foreach_batch_upsert and A7's keep-last dedup).
- ``heartbeat`` returns late-data disposition info (T6,
  checkpointing.py:307-311) so callers can buffer or drop.
- Markers and user state persist across restarts (T7) into any
  MutableMapping — e.g. a ``StateTable`` via ``.as_mapping()`` here, the
  analog of the reference persisting into its Cache
  (checkpointing.py:69-85).

This is control-plane logic: plain driver-side Python coordinating
StreamingQueries, not a data-plane operator — mirroring the reference,
where it coordinates asyncio tasks. Wire markers from micro-batches with
``marker_tracker`` (foreachBatch helper extracting max event time).
"""

from __future__ import annotations

import json
from collections.abc import Callable, MutableMapping
from dataclasses import dataclass, field
from datetime import datetime, timedelta
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ISO = "%Y-%m-%dT%H:%M:%S.%f"


def _dt_to_s(d) -> Any:
    """Markers are usually datetimes but may be any comparable value when
    custom checks are supplied; only datetimes need string encoding."""
    return d.strftime(_ISO) if isinstance(d, datetime) else d


def _s_to_dt(s) -> Any:
    if isinstance(s, str):
        try:
            return datetime.strptime(s, _ISO)
        except ValueError:
            return s
    return s


@dataclass
class Dependency:
    """One upstream stream the dependent relies on.

    ``downtime_check`` / ``recovery_check`` override the default
    event-time comparisons; both receive (dependent_marker,
    dependency_marker, threshold) and return the downtime amount (a
    timedelta, falsy when healthy) / a bool respectively.
    """

    name: str
    downtime_threshold: timedelta = timedelta(minutes=10)
    downtime_check: Callable[..., timedelta | None] | None = None
    recovery_check: Callable[..., bool] | None = None
    is_down: bool = False
    checkpoint_marker: datetime | None = None
    checkpoint_state: dict[str, Any] = field(default_factory=dict)

    def _check_downtime(self, dependent_marker: datetime) -> timedelta | None:
        if self.checkpoint_marker is None:
            return None
        if self.downtime_check is not None:
            return self.downtime_check(
                dependent_marker, self.checkpoint_marker, self.downtime_threshold
            )
        if not isinstance(dependent_marker, datetime):
            raise TypeError(
                "default downtime check requires datetime markers; "
                "pass a custom downtime_check for other marker types"
            )
        lag = dependent_marker - self.checkpoint_marker
        return lag if lag > self.downtime_threshold else None

    def _check_recovery(self, dependent_marker: datetime | None) -> bool:
        if self.checkpoint_marker is None or dependent_marker is None:
            return False
        if self.recovery_check is not None:
            return self.recovery_check(dependent_marker, self.checkpoint_marker)
        if not isinstance(dependent_marker, datetime):
            raise TypeError(
                "default recovery check requires datetime markers; "
                "pass a custom recovery_check for other marker types"
            )
        return self.checkpoint_marker > dependent_marker


class Checkpoint:
    """Tracks one dependent stream against its dependencies."""

    def __init__(
        self,
        name: str,
        dependencies: list[Dependency],
        store: MutableMapping[str, str] | None = None,
        downtime_callback: Callable[["Checkpoint", Dependency], None] | None = None,
        recovery_callback: Callable[["Checkpoint", Dependency], None] | None = None,
    ):
        self.name = name
        self.dependencies = {d.name: d for d in dependencies}
        self.store = store if store is not None else {}
        self.downtime_callback = downtime_callback
        self.recovery_callback = recovery_callback
        self.state_marker: datetime | None = None
        self.state: dict[str, Any] = {}
        self._load()

    # -- persistence (T7) ---------------------------------------------------

    def _key(self, *parts: str) -> str:
        return ":".join(("_checkpoint", self.name) + parts)

    def _load(self) -> None:
        raw = self.store.get(self._key("state"))
        if raw:
            doc = json.loads(raw)
            self.state_marker = _s_to_dt(doc.get("marker"))
            self.state = doc.get("state", {})
        for dep in self.dependencies.values():
            raw = self.store.get(self._key("dep", dep.name))
            if raw:
                doc = json.loads(raw)
                dep.checkpoint_marker = _s_to_dt(doc.get("marker"))
                dep.checkpoint_state = doc.get("state", {})
                dep.is_down = doc.get("is_down", False)

    def _save_state(self) -> None:
        self.store[self._key("state")] = json.dumps(
            {"marker": _dt_to_s(self.state_marker), "state": self.state},
            default=str,
        )

    def _save_dep(self, dep: Dependency) -> None:
        self.store[self._key("dep", dep.name)] = json.dumps(
            {
                "marker": _dt_to_s(dep.checkpoint_marker),
                "state": dep.checkpoint_state,
                "is_down": dep.is_down,
            },
            default=str,
        )

    # -- the two verbs ------------------------------------------------------

    def _resolve(self, dependency: str | None) -> Dependency:
        if dependency is not None:
            return self.dependencies[dependency]
        if len(self.dependencies) != 1:
            raise ValueError(
                "multiple dependencies; name which one (reference "
                "resolves the same way, checkpointing.py:275-286)"
            )
        return next(iter(self.dependencies.values()))

    def heartbeat(
        self, marker: datetime, dependency: str | None = None, **state: Any
    ) -> dict[str, Any]:
        """Dependency produced an event at ``marker``: persist its
        checkpoint; if it was down and has caught up, mark it up and —
        once ALL dependencies are up — fire ``recovery_callback``.
        Returns late-data info (T6): whether the dependent has already
        processed past this marker.
        """
        dep = self._resolve(dependency)
        dep.checkpoint_marker = marker
        dep.checkpoint_state.update(state)
        if dep.is_down and dep._check_recovery(self.state_marker):
            dep.is_down = False
            if all(not d.is_down for d in self.dependencies.values()):
                if self.recovery_callback:
                    self.recovery_callback(self, dep)
        self._save_dep(dep)
        is_late = (
            self.state_marker is not None
            and isinstance(marker, datetime)
            and marker < self.state_marker
        )
        return {
            "is_late": is_late,
            "dependent_marker": self.state_marker,
            "dependency_marker": marker,
        }

    def check_pulse(self, marker: datetime, **state: Any) -> timedelta | None:
        """Dependent produced an event at ``marker``: persist dependent
        state (e.g. source offsets for seek-reprocess, T5); check every
        dependency for downtime; fire ``downtime_callback`` on a fresh
        detection. Returns the largest detected downtime, else None.
        """
        self.state_marker = marker
        self.state.update(state)
        self._save_state()
        worst: timedelta | None = None
        for dep in self.dependencies.values():
            if dep.checkpoint_marker is None:
                # First pulse bootstrap: assume the dependency is aligned
                # with the dependent (checkpointing.py:336-343).
                dep.checkpoint_marker = marker
                self._save_dep(dep)
                continue
            downtime = dep._check_downtime(marker)
            if downtime:
                if not dep.is_down:
                    dep.is_down = True
                    self._save_dep(dep)
                    if self.downtime_callback:
                        self.downtime_callback(self, dep)
                if worst is None or downtime > worst:
                    worst = downtime
        return worst


def max_event_time(df: DataFrame, ts_col: str = "ts") -> datetime | None:
    """Max event time of a (micro-)batch — the marker feed."""
    row = df.agg(F.max(ts_col).alias("m")).collect()[0]
    return row["m"]


def marker_tracker(
    checkpoint: Checkpoint,
    role: str,
    ts_col: str = "ts",
    dependency: str | None = None,
):
    """foreachBatch hook: feed each micro-batch's max event time into the
    checkpoint as heartbeat (role='dependency') or check_pulse
    (role='dependent'). Compose with other sinks inside one foreachBatch
    for sink+monitor flows.
    """
    if role not in ("dependency", "dependent"):
        raise ValueError("role must be dependency|dependent")

    def hook(batch_df: DataFrame, epoch_id: int) -> None:
        marker = max_event_time(batch_df, ts_col)
        if marker is None:
            return
        if role == "dependency":
            checkpoint.heartbeat(marker, dependency=dependency)
        else:
            checkpoint.check_pulse(marker, epoch_id=epoch_id)

    return hook


def pausing_foreach_batch(
    checkpoint: Checkpoint,
    sink: Callable[[DataFrame, int], None],
    poll_interval: float = 0.1,
    max_wait: float = 30.0,
    on_timeout: str = "raise",
) -> Callable[[DataFrame, int], None]:
    """T4's hard PAUSE, Spark-native: wrap a foreachBatch sink so the
    dependent query BLOCKS at the micro-batch boundary while any
    dependency is marked down, and resumes the moment recovery flips it
    back up.

    The reference pauses its Kafka consumer in-place on ``Signal.PAUSE``
    (slipstream/core.py:88-94, consumer pause/resume loop
    core.py:516-527). Structured Streaming has no mid-query pause, but
    blocking inside foreachBatch is the exact operational analog: the
    micro-batch never completes, so **no offsets are committed and no
    further batches are scheduled** — on restart or resume nothing is
    lost or skipped. The dependency's own query keeps running (separate
    StreamingQuery); its ``heartbeat`` flips ``is_down`` from another
    foreachBatch thread on the shared driver-side Checkpoint, which
    unblocks this one.

    ``max_wait`` bounds the stall (a stuck dependency must surface as a
    failure, not a silent forever-hang): ``on_timeout='raise'`` fails
    the query (supervision restarts it and it re-blocks if still down);
    ``'proceed'`` lets the batch through — the reference's
    "enrich-with-stale-then-correct" mode, paired with seek-reprocess
    on recovery (T5).
    """
    import time as _time

    if on_timeout not in ("raise", "proceed"):
        raise ValueError("on_timeout must be raise|proceed")

    def hook(batch_df: DataFrame, epoch_id: int) -> None:
        waited = 0.0
        while any(d.is_down for d in checkpoint.dependencies.values()):
            if waited >= max_wait:
                if on_timeout == "raise":
                    down = [
                        n
                        for n, d in checkpoint.dependencies.items()
                        if d.is_down
                    ]
                    raise TimeoutError(
                        f"dependencies still down after {max_wait}s: {down}"
                    )
                break
            _time.sleep(poll_interval)
            waited += poll_interval
        sink(batch_df, epoch_id)

    return hook
