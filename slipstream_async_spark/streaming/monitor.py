"""Stream health monitoring on StreamingQueryListener — the engine-level
observability layer of the Checkpoint/Dependency semantics.

Reference mapping (SURVEY §2.7):

- T2/T3 downtime + recovery detection: the reference compares event-time
  markers inside handler code (slipstream/checkpointing.py:87-131); here
  the same thresholding runs on query-progress events — no user code in
  the data path. (The data-plane form, markers persisted through a
  StateTable, is ``checkpointing.Checkpoint``; this monitor is the
  control-plane complement.)
- T6 late-data disposition: the reference surfaces ``is_late`` for
  buffer-or-drop decisions (checkpointing.py:307-311); Spark drops
  late rows at the watermark and reports them per batch —
  ``numRowsDroppedByWatermark`` is aggregated here.
- T9 exit hooks: the reference awaits registered hooks at shutdown
  (slipstream/core.py:189-216); ``on_terminated`` callbacks fire from
  onQueryTerminated, including the exception for non-clean exits.

Listener events arrive on a background thread: state is guarded by a
lock, and tests must poll (``wait_until``) rather than assert
immediately after an action.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from datetime import datetime, timedelta
from typing import Callable

from pyspark.sql.streaming.listener import StreamingQueryListener


@dataclass
class QueryHealth:
    """Rolling health snapshot of one streaming query."""

    name: str | None = None
    run_id: str | None = None
    n_progress: int = 0
    input_rows: int = 0
    dropped_by_watermark: int = 0
    watermark: datetime | None = None
    max_event_time: datetime | None = None
    last_progress_wall: float = 0.0
    is_down: bool = False
    terminated: bool = False
    exception: str | None = None
    state_rows: int = field(default=0)


def _parse_event_ts(s: str | None) -> datetime | None:
    if not s:
        return None
    try:
        return datetime.strptime(s, "%Y-%m-%dT%H:%M:%S.%fZ")
    except ValueError:
        try:
            return datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ")
        except ValueError:
            return None


class StreamHealthMonitor(StreamingQueryListener):
    """Register with ``spark.streams.addListener(monitor)``; query health
    is then observable without touching any query's plan.

    ``downtime_threshold``: max event-time lag (watermark vs the newest
    event time seen across ALL monitored queries) before a query is
    flagged down and ``on_downtime`` fires; recovery fires
    ``on_recovery`` — the reference's default check pair
    (checkpointing.py:87-131) at the engine level.
    """

    def __init__(
        self,
        downtime_threshold: timedelta = timedelta(minutes=10),
        on_downtime: Callable[[str, timedelta], None] | None = None,
        on_recovery: Callable[[str], None] | None = None,
        on_terminated: Callable[[str, str | None], None] | None = None,
    ) -> None:
        self._lock = threading.Lock()
        self._health: dict[str, QueryHealth] = {}
        self.downtime_threshold = downtime_threshold
        self.on_downtime = on_downtime
        self.on_recovery = on_recovery
        self.on_terminated = on_terminated

    # -- listener callbacks (background thread) ---------------------------

    def onQueryStarted(self, event) -> None:
        with self._lock:
            self._health[str(event.id)] = QueryHealth(
                name=event.name, run_id=str(event.runId)
            )

    def onQueryProgress(self, event) -> None:
        p = event.progress
        qid = str(p.id)
        with self._lock:
            h = self._health.setdefault(qid, QueryHealth(name=p.name))
            h.n_progress += 1
            h.input_rows += int(p.numInputRows or 0)
            h.last_progress_wall = time.time()
            et = p.eventTime or {}
            wm = _parse_event_ts(et.get("watermark"))
            mx = _parse_event_ts(et.get("max"))
            if wm is not None:
                h.watermark = wm
            if mx is not None and (
                h.max_event_time is None or mx > h.max_event_time
            ):
                h.max_event_time = mx
            rows_total = 0
            for so in p.stateOperators or []:
                h.dropped_by_watermark += int(
                    getattr(so, "numRowsDroppedByWatermark", 0) or 0
                )
                rows_total += int(getattr(so, "numRowsTotal", 0) or 0)
            if p.stateOperators:
                h.state_rows = rows_total
            fire = self._check_health_locked()
        self._fire(fire)

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing
        pass

    def onQueryTerminated(self, event) -> None:
        qid = str(event.id)
        with self._lock:
            h = self._health.setdefault(qid, QueryHealth())
            h.terminated = True
            h.exception = event.exception
            cb = self.on_terminated
        if cb:
            cb(qid, event.exception)

    # -- health logic ------------------------------------------------------

    def _check_health_locked(self, now: float | None = None) -> list:
        """T2/T3 state transitions. A query is down when EITHER its
        event-time frontier lags the global frontier beyond the
        threshold (relative check — needs a second live query) OR its
        own wall clock has been silent longer than the threshold
        (absolute check — catches the single-query 'source went dead'
        case). Returns the callbacks to fire; the CALLER must invoke
        them after releasing the lock (user callbacks may re-enter
        snapshot()/wait_until(), and the lock is not reentrant)."""
        to_fire: list = []
        frontiers = [
            h.max_event_time
            for h in self._health.values()
            if h.max_event_time is not None and not h.terminated
        ]
        global_frontier = max(frontiers) if frontiers else None
        for qid, h in self._health.items():
            if h.terminated:
                continue
            lag = timedelta(0)
            if global_frontier is not None and h.max_event_time is not None:
                lag = global_frontier - h.max_event_time
            if now is not None and h.last_progress_wall:
                wall_lag = timedelta(seconds=now - h.last_progress_wall)
                lag = max(lag, wall_lag)
            if not h.is_down and lag > self.downtime_threshold:
                h.is_down = True
                if self.on_downtime:
                    to_fire.append((self.on_downtime, (qid, lag)))
            elif h.is_down and lag <= self.downtime_threshold:
                h.is_down = False
                if self.on_recovery:
                    to_fire.append((self.on_recovery, (qid,)))
        return to_fire

    def _fire(self, callbacks: list) -> None:
        for cb, args in callbacks:
            cb(*args)

    def check_now(self) -> None:
        """Wall-clock health sweep — call from a timer/poll loop to catch
        queries that stopped producing progress events entirely (no
        event, no relative check). Fires the same callbacks."""
        with self._lock:
            fire = self._check_health_locked(now=time.time())
        self._fire(fire)

    # -- inspection --------------------------------------------------------

    def snapshot(self) -> dict[str, QueryHealth]:
        with self._lock:
            return {
                k: QueryHealth(**vars(v)) for k, v in self._health.items()
            }

    def wait_until(
        self, predicate: Callable[[dict[str, QueryHealth]], bool],
        timeout: float = 30.0, poll: float = 0.2,
    ) -> bool:
        """Poll ``snapshot()`` until ``predicate`` holds (listener events
        are asynchronous); returns False on timeout."""
        deadline = time.time() + timeout
        while time.time() < deadline:
            if predicate(self.snapshot()):
                return True
            time.sleep(poll)
        return False
