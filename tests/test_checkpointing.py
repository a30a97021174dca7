"""Checkpoint/Dependency downtime-detection semantics — the reference's
distinctive control loop (checkpointing.py), reproduced as golden
scenarios including the weather/activity downtime + recovery sequence of
its integration test (test_kafka_integration.py:128-162's narrative).
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from slipstream_async_spark.streaming.checkpointing import Checkpoint, Dependency


def t(minute: float) -> datetime:
    return datetime(2024, 1, 1, 10, 0) + timedelta(minutes=minute)


def test_downtime_detected_after_threshold():
    dep = Dependency("weather", downtime_threshold=timedelta(minutes=10))
    events = []
    cp = Checkpoint(
        "act", [dep],
        downtime_callback=lambda c, d: events.append(("down", d.name)),
        recovery_callback=lambda c, d: events.append(("up", d.name)),
    )
    # Interleaved healthy traffic: weather leads activity slightly.
    cp.heartbeat(t(0))
    assert cp.check_pulse(t(5)) is None
    cp.heartbeat(t(6))
    assert cp.check_pulse(t(11)) is None  # lag 5m < 10m
    # Weather stops; activity continues past the threshold.
    downtime = cp.check_pulse(t(17))
    assert downtime == timedelta(minutes=11)
    assert dep.is_down and events == [("down", "weather")]
    # More activity while down: no duplicate callback.
    cp.check_pulse(t(20))
    assert events == [("down", "weather")]
    # Weather returns but still behind the dependent: not recovered yet.
    cp.heartbeat(t(18))
    assert dep.is_down
    # Weather passes the dependent marker: recovery fires.
    cp.heartbeat(t(21))
    assert not dep.is_down and events[-1] == ("up", "weather")


def test_first_pulse_bootstrap():
    # checkpointing.py:336-343: first pulse aligns an unseen dependency.
    dep = Dependency("w")
    cp = Checkpoint("a", [dep])
    assert cp.check_pulse(t(0)) is None
    assert dep.checkpoint_marker == t(0)


def test_heartbeat_late_info():
    dep = Dependency("w")
    cp = Checkpoint("a", [dep])
    cp.check_pulse(t(10))
    info = cp.heartbeat(t(5))
    assert info["is_late"] is True
    assert info["dependent_marker"] == t(10)
    info = cp.heartbeat(t(12))
    assert info["is_late"] is False


def test_persistence_roundtrip():
    """T7: markers + user state survive a restart through any mapping
    store (here a dict; StateTable.as_mapping() is the durable form)."""
    store: dict[str, str] = {}
    dep = Dependency("w", downtime_threshold=timedelta(minutes=10))
    cp = Checkpoint("a", [dep], store=store)
    cp.check_pulse(t(5), offset=42)
    cp.heartbeat(t(3))
    cp.check_pulse(t(20))           # -> downtime, dep marked down
    assert dep.is_down

    dep2 = Dependency("w", downtime_threshold=timedelta(minutes=10))
    cp2 = Checkpoint("a", [dep2], store=store)
    assert cp2.state_marker == t(20)
    assert cp2.state["offset"] == 42
    assert dep2.checkpoint_marker == t(3)
    assert dep2.is_down


def test_multiple_dependencies_all_up_gate():
    """Recovery callback only fires when ALL dependencies are back up
    (checkpointing.py:290-305)."""
    d1 = Dependency("w1", downtime_threshold=timedelta(minutes=5))
    d2 = Dependency("w2", downtime_threshold=timedelta(minutes=5))
    recovered = []
    cp = Checkpoint(
        "a", [d1, d2], recovery_callback=lambda c, d: recovered.append(d.name)
    )
    cp.heartbeat(t(0), dependency="w1")
    cp.heartbeat(t(0), dependency="w2")
    cp.check_pulse(t(10))
    assert d1.is_down and d2.is_down
    cp.heartbeat(t(11), dependency="w1")   # w1 up, w2 still down
    assert not d1.is_down and recovered == []
    cp.heartbeat(t(12), dependency="w2")   # all up -> callback
    assert recovered == ["w2"]


def test_custom_checks_non_datetime_markers():
    """Offset-based markers with custom checks (the reference requires
    datetime for defaults and raises TypeError otherwise,
    checkpointing.py:97-106 — same contract here)."""
    dep = Dependency(
        "w",
        downtime_check=lambda dm, cm, th: (dm - cm) if dm - cm > 100 else None,
        recovery_check=lambda dm, cm: cm > dm,
    )
    cp = Checkpoint("a", [dep])
    cp.heartbeat(1000)
    assert cp.check_pulse(1050) is None
    assert cp.check_pulse(1200) == 200

    dep_default = Dependency("w2")
    cp2 = Checkpoint("a2", [dep_default])
    cp2.heartbeat(1000)
    with pytest.raises(TypeError):
        cp2.check_pulse(1200)


def test_enrichment_correction_flow(spark, tmp_path):
    """The full reference scenario re-expressed Spark-first
    (cookbook.rst:493-520): downtime produces stale enrichment; after
    recovery the dependent window is reprocessed and a keep-last
    compaction (A7) yields the corrected output — the idempotent-sink
    contract that replaces offset seek-back."""
    from slipstream_async_spark.operators import asof_join, dedup_keep_first
    from pyspark.sql import functions as F

    # keyed per city — the scale-safe partitioned as-of shape the
    # cookbook's per-key temporal cache implies (one city here, but the
    # demonstrated pattern distributes)
    weather = spark.createDataFrame(
        [("ams", t(0), "🌞")], "city string, ts timestamp, weather string"
    )
    activity = spark.createDataFrame(
        [("ams", t(30), "swimming"), ("ams", t(90), "walking home")],
        "city string, ts timestamp, activity string",
    )
    # Pass 1: weather down since t(0) -> 'walking home' enriched stale.
    pass1 = asof_join(activity, weather, on="ts", by="city").select(
        "ts", "activity", F.col("weather_right").alias("weather"),
        F.lit(1).alias("pass_id"),
    )
    # Recovery: weather for t(60) arrives; dependent rows since the
    # downtime window are reprocessed (the seek-back replay).
    weather2 = weather.union(
        spark.createDataFrame(
            [("ams", t(60), "🌧")], "city string, ts timestamp, weather string"
        )
    )
    pass2 = asof_join(
        activity.filter(F.col("ts") >= t(60)), weather2, on="ts", by="city"
    ).select(
        "ts", "activity", F.col("weather_right").alias("weather"),
        F.lit(2).alias("pass_id"),
    )
    # Corrections compaction: latest pass wins per activity key.
    corrected = dedup_keep_first(
        pass1.union(pass2), ["ts", "activity"], "pass_id", keep="last"
    )
    out = {r["activity"]: r["weather"] for r in corrected.collect()}
    assert out == {"swimming": "🌞", "walking home": "🌧"}


def test_reference_golden_sequence(spark, tmp_path):
    """End-to-end replica of the reference's Kafka integration golden
    sequence (tests/integration/test_kafka_integration.py:128-162):

      🌞 -> (None, swimming/🌞) -> ⛅ -> (None, walking home/⛅)
      -> (5400s, shopping/⛅ STALE; dependency down, PAUSE)
      -> 🌦️ (still behind, still down) -> 🌧 (caught up, RESUME,
      recovery seeks the activity stream back to the stale offset)
      -> (None, shopping/🌦️ CORRECTED) -> (None, lunch/🌧)

    File-backed micro-batches stand in for Kafka partitions: each
    activity message is one parquet file, the file index is the offset,
    and the recovery callback rewinds the cursor exactly like the
    reference's ``t.seek({partition: offset})``. The weather dependency
    writes its observations into a StateTable (cache-as-sink, S7);
    enrichment as-of joins each activity micro-batch against that cache;
    outputs land in a second StateTable via idempotent upsert so the
    seek-back replay compacts the correction in place.
    """
    import os

    from pyspark.sql import functions as F

    from slipstream_async_spark.operators import asof_join
    from slipstream_async_spark.streaming.state import StateTable

    def h(hour: int, minute: int = 0) -> datetime:
        return datetime(2023, 1, 1, hour, minute)

    weather_events = [(h(10), "🌞"), (h(11), "⛅"), (h(12), "🌦️"), (h(13), "🌧")]
    activities = [
        (h(10, 30), "swimming"),
        (h(11, 30), "walking home"),
        (h(12, 30), "shopping"),
        (h(13, 10), "lunch"),
    ]
    act_dir = str(tmp_path / "activity_topic")
    for i, (ats, val) in enumerate(activities):
        spark.createDataFrame(
            [(ats, val)], "ts timestamp, activity string"
        ).write.parquet(os.path.join(act_dir, f"offset={i}"))

    weather_cache = StateTable(spark, str(tmp_path / "weather_state"))
    enriched = StateTable(spark, str(tmp_path / "enriched"))
    signals: list[str] = []
    cursor = {"next": 0}

    def on_downtime(c: Checkpoint, d: Dependency) -> None:
        signals.append("PAUSE")

    def on_recovery(c: Checkpoint, d: Dependency) -> None:
        signals.append("RESUME")
        cursor["next"] = c.state["offset"]  # seek-back reprocess (T5)

    cp = Checkpoint(
        "activity",
        [Dependency("weather", downtime_threshold=timedelta(hours=1))],
        downtime_callback=on_downtime,
        recovery_callback=on_recovery,
    )

    wi = iter(weather_events)

    def next_weather() -> str:
        wts, val = next(wi)
        weather_cache.put(wts.isoformat(), val)
        cp.heartbeat(wts)
        return val

    def next_activity():
        offset = cursor["next"]
        batch = spark.read.parquet(os.path.join(act_dir, f"offset={offset}"))
        ats = batch.first()["ts"]
        downtime = cp.check_pulse(ats, offset=offset)
        wdf = spark.createDataFrame(
            [(datetime.fromisoformat(k), v) for k, v in weather_cache.items()],
            "ts timestamp, weather string",
        )
        row = asof_join(
            batch.withColumn("k", F.lit(1)),
            wdf.withColumn("k", F.lit(1)),
            on="ts",
            by="k",
        ).first()
        enriched.upsert(
            spark.createDataFrame(
                [(row["activity"], row["weather_right"])], "key string, value string"
            )
        )
        cursor["next"] = offset + 1
        return (downtime, row["activity"], row["weather_right"])

    dep = cp.dependencies["weather"]

    assert next_weather() == "🌞"
    assert next_activity() == (None, "swimming", "🌞")
    assert next_weather() == "⛅"
    assert next_activity() == (None, "walking home", "⛅")
    # <- wrongly enriched with stale data; 5400s downtime detected
    assert next_activity() == (timedelta(seconds=5400), "shopping", "⛅")
    assert dep.is_down is True
    assert signals == ["PAUSE"]
    assert enriched.get("shopping") == "⛅"  # stale row persisted
    # <- the weather stream recovers but hasn't caught up yet
    assert next_weather() == "🌦️"
    assert dep.is_down is True
    # <- the weather stream catches up: RESUME + seek-back
    assert next_weather() == "🌧"
    assert dep.is_down is False
    assert signals == ["PAUSE", "RESUME"]
    assert cursor["next"] == 2  # rewound to the stale offset
    # <- correction: shopping re-emitted with the right weather
    assert next_activity() == (None, "shopping", "🌦️")
    assert next_activity() == (None, "lunch", "🌧")
    # Idempotent upsert compacted the correction in place (exactly one
    # row per activity, stale value replaced).
    final = {k: v for k, v in enriched.items()}
    assert final == {
        "swimming": "🌞",
        "walking home": "⛅",
        "shopping": "🌦️",
        "lunch": "🌧",
    }


def test_pausing_foreach_batch_blocks_until_recovery(spark):
    """T4 hard pause: the wrapped sink must not run while a dependency
    is down, must unblock promptly when recovery (from another thread —
    the dependency query's heartbeat in real flows) flips it up, and
    must time out loudly when recovery never comes."""
    import threading
    import time

    from slipstream_async_spark.streaming.checkpointing import (
        pausing_foreach_batch,
    )

    dep = Dependency("w", downtime_threshold=timedelta(minutes=10))
    cp = Checkpoint("a", [dep])
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    cp.heartbeat(t0, dependency="w")
    cp.check_pulse(t0 + timedelta(minutes=20))  # -> downtime detected
    assert dep.is_down

    seen: list[int] = []
    hook = pausing_foreach_batch(
        cp, lambda df, epoch: seen.append(epoch), poll_interval=0.01, max_wait=5.0
    )
    batch = spark.createDataFrame([(1,)], "x int")

    def recover():
        time.sleep(0.3)
        # dependency catches up past the dependent's marker -> recovery
        cp.heartbeat(t0 + timedelta(minutes=21), dependency="w")

    th = threading.Thread(target=recover)
    start = time.time()
    th.start()
    hook(batch, 7)  # blocks ~0.3s, then runs the sink
    elapsed = time.time() - start
    th.join()
    assert seen == [7]
    assert 0.25 <= elapsed < 4.0, elapsed
    assert not dep.is_down

    # timeout path: down again, nobody recovers
    cp.check_pulse(t0 + timedelta(minutes=40))
    assert dep.is_down
    strict = pausing_foreach_batch(
        cp, lambda df, epoch: seen.append(epoch), poll_interval=0.01, max_wait=0.1
    )
    with pytest.raises(TimeoutError, match="w"):
        strict(batch, 8)
    assert seen == [7]  # sink never ran

    # proceed mode: stale-enrich-then-correct lane lets the batch pass
    lenient = pausing_foreach_batch(
        cp,
        lambda df, epoch: seen.append(epoch),
        poll_interval=0.01,
        max_wait=0.1,
        on_timeout="proceed",
    )
    lenient(batch, 9)
    assert seen == [7, 9]
