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

    weather = spark.createDataFrame(
        [(t(0), "🌞")], "ts timestamp, weather string"
    )
    activity = spark.createDataFrame(
        [(t(30), "swimming"), (t(90), "walking home")],
        "ts timestamp, activity string",
    )
    # Pass 1: weather down since t(0) -> 'walking home' enriched stale.
    pass1 = asof_join(activity, weather, on="ts").select(
        "ts", "activity", F.col("weather_right").alias("weather"),
        F.lit(1).alias("pass_id"),
    )
    # Recovery: weather for t(60) arrives; dependent rows since the
    # downtime window are reprocessed (the seek-back replay).
    weather2 = weather.union(
        spark.createDataFrame([(t(60), "🌧")], "ts timestamp, weather string")
    )
    pass2 = asof_join(
        activity.filter(F.col("ts") >= t(60)), weather2, on="ts"
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
