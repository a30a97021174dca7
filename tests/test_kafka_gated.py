"""Skip-gated Kafka integration test (S1-S3).

The reference tests its Kafka lane against a real broker via
testcontainers (/root/reference/tests/conftest.py:46-54); this container
has neither the spark-sql-kafka connector jars nor a broker, so the test
skips cleanly here and runs wherever both exist. Point
``SPARK_GRAFT_KAFKA_BOOTSTRAP`` at a broker (e.g. a testcontainers
Kafka) to exercise the full produce -> consume -> seek roundtrip,
mirroring the reference's test_kafka_integration.py flow.
"""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F

from slipstream_async_spark.sources.readers import kafka_sink, kafka_source

BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")


def _require_kafka_classpath(spark) -> None:
    """Skip (don't fail) when the kafka connector jar is absent."""
    try:
        spark.readStream.format("kafka").option(
            "kafka.bootstrap.servers", "localhost:1"
        ).option("subscribe", "probe").load()
    except Exception as e:
        msg = str(e).upper()
        if "DATA_SOURCE_NOT_FOUND" in msg or "FAILED TO FIND" in msg:
            pytest.skip("spark-sql-kafka connector jar not on classpath")
        # Jar present; other errors (no broker yet) are fine at plan time.


def test_kafka_source_requires_connector_or_roundtrips(spark, tmp_path):
    """S1/S2/S3: envelope schema, produce, consume, offset seek."""
    _require_kafka_classpath(spark)
    if not BOOTSTRAP:
        pytest.skip("no broker: set SPARK_GRAFT_KAFKA_BOOTSTRAP to run")

    topic = f"t-{uuid.uuid4().hex[:8]}"
    src = spark.createDataFrame(
        [(str(i), f"v{i}") for i in range(10)], "key string, value string"
    )
    # S2 produce (batch write uses the same connector path as the
    # streaming kafka_sink; assert the sink helper builds too).
    (
        src.write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("topic", topic)
        .save()
    )
    stream = kafka_source(spark, BOOTSTRAP, topic, starting_offsets="earliest")
    # S1 consume: fixed Kafka envelope (the ConsumerRecord analog).
    assert {"key", "value", "topic", "partition", "offset", "timestamp"} <= set(
        stream.columns
    )
    q = (
        stream.selectExpr("CAST(key AS STRING) k", "CAST(value AS STRING) v")
        .writeStream.format("memory")
        .queryName("kafka_roundtrip")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        (r["k"], r["v"])
        for r in spark.sql("SELECT * FROM kafka_roundtrip").collect()
    }
    assert got == {(str(i), f"v{i}") for i in range(10)}

    # S3 offset seek: re-read from a per-partition offset JSON (Topic.seek
    # analog, slipstream/core.py:368-423) — skip the first 5 offsets.
    seek = kafka_source(
        spark,
        BOOTSTRAP,
        topic,
        starting_offsets='{"%s":{"0":5}}' % topic,
    )
    q2 = (
        seek.selectExpr("CAST(value AS STRING) v")
        .writeStream.format("memory")
        .queryName("kafka_seek")
        .option("checkpointLocation", str(tmp_path / "cp2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(60)
    assert spark.sql("SELECT * FROM kafka_seek").count() == 5

    # kafka_sink builds a streaming writer against the same connector.
    rate = spark.readStream.format("rate").option("rowsPerSecond", "1").load()
    sink_q = kafka_sink(
        rate.select(
            F.col("value").cast("string").alias("key"),
            F.col("value").cast("string").alias("value"),
        ),
        BOOTSTRAP,
        topic,
        str(tmp_path / "cp3"),
    )
    sink_q.stop()
