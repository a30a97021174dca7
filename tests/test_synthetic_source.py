"""Custom Python DataSource tests (sources/synthetic.py): batch
partitioned reads, determinism, and streaming micro-batch offset
progression — the reference's programmatic-source capability (S10/S11)
through Spark's engine-managed source API.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module", autouse=True)
def register(spark):
    from slipstream_async_spark.sources.synthetic import SyntheticEventsDataSource

    spark.dataSource.register(SyntheticEventsDataSource)


def test_batch_read_partitioned(spark):
    df = (
        spark.read.format("synthetic_events")
        .option("numRows", 1000)
        .option("numPartitions", 8)
        .load()
    )
    assert df.count() == 1000
    assert df.rdd.getNumPartitions() == 8
    # every event_id exactly once — partitions cover disjoint slices
    assert df.select("event_id").distinct().count() == 1000
    assert df.schema.simpleString() == (
        "struct<event_id:bigint,ts:timestamp,user_id:bigint,"
        "event_type:string,value:double>"
    )


def test_batch_deterministic(spark):
    def digest():
        df = (
            spark.read.format("synthetic_events")
            .option("numRows", 200)
            .option("seed", 7)
            .load()
        )
        return df.orderBy("event_id").select(
            F.md5(F.concat_ws("|", *df.columns)).alias("h")
        ).agg(F.md5(F.concat_ws("", F.collect_list("h"))).alias("d")).first()["d"]

    assert digest() == digest()


def test_stream_microbatches(spark, tmp_path):
    q = (
        spark.readStream.format("synthetic_events")
        .option("rowsPerBatch", 50)
        .option("maxRows", 150)
        .option("numPartitions", 2)
        .load()
        .writeStream.format("memory")
        .queryName("synth_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM synth_out").collect()
        # bounded at maxRows; every index exactly once across micro-batches
        assert len(rows) == 150
        assert sorted(r["event_id"] for r in rows) == list(range(150))
        assert len(q.recentProgress) >= 3  # advanced in rowsPerBatch steps
    finally:
        q.stop()
