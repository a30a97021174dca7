"""StateTable (Cache analog) tests — the reference's Cache contract
(SURVEY §2.8 C1-C10) against the versioned parquet implementation,
mirroring its real-RocksDB test style (tests/test_cache.py in the
reference: CRUD, prefix families user:/order:, ordered scans)."""

from __future__ import annotations

import pytest

from slipstream_async_spark.streaming.state import StateTable


@pytest.fixture()
def table(spark, tmp_path):
    t = StateTable(spark, str(tmp_path / "state"))
    yield t
    t.destroy()


def test_crud_miss_returns_none(table):
    # interfaces.py:84-90: miss -> None/default, never an error.
    assert table.get("nope") is None
    assert table.get("nope", 0) == 0
    table.put("k", {"a": 1})
    assert table.get("k") == {"a": 1}
    assert "k" in table
    table.put("k", [1, 2, 3])          # overwrite
    assert table.get("k") == [1, 2, 3]
    table.delete("k")
    assert table.get("k") is None


def test_ordered_and_prefix_scans(table):
    # reference tests/test_cache.py prefix families.
    for i in (1, 2, 3):
        table.put(f"user:{i}", i)
        table.put(f"order:{i}", i * 10)
    keys = list(table.keys())
    assert keys == sorted(keys)
    assert list(table.keys(prefix="user:")) == ["user:1", "user:2", "user:3"]
    assert list(table.keys(prefix="user:", backwards=True)) == [
        "user:3", "user:2", "user:1",
    ]
    # from_key backwards scan — the temporal-join lookup shape
    # (caching.py:302-317): latest key at-or-before from_key.
    assert next(table.keys(prefix="user:", from_key="user:2", backwards=True)) == "user:2"


def test_delete_range(table):
    for i in range(5):
        table.put(f"k{i}", i)
    table.delete_range("k1", "k3")     # [begin, end)
    assert list(table.keys()) == ["k0", "k3", "k4"]


def test_entities_wide_columns(table):
    # caching.py:223-247 put_entity/get_entity/columns.
    table.put_entity("user:1", ["name", "age"], ["alice", 30])
    assert table.get_entity("user:1") == {"name": "alice", "age": "30"}
    assert table.columns("user:1") == ["age", "name"]
    assert table.get_entity("user:2") is None


def test_versioning_and_changelog(table):
    table.put("a", 1)
    v1 = table.version
    table.put("a", 2)
    # C8 snapshot/time travel: old version still readable.
    old = {r["key"]: r["value"] for r in table.snapshot(v1).collect()}
    assert old["a"] == "1"
    assert table.get("a") == 2
    # C10 update events: one changelog row per mutation, in order.
    log = table.changelog().orderBy("version").collect()
    assert [r["op"] for r in log] == ["put", "put"]
    assert [r["value"] for r in log] == ["1", "2"]


def test_callable_sink_contract(table):
    # S7: calling the table persists + publishes (interfaces.py:97-103).
    table("k", "v")
    assert table.get("k") == "v"
    assert table.changelog().count() == 1


def test_batch_upsert_and_mapping_view(spark, table):
    df = spark.createDataFrame(
        [("x", "1"), ("y", "2")], "key string, value string"
    )
    table.upsert(df)
    assert table.snapshot().count() == 2
    m = table.as_mapping()
    m["z"] = "3"
    assert m["z"] == "3"
    assert m.get("missing") is None
    assert len(m) == 3


def test_changelog_stream(spark, table):
    """S8/C10: downstream streaming query over state updates."""
    table.put("a", 1)
    table.put("b", 2)
    q = (
        table.changelog_stream()
        .writeStream.format("memory").queryName("cdc_out")
        .outputMode("append").start()
    )
    q.processAllAvailable()
    got = sorted(
        (r["key"], r["value"]) for r in spark.sql("SELECT * FROM cdc_out").collect()
    )
    q.stop()
    assert got == [("a", "1"), ("b", "2")]


def test_codec_provenance_not_content_sniffing(spark, tmp_path):
    """put() values round-trip through JSON typed; upsert() raw strings
    come back VERBATIM even when they look like JSON — decoding follows
    write provenance (the codec marker), never value content."""
    from slipstream_async_spark.streaming.state import StateTable

    t = StateTable(spark, str(tmp_path / "codec"))
    t.put("a", 42)
    t.put("b", {"x": 1})
    t.upsert(
        spark.createDataFrame(
            [("c", "42"), ("d", "true"), ("e", "[1,2]"), ("f", "plain")],
            "key string, value string",
        )
    )
    assert t.get("a") == 42 and t.get("b") == {"x": 1}
    assert t.get("c") == "42"  # raw string, NOT int
    assert t.get("d") == "true"  # raw string, NOT bool
    assert t.get("e") == "[1,2]"  # raw string, NOT list
    assert t.get("f") == "plain"
    got = dict(t.items())
    assert got == {"a": 42, "b": {"x": 1}, "c": "42", "d": "true",
                   "e": "[1,2]", "f": "plain"}
    # the codec marker is internal: entity view doesn't leak it
    assert t.get_entity("a") is None
