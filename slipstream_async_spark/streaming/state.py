"""StateTable: the Cache analog — queryable, versioned keyed state.

Reference: ``Cache`` wraps an embedded RocksDB with get/put/delete,
ordered/prefix/range scans, wide-column entities, range deletes,
snapshots, and an update-event stream (slipstream/caching.py:67-475,
interfaces.py:72-110). It is simultaneously a sink (``await cache(key,
val)``) and a CDC source (``async for k, v in cache``).

Spark-first redesign (not a port): state is a **versioned parquet
table** — each mutation batch produces a new immutable version plus an
append-only changelog. This keeps every capability queryable *with
DataFrames at any scale*:

- C1 CRUD            -> ``upsert``/``delete`` batch merges; ``get`` etc.
                        driver conveniences over ``filter(key == k)``
- C3 ordered scans   -> ``items(backwards=..., from_key=...)`` =
                        ``orderBy`` + range predicate (sort pushed to scan)
- C4 prefix scan     -> ``scan(prefix=...)`` = ``startswith`` predicate
                        (rewritten to a sargable range: [p, p+maxchar))
- C5 wide columns    -> MAP<STRING,STRING> ``attrs`` column
- C6 delete_range    -> anti-predicate merge
- C8 snapshot        -> read any retained version (time travel)
- C10 update events  -> ``changelog()`` DataFrame / ``changelog_stream()``
                        (file-source streaming over the changelog dir)
- S7 cache-as-sink   -> ``__call__(key, value)`` and
                        ``foreach_batch_upsert`` for streaming queries

Per-key transactional RMW (C7/T8's striped locks) is unnecessary: batch
merges are atomic per version swap, and streaming state updates are
per-key serialized inside Spark's stateful operators.

Scale: state is HASH-BUCKETED (``pmod(md5-hash(key), n_buckets)``) and a
commit rewrites ONLY the buckets the batch touches — O(|batch| +
touched-bucket data), never O(|state|). Each version is a bucket->
version MANIFEST (the Iceberg/Delta snapshot pattern, poor-man's):
untouched buckets keep pointing at the version directory that last
wrote them, so time travel (C8) and the changelog (C10) are unchanged
while a streaming upsert sink stops paying full-table write
amplification per micro-batch (the r7-measured reason the bloom-dedup
flow ran at 483 rows/s vs 2,334 for the stateless path). Swap the
storage layer for Delta/Iceberg MERGE when its jars are available —
the API here is storage-agnostic.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from collections.abc import Iterator, MutableMapping
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SCHEMA = "key string, value string, attrs map<string,string>"
_LOG_SCHEMA = (
    "key string, value string, attrs map<string,string>, "
    "op string, version long, ts timestamp"
)


# Codec marker: put() tags its rows so get()/items() know the value is
# JSON-encoded. DataFrame upsert() rows carry no tag and round-trip
# VERBATIM — decoding is driven by provenance, never by sniffing the
# content (a raw string that happens to look like JSON, e.g. "42",
# must come back as the string "42"). One explicit codec boundary,
# like the reference's Cache (slipstream/caching.py:150-159).
_CODEC_KEY = "__codec"
_CODEC_JSON = "json"


def _encode(value: Any) -> str:
    return json.dumps(value, default=str, sort_keys=True)


def _decode(s: str | None, attrs) -> Any:
    if s is None:
        return None
    if attrs is not None and attrs.get(_CODEC_KEY) == _CODEC_JSON:
        try:
            return json.loads(s)
        except (json.JSONDecodeError, ValueError):
            return s  # tagged but corrupt: surface the raw payload
    return s


class StateTable:
    """Versioned parquet-backed keyed state (see module docstring)."""

    def __init__(self, spark: SparkSession, path: str, n_buckets: int = 16):
        self.spark = spark
        self.path = path
        self.n_buckets = n_buckets
        os.makedirs(os.path.join(path, "versions"), exist_ok=True)
        os.makedirs(os.path.join(path, "changelog"), exist_ok=True)

    # -- bucketing ----------------------------------------------------------

    def _bucket_expr(self):
        """md5-derived key bucket — engine-version-stable (the house
        hash discipline), unlike F.hash whose murmur3 seed is a Spark
        implementation detail."""
        return F.pmod(
            F.conv(F.substring(F.md5("key"), 1, 8), 16, 10).cast("bigint"),
            F.lit(self.n_buckets),
        ).cast("int")

    def _bucket_of(self, key: str) -> int:
        """Driver-side twin of :meth:`_bucket_expr` (same md5-prefix
        formula), so point lookups prune to ONE bucket's files instead
        of scanning the whole snapshot."""
        import hashlib

        h = hashlib.md5(str(key).encode("utf-8")).hexdigest()[:8]
        return int(h, 16) % self.n_buckets

    def _key_frame(self, key: str) -> DataFrame:
        """The (at most one-bucket) DataFrame a point op needs."""
        manifest = self._manifest(self.version)
        paths = self._bucket_paths(manifest, [self._bucket_of(key)])
        if not paths:
            return self.spark.createDataFrame([], _SCHEMA)
        return self.spark.read.schema(_SCHEMA).parquet(*paths)

    # -- version bookkeeping ------------------------------------------------

    def _versions(self) -> list[int]:
        vdir = os.path.join(self.path, "versions")
        out = []
        for d in os.listdir(vdir):
            # only committed versions (manifest is written before the
            # atomic rename; a crashed commit leaves v{n}.tmp behind)
            if re.fullmatch(r"v\d+", d) and os.path.exists(
                os.path.join(vdir, d, "manifest.json")
            ):
                out.append(int(d[1:]))
        return sorted(out)

    @property
    def version(self) -> int:
        vs = self._versions()
        return vs[-1] if vs else -1

    def _vpath(self, version: int) -> str:
        return os.path.join(self.path, "versions", f"v{version}")

    def _manifest(self, version: int) -> dict[int, int]:
        """bucket -> version-dir holding that bucket's current rows.
        Buckets absent from the manifest are empty."""
        if version < 0:
            return {}
        with open(os.path.join(self._vpath(version), "manifest.json")) as fh:
            return {int(b): int(v) for b, v in json.load(fh).items()}

    def _bucket_paths(self, manifest: dict[int, int], buckets=None) -> list[str]:
        want = manifest if buckets is None else {
            b: v for b, v in manifest.items() if b in set(buckets)
        }
        return sorted(
            os.path.join(self._vpath(v), f"_bucket={b}")
            for b, v in want.items()
        )

    def snapshot(self, version: int | None = None) -> DataFrame:
        """Current state (or any retained version — C8 time travel)."""
        v = self.version if version is None else version
        paths = self._bucket_paths(self._manifest(v)) if v >= 0 else []
        if not paths:
            return self.spark.createDataFrame([], _SCHEMA)
        return self.spark.read.schema(_SCHEMA).parquet(*paths)

    def df(self) -> DataFrame:
        return self.snapshot()

    # -- mutation (batch merges) -------------------------------------------

    def _commit(
        self,
        merged: DataFrame,
        log: DataFrame,
        touched: list[int],
        base: dict[int, int],
    ) -> None:
        """Write ONLY the touched buckets as a new version plus a
        manifest that keeps untouched buckets pointing at their prior
        version directories — O(|batch| + touched-bucket data) per
        commit, never O(|state|). ``merged`` must contain exactly the
        post-merge rows of the touched buckets."""
        new_v = self.version + 1
        tmp = self._vpath(new_v) + ".tmp"
        (
            merged.withColumn("_bucket", self._bucket_expr())
            .write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(tmp)
        )
        manifest = {b: v for b, v in base.items() if b not in set(touched)}
        for b in touched:
            # a touched bucket with zero surviving rows writes no
            # partition dir — it drops out of the manifest (empty)
            if os.path.isdir(os.path.join(tmp, f"_bucket={b}")):
                manifest[b] = new_v
        with open(os.path.join(tmp, "manifest.json"), "w") as fh:
            json.dump({str(b): v for b, v in manifest.items()}, fh)
        os.rename(tmp, self._vpath(new_v))
        log.withColumn("version", F.lit(new_v)).withColumn(
            "ts", F.current_timestamp()
        ).write.mode("append").parquet(os.path.join(self.path, "changelog"))

    def _touched(self, keyed: DataFrame) -> list[int]:
        """Distinct key buckets of a batch — a bounded (<= n_buckets)
        control-plane collect, not a data collect."""
        return [
            r[0]
            for r in keyed.select(self._bucket_expr().alias("_b"))
            .distinct()
            .collect()
        ]

    def upsert(self, updates: DataFrame) -> None:
        """Merge a (key, value[, attrs]) batch; last write per key wins
        within the batch (deterministic via max aggregation on arrival
        order is not needed — callers pass one row per key; duplicate
        keys resolve to an arbitrary single row via last over key order).
        Only the buckets containing batch keys are re-read and
        rewritten (partition-pruned merge)."""
        for c, t in (("value", "string"), ("attrs", "map<string,string>")):
            if c not in updates.columns:
                updates = updates.withColumn(c, F.lit(None).cast(t))
        updates = updates.select("key", "value", "attrs").dropDuplicates(["key"])
        touched = self._touched(updates)
        base = self._manifest(self.version)
        paths = self._bucket_paths(base, touched)
        current = (
            self.spark.read.schema(_SCHEMA).parquet(*paths)
            if paths
            else self.spark.createDataFrame([], _SCHEMA)
        )
        merged = current.join(updates.select("key"), "key", "left_anti").unionByName(
            updates
        )
        self._commit(merged, updates.withColumn("op", F.lit("put")), touched, base)

    def delete_where(self, predicate) -> None:
        """Delete all rows matching a Column predicate (generalizes C6).
        The predicate is arbitrary, so finding victims scans the full
        snapshot — but only the buckets that actually contain victims
        are rewritten."""
        base = self._manifest(self.version)
        removed = self.snapshot().filter(predicate)
        touched = self._touched(removed)
        paths = self._bucket_paths(base, touched)
        kept = (
            self.spark.read.schema(_SCHEMA).parquet(*paths).filter(~predicate)
            if paths
            else self.spark.createDataFrame([], _SCHEMA)
        )
        self._commit(kept, removed.withColumn("op", F.lit("delete")), touched, base)

    def delete_range(self, begin: str, end: str) -> None:
        """C6: delete keys in [begin, end) (caching.py:383-390)."""
        self.delete_where((F.col("key") >= begin) & (F.col("key") < end))

    # -- driver-convenience point ops (C1) ---------------------------------

    def put(self, key: str, value: Any) -> None:
        self.upsert(
            self.spark.createDataFrame(
                [(str(key), _encode(value), {_CODEC_KEY: _CODEC_JSON})], _SCHEMA
            )
        )

    def get(self, key: str, default: Any = None) -> Any:
        """None/default on miss, never KeyError (interfaces.py:84-90)."""
        rows = (
            self._key_frame(key)
            .filter(F.col("key") == str(key))
            .select("value", "attrs")
            .take(1)
        )
        return _decode(rows[0][0], rows[0][1]) if rows else default

    def __contains__(self, key: str) -> bool:
        return bool(
            self._key_frame(key).filter(F.col("key") == str(key)).take(1)
        )

    def delete(self, key: str) -> None:
        self.delete_where(F.col("key") == str(key))

    def __call__(self, key: str, value: Any) -> None:
        """Cache-as-sink contract (S7, interfaces.py:97-103): calling the
        table persists and emits a changelog event."""
        self.put(key, value)

    # -- wide-column entities (C5) -----------------------------------------

    def put_entity(self, key: str, names: list[str], values: list[Any]) -> None:
        """caching.py:223-247 put_entity analog: key -> named columns."""
        attrs = {n: str(v) for n, v in zip(names, values)}
        df = self.spark.createDataFrame(
            [(str(key), None, attrs)], _SCHEMA
        )
        self.upsert(df)

    def get_entity(self, key: str) -> dict[str, str] | None:
        rows = (
            self._key_frame(key)
            .filter(F.col("key") == str(key))
            .select("attrs")
            .take(1)
        )
        if not rows or rows[0][0] is None:
            return None
        ent = {k: v for k, v in rows[0][0].items() if k != _CODEC_KEY}
        return ent or None

    def columns(self, key: str) -> list[str]:
        ent = self.get_entity(key)
        return sorted(ent) if ent else []

    # -- scans (C3/C4) ------------------------------------------------------

    def scan(
        self,
        prefix: str | None = None,
        from_key: str | None = None,
        backwards: bool = False,
    ) -> DataFrame:
        """Ordered scan as a DataFrame. ``prefix`` is rewritten to a
        sargable key range (parquet min/max skipping applies — the
        engine-level analog of RocksDB's early-terminating prefix
        iterator, caching.py:276-300)."""
        df = self.snapshot()
        if prefix is not None:
            df = df.filter(
                (F.col("key") >= prefix) & (F.col("key") < prefix + "￿")
            )
        if from_key is not None:
            df = df.filter(
                F.col("key") <= from_key if backwards else F.col("key") >= from_key
            )
        order = F.col("key").desc() if backwards else F.col("key").asc()
        return df.orderBy(order)

    def items(self, **kwargs) -> Iterator[tuple[str, Any]]:
        for r in self.scan(**kwargs).select("key", "value", "attrs").toLocalIterator():
            yield r["key"], _decode(r["value"], r["attrs"])

    def keys(self, **kwargs) -> Iterator[str]:
        for k, _ in self.items(**kwargs):
            yield k

    def values(self, **kwargs) -> Iterator[Any]:
        for _, v in self.items(**kwargs):
            yield v

    # -- CDC (C10/S8) -------------------------------------------------------

    def changelog(self) -> DataFrame:
        """All mutation events in version order (the update stream the
        reference publishes via ICache.__aiter__, interfaces.py:105-110)."""
        log_dir = os.path.join(self.path, "changelog")
        if not any(f.endswith(".parquet") for _, _, fs in os.walk(log_dir) for f in fs):
            return self.spark.createDataFrame([], _LOG_SCHEMA)
        return self.spark.read.schema(_LOG_SCHEMA).parquet(log_dir)

    def changelog_stream(self) -> DataFrame:
        """Unbounded changelog (file-source stream): downstream queries
        react to state updates — the CDC-ish pattern of
        cookbook.rst:522-588."""
        return (
            self.spark.readStream.schema(_LOG_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(self.path, "changelog"))
        )

    def as_mapping(self) -> "MutableMapping[str, str]":
        """MutableMapping view (raw string values) — e.g. the persistence
        store for streaming.checkpointing.Checkpoint (the reference
        persists checkpoints into its Cache the same way,
        checkpointing.py:69-85)."""
        table = self

        class _View(MutableMapping):
            def __getitem__(self, k: str) -> str:
                rows = (
                    table._key_frame(k)
                    .filter(F.col("key") == k)
                    .select("value")
                    .take(1)
                )
                if not rows:
                    raise KeyError(k)
                return rows[0][0]

            def get(self, k: str, default=None):
                try:
                    return self[k]
                except KeyError:
                    return default

            def __setitem__(self, k: str, v: str) -> None:
                table.upsert(
                    table.spark.createDataFrame([(k, v)], "key string, value string")
                )

            def __delitem__(self, k: str) -> None:
                table.delete(k)

            def __iter__(self):
                return table.keys()

            def __len__(self) -> int:
                return table.snapshot().count()

        return _View()

    # -- maintenance (C9's compact/destroy, engine-managed) -----------------

    def vacuum(self, keep_last: int = 2) -> None:
        """Drop version directories not referenced by any of the last
        ``keep_last`` manifests. A directory stays live as long as ANY
        retained manifest still points a bucket at it (bucket-sharing
        across versions is the whole point of the manifest layout)."""
        retained = self._versions()[-keep_last:]
        live = set(retained)
        for v in retained:
            live.update(self._manifest(v).values())
        for v in self._versions():
            if v not in live:
                shutil.rmtree(self._vpath(v), ignore_errors=True)

    def destroy(self) -> None:
        shutil.rmtree(self.path, ignore_errors=True)


def foreach_batch_upsert(table: StateTable):
    """Streaming sink: upsert each micro-batch into the state table
    (exactly-once via the query's checkpoint + idempotent version swap)."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        table.upsert(batch_df)

    return sink
