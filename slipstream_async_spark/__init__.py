"""slipstream_async_spark — a PySpark-native streaming analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference library `Menziess/slipstream-async` (a single-process asyncio
stateful streaming library), re-expressed Spark-first:

- **Data plane**: typed DataFrames (batch) / unbounded DataFrames
  (Structured Streaming) instead of schema-less async iterables.
- **State plane**: Spark's managed per-key state store
  (``applyInPandasWithState``) and queryable parquet state tables instead of
  an embedded RocksDB cache.
- **Control plane**: a thin ``Pipeline`` registry echoing the reference's
  ``@handle``/``stream()`` ergonomics, plus a ``Checkpoint``/``Dependency``
  health monitor reproducing its event-time downtime-detection semantics.

Capability map (reference -> here) is documented in SURVEY.md; each module
docstring cites the reference behavior (file:line under /root/reference) it
reproduces. No code is copied from the reference — it is a different
execution model (asyncio + RocksDB) from ours (Catalyst + Tungsten +
Structured Streaming).
"""

from slipstream_async_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]

__version__ = "0.1.0"
