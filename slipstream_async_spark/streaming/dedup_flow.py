"""Streaming incremental dedup: the nightly-ingest dedup story as an
actual streaming query.

Reference parity: the cookbook's cache-update-stream pattern
(docs/source/cookbook.rst:522-588) — a handler consumes a stream, looks
each arrival up against a standing RocksDB cache, emits what it learns,
and folds the arrival back into the cache for the next event. Here the
micro-batch is the unit instead of the single event, and the standing
cache is a :class:`~slipstream_async_spark.streaming.state.StateTable`:

- each arriving micro-batch is near-dup-checked against the standing
  corpus index WITH :func:`~slipstream_async_spark.operators.dedup.
  dedup_incremental` (prefix-index probe: batch x corpus and batch x
  batch pairs only — the corpus is never re-paired against itself);
- discovered pairs land in a pairs StateTable (key ``id_a|id_b``,
  value jaccard) — the operator's continuously-growing output;
- the batch's documents are then upserted into the corpus StateTable,
  so the NEXT micro-batch dedups against them.

Exactly-once: foreachBatch is at-least-once per epoch, and both writes
are idempotent upserts keyed deterministically (same pair key -> same
jaccard; same doc key -> same text), so a replayed epoch converges to
the same state — the same idempotent-upsert argument the reference's
cache sinks rely on.

Scale: per micro-batch cost is |batch| x (prefix-index probe), never
|corpus|^2; the standing index is the copy-on-write StateTable, which at
100 TB is the Delta/Iceberg MERGE pattern (state.py module docstring).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from slipstream_async_spark.operators.dedup import dedup_incremental
from slipstream_async_spark.streaming.state import StateTable


def incremental_dedup_sink(
    corpus: StateTable,
    pairs: StateTable,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function wiring ``dedup_incremental`` between a
    streaming source and two StateTables (standing corpus index + pair
    output). Use with ``foreach_batch_sink`` on a ``Pipeline`` flow::

        p.handle(stream, sink=[foreach_batch_sink(
            incremental_dedup_sink(corpus, pairs))])

    Document ids are carried as strings (StateTable keys are strings);
    pair ordering ``id_a < id_b`` is therefore string order within one
    micro-batch's output — stable across replays.
    """

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch = (
            batch_df.select(
                F.col(id_col).cast("string").alias(id_col), F.col(text_col)
            )
            .dropDuplicates([id_col])
            .cache()
        )
        try:
            standing = corpus.snapshot().select(
                F.col("key").alias(id_col), F.col("value").alias(text_col)
            )
            found = dedup_incremental(
                standing, batch, text_col, id_col, k=k, threshold=threshold
            )
            pairs.upsert(
                found.select(
                    F.concat_ws("|", "id_a", "id_b").alias("key"),
                    F.col("jaccard").cast("string").alias("value"),
                )
            )
            corpus.upsert(
                batch.select(
                    F.col(id_col).alias("key"),
                    F.col(text_col).alias("value"),
                )
            )
        finally:
            batch.unpersist()

    return sink
