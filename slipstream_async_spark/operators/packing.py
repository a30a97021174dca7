"""Sequence packing: assign documents to fixed-token-budget training
chunks — the batch-construction step between a curated corpus and a
training run (concatenate-and-chunk packing, as used by GPT-style
pretraining pipelines).

The reference has no corpus surface (single-stream dataflow); this
extends SURVEY §2's M7 training-data inventory.

Semantics: documents are laid end-to-end in ``id_col`` order; a document
starts at the running token offset of everything before it and belongs to
chunk ``floor(start / budget)`` — deterministic, rerun-stable, and
engine-reproducible (it is exactly a prefix sum).

Scale design — the naive form is a single global window
(``SUM OVER (ORDER BY id)``), which Spark executes in ONE partition: the
100 TB anti-pattern. ``contiguous_pack`` instead does the classic
two-phase distributed prefix sum:

1. rows are bucketed by id range (``id div bucket_size`` — deterministic,
   unlike ``spark_partition_id()``); the inner prefix sum is a window
   PARTITIONED by bucket (parallel, each bucket local);
2. per-bucket totals (#rows / bucket_size rows — tiny) get their own
   running sum, the bucket offsets, broadcast back onto the buckets.

Only the tiny bucket-totals window is single-partition; the data-sized
work is embarrassingly parallel. Wall-clock scales with the largest
bucket, so pick ``bucket_size`` ~ rows-per-task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def contiguous_pack(
    df: DataFrame,
    id_col: str,
    size_col: str,
    budget: int,
    bucket_size: int = 4096,
) -> DataFrame:
    """Add ``start`` (running offset before this row in ``id_col`` order)
    and ``chunk_id`` (= start div budget) to ``df``.

    A document straddling a budget boundary belongs to the chunk where it
    STARTS (concatenation packing never splits here; splitting is a
    downstream tokenizer concern).
    """
    bucket = (F.col(id_col) / F.lit(bucket_size)).cast("bigint")
    w_in = (
        Window.partitionBy("_bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = df.withColumn("_bucket", bucket).withColumn(
        "_local_start",
        F.coalesce(F.sum(size_col).over(w_in), F.lit(0)).cast("bigint"),
    )
    totals = (
        local.groupBy("_bucket")
        .agg(F.sum(size_col).cast("bigint").alias("_tot"))
    )
    w_b = (
        Window.orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "_bucket",
        F.coalesce(F.sum("_tot").over(w_b), F.lit(0)).cast("bigint").alias(
            "_offset"
        ),
    )
    return (
        local.join(F.broadcast(offsets), "_bucket")
        .withColumn("start", F.col("_offset") + F.col("_local_start"))
        .withColumn(
            "chunk_id", (F.col("start") / F.lit(budget)).cast("bigint")
        )
        .drop("_bucket", "_local_start", "_offset")
    )


def chunk_stats(packed: DataFrame, size_col: str) -> DataFrame:
    """Per-chunk fill statistics (docs per chunk, token sum) — the
    packing-efficiency readout (waste = budget - tokens of the last
    chunk-starting doc's span)."""
    return packed.groupBy("chunk_id").agg(
        F.count("*").alias("n_docs"),
        F.sum(size_col).cast("bigint").alias("n_tokens"),
        F.min("start").cast("bigint").alias("chunk_start"),
    )


def length_buckets(
    df: DataFrame,
    size_col: str,
    max_len: int = 1 << 20,
) -> DataFrame:
    """Length-bucketed batching stats: assign every sequence to the
    smallest power-of-2 bucket holding it and report, per bucket, the
    padding cost of batching inside the bucket vs padding everything to
    the corpus maximum — the standard padding-waste reduction for
    non-packed (padded-batch) training and inference serving.

    Per bucket: ``n_seqs``, real ``n_tokens``, ``padded_tokens`` (=
    n_seqs * bucket upper edge), ``pad_overhead`` (padded/real - 1,
    rounded), and ``global_padded_tokens`` (n_seqs * corpus max) — the
    counterfactual single-bucket cost. Sequences longer than
    ``max_len`` land in the top bucket (cap documented, not silent:
    they're counted in ``n_truncated``).

    Scale shape: bucket id is ``ceil(log2(len))`` — pure expression;
    one partial-aggregated groupBy on ~30 distinct buckets; the corpus
    max is a one-row broadcast (scalar-subquery shape). No window, no
    shuffle beyond the 30-group agg.
    """
    n = F.col(size_col).cast("bigint")
    # smallest power of two >= n, via the bit length of n-1 — exact
    # integer arithmetic (ceil(log2(n)) through libm can land a hair
    # above an integer at exact powers of two and flip the bucket,
    # engine-dependently; binary-string length cannot). SQL expr because
    # the Python F.shiftleft only takes a literal bit count.
    sized = df.select(n.alias("_n")).withColumn(
        "bucket_edge",
        F.expr(
            "least(CASE WHEN _n <= 1 THEN CAST(1 AS BIGINT) "
            "ELSE shiftleft(CAST(1 AS BIGINT), length(bin(_n - 1))) END, "
            f"CAST({int(max_len)} AS BIGINT))"
        ),
    ).withColumn("_trunc", (F.col("_n") > max_len).cast("int"))
    gmax = sized.agg(F.max("_n").alias("_gmax"))
    return (
        sized.groupBy("bucket_edge")
        .agg(
            F.count("*").cast("bigint").alias("n_seqs"),
            F.sum("_n").cast("bigint").alias("n_tokens"),
            F.sum(F.col("bucket_edge") * F.lit(1)).cast("bigint").alias(
                "padded_tokens"
            ),
            F.sum("_trunc").cast("bigint").alias("n_truncated"),
        )
        .crossJoin(F.broadcast(gmax))
        .select(
            "bucket_edge",
            "n_seqs",
            "n_tokens",
            "padded_tokens",
            F.round(
                F.col("padded_tokens") / F.col("n_tokens") - 1.0, 6
            ).alias("pad_overhead"),
            (F.col("n_seqs") * F.col("_gmax")).cast("bigint").alias(
                "global_padded_tokens"
            ),
            "n_truncated",
        )
    )
