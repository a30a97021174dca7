"""Bucketed tables: pre-shuffled storage for co-located joins/aggs.

The single biggest repeated cost at 100 TB is re-shuffling the same fact
table on the same key for every join. Bucketing pays that shuffle ONCE at
write time: ``bucketBy(n, key)`` hash-partitions files on disk, and every
later equi-join or aggregation on that key runs with NO exchange on the
bucketed side (Catalyst sees the hashed output partitioning).

This is the Spark-native replacement for the reference's "state is
already partitioned by key in RocksDB" property (slipstream/caching.py) —
here the partitioning is declared in the table layout and the planner
exploits it.

Bucketed writes require the session catalog (``saveAsTable``); bucket
counts must match on both sides of a join to avoid a re-shuffle (use the
same ``n_buckets`` for tables joined together, and size n_buckets ~
table_size / target_partition_size at the largest SF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: str | list[str],
    n_buckets: int = 32,
    sort_cols: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) catalog table.

    Sorting within buckets additionally enables exchange-AND-sort-free
    sort-merge joins (both sides pre-sorted on disk).
    """
    bc = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bc)
    if sort_cols is not None:
        sc = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*sc)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (plain table read; the bucketing metadata
    rides along in the catalog and the planner uses it automatically)."""
    return spark.table(table)
