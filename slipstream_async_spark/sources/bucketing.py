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


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_mb: int = 512,
) -> dict:
    """Small-file compaction: rewrite a parquet directory into files of
    ~``target_file_mb`` each — the nightly maintenance job every real
    lake needs (streaming sinks and fine-grained ingest produce
    thousands of KB-sized files; at 100 TB the resulting task-per-file
    scheduling and footer-reading overhead dominates scan time; the
    reference's RocksDB analog is SST compaction, SURVEY §2 C9 —
    engine-owned there, an explicit operator here).

    Sizing comes from the actual on-disk bytes (file listing via the
    Hadoop FS API — no data read), so the output count tracks the real
    payload, not a guess. Returns accounting: files/bytes before, files
    after. Row data is rewritten once with no shuffle beyond a
    coalesce; use ``write_zordered``/``write_bucketed`` instead when
    the rewrite should ALSO fix the sort/cluster layout.
    """
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = path.getFileSystem(hconf)
    statuses = list(fs.listStatus(path))
    # A partitioned layout (subdirectories) would list zero top-level
    # files: sizing would see 0 bytes and coalesce(1) would flatten a
    # multi-GB partitioned dataset into one file, destroying the
    # layout. Refuse and point at the per-partition form instead.
    subdirs = [
        s.getPath().getName()
        for s in statuses
        if s.isDirectory() and not s.getPath().getName().startswith(("_", "."))
    ]
    if subdirs:
        raise ValueError(
            "compact_parquet: partitioned layout detected "
            f"(subdirectories {subdirs[:3]}...); compact each partition "
            "directory separately to preserve partition pruning"
        )
    files = [
        (f.getPath().toString(), f.getLen())
        for f in statuses
        if f.isFile() and f.getPath().getName().endswith(".parquet")
    ]
    total_bytes = sum(b for _, b in files)
    n_out = max(1, -(-total_bytes // (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(src_path)
    df.coalesce(int(n_out)).write.mode("overwrite").parquet(dst_path)
    out = jvm.org.apache.hadoop.fs.Path(dst_path)
    n_after = sum(
        1
        for f in fs.listStatus(out)
        if f.isFile() and f.getPath().getName().endswith(".parquet")
    )
    return {
        "files_before": len(files),
        "bytes_before": total_bytes,
        "files_after": n_after,
    }
