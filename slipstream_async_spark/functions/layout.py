"""Multi-dimensional data layout: Z-order (Morton) clustering.

Why this exists: at 100 TB the cheapest query is the one that never
reads the data. Parquet row-group and file min/max statistics prune
scans automatically — but only if rows that are close in the FILTER
space are close in the FILE layout. A single-column sort gives perfect
pruning on that column and none on any other; Z-ordering interleaves
the bits of two (or more) columns so that a range predicate on EITHER
column maps to a bounded set of z-ranges, i.e. both columns' min/max
spans stay tight in every file (Morton 1966; the same layout Delta
Lake's OPTIMIZE ZORDER BY and ClickHouse's mortonEncode use).

Everything here is integer bit arithmetic on JVM expressions — no UDF,
no shuffle beyond the final range partition — and md5-free, so the
DuckDB oracle reproduces keys with the same ``<<``/``>>``/``&`` ops.

The reference (an event-stream processor) has no layout surface; this
extends SURVEY §2's M7 inventory on the storage side, complementing
sources/bucketing.py (hash bucketing for join co-location) with range
clustering for scan pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative
    integer columns into a single BIGINT sort key: bit i of ``x`` lands
    at position 2i, bit i of ``y`` at 2i+1.

    Column values are masked to ``bits`` bits first (callers normalize
    to that range — e.g. quantile-bucket or scale a timestamp to day
    numbers); 2*bits must stay <= 62 to fit a signed 64-bit key. The
    expansion is ``bits`` shift-and-mask terms per column, all constant-
    folded into one whole-stage-codegen projection.
    """
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    xc = (F.col(x) if isinstance(x, str) else x).cast("bigint")
    yc = (F.col(y) if isinstance(y, str) else y).cast("bigint")
    z: Column = F.lit(0).cast("bigint")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(xc, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(yc, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zorder_sql(x: str, y: str, bits: int = 16) -> str:
    """The ANSI-SQL replica of ``zorder_key`` (DuckDB-runnable), emitted
    from the same loop so the two can't drift."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    x: Column | str,
    y: Column | str,
    bits: int = 16,
    n_files: int = 16,
) -> None:
    """Materialize ``df`` Z-ordered: range-partition on the Morton key
    (each output file owns a contiguous z-range, so file-level min/max
    on BOTH dimensions stay tight), sort within partitions (row-group
    stats get the same locality), write parquet.

    This is the batch 'OPTIMIZE ZORDER BY' compaction: one range
    shuffle over the data, then pruning on either dimension is free for
    every later reader.
    """
    keyed = df.withColumn("_z", zorder_key(x, y, bits))
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
