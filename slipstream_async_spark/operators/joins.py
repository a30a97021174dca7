"""Joins: as-of (temporal), interval (stream-stream), lookup (enrichment).

Reference capabilities reproduced:

- **J1 as-of join** — the reference's flagship "temporal-join, nearby-join,
  or merge-as-of" pattern (docs/source/cookbook.rst:289-356): enrich each
  activity event with the latest weather at-or-before its event time, via a
  backwards ordered RocksDB scan from the event's timestamp key
  (slipstream/caching.py:302-317) taking the first hit, with a fallback
  value when nothing precedes (cookbook.rst:342 yields ``'?'``).
- **J2 stream-stream join via shared cache** (cookbook.rst:292) —
  ``interval_join``: equi-key + bounded time-range condition.
- **J3 stream-static lookup** (slipstream/caching.py:150-155 ``cache[key]``
  reads) — ``lookup_join``: broadcast enrichment.

Scale design (100 TB): ``asof_join`` is implemented as the union +
last-non-null window rewrite, NOT a range join. A range join
``l.ts >= r.ts`` explodes to O(|L|·|R|) per key before the argmax; the
union rewrite is one shuffle on (by, ts) and a linear scan per partition —
the same asymptotics as a sort-merge join. Skewed ``by`` keys hit the same
limits as any keyed shuffle; pre-salt or let AQE split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] | None = None,
    right_on: str | None = None,
    direction: str = "backward",
    suffix: str = "_right",
    tolerance: Column | None = None,
) -> DataFrame:
    """For each left row, attach the closest right row at-or-before
    (direction='backward'), at-or-after ('forward'), or closest in
    absolute gap either way ('nearest', ties -> the earlier/backward
    row), optionally matching equal ``by`` keys. Left rows with no match
    keep NULL right columns (reference fallback semantics,
    cookbook.rst:342).

    Implementation: tag both sides, union on a common schema, and compute
    ``last(right_value, ignorenulls=True)`` over a window ordered by
    (time, side) — right rows sort before left rows at equal timestamps,
    making the match inclusive (ties: a right row at exactly left.ts
    matches, same as DuckDB ASOF JOIN). 'nearest' evaluates the backward
    and forward windows over the SAME union (one shuffle on the by keys,
    two in-partition sorts) and picks per row.

    ``tolerance``: max allowed gap (a Column interval or numeric), e.g.
    ``F.expr("INTERVAL 1 HOUR")``; matches farther than this are nulled.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction}"
        )
    right_on = right_on or on
    by_cols = [by] if isinstance(by, str) else list(by or [])
    if not by_cols and (left.isStreaming or right.isStreaming):
        # on unbounded input the single-partition fallback is not a
        # parity convenience but an unkillable sequential stage —
        # refuse outright (batch keeps the documented warn-fallback).
        # Checked before the union is built: Spark would otherwise
        # reject a streaming/batch union with a less actionable error.
        raise ValueError(
            "asof_join: streaming input requires a partitioning 'by' "
            "key — the no-key fallback sorts the whole stream in ONE "
            "task and cannot scale. Pass by=<key column(s)>."
        )

    right_vals = [c for c in right.columns if c not in by_cols and c != right_on]
    # Project both sides onto one schema: by, _t, _side, left cols, right cols.
    lsel = (
        [F.col(c) for c in by_cols]
        + [F.col(on).alias("_t"), F.lit(1).alias("_side")]
        + [F.col(c) for c in left.columns if c not in by_cols]
        + [F.lit(None).cast(right.schema[c].dataType).alias(c + suffix) for c in right_vals]
        + [F.lit(None).cast(right.schema[right_on].dataType).alias("_rt")]
    )
    rsel = (
        [F.col(c) for c in by_cols]
        + [F.col(right_on).alias("_t"), F.lit(0).alias("_side")]
        + [F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in by_cols]
        + [F.col(c).alias(c + suffix) for c in right_vals]
        + [F.col(right_on).alias("_rt")]
    )
    unioned = left.select(*lsel).unionByName(right.select(*rsel))

    if not by_cols:
        from slipstream_async_spark.operators.handlers import warn_global_sort

        warn_global_sort("asof_join", key_param="by")

    def mk_window(desc: bool) -> Window:
        order = [
            F.col("_t").desc() if desc else F.col("_t").asc(),
            F.col("_side").asc(),
        ]
        return (
            Window.partitionBy(*by_cols).orderBy(*order)
            if by_cols
            else Window.orderBy(*order)
        ).rowsBetween(Window.unboundedPreceding, 0)

    if direction in ("backward", "forward"):
        w = mk_window(desc=direction == "forward")
        filled = unioned
        for c in right_vals:
            filled = filled.withColumn(
                c + suffix, F.last(c + suffix, ignorenulls=True).over(w)
            )
        filled = filled.withColumn("_rt", F.last("_rt", ignorenulls=True).over(w))
        out = filled.filter(F.col("_side") == 1)
        if tolerance is not None:
            gap_ok = (
                (F.col("_t") - F.col("_rt")) <= tolerance
                if direction == "backward"
                else (F.col("_rt") - F.col("_t")) <= tolerance
            )
            for c in right_vals:
                out = out.withColumn(c + suffix, F.when(gap_ok, F.col(c + suffix)))
            out = out.withColumn("_rt", F.when(gap_ok, F.col("_rt")))
        return out.drop("_t", "_side", "_rt")

    # nearest: fill from both directions over the same union, pick per row
    wb, wf = mk_window(desc=False), mk_window(desc=True)
    filled = unioned
    for c in right_vals:
        filled = (
            filled.withColumn(
                c + "__b", F.last(c + suffix, ignorenulls=True).over(wb)
            ).withColumn(c + "__f", F.last(c + suffix, ignorenulls=True).over(wf))
        )
    filled = (
        filled.withColumn("_rtb", F.last("_rt", ignorenulls=True).over(wb))
        .withColumn("_rtf", F.last("_rt", ignorenulls=True).over(wf))
    )
    out = filled.filter(F.col("_side") == 1)
    # backward wins when forward is absent, or both exist and the
    # backward gap is <= the forward gap (tie -> earlier row)
    choose_b = F.col("_rtf").isNull() | (
        F.col("_rtb").isNotNull()
        & ((F.col("_t") - F.col("_rtb")) <= (F.col("_rtf") - F.col("_t")))
    )
    for c in right_vals:
        out = out.withColumn(
            c + suffix, F.when(choose_b, F.col(c + "__b")).otherwise(F.col(c + "__f"))
        ).drop(c + "__b", c + "__f")
    out = out.withColumn(
        "_rt", F.when(choose_b, F.col("_rtb")).otherwise(F.col("_rtf"))
    )
    if tolerance is not None:
        gap_ok = F.when(
            F.col("_rt") <= F.col("_t"),
            (F.col("_t") - F.col("_rt")) <= tolerance,
        ).otherwise((F.col("_rt") - F.col("_t")) <= tolerance)
        for c in right_vals:
            out = out.withColumn(c + suffix, F.when(gap_ok, F.col(c + suffix)))
        out = out.withColumn("_rt", F.when(gap_ok, F.col("_rt")))
    return out.drop("_t", "_side", "_rt", "_rtb", "_rtf")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
    how: str = "inner",
) -> DataFrame:
    """Equi-key join constrained to a time interval:
    ``right_ts BETWEEN left_ts - lower AND left_ts + upper`` — the batch
    form of a watermarked stream-stream join (reference J2,
    cookbook.rst:292). ``lower``/``upper`` are interval SQL strings, e.g.
    ``"INTERVAL 5 MINUTES"``.
    """
    lk, rk = left.alias("l"), right.alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.expr(f"l.{left_ts} - {lower}"))
        & (F.col(f"r.{right_ts}") <= F.expr(f"l.{left_ts} + {upper}"))
    )
    return lk.join(rk, cond, how)


def lookup_join(
    stream: DataFrame,
    dim: DataFrame,
    on,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Enrich a (possibly unbounded) DataFrame against a dimension table —
    the reference's cache-lookup enrichment (J3). Broadcasts the dimension
    by default: at 100 TB the fact side must never shuffle for a
    small-dimension join.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on, how)


def scd2_build(
    df: DataFrame,
    key: str,
    ts_col: str,
    attr_cols: list[str],
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Build a type-2 slowly-changing dimension from an event/update
    log: collapse consecutive rows whose tracked attributes are
    unchanged, emit one row per VERSION with ``valid_from`` /
    ``valid_to`` (exclusive, NULL while current) and ``is_current`` —
    the standard warehouse dimension-history shape (Kimball SCD type 2),
    and the batch analog of the reference's keyed cache upserts
    (slipstream/caching.py: last write per key wins; here every write
    is kept with its validity interval).

    Change detection is a null-safe struct compare against the lag row;
    ``order_cols`` breaks timestamp ties deterministically (pass the
    event's unique id). Two windows, both partitioned BY KEY — no
    global sort, shuffle keyed on the dimension key, scale-safe for
    billions of keys.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(key).orderBy(*order)
    cur = F.struct(*[F.col(c) for c in attr_cols])
    changed = ~cur.eqNullSafe(F.lag(cur).over(w))
    versions = df.withColumn(
        "_chg", F.coalesce(changed, F.lit(True))
    ).filter(F.col("_chg"))
    wv = Window.partitionBy(key).orderBy(*order)
    return versions.select(
        key,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(wv).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())
