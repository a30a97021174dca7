"""Stateful streaming operators over Spark's managed per-key state store.

The reference's stateful model is "read cache[key], compute, write
cache[key]" inside a handler (getting_started.rst:113-123) with per-key
locks (T8). Spark's ``applyInPandasWithState`` gives the same per-key
read-modify-write with the locking, checkpointing, and partitioning
managed by the engine — state lives in the RocksDB state store provider
(the same storage engine the reference embeds, here sharded per
shuffle partition).

These helpers wrap the common shapes:

- ``stateful_fold``  — A1's incremental per-key aggregate (count/sum/...)
  emitting the running value per micro-batch, update-mode semantics.
- ``stateful_map``   — the general escape hatch: user fn over
  (key, iterator-of-batches, GroupState).

Scale note: state is hash-partitioned by key across
``spark.sql.shuffle.partitions`` tasks; one shuffle per micro-batch on
the grouping key — the distributed generalization of the reference's 16
striped locks (caching.py:135-139).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stateful_fold(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    fold: str = "count",
    out_col: str = "agg_value",
) -> DataFrame:
    """Running per-key fold over an unbounded DataFrame (A1).

    fold: 'count' | 'sum' | 'max' | 'min'. Emits one row per key per
    micro-batch with the updated running value — the same output cadence
    as the reference's per-message ``yield key, count`` (it emits on
    every message; micro-batching coarsens that to per-batch, the
    documented trade of SURVEY §3.5).
    """
    out_schema = ", ".join(
        [f"{k} string" for k in key_cols] + [f"{out_col} double"]
    )
    state_schema = "acc double"

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ):
        (acc,) = state.get if state.exists else (0.0,)
        n = 0.0
        vmax: float | None = None
        vmin: float | None = None
        vsum = 0.0
        for pdf in pdfs:
            col = pdf[value_col].astype(float)
            n += float(len(col))
            vsum += float(col.sum()) if len(col) else 0.0
            if len(col):
                m = float(col.max())
                vmax = m if vmax is None else max(vmax, m)
                m = float(col.min())
                vmin = m if vmin is None else min(vmin, m)
        if fold == "count":
            acc += n
        elif fold == "sum":
            acc += vsum
        elif fold == "max":
            acc = vmax if not state.exists else max(acc, vmax if vmax is not None else acc)
        elif fold == "min":
            acc = vmin if not state.exists else min(acc, vmin if vmin is not None else acc)
        else:
            raise ValueError(f"unknown fold {fold}")
        state.update((acc,))
        yield pd.DataFrame(
            {**{k: [str(v)] for k, v in zip(key_cols, key)}, out_col: [acc]}
        )

    return df.groupBy(*key_cols).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_map(
    df: DataFrame,
    key_cols: list[str],
    fn: Callable[[tuple, Iterable[pd.DataFrame], GroupState], Any],
    output_schema: str,
    state_schema: str,
    output_mode: str = "update",
    timeout: str = GroupStateTimeout.NoTimeout,
) -> DataFrame:
    """General custom stateful operator (the reference's arbitrary
    stateful handler, §2.9): user-supplied (key, batches, state) -> rows.
    """
    return df.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode=output_mode,
        timeoutConf=timeout,
    )


def streaming_dedup(df: DataFrame, keys: list[str], watermark_col: str,
                    delay: str) -> DataFrame:
    """A7 streaming dedup: drop duplicate keys with bounded state
    (dropDuplicatesWithinWatermark keeps state only ``delay`` long —
    unbounded-state dedup does not survive 100 TB streams)."""
    return df.withWatermark(watermark_col, delay).dropDuplicatesWithinWatermark(
        keys
    )
