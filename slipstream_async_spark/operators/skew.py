"""Skew mitigation: salted joins and skew diagnostics.

At 100 TB the failure mode of every keyed shuffle is a hot key: one task
receives the whole key's partition and the stage runs at the speed of
that straggler. AQE's skew-join splitting (on in session.py) handles
sort-merge cases at runtime; ``salted_join`` is the explicit form for
when the planner must be forced — e.g. a hot-key aggregation feeding a
join, or a streaming stage where AQE doesn't apply.

Scheme (standard salting):
- fact side: add ``_salt = pmod(hash(<row>), n_salts)`` — spreads each
  hot key over ``n_salts`` sub-partitions;
- dim side: explode each row into all ``n_salts`` salt values;
- join on (key, _salt): the hot key's rows now land on n_salts tasks.

The dim side grows n_salts×, so salt only when the dim is small or
pre-filtered — exactly the situation where the hot fact key is the
bottleneck. The reference has no analog (single process, no shuffle);
this is pure engine-scale machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the fact side salted across ``n_salts`` shuffle
    partitions per key and the dim side replicated to every salt.

    Result is row-identical to ``fact.join(dim, on, how)`` (supported
    how: inner / left) — only the physical key distribution changes.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner|left, got {how}")
    keys = [on] if isinstance(on, str) else list(on)
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )
    salted_dim = dim.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>")),
    )
    out = salted_fact.join(salted_dim, [*keys, "_salt"], how)
    return out.drop("_salt")


def key_skew_stats(df: DataFrame, key_cols: list[str], top: int = 20) -> DataFrame:
    """Per-key row counts + share of total for the heaviest keys — the
    diagnostic to run BEFORE choosing n_salts (one aggregation; at scale
    run it on a sample: ``df.sample(0.01)``).
    """
    counts = df.groupBy(*key_cols).agg(F.count("*").alias("n"))
    total = df.count()
    return (
        counts.withColumn("share", F.round(F.col("n") / F.lit(total), 6))
        .orderBy(F.col("n").desc())
        .limit(top)
    )
