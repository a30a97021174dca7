"""Source-mixture design for pretraining corpora.

Temperature-based mixture weighting is the standard way multi-source /
multilingual training sets are balanced (sampling probability
``p_s ∝ n_s^alpha``, e.g. alpha=0.3 in multilingual BERT, alpha=0.7-ish
in mT5): ``alpha=1`` keeps natural proportions, ``alpha=0`` forces a
uniform mix, and values in between up-weight small sources without
letting them dominate.

The reference has no corpus surface (single-stream dataflow); this
extends SURVEY §2's M7 training-data inventory. Everything is one
partial-aggregated ``groupBy`` plus a single-row broadcast of the
normalizer — at 100 TB the only full-data pass is the token count, which
upstream stats jobs usually already produced (pass ``pre_aggregated``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def temperature_mix(
    df: DataFrame,
    source_col: str,
    size_col: str,
    alpha: float = 0.5,
    token_budget: int = 1_000_000_000,
    pre_aggregated: bool = False,
) -> DataFrame:
    """Per-source mixture weights ``w_s = tokens_s^alpha / Σ tokens^alpha``
    and the implied epoch count ``budget * w_s / tokens_s`` (how many
    times a source is repeated to fill the budget — the over-sampling /
    duplication-risk gauge).

    ``df`` is one row per document with ``size_col`` = its token count
    (or, with ``pre_aggregated``, one row per source with ``n_docs`` and
    summed ``size_col``). Token totals are summed as exact integers; only
    the final weight is floating point.

    Scale shape: partial-aggregate shuffle on ``source_col`` (hundreds of
    sources, never hot), then the one-row normalizer joins back via
    broadcast nested loop — no second pass over the data.
    """
    if pre_aggregated:
        per = df.select(
            source_col,
            F.col("n_docs"),
            F.col(size_col).cast("bigint").alias("tokens"),
        )
    else:
        per = df.groupBy(source_col).agg(
            F.count("*").alias("n_docs"),
            F.sum(size_col).cast("bigint").alias("tokens"),
        )
    powed = F.pow(F.col("tokens").cast("double"), F.lit(float(alpha)))
    total = per.agg(F.sum(powed).alias("_z"))
    weight = powed / F.col("_z")
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            source_col,
            "n_docs",
            "tokens",
            F.round(weight, 6).alias("weight"),
            F.round(
                F.lit(float(token_budget)) * weight / F.col("tokens"), 6
            ).alias("epochs"),
        )
    )
