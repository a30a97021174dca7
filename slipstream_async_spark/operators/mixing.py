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
    # sqrt for the alpha=0.5 default: IEEE sqrt is correctly rounded in
    # every engine, pow() is only ~1-ulp accurate — bit-stable weights
    # matter when downstream materialization thresholds on them.
    if alpha == 0.5:
        powed = F.sqrt(F.col("tokens").cast("double"))
    else:
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


def materialize_mixture(
    df: DataFrame,
    source_col: str,
    id_col: str,
    size_col: str,
    alpha: float = 0.5,
    token_budget: int = 100_000,
    salt: str = "mix",
) -> DataFrame:
    """Materialize the designed mixture as an actual sampled/duplicated
    corpus: every document of source ``s`` appears ``floor(epochs_s)``
    times, plus one more copy for the deterministic id-hash slice sized
    to the fractional part — over-represented sources are down-sampled
    (epochs < 1: only the fractional slice survives) and rare sources
    are repeated (epochs > 1: the duplication step of data scheduling).

    Membership/duplication derives from the PUBLISHED 6-decimal epochs
    (what ``temperature_mix`` reports), not the raw double — the
    materialized corpus matches the spec humans signed off on, and the
    decision threshold is bit-identical on any engine. Output = input
    row repeated with ``copy_id`` 1..n; deterministic and rerun-stable.

    Scale shape: the weight table is a per-source broadcast; copies come
    from ``explode(sequence(...))`` in the scan stage — no shuffle of
    the corpus, no driver loop, and epoch counts bound the blowup.
    """
    from slipstream_async_spark.operators.sampling import _BUCKETS, hash_bucket

    weights = temperature_mix(
        df, source_col, size_col, alpha=alpha, token_budget=token_budget
    ).select(source_col, "epochs")
    joined = df.join(F.broadcast(weights), source_col)
    n_full = F.floor("epochs")
    frac = F.col("epochs") - n_full
    extra = (
        hash_bucket(id_col, salt) < F.round(frac * F.lit(float(_BUCKETS)))
    ).cast("bigint")
    copies = (n_full + extra).cast("bigint")
    return (
        joined.withColumn("_copies", copies)
        .filter(F.col("_copies") >= 1)
        .withColumn(
            "copy_id",
            F.explode(F.sequence(F.lit(1).cast("bigint"), F.col("_copies"))),
        )
        .drop("_copies", "epochs")
    )


def epoch_capped_mix(
    df: DataFrame,
    source_col: str,
    size_col: str,
    alpha: float = 0.5,
    token_budget: int = 1_000_000_000,
    max_epochs: float = 4.0,
    rounds: int = 3,
    pre_aggregated: bool = False,
) -> DataFrame:
    """Temperature mixture under a repetition cap (the data-constrained
    regime — Muennighoff et al., "Scaling Data-Constrained Language
    Models", NeurIPS 2023: repeating data beyond ~4 epochs stops paying):
    each source's allocation is capped at ``max_epochs * tokens_s`` and
    the freed budget is re-spread over the still-uncapped sources in
    proportion to their temperature weights — a fixed-``rounds``
    waterfill (each round can only saturate MORE sources, so a handful
    of rounds reaches the fixpoint for realistic source counts; the
    round count is fixed, not convergence-tested, to keep the
    computation reproducible on any engine).

    Everything happens on the per-source aggregate (one row per source —
    control-plane-sized even at 100 TB): per round, one single-row
    broadcast carries (saturated allocation, unsaturated weight mass).
    No driver collect, no data-pass beyond the initial token count.

    Returns per source: tokens, weight, alloc_tokens (post-waterfill),
    epochs (= alloc/tokens, rounded), capped.
    """
    # localCheckpoint the per-source aggregate BEFORE the waterfill loop:
    # each round's totals-aggregate forks the lineage, and without
    # truncation every fork re-derives the aggregate from the raw corpus
    # — the plan showed 8 corpus scans for 3 rounds. The checkpoint is
    # one row per source (control-plane sized), so materializing it is
    # free and every round reads 20 rows instead of re-scanning 100 TB.
    base = temperature_mix(
        df, source_col, size_col, alpha=alpha,
        token_budget=token_budget, pre_aggregated=pre_aggregated,
    ).select(source_col, "n_docs", "tokens", "weight").localCheckpoint()
    budget = F.lit(float(token_budget))
    cap = F.col("tokens").cast("double") * F.lit(float(max_epochs))
    # round 0: the uncapped temperature allocation
    cur = base.withColumn("alloc", budget * F.col("weight"))
    for _ in range(rounds):
        cur = cur.withColumn("sat", F.col("alloc") >= cap)
        totals = cur.agg(
            F.sum(F.when(F.col("sat"), cap)).alias("_sat_alloc"),
            F.sum(F.when(~F.col("sat"), F.col("weight"))).alias("_z"),
        )
        cur = (
            cur.crossJoin(F.broadcast(totals))
            .withColumn(
                "alloc",
                F.when(F.col("sat"), cap).otherwise(
                    (budget - F.coalesce(F.col("_sat_alloc"), F.lit(0.0)))
                    * F.col("weight")
                    / F.col("_z")
                ),
            )
            .drop("_sat_alloc", "_z", "sat")
        )
    # Final hard clamp: a saturation cascade deeper than ``rounds`` can
    # leave the last redistribution pushing a source past its cap — the
    # contract (alloc <= max_epochs * tokens) must hold regardless, so
    # the residual budget is simply left unspent rather than violating
    # the repetition cap.
    final = F.least(F.col("alloc"), cap)
    return cur.select(
        source_col,
        "n_docs",
        "tokens",
        "weight",
        F.round(final, 2).alias("alloc_tokens"),
        F.round(final / F.col("tokens"), 6).alias("epochs"),
        (F.col("alloc") >= cap).alias("capped"),
    )


def curriculum_order(
    df: DataFrame,
    score_col: str,
    id_col: str,
    phases: int = 4,
    salt: str = "curr",
) -> DataFrame:
    """Curriculum data ordering (Bengio et al., ICML 2009): assign every
    row a training ``phase`` (1 = lowest-score band ... ``phases`` =
    highest) and a deterministic within-phase ``order_key``, so the
    training loader reads phase by phase, shuffled-but-reproducibly
    within each phase.

    Phases are EQUAL-WIDTH score bands between the global min and max —
    two scalars from one partial-aggregated pass, broadcast back (the
    scalar-subquery shape) — not equal-count ntiles: a global ntile
    needs a total order (single-partition window), which is exactly the
    shape that dies at 100 TB. ``order_key`` is the md5 hash of the id:
    the SORT KEY for the loader (write with
    ``repartitionByRange(phase, order_key)``), not a materialized
    ordinal — emitting 'position 7,381,224,551' would again need a
    global order.
    """
    from slipstream_async_spark.functions.text import hash32

    s = F.col(score_col).cast("double")
    bounds = df.agg(
        F.min(s).alias("_lo"), F.max(s).alias("_hi")
    )
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(phases))
    phase = F.when(
        F.col("_hi") == F.col("_lo"), F.lit(1)
    ).otherwise(
        F.least(
            F.lit(phases),
            (F.floor((s - F.col("_lo")) / width) + 1).cast("int"),
        )
    )
    return df.crossJoin(F.broadcast(bounds)).select(
        *[F.col(c) for c in df.columns],
        phase.cast("int").alias("phase"),
        hash32(
            F.concat(F.lit(salt), F.col(id_col).cast("string"))
        ).alias("order_key"),
    )
