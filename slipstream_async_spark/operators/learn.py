"""In-engine model fitting for data curation: logistic regression by
full-batch gradient descent, expressed as DataFrame aggregations.

Why this lives in a data engine: the modern curation stack (CCNet,
RefinedWeb, DCLM) filters corpora with LEARNED quality classifiers — a
linear/logistic model over cheap document features, trained to separate
a trusted target domain from the raw crawl. At 100 TB the features and
the training pass are exactly the engine's job: each gradient step is
one partial-aggregated scan (``avg((y - sigmoid(w·x)) * x)``), the
weight vector is a handful of scalars, and scoring is a pure projection.
No MLlib dependency, no driver-side data: only the d+1 weight scalars
ever leave the cluster, once per step.

Determinism/cross-engine contract: features arrive pre-rounded (6 dp),
weights are re-rounded to 6 dp after every step, and the step count is
fixed — so an independent engine (the DuckDB oracle generates the same
fixed step chain) reproduces the trained weights bit-for-bit; the only
float hazards are libm ``exp`` (1-ulp class) and summation order,
both absorbed by the per-step rounding.

The reference is a stream processor with no corpus/ML surface; this
extends SURVEY §2's M7 training-data inventory (the 'learned filter'
row next to the hand-rule gates in quality_feature_matrix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def logistic_fit(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    steps: int = 5,
    lr: float = 1.0,
) -> list[float]:
    """Fit logistic-regression weights ``[bias, w_1..w_d]`` by ``steps``
    full-batch gradient-descent rounds over ``df``.

    Each round is ONE aggregation job over the data (the scan cost is
    inherent to full-batch GD — same shape as a k-means iteration); the
    collected result is a single row of d+1 gradient means. Weights are
    rounded to 6 dp per step (see module docstring). Labels are 0/1;
    features should be bounded (roughly [-1, 1]) for lr ~ 1 to behave.
    """
    # NULL features/labels would silently skew each gradient component
    # over a DIFFERENT row subset (avg skips nulls per column); an empty
    # frame would make every avg None and crash the update arithmetic.
    df = df.dropna(subset=[label_col, *feature_cols])
    w = [0.0] * (len(feature_cols) + 1)
    y = F.col(label_col).cast("double")
    xs = [F.lit(1.0)] + [F.col(c).cast("double") for c in feature_cols]
    for _ in range(steps):
        z = sum((F.lit(w[j]) * xs[j] for j in range(len(xs))), F.lit(0.0))
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        row = df.agg(
            *[F.avg((y - p) * xs[j]).alias(f"g{j}") for j in range(len(xs))]
        ).collect()[0]
        if row[0] is None:
            raise ValueError(
                "logistic_fit: no non-null training rows to fit on"
            )
        w = [round(w[j] + lr * row[j], 6) for j in range(len(xs))]
    return w


def logistic_score(
    df: DataFrame,
    feature_cols: list[str],
    weights: list[float],
) -> F.Column:
    """The score expression ``sigmoid(w·[1, x])`` for trained
    ``weights`` — a pure projection to attach to any scan."""
    xs = [F.lit(1.0)] + [F.col(c).cast("double") for c in feature_cols]
    z = sum(
        (F.lit(weights[j]) * xs[j] for j in range(len(xs))), F.lit(0.0)
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def kmeans_fit(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means over an embedding column, fixed-iteration and
    deterministic — the TRAINED coarse quantizer the IVF/IVFADC family's
    docstrings promise ("swap in trained centroids for recall"): seeds
    are the k smallest-md5-hash vectors (the same rule as ``ivf_index``,
    so an independent engine reproduces them), then ``iters`` rounds of
    assign (max-cosine centroid per vector) + update (per-cluster
    coordinate mean).

    Scale shape per iteration: assignment is a broadcast of k centroids
    against one corpus scan + a per-vector argmax window; the update is
    the posexplode -> groupBy(list, pos) -> avg partial-agg shape
    (_label_centroids' rule: the shuffle carries (list, pos, partial
    sums), never whole vectors, so a huge cluster spreads over ``dim``
    reducers). Centroids are localCheckpointed per round (k rows) so
    lineage doesn't re-derive earlier rounds. An emptied cluster keeps
    its previous centroid (deterministic, no reseeding).

    Determinism contract: centroid coordinates and the assignment
    cosine are rounded to 6 dp every round, so the fixed-step DuckDB
    oracle replays the identical trajectory. Returns (list_id 0..k-1,
    centroid ARRAY<DOUBLE>).
    """
    from pyspark.sql import Window

    from slipstream_async_spark.functions.text import hash32

    seeds = (
        corpus.withColumn("_h", hash32(F.col(id_col).cast("string")))
        .orderBy("_h", id_col)
        .limit(k)
    )
    w_seed = Window.orderBy("_h", id_col)  # k rows — tiny, single task
    cents = seeds.select(
        (F.row_number().over(w_seed) - 1).cast("bigint").alias("list_id"),
        F.transform(
            F.col(vec_col), lambda x: F.round(x.cast("double"), 6)
        ).alias("centroid"),
    ).localCheckpoint()
    from slipstream_async_spark.operators.similarity import (
        assign_nearest_centroid,
    )

    for _ in range(iters):
        # Arrow exact-fold lane: same round(cos, 6)-then-argmax decision
        # as the former crossJoin + window (margin superset + Spark's
        # own round/window pick the winner), ~1 candidate row per
        # vector instead of k.
        assigned = assign_nearest_centroid(
            corpus,
            cents,
            id_col=id_col,
            vec_col=vec_col,
            cent_id_col="list_id",
            cent_vec_col="centroid",
            rounded=True,
        )
        means = (
            assigned.select(
                "list_id", F.posexplode(vec_col).alias("pos", "val")
            )
            .groupBy("list_id", "pos")
            .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("v"))
            .groupBy("list_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "v"))
                ).alias("s")
            )
            .select(
                "list_id",
                F.transform("s", lambda x: x["v"]).alias("_new"),
            )
        )
        cents = (
            cents.join(F.broadcast(means), "list_id", "left")
            .select(
                "list_id",
                F.coalesce(F.col("_new"), F.col("centroid")).alias(
                    "centroid"
                ),
            )
            .localCheckpoint()
        )
    return cents
