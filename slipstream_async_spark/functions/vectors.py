"""Vector column expressions for embedding similarity.

Pure ``F.zip_with`` / ``F.aggregate`` expressions — JVM-side, sequential
left-to-right folds in index order, so the floating-point result is
bit-reproducible (and matched by an index-ordered fold in the DuckDB
oracle). Inputs are cast to DOUBLE before any arithmetic: float32 math
would diverge between engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Index-ordered fold of elementwise products."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine of the angle between two vectors; 0.0 when either norm is
    zero (padding/failed-encode artifacts) instead of NaN — NaN sorts
    FIRST under a descending Spark sort, which would rank broken vectors
    into every top-k."""
    d = norm(a) * norm(b)
    return F.when(d == 0.0, F.lit(0.0)).otherwise(dot(a, b) / d)
