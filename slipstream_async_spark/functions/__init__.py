from slipstream_async_spark.functions.text import (
    hash32,
    lang_id,
    quality_score,
    text_fingerprint,
    tokens,
)
from slipstream_async_spark.functions.vectors import cosine_similarity, dot, norm

__all__ = [
    "hash32",
    "lang_id",
    "quality_score",
    "text_fingerprint",
    "tokens",
    "cosine_similarity",
    "dot",
    "norm",
]
