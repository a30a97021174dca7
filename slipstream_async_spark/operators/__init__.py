from slipstream_async_spark.operators.handlers import (
    accumulate,
    fan_in,
    pairwise,
    pipe,
)
from slipstream_async_spark.operators.joins import (
    asof_join,
    interval_join,
    lookup_join,
)
from slipstream_async_spark.operators.aggregations import (
    dedup_keep_first,
    hopping_window_agg,
    session_windows,
    sliding_count_per_event,
    tumbling_window_agg,
)
from slipstream_async_spark.operators.skew import (
    key_skew_stats,
    salted_join,
)
from slipstream_async_spark.operators.packing import (
    chunk_stats,
    contiguous_pack,
)
from slipstream_async_spark.operators.sampling import (
    deterministic_sample,
    deterministic_stratified_sample,
    train_test_split,
)
from slipstream_async_spark.operators.mixing import (
    temperature_mix,
)
from slipstream_async_spark.operators.multimodal import (
    attach_payloads,
    decode_features,
    embed_media,
    media_metadata,
    resize_images,
    sample_frames,
)

__all__ = [
    "accumulate",
    "fan_in",
    "pairwise",
    "pipe",
    "asof_join",
    "interval_join",
    "lookup_join",
    "dedup_keep_first",
    "hopping_window_agg",
    "session_windows",
    "sliding_count_per_event",
    "tumbling_window_agg",
    "attach_payloads",
    "decode_features",
    "embed_media",
    "media_metadata",
    "resize_images",
    "sample_frames",
    "key_skew_stats",
    "salted_join",
    "chunk_stats",
    "contiguous_pack",
    "deterministic_sample",
    "deterministic_stratified_sample",
    "train_test_split",
    "temperature_mix",
]
