from slipstream_async_spark.streaming.pipeline import Pipeline, handle
from slipstream_async_spark.streaming.checkpointing import Checkpoint, Dependency
from slipstream_async_spark.streaming.state import StateTable

__all__ = ["Pipeline", "handle", "Checkpoint", "Dependency", "StateTable"]
