from slipstream_async_spark.streaming.pipeline import Pipeline, handle
from slipstream_async_spark.streaming.checkpointing import Checkpoint, Dependency
from slipstream_async_spark.streaming.state import StateTable
from slipstream_async_spark.streaming.monitor import StreamHealthMonitor

__all__ = ["Pipeline", "handle", "Checkpoint", "Dependency", "StateTable", "StreamHealthMonitor"]
