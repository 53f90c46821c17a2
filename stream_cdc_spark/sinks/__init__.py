from stream_cdc_spark.sinks.queue import (
    InMemoryQueue,
    QueueSink,
    pack_entries,
    prepare_message,
)

__all__ = ["InMemoryQueue", "QueueSink", "pack_entries", "prepare_message"]
