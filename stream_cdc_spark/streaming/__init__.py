from stream_cdc_spark.streaming.pipeline import CdcPipeline, replay_stream

__all__ = ["CdcPipeline", "replay_stream"]
