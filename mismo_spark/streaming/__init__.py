from mismo_spark.streaming.incremental import incremental_link_stream

__all__ = ["incremental_link_stream"]
