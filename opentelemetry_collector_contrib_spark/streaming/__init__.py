from .stream_pipeline import streaming_pipeline, streaming_counts

__all__ = ["streaming_pipeline", "streaming_counts"]
