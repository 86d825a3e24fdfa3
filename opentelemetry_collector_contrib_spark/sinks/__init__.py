from .writers import SinkConfig, serialize_records, write_sink

__all__ = ["SinkConfig", "serialize_records", "write_sink"]
