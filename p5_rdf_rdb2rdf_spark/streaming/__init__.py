from .incremental import stream_mapping, stream_source, write_triples_stream

__all__ = ["stream_mapping", "stream_source", "write_triples_stream"]
