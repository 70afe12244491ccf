from .incremental import (
    stream_mapping,
    stream_source,
    streaming_first_seen,
    streaming_session_stats,
    windowed_triple_counts,
    write_triples_stream,
)

__all__ = [
    "stream_mapping",
    "stream_source",
    "streaming_first_seen",
    "streaming_session_stats",
    "windowed_triple_counts",
    "write_triples_stream",
]
