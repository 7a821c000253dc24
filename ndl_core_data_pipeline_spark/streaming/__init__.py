from .jobs import (
    available_now_ingest,
    sessionized_stream,
    stream_dedup,
    watermarked_tumbling_agg,
)

__all__ = [
    "available_now_ingest",
    "sessionized_stream",
    "stream_dedup",
    "watermarked_tumbling_agg",
]
