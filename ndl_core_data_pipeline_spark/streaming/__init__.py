from .jobs import (
    available_now_ingest,
    late_data_metrics,
    observed_tumbling_agg,
    stream_stream_join,
    foreach_batch_writer,
    sessionized_stream,
    stateful_running_totals,
    stream_dedup,
    stream_static_enrich,
    watermarked_tumbling_agg,
)

__all__ = [
    "available_now_ingest",
    "late_data_metrics",
    "observed_tumbling_agg",
    "stream_stream_join",
    "foreach_batch_writer",
    "sessionized_stream",
    "stateful_running_totals",
    "stream_dedup",
    "stream_static_enrich",
    "watermarked_tumbling_agg",
]
