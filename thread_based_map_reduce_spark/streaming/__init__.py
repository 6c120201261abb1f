from .events import tumbling_counts_stream, run_stream_to_memory, user_running_totals_stream

__all__ = ["tumbling_counts_stream", "run_stream_to_memory", "user_running_totals_stream"]
