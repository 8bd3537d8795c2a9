from .ops import (
    sessionize_stream, streaming_word_count, windowed_event_agg,
    running_user_totals_stateful,
)

__all__ = [
    "streaming_word_count", "windowed_event_agg", "sessionize_stream",
    "running_user_totals_stateful",
]
