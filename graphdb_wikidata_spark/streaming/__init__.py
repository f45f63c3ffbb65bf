from .streams import (
    dedup_within_watermark,
    events_stream,
    run_available_now,
    running_user_totals,
    session_stats,
    sliding_avg,
    tumbling_counts,
)

__all__ = [
    "events_stream",
    "tumbling_counts",
    "sliding_avg",
    "session_stats",
    "dedup_within_watermark",
    "running_user_totals",
    "run_available_now",
]
