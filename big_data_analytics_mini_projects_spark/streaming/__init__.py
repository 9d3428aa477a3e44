from .stream_stats import (  # noqa: F401
    events_stream,
    run_available_now,
    stream_global_stats,
    stream_hashbucket_sample,
    stream_hourly_counts,
)
