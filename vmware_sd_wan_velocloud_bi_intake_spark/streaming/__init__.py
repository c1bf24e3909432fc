from .incremental import staleness_filter
from .jobs import streaming_event_dedup, streaming_hourly_scores

__all__ = ["staleness_filter", "streaming_event_dedup", "streaming_hourly_scores"]
