from .joins import (
    purchase_click_attribution,
    stream_stream_interval_join,
)
from .kmeans_stream import (
    streaming_assign,
    streaming_cluster_counts,
    windowed_cluster_stats,
)
from .sessions import (
    batch_sessions_via_session_window,
    streaming_dedup,
    streaming_sessions,
)

__all__ = [
    "batch_sessions_via_session_window",
    "purchase_click_attribution",
    "stream_stream_interval_join",
    "streaming_assign",
    "streaming_dedup",
    "streaming_cluster_counts",
    "streaming_sessions",
    "windowed_cluster_stats",
]
