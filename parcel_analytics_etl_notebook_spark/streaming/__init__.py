from parcel_analytics_etl_notebook_spark.streaming.joins import (
    stream_static_enrich,
    stream_stream_purchase_after_view,
)
from parcel_analytics_etl_notebook_spark.streaming.sessions import (
    read_events_stream,
    streaming_lifecycle_counts,
    streaming_session_stats,
)

__all__ = [
    "read_events_stream",
    "stream_static_enrich",
    "stream_stream_purchase_after_view",
    "streaming_lifecycle_counts",
    "streaming_session_stats",
]
