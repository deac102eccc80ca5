"""Structured Streaming surface.

The reference has **no** streaming operators (SURVEY.md §2.5) — this
module is additive. Because all simba_spark spatial predicates are plain
Column expressions, they compose with ``readStream`` unchanged; helpers
here cover the windowed-aggregation patterns a pipeline needs.
"""

from ..operators.sessionize import sessionize_stream
from .ops import (
    streaming_asof_join,
    streaming_static_asof_join,
    streaming_circle_range,
    streaming_distance_join,
    streaming_geo_distance_join,
    streaming_geo_knn_join,
    streaming_stream_geo_distance_join,
    streaming_exact_dedup,
    streaming_kmeans_assign,
    streaming_pca_project,
    streaming_interval_join,
    streaming_knn_join,
    streaming_neardup_flag,
    streaming_psi,
    streaming_trending_terms,
    streaming_range_filter,
    streaming_stream_distance_join,
    streaming_stream_interval_join,
    streaming_stream_knn_join,
    streaming_session_window_stats,
    streaming_windowed_ohlc,
    windowed_event_counts,
)

__all__ = [
    "streaming_asof_join",
    "streaming_static_asof_join",
    "streaming_range_filter",
    "streaming_circle_range",
    "streaming_distance_join",
    "streaming_geo_distance_join",
    "streaming_geo_knn_join",
    "streaming_stream_geo_distance_join",
    "streaming_exact_dedup",
    "streaming_kmeans_assign",
    "streaming_pca_project",
    "streaming_knn_join",
    "streaming_neardup_flag",
    "streaming_interval_join",
    "streaming_stream_distance_join",
    "streaming_stream_interval_join",
    "streaming_stream_knn_join",
    "streaming_session_window_stats",
    "streaming_windowed_ohlc",
    "streaming_psi",
    "streaming_trending_terms",
    "windowed_event_counts",
    "sessionize_stream",
]
