"""Streaming operators (additive — reference has none, SURVEY §2.5)."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import in_circle_range, in_range


def streaming_range_filter(
    stream_df: DataFrame, cols: Sequence, low, high
) -> DataFrame:
    """Spatial range filter on a stream — identical Column predicate as
    batch (closed bounds), proving the predicates are engine-agnostic."""
    return stream_df.filter(in_range(cols, low, high))


def streaming_circle_range(
    stream_df: DataFrame, cols: Sequence, center, radius: float
) -> DataFrame:
    return stream_df.filter(in_circle_range(cols, center, radius))


def windowed_event_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "5 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling/sliding window counts — the canonical
    late-data-tolerant streaming aggregation."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window, slide), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
    )
