"""Streaming operators (additive — reference has none, SURVEY §2.5)."""

from __future__ import annotations

from typing import Optional, Sequence

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


def streaming_exact_dedup(
    stream_df: DataFrame,
    text_col: str = "text",
    ts_col: Optional[str] = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: drop events whose normalized-text
    fingerprint was already seen. With `ts_col`, the dedup state is
    bounded by the watermark (`dropDuplicatesWithinWatermark`) — the
    production shape for unbounded ingest; without it, state grows with
    distinct keys (only for bounded backfills).

    Same fingerprint as the batch `dedup.exact_dedup`, so a backfill and
    the live stream agree on what is a duplicate.
    """
    from ..operators.text import fingerprint

    with_fp = fingerprint(stream_df, text_col, "__fp")
    if ts_col is not None:
        return with_fp.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["__fp"]
        ).drop("__fp")
    return with_fp.dropDuplicates(["__fp"]).drop("__fp")


def streaming_distance_join(
    stream_df: DataFrame,
    static_df: DataFrame,
    stream_cols: Sequence[str],
    static_cols: Sequence[str],
    radius: float,
    static_prefix: str = "s_",
) -> DataFrame:
    """Stream-static distance join: each streaming point joined to every
    static point within `radius` (closed bound — same contract as the
    batch grid join, DJSpark semantics).

    Physical shape: the static side is exploded to every grid cell its
    r-buffer touches (done once, re-used every micro-batch); the stream
    row computes its single cell — a stream-static equi-join on the cell
    key, which Spark executes as a broadcast/hash join per batch with no
    stream-side shuffle. The exact-distance refine runs codegen'd.
    """
    r = float(radius)
    assert r >= 0.0
    s = 2.0 * r if r > 0 else 1.0
    d = len(stream_cols)
    assert d == len(static_cols)

    static_p = static_df.select(
        [F.col(c).alias(f"{static_prefix}{c}") for c in static_df.columns]
    )
    pcols = [f"{static_prefix}{c}" for c in static_cols]
    lo = [F.floor((F.col(c) - F.lit(r)) / F.lit(s)).cast("long") for c in pcols]
    hi = [F.floor((F.col(c) + F.lit(r)) / F.lit(s)).cast("long") for c in pcols]
    sg = static_p
    for i in range(d):
        sg = sg.withColumn(f"__c{i}", F.explode(F.sequence(lo[i], hi[i])))
    sg = sg.withColumn(
        "__cell", F.struct(*[F.col(f"__c{i}").alias(f"c{i}") for i in range(d)])
    ).drop(*[f"__c{i}" for i in range(d)])

    cell = F.struct(
        *[
            F.floor(F.col(c) / F.lit(s)).cast("long").alias(f"c{i}")
            for i, c in enumerate(stream_cols)
        ]
    )
    st = stream_df.withColumn("__cell", cell)

    from ..functions import dist2_cols

    pred = dist2_cols(list(stream_cols), pcols) <= F.lit(r * r)
    return st.join(sg, on="__cell", how="inner").filter(pred).drop("__cell")


def windowed_event_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "5 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
    value_col: Optional[str] = "value",
) -> DataFrame:
    """Watermarked tumbling/sliding window counts — the canonical
    late-data-tolerant streaming aggregation. `value_col` adds a sum
    aggregate; pass None for streams without a numeric value column."""
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias(f"sum_{value_col}"))
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window, slide), F.col(key_col))
        .agg(*aggs)
    )
