"""Structured Streaming: spatial predicates and windowed aggregation
driven synchronously through the memory sink (additive capability —
the reference has no streaming, SURVEY.md §2.5)."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def stream_dir(spark):
    """A small parquet directory usable as a file-stream source."""
    d = tempfile.mkdtemp(prefix="simba_stream_")
    df = spark.createDataFrame(
        [
            (0, "2024-01-01 00:00:30", 1, "click", 10.0),
            (1, "2024-01-01 00:01:10", 2, "view", 200.0),
            (2, "2024-01-01 00:02:45", 1, "click", 35.0),
            (3, "2024-01-01 00:07:20", 3, "view", 50.0),
            (4, "2024-01-01 00:08:05", 2, "click", 300.0),
        ],
        "event_id long, ts_s string, user_id long, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    df.write.mode("overwrite").parquet(d)
    yield d, df.schema
    shutil.rmtree(d, ignore_errors=True)


def _run_stream(spark, stream_df, name):
    q = (
        stream_df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def test_streaming_range_filter(spark, stream_dir):
    from simba_spark.streaming import streaming_range_filter

    d, schema = stream_dir
    src = spark.readStream.schema(schema).parquet(d)
    out = streaming_range_filter(src, ["value", "user_id"], (10.0, 1.0), (60.0, 2.0))
    got = _run_stream(spark, out, "stream_range_out")
    assert sorted(r.event_id for r in got.collect()) == [0, 2]


def test_streaming_circle_range(spark, stream_dir):
    from simba_spark.streaming import streaming_circle_range

    d, schema = stream_dir
    src = spark.readStream.schema(schema).parquet(d)
    out = streaming_circle_range(src, ["value", "user_id"], (30.0, 1.0), 10.0)
    got = _run_stream(spark, out, "stream_circle_out")
    assert sorted(r.event_id for r in got.collect()) == [2]


def test_streaming_windowed_counts(spark, stream_dir):
    from simba_spark.streaming import windowed_event_counts

    d, schema = stream_dir
    src = spark.readStream.schema(schema).parquet(d)
    agg = windowed_event_counts(src, window="5 minutes", slide="5 minutes")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_win_out")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql(
        "SELECT window.start AS ws, event_type, n_events, sum_value "
        "FROM stream_win_out ORDER BY ws, event_type"
    ).collect()
    by_key = {(str(r.ws), r.event_type): (r.n_events, r.sum_value) for r in rows}
    # first 5-minute window: clicks at 00:00:30 and 00:02:45, one view
    assert by_key[("2024-01-01 00:00:00", "click")] == (2, 45.0)
    assert by_key[("2024-01-01 00:00:00", "view")] == (1, 200.0)
    # second window: one view, one click
    assert by_key[("2024-01-01 00:05:00", "click")] == (1, 300.0)
    assert by_key[("2024-01-01 00:05:00", "view")] == (1, 50.0)
