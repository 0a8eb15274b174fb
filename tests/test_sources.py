"""Source abstraction: batch/stream feed readers and synthetic streams."""

from __future__ import annotations

from postgres_to_snowflake_data_pipeline_spark.cdc.generator import change_events, write_feed
from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import CHANGE_EVENT_SCHEMA
from postgres_to_snowflake_data_pipeline_spark.sources import (
    rate_change_stream,
    read_feed_batch,
    read_feed_stream,
)


def test_batch_and_stream_readers_agree(spark, tmp_path):
    events = change_events(spark, 2000, n_convs=100)
    feed = str(tmp_path / "feed")
    write_feed(events, feed, n_files=4)
    batch = read_feed_batch(spark, feed, CHANGE_EVENT_SCHEMA)
    assert batch.count() == events.count()
    stream = read_feed_stream(spark, feed)
    assert stream.isStreaming
    # parquet read relaxes nullability; names and types must match
    assert [(f.name, f.dataType) for f in stream.schema.fields] == [
        (f.name, f.dataType) for f in CHANGE_EVENT_SCHEMA.fields
    ]


def test_rate_stream_shares_event_projection(spark):
    """The rate source's projected schema equals the change-event schema
    (same deterministic projection as the batch generator)."""
    rs = rate_change_stream(spark, rows_per_second=10)
    assert rs.isStreaming
    assert [f.name for f in rs.schema.fields] == [
        f.name for f in CHANGE_EVENT_SCHEMA.fields
    ]


def test_generator_deterministic_across_parallelism(spark):
    a = change_events(spark, 3000, n_convs=100, num_partitions=2)
    b = change_events(spark, 3000, n_convs=100, num_partitions=16)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
