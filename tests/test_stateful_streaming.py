"""Custom stateful operator (applyInPandasWithState): state persists across
micro-batches and the final emitted values equal the batch ground truth."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_to_snowflake_data_pipeline_spark.cdc.generator import change_events, write_feed
from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import CHANGE_EVENT_SCHEMA
from postgres_to_snowflake_data_pipeline_spark.sources import read_feed_stream
from postgres_to_snowflake_data_pipeline_spark.streaming.stateful import (
    conversation_progress,
)


def test_progress_state_across_batches_matches_batch_truth(spark, tmp_path):
    events = change_events(spark, 5000, n_convs=80)
    feed = str(tmp_path / "feed")
    write_feed(events, feed, n_files=5)

    stream = read_feed_stream(spark, feed, CHANGE_EVENT_SCHEMA, max_files_per_trigger=2)
    # ts arrives as TIMESTAMP_NTZ from parquet; stateful ops need none of it
    q = (
        conversation_progress(stream)
        .writeStream.format("memory")
        .queryName("progress")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not drain within deadline"

    # memory sink in update mode appends each emission; keep the LAST row
    # per conversation (the final state after all batches)
    emitted = spark.table("progress").toPandas()
    final = emitted.groupby("conv_id").last()

    truth = (
        events.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("events_seen"),
            F.countDistinct("turn_idx").alias("distinct_turns"),
            F.max("lsn").alias("max_lsn"),
        )
        .toPandas()
        .set_index("conv_id")
    )
    assert len(final) == len(truth)
    for conv_id, row in truth.iterrows():
        got = final.loc[conv_id]
        assert got["events_seen"] == row["events_seen"], conv_id
        assert got["distinct_turns"] == row["distinct_turns"], conv_id
        assert got["max_lsn"] == row["max_lsn"], conv_id
