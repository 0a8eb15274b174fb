"""Stream-side lineage: per-micro-batch source offsets reconcile with both
the feed and the commit-side snapshot lineage (the full loop the north
rule names: source offset range ↔ rows in ↔ commit snapshot id)."""

from __future__ import annotations

import time

from postgres_to_snowflake_data_pipeline_spark.cdc.apply import lineage_df
from postgres_to_snowflake_data_pipeline_spark.cdc.generator import change_events, write_feed
from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import (
    CHANGE_EVENT_SCHEMA,
    TRANSCRIPT_SCHEMA,
)
from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable
from postgres_to_snowflake_data_pipeline_spark.streaming.listener import (
    attach_progress_listener,
    read_progress,
)
from postgres_to_snowflake_data_pipeline_spark.streaming.pipeline import run_stream


def test_listener_offsets_reconcile_with_commits(spark, tmp_path):
    events = change_events(spark, 4000, n_convs=200)
    feed = str(tmp_path / "feed")
    write_feed(events, feed, n_files=6)
    table = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, ("conv_id", "turn_idx"),
        n_buckets=4,
    )
    progress_path = str(tmp_path / "progress.jsonl")
    listener = attach_progress_listener(spark, progress_path)
    try:
        q = run_stream(spark, table, feed, CHANGE_EVENT_SCHEMA,
                       str(tmp_path / "ck"), max_files_per_trigger=2)
        assert q.awaitTermination(300), "stream did not drain within deadline"
        # listener events are delivered asynchronously on the driver bus
        deadline = time.time() + 30
        while time.time() < deadline:
            rows = [r for r in read_progress(progress_path)
                    if r["num_input_rows"]]
            if sum(r["num_input_rows"] for r in rows) >= events.count():
                break
            time.sleep(0.5)
    finally:
        spark.streams.removeListener(listener)

    # stream-side rows: every input row accounted for, offsets recorded
    assert sum(r["num_input_rows"] for r in rows) == events.count()
    for r in rows:
        (src,) = r["sources"]
        assert src["end_offset"] is not None
        assert src["rows"] == r["num_input_rows"]
    # the loop closes: stream batch ids == commit epochs, and per-batch
    # input rows match the commit-side lineage exactly
    commit_lineage = {
        row["epoch"]: row["rows_in"]
        for row in lineage_df(spark, table).collect()
    }
    stream_lineage = {r["batch_id"]: r["num_input_rows"] for r in rows}
    assert stream_lineage == commit_lineage
