"""Streaming windowed aggregation ≡ batch result (§2.9 parity evidence).

The same tumbling-window rollup computed (a) by the batch catalog query
and (b) by a Structured Streaming query with watermark + window over the
same events, drained with availableNow — final results must be identical.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_to_snowflake_data_pipeline_spark.queries.reference import q16_hourly_rollup

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_window_agg_matches_batch(spark, tmp_path):
    # the parquet stores TIMESTAMP_NTZ; watermarks require TIMESTAMP, so
    # both sides are cast (session TZ is pinned UTC -> identical instants)
    batch = q16_hourly_rollup(spark, SF_DIR).withColumn(
        "hour_start", F.col("hour_start").cast("timestamp")
    )

    # file-stream source needs a directory
    import shutil

    feed_dir = tmp_path / "events_feed"
    feed_dir.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", feed_dir / "part-0.parquet")

    schema = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(str(feed_dir))
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("hour_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("hourly")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not drain within deadline"
    streamed = spark.table("hourly")
    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0
