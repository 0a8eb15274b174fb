"""Structured Streaming wrapper around the batch merge-apply."""

from postgres_to_snowflake_data_pipeline_spark.streaming.pipeline import (  # noqa: F401
    run_stream,
)
