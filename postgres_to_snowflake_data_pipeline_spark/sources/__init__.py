"""Change-feed sources (the engine's ingress surface).

Parity with the reference's source inventory (SURVEY.md §2.1): CSV/file
scans, Postgres table scans, and bulk loads become — Spark-first — a
file-backed WAL tail (batch + streaming over the same files), a rate-based
synthetic stream, and a JDBC snapshot/changefeed reader. Everything
downstream of a source is source-agnostic (the merge pipeline takes any
DataFrame with the change-event schema).
"""

from postgres_to_snowflake_data_pipeline_spark.sources.feed import (
    jdbc_changefeed,
    rate_change_stream,
    read_feed_batch,
    read_feed_stream,
)
from postgres_to_snowflake_data_pipeline_spark.sources.files import (
    read_csv_table,
    read_json_table,
)

__all__ = [
    "read_feed_batch",
    "read_feed_stream",
    "rate_change_stream",
    "jdbc_changefeed",
    "read_csv_table",
    "read_json_table",
]
