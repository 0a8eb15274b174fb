"""Concrete change-feed sources.

| source | reference analog | file:line |
|---|---|---|
| parquet WAL tail (batch+stream) | per-table CSV / S3 Parquet snapshot files | /root/reference/scripts/load_data.py:153-155; export_to_s3.py:95-114 |
| rate-based synthetic stream | sample-data generator | /root/reference/scripts/generate_sample_data.py:23-139 |
| JDBC snapshot/changefeed | `SELECT * FROM {table}` via psycopg2 | /root/reference/scripts/export_to_s3.py:74-76 |

The JDBC reader is configuration-complete but exercised only against a
real database (none exists in this sandbox); everything else is tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import CHANGE_EVENT_SCHEMA


def read_feed_batch(
    spark: SparkSession, feed_path: str, schema: T.StructType | None = None
) -> DataFrame:
    """Batch scan of a parquet WAL feed directory (LSN-sliced files).
    Column pruning + LSN-range predicate pushdown reach the footer, so an
    epoch slice reads only its own files."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(feed_path)


def read_feed_stream(
    spark: SparkSession,
    feed_path: str,
    schema: T.StructType = CHANGE_EVENT_SCHEMA,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-backed WAL tail: each parquet file is an LSN slice; new files
    appear over time. On a production cluster this is swapped for a
    Kafka/Kinesis/Debezium reader — downstream code is identical."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(feed_path)
    )


def rate_change_stream(
    spark: SparkSession,
    rows_per_second: int = 10_000,
    n_convs: int = 5000,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Unbounded synthetic change stream from Spark's rate source: the
    deterministic event projection (pure function of the rate counter) is
    shared with the batch generator, so streamed and pre-materialized feeds
    carry identical rows for the same indices."""
    from pyspark.sql import functions as F

    from postgres_to_snowflake_data_pipeline_spark.cdc.generator import event_projection

    reader = (
        spark.readStream.format("rate").option("rowsPerSecond", rows_per_second)
    )
    if num_partitions is not None:
        reader = reader.option("numPartitions", num_partitions)
    base = reader.load()  # columns: timestamp, value
    return base.select(*event_projection(F.col("value"), n_convs=n_convs, seed=seed))


def jdbc_changefeed(
    spark: SparkSession,
    url: str,
    dbtable: str,
    lsn_column: str = "lsn",
    lower_bound: int = 0,
    upper_bound: int = 1 << 40,
    num_partitions: int = 32,
    fetch_size: int = 10_000,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Partition-parallel JDBC scan of a logical-decoding table (e.g. a
    Postgres table fed by `pg_logical_slot_get_changes` or a Debezium
    outbox). Partitioning on the LSN column gives `num_partitions`
    concurrent range scans — the reference's single-threaded
    `pd.read_sql_query` (export_to_s3.py:74-76) parallelized. Exercised
    end-to-end against embedded Derby in tests/test_jdbc.py."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", dbtable)
        .option("partitionColumn", lsn_column)
        .option("lowerBound", str(lower_bound))
        .option("upperBound", str(upper_bound))
        .option("numPartitions", str(num_partitions))
        .option("fetchsize", str(fetch_size))
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()
