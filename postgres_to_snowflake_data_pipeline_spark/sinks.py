"""Egress sinks (SURVEY.md §2.1 S5/S6/S10/S11/S12 parity).

The reference's sinks are: date-partitioned Parquet to S3
(/root/reference/scripts/export_to_s3.py:95-114, key layout :103-106),
CREATE-OR-REPLACE warehouse tables, a CTAS summary table, a JDBC report
writeback (/root/reference/dags/silver_layer_dag.py:82-127), and JSON/
Markdown documents. Spark-first equivalents below; the lake table itself
(lake/table.py) is the primary sink for CDC state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_partitioned_snapshot(
    df: DataFrame,
    path: str,
    date_col: str = "ts",
    mode: str = "overwrite",
) -> None:
    """Date-partitioned Parquet export — the reference's
    ``data/{table}/{YYYY}/{MM}/{DD}/`` S3 layout (export_to_s3.py:103-106)
    as hive-style partitions, so downstream readers get partition pruning
    for free."""
    (
        df.withColumn("_y", F.year(date_col))
        .withColumn("_m", F.month(date_col))
        .withColumn("_d", F.dayofmonth(date_col))
        .write.partitionBy("_y", "_m", "_d")
        .mode(mode)
        .parquet(path)
    )


def write_report_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Create-or-replace analytical report table (the Silver CTAS,
    s3_to_snowflake_dag.py:209-255 / silver_layer_dag.py:41-69)."""
    df.write.mode(mode).parquet(path)


def write_report_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    properties: dict[str, str] | None = None,
) -> None:
    """JDBC report writeback (the reference recomputes the report into
    Supabase, silver_layer_dag.py:82-127; we write the already-computed
    DataFrame). Exercised end-to-end against embedded Derby in
    tests/test_jdbc.py."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.mode(mode).save()
