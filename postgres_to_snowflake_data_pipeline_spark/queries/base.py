"""Shared helpers for the query catalog.

Every query in the catalog is a pure function ``(spark, sf_dir) -> DataFrame``
over the driver-generated parquet tables, paired with an ANSI-SQL oracle
string that DuckDB runs on the same files. Column names/types are aligned
between the two so the driver's order-insensitive value-hash matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-generated parquet table (columnar scan; Catalyst
    pushes filters/projections from downstream operators into this scan)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
