"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship (the CDC engine end-to-end on
sf0.001); ``queries()``/``oracle_sql()`` expose the full catalog from
``postgres_to_snowflake_data_pipeline_spark.queries`` — every entry has a DuckDB
oracle, including the CDC replay itself (its oracle is the declarative
LWW/tombstone semantics the engine must converge to).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from postgres_to_snowflake_data_pipeline_spark.queries import (  # noqa: E402
    oracle_queries,
    spark_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: replay the sf0.001 change feed through the CDC engine
    (normalize → LWW dedup → bucketed tombstone merge → snapshot commit)
    and return the final transcripts state."""
    from postgres_to_snowflake_data_pipeline_spark.queries.cdcq import c01_cdc_replay_state

    return c01_cdc_replay_state(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return spark_queries()


def oracle_sql() -> dict[str, str]:
    return oracle_queries()
