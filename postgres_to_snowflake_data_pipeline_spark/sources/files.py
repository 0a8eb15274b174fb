"""File-format sources beyond the parquet WAL feed.

CSV parity with the reference's loader (S1/P7): the reference reads CSVs
with csv.DictReader and cleans rows one at a time in Python
(/root/reference/scripts/load_data.py:111-117,153-155,173-177); here the
schema-enforced reader does the same work declaratively — malformed rows
dropped (or quarantined to a corrupt-record column), empty strings to
NULL, all JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv_table(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    drop_malformed: bool = True,
    null_value: str = "",
) -> DataFrame:
    """Schema-enforced CSV scan. ``drop_malformed=True`` maps to Spark's
    DROPMALFORMED (the reference's skip-rows-with-wrong-arity,
    load_data.py:173-177); otherwise PERMISSIVE keeps bad rows with NULLs.
    ``null_value`` treats empty strings as NULL (load_data.py:184-185)."""
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "DROPMALFORMED" if drop_malformed else "PERMISSIVE")
        .option("nullValue", null_value)
        .csv(path)
    )


def read_json_table(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """JSON lines scan (the reference's metadata documents are JSON,
    generate_postgres_dictionary.py:286-295)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
