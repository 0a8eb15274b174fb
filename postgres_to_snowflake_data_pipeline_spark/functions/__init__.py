"""Reusable column-expression builders (the engine's scalar/array function
library). Everything is pure `pyspark.sql.functions` composition — JVM-side,
codegen-friendly, no Python in the data path."""

from postgres_to_snowflake_data_pipeline_spark.functions.text import (
    minhash_signature_fast,
    norm_text,
    shingles,
    simhash32,
    tokens,
)
from postgres_to_snowflake_data_pipeline_spark.functions.vector import (
    cosine_similarity,
    dot,
    l2_norm,
    to_double_array,
)

__all__ = [
    "norm_text",
    "tokens",
    "shingles",
    "simhash32",
    "minhash_signature_fast",
    "to_double_array",
    "dot",
    "l2_norm",
    "cosine_similarity",
]
