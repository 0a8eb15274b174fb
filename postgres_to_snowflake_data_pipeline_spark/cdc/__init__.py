"""CDC layer: change-event schemas, deterministic generator, LWW dedup,
Arrow schema normalization, and the merge-apply pipeline."""

from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import (  # noqa: F401
    CHANGE_EVENT_SCHEMA,
    CHANGE_EVENT_V2_SCHEMA,
    TRANSCRIPT_SCHEMA,
)
