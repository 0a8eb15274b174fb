"""Snapshot-committed lake table format ("lakehouse-lite").

No Iceberg/Delta jars ship in this environment, so the engine carries a
minimal, public-concepts-only implementation of the same ideas (atomic
snapshot commits, copy-on-write MERGE, hidden bucket partitioning with
partition pruning, additive schema evolution, commit-summary idempotency
keys, time travel) in pure PySpark + JSON metadata. The interface is
deliberately Iceberg-shaped so a real Iceberg catalog can replace it on a
production cluster without touching the CDC pipeline code.
"""

from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable  # noqa: F401
