"""postgres_to_snowflake_data_pipeline_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of the reference repo
``PIPE1303/postgres-to-snowflake-data-pipeline`` (an Airflow-orchestrated
Postgres -> S3 Parquet -> Snowflake batch ETL; see SURVEY.md) as an idiomatic
Structured-Streaming CDC engine:

    WAL/binlog-style change feed
      -> Arrow-vectorized schema normalization (additive evolution)
      -> watermarked last-writer-wins dedup by max LSN per (conv_id, turn_idx)
      -> key-partitioned MERGE into a snapshot-committed lake table
      -> exactly-once via idempotent (epoch, partition) commit keys
      -> per-epoch per-partition lineage + metrics rows

Subpackages
-----------
lake        snapshot-committed table format (MERGE, schema evolution — rename/
            drop/widen, time travel, zone maps, incremental + delta agg views)
cdc         change-event generator, LWW dedup, merge-apply pipeline, multi-table
            routing + cross-table frontier, oracle
streaming   Structured Streaming wrapper (readStream -> foreachBatch), resume
queries     relational query library (reference-parity reports, text/dedup/ANN/
            multimodal operators over testdata)
functions   shared column functions + the stdlib PNG codec
sources     batch/stream readers for CSV/Parquet/JSON/JDBC event feeds
plans       plan-inspection helpers (pushdown / broadcast / codegen assertions)
orchestrate declarative multi-source pipeline config + epoch runner
"""

__version__ = "0.1.0"
