"""Merge-apply: one micro-batch of change events -> one lake-table commit.

The engine's end-to-end slice (SURVEY.md §7.2 step 3), shared verbatim by
batch replay and the Structured Streaming ``foreachBatch`` sink:

    events -> Arrow schema normalization (additive evolution)
           -> LWW dedup (max LSN per (conv_id, turn_idx), map-side partials)
           -> MERGE into LakeTable (delta append, idempotent commit key)
           -> lineage rows (per source partition: lsn range, row counts)

Exactly-once: the commit key ``epoch:{batch_id}`` is checked against the
table's cumulative commit-key set before any work; a replayed epoch is a
pure no-op (SURVEY.md §7.4 hard-part #1). Within an epoch the merge itself
is deterministic (stable (lsn, delete-rank) tie-break), so a crash between
data write and metadata commit just leaves orphaned uncommitted files.

Late data: a surviving event with a *lower* LSN than the row already in the
table loses the read-time LWW resolution against the stored ``_lsn`` — the
"WHEN MATCHED AND source.lsn > target.last_lsn" guard of an Iceberg MERGE,
expressed as merge-on-read (SURVEY.md §7.4 hard-part #2/#3).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from postgres_to_snowflake_data_pipeline_spark.cdc.dedup import lww_dedup
from postgres_to_snowflake_data_pipeline_spark.cdc.normalize import (
    evolve_schema,
    normalize_to_schema,
)
from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import KEY_COLS, ORDER_COL
from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("epoch", T.LongType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("lsn_min", T.LongType(), True),
        T.StructField("lsn_max", T.LongType(), True),
        T.StructField("rows_in", T.LongType(), False),
        T.StructField("rows_deduped", T.LongType(), True),
        T.StructField("rows_merged", T.LongType(), True),
        T.StructField("snapshot_id", T.LongType(), True),
        T.StructField("committed_at", T.TimestampType(), True),
    ]
)


@dataclass
class ApplyResult:
    epoch: int
    skipped: bool
    rows_in: int
    rows_deduped: int
    snapshot_id: int | None


def _event_schema_of(table: LakeTable, events: DataFrame) -> T.StructType:
    """The change-event schema implied by the table schema: op + lsn + row."""
    fields = [
        T.StructField(ORDER_COL, T.LongType(), False),
        T.StructField("op", T.StringType(), False),
    ] + list(table.schema().fields)
    return T.StructType(fields)


def apply_batch(
    spark: SparkSession,
    table: LakeTable,
    events: DataFrame,
    epoch: int,
    lineage_path: str | None = None,
    salt_buckets: int | None = None,
) -> ApplyResult:
    """Apply one batch of change events to the table, exactly once."""
    commit_key = f"epoch:{epoch}"
    if table.has_commit_key(commit_key):
        return ApplyResult(epoch, True, 0, 0, None)

    # ---- 1. schema handling: additive evolution + Arrow normalization
    target_evt_schema = _event_schema_of(table, events)
    table_schema = table.schema()
    diff_added = [
        f.name
        for f in events.schema.fields
        if f.name.lower() not in {x.name.lower() for x in target_evt_schema.fields}
    ]
    if diff_added:
        table_schema = evolve_schema(
            table_schema,
            T.StructType([f for f in events.schema.fields if f.name in diff_added]),
        )
        target_evt_schema = T.StructType(
            [
                T.StructField(ORDER_COL, T.LongType(), False),
                T.StructField("op", T.StringType(), False),
            ]
            + list(table_schema.fields)
        )
    events = normalize_to_schema(events, target_evt_schema)

    # ---- 2. lineage pre-aggregation per source partition (before the
    # dedup shuffle: offset ranges describe the *source* slices, the analog
    # of the reference's per-table verification counts,
    # /root/reference/dags/s3_to_snowflake_dag.py:159-203)
    events = events.persist()
    part_stats = (
        events.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(
            F.min(ORDER_COL).alias("lsn_min"),
            F.max(ORDER_COL).alias("lsn_max"),
            F.count(F.lit(1)).alias("rows_in"),
        )
        .collect()
    )
    rows_in = sum(r["rows_in"] for r in part_stats)

    # ---- 3. LWW dedup within the batch
    winners = lww_dedup(events, KEY_COLS, salt_buckets=salt_buckets)
    payload = [f.name for f in table_schema.fields]
    storage = winners.select(
        *payload,
        F.col(ORDER_COL).alias("_lsn"),
        (F.col("op") == "delete").alias("_deleted"),
    )

    # ---- 4. merge (delta append + atomic snapshot commit). The lineage
    # rows ride INSIDE the snapshot summary so they commit atomically with
    # the data: a crash between data write and commit replays the epoch
    # (commit key absent), a crash after the commit skips it — in both cases
    # lineage and table state stay consistent (no separate-write race).
    lineage_rows = [
        {
            "epoch": epoch,
            "partition_id": int(r["partition_id"]),
            "lsn_min": int(r["lsn_min"]),
            "lsn_max": int(r["lsn_max"]),
            "rows_in": int(r["rows_in"]),
        }
        for r in part_stats
    ]
    snap = table.merge(
        storage,
        commit_key=commit_key,
        schema=table_schema,
        summary={"epoch": epoch, "rows_in": rows_in, "lineage": lineage_rows},
    )
    events.unpersist()
    assert snap is not None  # key was checked above; single writer
    rows_deduped = -1  # not recounted on the hot path (would force a 2nd agg)

    # ---- 5. optional materialized lineage mirror (derived, best-effort —
    # the authoritative record is the snapshot log; see lineage_df())
    if lineage_path is not None:
        export_lineage(spark, table, lineage_path)

    return ApplyResult(epoch, False, rows_in, rows_deduped, snap.snapshot_id)


def lineage_df(spark: SparkSession, table: LakeTable) -> DataFrame:
    """Authoritative lineage/metrics table, rebuilt from the snapshot log —
    the engine's analog of the reference's ``data_summary`` + verification
    outputs (/root/reference/dags/s3_to_snowflake_dag.py:159-255), but
    exactly-once by construction (lineage commits atomically with data)."""
    rows = []
    for snap in table.snapshots():
        committed = snap.summary.get("committed_at_unix")
        for lr in snap.summary.get("lineage", []):
            rows.append(
                (
                    int(lr["epoch"]),
                    int(lr["partition_id"]),
                    lr.get("lsn_min"),
                    lr.get("lsn_max"),
                    int(lr["rows_in"]),
                    None,
                    None,
                    int(snap.snapshot_id),
                    committed,
                )
            )
    df = spark.createDataFrame(
        rows,
        schema=T.StructType(
            LINEAGE_SCHEMA.fields[:-1]
            + [T.StructField("committed_at_unix", T.DoubleType(), True)]
        ),
    )
    return df.withColumn(
        "committed_at", F.timestamp_seconds(F.col("committed_at_unix"))
    ).drop("committed_at_unix").select([f.name for f in LINEAGE_SCHEMA.fields])


def export_lineage(spark: SparkSession, table: LakeTable, path: str) -> None:
    """Materialize the lineage table to parquet (full rebuild: idempotent)."""
    lineage_df(spark, table).coalesce(1).write.mode("overwrite").parquet(path)


def replay_feed(
    spark: SparkSession,
    table: LakeTable,
    feed_path: str,
    epochs: int,
    lineage_path: str | None = None,
    compact_every: int = 8,
    salt_buckets: int | None = None,
) -> list[ApplyResult]:
    """Batch-mode replay of a parquet change feed in ``epochs`` LSN slices —
    the deterministic twin of the streaming pipeline (same apply_batch)."""
    feed = spark.read.parquet(feed_path)
    bounds = feed.select(F.min(ORDER_COL), F.max(ORDER_COL)).first()
    lo, hi = bounds[0], bounds[1]
    step = max((hi - lo + 1) // epochs, 1)
    results = []
    for e in range(epochs):
        a = lo + e * step
        b = hi + 1 if e == epochs - 1 else lo + (e + 1) * step
        batch = feed.filter((F.col(ORDER_COL) >= a) & (F.col(ORDER_COL) < b))
        results.append(
            apply_batch(spark, table, batch, epoch=e, lineage_path=lineage_path,
                        salt_buckets=salt_buckets)
        )
        if compact_every and (e + 1) % compact_every == 0:
            table.compact()
    return results
