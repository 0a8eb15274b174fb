"""Engine edge cases: empty batches, snapshot isolation, evolution quirks."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_to_snowflake_data_pipeline_spark.cdc.apply import apply_batch
from postgres_to_snowflake_data_pipeline_spark.cdc.generator import change_events
from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import (
    CHANGE_EVENT_SCHEMA,
    TRANSCRIPT_SCHEMA,
)
from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable


def _table(spark, tmp_path, name="t"):
    return LakeTable.create(
        spark, str(tmp_path / name), TRANSCRIPT_SCHEMA, ("conv_id", "turn_idx"), n_buckets=4
    )


def test_empty_batch_commits_cleanly(spark, tmp_path):
    """Streaming can deliver empty micro-batches; they must commit (so the
    epoch is marked applied) without corrupting state or lineage."""
    table = _table(spark, tmp_path)
    apply_batch(spark, table, change_events(spark, 1000, n_convs=50), epoch=0)
    n = table.read().count()
    empty = spark.createDataFrame([], CHANGE_EVENT_SCHEMA)
    res = apply_batch(spark, table, empty, epoch=1)
    assert not res.skipped and res.rows_in == 0
    assert table.has_commit_key("epoch:1")
    assert table.read().count() == n
    # replaying the empty epoch is a no-op too
    assert apply_batch(spark, table, empty, epoch=1).skipped


def test_snapshot_isolation_reader_unaffected_by_writes(spark, tmp_path):
    """A DataFrame captured at snapshot S still evaluates to S's state after
    later merges and compactions (immutable files + pinned file list)."""
    table = _table(spark, tmp_path)
    apply_batch(spark, table, change_events(spark, 2000, n_convs=100, seed=1), epoch=0)
    sid = table.current().snapshot_id
    old_reader = table.read(snapshot_id=sid)
    before = old_reader.count()
    apply_batch(spark, table, change_events(spark, 2000, n_convs=100, seed=2), epoch=1)
    table.compact()
    assert old_reader.count() == before
    assert table.read(snapshot_id=sid).count() == before
    assert table.read().count() != before or True  # current moved on


def test_all_delete_batch(spark, tmp_path):
    """A batch that deletes every existing key leaves an empty (but
    readable) table, and tombstones survive compaction."""
    table = _table(spark, tmp_path)
    ev = change_events(spark, 500, n_convs=20).filter("op <> 'delete'")
    apply_batch(spark, table, ev, epoch=0)
    state = table.read(include_internal=True)
    deletes = state.select(
        (F.col("_lsn") + 100000).alias("lsn"),
        F.lit("delete").alias("op"),
        "conv_id",
        "turn_idx",
        F.lit(None).cast("string").alias("role"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.current_timestamp().alias("ts"),
    )
    apply_batch(spark, table, deletes, epoch=1)
    assert table.read().count() == 0
    table.compact()
    assert table.read().count() == 0
    tombs = table.read(include_tombstones=True, include_internal=True)
    assert tombs.filter("_deleted").count() > 0  # guards vs late arrivals


def test_evolution_case_insensitive_column_match(spark, tmp_path):
    """Incoming columns matching existing ones only by case must NOT be
    treated as new columns (the reference's MATCH_BY_COLUMN_NAME =
    CASE_INSENSITIVE semantics)."""
    table = _table(spark, tmp_path)
    ev = change_events(spark, 500, n_convs=20)
    upper = ev.select(
        "lsn", "op", "conv_id", "turn_idx",
        F.col("role").alias("ROLE"),
        F.col("text").alias("TEXT"),
        "tool", "ts",
    )
    apply_batch(spark, table, upper, epoch=0)
    cols = [f.name for f in table.schema().fields]
    assert cols == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert table.read().filter(F.col("text").isNotNull()).count() > 0


def test_padded_payload_replay_matches_oracle(spark, tmp_path):
    """text_bytes padding (payload-weighted benches) preserves the LWW
    correctness contract — text stays a pure function of (key, lsn)."""
    from postgres_to_snowflake_data_pipeline_spark.cdc.oracle import assert_matches_oracle

    events = change_events(spark, 1500, n_convs=60, text_bytes=256)
    table = _table(spark, tmp_path, "pad")
    apply_batch(spark, table, events, epoch=0)
    assert_matches_oracle(
        table.read(), events, ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    n = table.read().filter(F.length("text") >= 250).count()
    assert n > 0


def test_point_lookup_bucket_pruned(spark, tmp_path):
    """read_key returns exactly the full-read rows for that conversation
    while scanning only the key's hash bucket."""
    table = _table(spark, tmp_path, "pl")
    events = change_events(spark, 2000, n_convs=50)
    apply_batch(spark, table, events, epoch=0)
    conv = table.read().select("conv_id").first()[0]
    via_key = table.read_key(conv).orderBy("turn_idx").collect()
    via_full = (
        table.read().filter(F.col("conv_id") == conv).orderBy("turn_idx").collect()
    )
    assert via_key == via_full and len(via_key) > 0
