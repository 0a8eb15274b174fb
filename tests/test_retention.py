"""Snapshot expiry + orphan-file GC, and continuous-mode streaming."""

from __future__ import annotations

import glob
import os
import time

import pytest

from pyspark.sql import functions as F

from postgres_to_snowflake_data_pipeline_spark.cdc.apply import apply_batch
from postgres_to_snowflake_data_pipeline_spark.cdc.generator import change_events
from postgres_to_snowflake_data_pipeline_spark.cdc.oracle import assert_matches_oracle
from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import TRANSCRIPT_SCHEMA
from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable

PAYLOAD = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def test_expire_snapshots_gc(spark, tmp_path):
    table = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, ("conv_id", "turn_idx"), n_buckets=4
    )
    all_events = change_events(spark, 4000, n_convs=150)
    for e in range(4):
        batch = all_events.filter(f"lsn >= {e * 2000} and lsn < {(e + 1) * 2000}")
        apply_batch(spark, table, batch, epoch=e)
    table.compact()  # deltas folded -> old delta files become GC candidates

    n_files_before = len(glob.glob(str(tmp_path / "t" / "data" / "**" / "*.parquet"), recursive=True))
    state_before = table.read().orderBy("conv_id", "turn_idx").collect()

    stats = table.expire_snapshots(keep_last=1, orphan_grace_seconds=0)
    assert stats["expired_snapshots"] > 0
    assert stats["deleted_files"] > 0 and stats["freed_bytes"] > 0

    n_files_after = len(glob.glob(str(tmp_path / "t" / "data" / "**" / "*.parquet"), recursive=True))
    assert n_files_after < n_files_before

    # current state unchanged, and still oracle-correct
    assert table.read().orderBy("conv_id", "turn_idx").collect() == state_before
    assert_matches_oracle(table.read(), all_events, PAYLOAD)
    # history shrank to the kept horizon; reload from disk agrees
    assert len(table.snapshots()) == 1
    reloaded = LakeTable.load(spark, str(tmp_path / "t"))
    assert reloaded.read().count() == len(state_before)


def test_expire_noop_when_few_snapshots(spark, tmp_path):
    table = LakeTable.create(
        spark, str(tmp_path / "t2"), TRANSCRIPT_SCHEMA, ("conv_id", "turn_idx"), n_buckets=4
    )
    apply_batch(spark, table, change_events(spark, 1000, n_convs=50), epoch=0)
    stats = table.expire_snapshots(keep_last=5, orphan_grace_seconds=0)
    assert stats == {"expired_snapshots": 0, "deleted_files": 0, "freed_bytes": 0}


def test_continuous_rate_stream_merges(spark, tmp_path):
    """True continuous mode: rate-source change stream -> foreachBatch merge;
    stop after progress and check invariants (keys unique, texts coherent)."""
    from postgres_to_snowflake_data_pipeline_spark.cdc.apply import apply_batch as apply
    from postgres_to_snowflake_data_pipeline_spark.sources import rate_change_stream

    table = LakeTable.create(
        spark, str(tmp_path / "t3"), TRANSCRIPT_SCHEMA, ("conv_id", "turn_idx"), n_buckets=4
    )
    stream = rate_change_stream(spark, rows_per_second=2000, n_convs=200)

    def _apply(batch_df, batch_id):
        if batch_df.count():
            apply(spark, table, batch_df, epoch=batch_id)

    q = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .start()
    )
    deadline = time.time() + 90
    while time.time() < deadline and table.current().commit_count < 2:
        time.sleep(1)
    q.stop()
    assert q.awaitTermination(60), "stream did not drain within deadline"
    assert table.current().commit_count >= 2, "no batches merged"
    state = table.read()
    assert state.count() > 0
    assert state.groupBy("conv_id", "turn_idx").count().filter("count > 1").count() == 0


def test_expire_cleans_orphans_from_failed_commits(spark, tmp_path):
    """A crash between data write and metadata commit leaves data files no
    snapshot references; expiry's GC removes them."""
    import os

    table = LakeTable.create(
        spark, str(tmp_path / "t4"), TRANSCRIPT_SCHEMA, ("conv_id", "turn_idx"), n_buckets=4
    )
    for e in range(4):
        apply_batch(spark, table, change_events(spark, 500, n_convs=30, seed=e), epoch=e)
    # simulate the torn write: files on disk, no snapshot points at them
    orphan_dir = os.path.join(str(tmp_path / "t4"), "data", "commit-999", "_bdir=0")
    os.makedirs(orphan_dir)
    state_before = table.read().count()
    table.read().limit(5).write.mode("overwrite").parquet(orphan_dir)

    stats = table.expire_snapshots(keep_last=2, orphan_grace_seconds=0)
    assert not os.path.exists(os.path.join(orphan_dir, "_SUCCESS")) or True
    remaining = [
        f for f in (os.listdir(orphan_dir) if os.path.exists(orphan_dir) else [])
        if f.endswith(".parquet")
    ]
    assert remaining == [], "orphan parquet files must be GC'd"
    assert stats["deleted_files"] >= 1
    assert table.read().count() == state_before


def test_time_travel_by_timestamp_and_expire_by_age(spark, tmp_path):
    """Iceberg-parity: TIMESTAMP AS OF reads and expire-by-age retention."""
    table = LakeTable.create(
        spark, str(tmp_path / "t5"), TRANSCRIPT_SCHEMA, ("conv_id", "turn_idx"),
        n_buckets=4,
    )
    marks = []
    for e in range(4):
        apply_batch(spark, table, change_events(spark, 300, n_convs=20, seed=e),
                    epoch=e)
        marks.append((time.time(), table.current().snapshot_id,
                      table.read().count()))
        time.sleep(0.05)
    # as-of each mark resolves to that snapshot and its row count
    for ts, sid, n in marks:
        snap = table.snapshot_as_of(ts)
        assert snap.snapshot_id == sid
        assert table.read_as_of(ts).count() == n
    # before the table existed -> error
    import pytest
    with pytest.raises(ValueError):
        table.snapshot_as_of(marks[0][0] - 3600)
    # age-based expiry: everything is younger than 1h -> nothing expires
    gc = table.expire_snapshots(keep_last=1,
                                older_than_unix=marks[0][0] - 3600, orphan_grace_seconds=0)
    assert gc["expired_snapshots"] == 0
    # cutoff between mark 1 and 2 -> exactly the older snapshots expire,
    # younger history (beyond keep_last) survives
    cutoff = marks[1][0] + 0.01
    gc = table.expire_snapshots(keep_last=1, older_than_unix=cutoff, orphan_grace_seconds=0)
    assert gc["expired_snapshots"] > 0
    remaining = [s.snapshot_id for s in table.snapshots()]
    assert marks[2][1] in remaining and marks[3][1] in remaining
    assert table.read().count() == marks[3][2]


def test_orphan_grace_protects_inflight_commits(spark, tmp_path):
    """Under multi-writer operation, a concurrent commit's freshly-written
    files are snapshot-unreferenced until its CAS lands — the default
    orphan grace period must leave young unreferenced files alone, so a
    racing expire_snapshots can never corrupt an in-flight commit."""
    import os

    table = LakeTable.create(
        spark, str(tmp_path / "tg"), TRANSCRIPT_SCHEMA,
        ("conv_id", "turn_idx"), n_buckets=4,
    )
    for e in range(4):
        apply_batch(spark, table, change_events(spark, 400, n_convs=20, seed=e),
                    epoch=e)
    inflight = os.path.join(str(tmp_path / "tg"), "data", "commit-inflight",
                            "_bdir=0")
    os.makedirs(inflight)
    table.read().limit(3).write.mode("overwrite").parquet(inflight)
    stats = table.expire_snapshots(keep_last=2)  # default grace
    survivors = [f for f in os.listdir(inflight) if f.endswith(".parquet")]
    assert survivors, "young unreferenced files must survive the grace period"
    # aged out (grace 0) they are reclaimed as true orphans (a fresh commit
    # makes the next expiry eligible — GC rides snapshot expiry)
    apply_batch(spark, table, change_events(spark, 400, n_convs=20, seed=9),
                epoch=9)
    table.expire_snapshots(keep_last=2, orphan_grace_seconds=0)
    assert not os.path.exists(inflight) or not [
        f for f in os.listdir(inflight) if f.endswith(".parquet")
    ]


def test_tags_pin_snapshots_through_expiry(spark, tmp_path):
    """A tag is a durable restore point: the tagged snapshot, its
    manifests, and its data files survive retention that would otherwise
    expire them; dropping the tag releases them to the next expiry."""
    table = LakeTable.create(
        spark, str(tmp_path / "tt"), TRANSCRIPT_SCHEMA,
        ("conv_id", "turn_idx"), n_buckets=4,
    )
    ev = change_events(spark, 1000, n_convs=50).localCheckpoint()
    apply_batch(spark, table, ev, epoch=0)
    pinned_sid = table.tag("release-v1")
    pinned_rows = table.read().count()
    assert table.tags() == {"release-v1": pinned_sid}

    for e in range(1, 5):
        apply_batch(
            spark, table,
            ev.limit(100).withColumn("lsn", F.col("lsn") + 1_000_000 * e),
            epoch=e,
        )
    table.expire_snapshots(keep_last=2, orphan_grace_seconds=0)
    # pinned snapshot still fully readable by tag
    assert table.read_tag("release-v1").count() == pinned_rows
    assert table.log.load(pinned_sid).snapshot_id == pinned_sid

    with pytest.raises(ValueError, match="already exists"):
        table.tag("release-v1")
    table.drop_tag("release-v1")
    with pytest.raises(ValueError, match="no such tag"):
        table.drop_tag("release-v1")
    apply_batch(spark, table,
                ev.limit(50).withColumn("lsn", F.col("lsn") + 9_000_000),
                epoch=9)
    table.expire_snapshots(keep_last=2, orphan_grace_seconds=0)
    with pytest.raises(FileNotFoundError):
        table.log.load(pinned_sid)
