"""Write-audit-publish (staged commits): a batch is written and deduped
exactly like a merge, but stays invisible to every reader until published —
the data-quality gate for CDC ingest. Covers: invisibility, audit reads
(delta-only and merged preview), publish atomicity + exactly-once under the
epoch key, discard cleanup, GC protection of staged files, and composition
with interleaved merges and compaction.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from postgres_to_snowflake_data_pipeline_spark.cdc.apply import apply_batch
from postgres_to_snowflake_data_pipeline_spark.cdc.generator import change_events
from postgres_to_snowflake_data_pipeline_spark.cdc.oracle import (
    assert_matches_oracle,
    lww_state_oracle,
)
from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import TRANSCRIPT_SCHEMA
from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable

PAYLOAD = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
KEYS = ("conv_id", "turn_idx")


@pytest.fixture()
def table(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "transcripts"), TRANSCRIPT_SCHEMA,
        key_cols=KEYS, n_buckets=8,
    )


def _rows(df):
    return sorted(
        tuple(r[c] for c in PAYLOAD)
        for r in df.select(*PAYLOAD).collect()
    )


def test_staged_invisible_until_published(spark, table):
    events = change_events(spark, 4000, n_convs=200)
    res = apply_batch(spark, table, events, epoch=0, stage="audit-e0")
    assert res.staged == "audit-e0" and not res.skipped
    assert res.rows_in == events.count() and res.snapshot_id is None
    # invisible to readers, epoch NOT yet committed
    assert table.read().count() == 0
    assert not table.has_commit_key("epoch:0")
    assert list(table.staged()) == ["audit-e0"]
    # audit view = the batch's LWW-resolved survivors
    staged = table.read_staged("audit-e0")
    oracle = lww_state_oracle(events, list(KEYS), PAYLOAD)
    assert _rows(staged) == _rows(oracle)
    # publish: now visible, exactly-once key folded, descriptor gone
    snap = table.publish_staged("audit-e0")
    assert snap is not None and snap.summary["operation_detail"] == "publish-staged"
    assert table.has_commit_key("epoch:0")
    assert table.staged() == {}
    assert_matches_oracle(table.read(), events, PAYLOAD)
    # replaying the staged epoch after publish is a no-op
    assert apply_batch(spark, table, events, epoch=0, stage="audit-e0-retry").skipped
    assert apply_batch(spark, table, events, epoch=0).skipped


def test_discard_staged_deletes_files(spark, table):
    events = change_events(spark, 2000, n_convs=100)
    apply_batch(spark, table, events, epoch=0, stage="reject-me")
    desc = table.staged()["reject-me"]
    paths = [
        os.path.join(table.root, e["path"])
        for es in table.log._load_manifest(desc["manifest"]).values()
        for e in es
    ]
    assert paths and all(os.path.exists(p) for p in paths)
    out = table.discard_staged("reject-me")
    assert out["deleted_files"] == len(paths)
    assert not any(os.path.exists(p) for p in paths)
    assert table.staged() == {} and table.read().count() == 0
    # the epoch was never committed: a corrected batch can re-apply it
    res = apply_batch(spark, table, events, epoch=0)
    assert not res.skipped
    assert_matches_oracle(table.read(), events, PAYLOAD)


def test_staged_name_collision_raises(spark, table):
    events = change_events(spark, 1000, n_convs=50)
    apply_batch(spark, table, events, epoch=0, stage="gate")
    with pytest.raises(ValueError, match="already exists"):
        table.stage_merge(
            events.limit(0).withColumn("_lsn", F.lit(0).cast("long")),
            "gate",
        )


def test_staged_files_survive_gc(spark, table):
    """expire_snapshots must treat staged files as referenced — an audit
    window longer than the orphan grace must not lose the batch."""
    events = change_events(spark, 6000, n_convs=300).cache()
    third = events.filter(F.col("lsn") % 3 == 1)
    apply_batch(spark, table, third, epoch=1, stage="long-audit")
    # churn the table past the retention horizon with zero grace
    for e in (0, 2):
        apply_batch(spark, table, events.filter(F.col("lsn") % 3 == e), epoch=e)
    table.compact()
    table.expire_snapshots(keep_last=1, orphan_grace_seconds=0)
    # the staged batch is intact and still publishable
    assert table.read_staged("long-audit").count() > 0
    assert table.publish_staged("long-audit") is not None
    assert_matches_oracle(table.read(), events, PAYLOAD)
    events.unpersist()


def test_publish_composes_with_interleaved_merges_and_compaction(spark, table):
    events = change_events(spark, 6000, n_convs=300).cache()
    slices = [events.filter(F.col("lsn") % 3 == k) for k in range(3)]
    apply_batch(spark, table, slices[1], epoch=1, stage="mid")
    apply_batch(spark, table, slices[0], epoch=0)
    apply_batch(spark, table, slices[2], epoch=2)
    table.compact()  # folds epochs 0+2; the staged delta is NOT in the fold
    table.publish_staged("mid")
    assert_matches_oracle(table.read(), events, PAYLOAD)
    events.unpersist()


def test_with_base_preview_equals_post_publish_read(spark, table):
    events = change_events(spark, 4000, n_convs=200).cache()
    half = events.filter(F.col("lsn") % 2 == 0)
    rest = events.filter(F.col("lsn") % 2 == 1)
    apply_batch(spark, table, rest, epoch=0)
    apply_batch(spark, table, half, epoch=1, stage="preview")
    preview = _rows(table.read_staged("preview", with_base=True))
    table.publish_staged("preview")
    assert preview == _rows(table.read())
    events.unpersist()


def test_publish_idempotent_after_simulated_crash(spark, table):
    """Crash between the publish commit and the descriptor cleanup: the
    retried publish sees the publish key already folded, commits nothing,
    and just cleans up."""
    events = change_events(spark, 2000, n_convs=100)
    apply_batch(spark, table, events, epoch=0, stage="crashy")
    desc = dict(table.staged()["crashy"])
    manifest = dict(table.log._load_manifest(desc["manifest"]))
    snap = table.publish_staged("crashy")
    assert snap is not None
    rows_before = table.read().count()
    sid_before = table.current().snapshot_id
    # resurrect the descriptor + manifest as if cleanup never ran
    table.log._atomic_write(
        table.log.manifest_path(desc["manifest"]),
        __import__("json").dumps({"files": manifest}),
    )
    assert table.log.write_staged("crashy", desc)
    assert table.publish_staged("crashy") is None  # no double-apply
    assert table.current().snapshot_id == sid_before
    assert table.read().count() == rows_before
    assert table.staged() == {}
