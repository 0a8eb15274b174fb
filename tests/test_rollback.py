"""Snapshot rollback: state + frontier rewind as one metadata-only commit.

Invariants: rollback restores the tagged state exactly (files, schema,
props, epoch watermark) without touching data files; corrected epochs
re-apply through the normal idempotent path and reconverge; incremental
consumers never silently span a rollback — ``changes()`` raises, the view
refreshes rebuild; GC keeps everything the rollback snapshot references;
racing replace commits and stale-layout appends are rejected loudly.

Reference analog: the reference's only recovery story is re-running the
full clear-and-reload (/root/reference/scripts/load_data.py:119-131).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from postgres_to_snowflake_data_pipeline_spark.cdc.apply import apply_batch
from postgres_to_snowflake_data_pipeline_spark.cdc.generator import change_events
from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import TRANSCRIPT_SCHEMA
from postgres_to_snowflake_data_pipeline_spark.lake.delta_view import DeltaAggView
from postgres_to_snowflake_data_pipeline_spark.lake.metadata import (
    CommitConflictError,
)
from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable
from postgres_to_snowflake_data_pipeline_spark.lake.view import IncrementalAggView


def _table(spark, tmp_path, name="t", n_buckets=4):
    return LakeTable.create(
        spark,
        str(tmp_path / name),
        TRANSCRIPT_SCHEMA,
        ("conv_id", "turn_idx"),
        n_buckets=n_buckets,
    )


def _same(a, b):
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def _good_bad_table(spark, tmp_path):
    """Two good epochs, a tag, then one bad epoch."""
    t = _table(spark, tmp_path)
    apply_batch(spark, t, change_events(spark, 2000, n_convs=100, seed=1), epoch=0)
    apply_batch(spark, t, change_events(spark, 1000, n_convs=100, seed=2), epoch=1)
    t.tag("good")
    bad = change_events(spark, 1000, n_convs=100, seed=3).withColumn(
        "text", F.lit("CORRUPTED")
    )
    apply_batch(spark, t, bad, epoch=2)
    return t


def test_rollback_restores_tagged_state_and_frontier(spark, tmp_path):
    t = _good_bad_table(spark, tmp_path)
    good_sid = t.tags()["good"]
    want = t.read(snapshot_id=good_sid)
    assert t.read().filter(F.col("text") == "CORRUPTED").count() > 0

    snap = t.rollback_to(tag="good")
    assert snap.summary["operation"] == "rollback"
    assert snap.summary["rollback_to"] == good_sid
    assert _same(t.read(), want)
    # frontier rewound: epoch 2 is un-applied again, 0/1 still applied
    assert t.has_commit_key("epoch:1")
    assert not t.has_commit_key("epoch:2")
    # history preserved: the bad commit stays time-travelable
    assert (
        t.read(snapshot_id=snap.parent_id)
        .filter(F.col("text") == "CORRUPTED")
        .count()
        > 0
    )


def test_rollback_is_metadata_only(spark, tmp_path):
    t = _good_bad_table(spark, tmp_path)
    data_root = os.path.join(t.root, "data")
    before = {
        os.path.join(d, f)
        for d, _s, fs in os.walk(data_root)
        for f in fs
        if f.endswith(".parquet")
    }
    t.rollback_to(tag="good")
    after = {
        os.path.join(d, f)
        for d, _s, fs in os.walk(data_root)
        for f in fs
        if f.endswith(".parquet")
    }
    assert before == after  # no file deleted, copied or written


def test_corrected_epochs_reapply_and_converge(spark, tmp_path):
    t = _good_bad_table(spark, tmp_path)
    t.rollback_to(tag="good")
    fixed2 = change_events(spark, 1000, n_convs=100, seed=3)
    fixed3 = change_events(spark, 500, n_convs=100, seed=4)
    assert apply_batch(spark, t, fixed2, epoch=2).skipped is False
    assert apply_batch(spark, t, fixed3, epoch=3).skipped is False
    # re-delivery of an already-corrected epoch is idempotent again
    assert apply_batch(spark, t, fixed2, epoch=2).skipped is True

    ref = _table(spark, tmp_path, name="ref")
    apply_batch(spark, ref, change_events(spark, 2000, n_convs=100, seed=1), epoch=0)
    apply_batch(spark, ref, change_events(spark, 1000, n_convs=100, seed=2), epoch=1)
    apply_batch(spark, ref, fixed2, epoch=2)
    apply_batch(spark, ref, fixed3, epoch=3)
    assert _same(t.read(), ref.read())


def test_rollback_to_current_is_noop(spark, tmp_path):
    t = _good_bad_table(spark, tmp_path)
    cur = t.current().snapshot_id
    snap = t.rollback_to(snapshot_id=cur)
    assert snap.snapshot_id == cur  # no new commit minted


def test_rollback_validation(spark, tmp_path):
    t = _good_bad_table(spark, tmp_path)
    with pytest.raises(ValueError, match="exactly one"):
        t.rollback_to()
    with pytest.raises(ValueError, match="exactly one"):
        t.rollback_to(snapshot_id=1, tag="good")
    with pytest.raises(KeyError, match="unknown tag"):
        t.rollback_to(tag="nope")
    with pytest.raises(ValueError, match="not retained"):
        t.rollback_to(snapshot_id=999)


def test_rollback_to_expired_snapshot_raises(spark, tmp_path):
    t = _table(spark, tmp_path)
    for e in range(4):
        apply_batch(
            spark,
            t,
            change_events(spark, 500, n_convs=50, seed=e),
            epoch=e,
        )
    doomed = t.current().snapshot_id - 2
    t.expire_snapshots(keep_last=1, orphan_grace_seconds=0)
    with pytest.raises(ValueError, match="not retained"):
        t.rollback_to(snapshot_id=doomed)


def test_changes_refuses_to_span_rollback(spark, tmp_path):
    t = _good_bad_table(spark, tmp_path)
    pre_bad = t.tags()["good"]
    bad_sid = t.current().snapshot_id
    t.rollback_to(tag="good")
    with pytest.raises(ValueError, match="rollback"):
        t.changes(pre_bad)
    # a closed window entirely BEFORE the rollback stays readable
    # (reproducible audit replays)
    assert t.changes(0, until_snapshot_id=bad_sid).count() > 0
    # and a fresh window from the rollback commit onward is clean
    after = t.current().snapshot_id
    apply_batch(spark, t, change_events(spark, 300, n_convs=50, seed=9), epoch=2)
    assert t.changes(after).count() > 0


def test_scd2_history_raises_after_rollback(spark, tmp_path):
    t = _good_bad_table(spark, tmp_path)
    t.rollback_to(tag="good")
    with pytest.raises(ValueError, match="rollback"):
        t.history()
    # per-key forensic audit stays available (documented contract)
    any_key = t.read().select("conv_id").first()["conv_id"]
    assert t.key_history(any_key).count() > 0


def test_gc_keeps_files_the_rollback_references(spark, tmp_path):
    t = _good_bad_table(spark, tmp_path)
    want = t.read(snapshot_id=t.tags()["good"]).collect()
    t.rollback_to(tag="good")
    t.drop_tag("good")  # pin only via the live rollback snapshot
    stats = t.expire_snapshots(keep_last=1, orphan_grace_seconds=0)
    assert stats["expired_snapshots"] > 0
    got = t.read().collect()
    assert sorted(map(str, got)) == sorted(map(str, want))


def test_incremental_view_rebuilds_after_rollback(spark, tmp_path):
    t = _good_bad_table(spark, tmp_path)

    def agg(rows):
        return rows.groupBy("role").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("percentile(length(text), 0.5)").alias("med_len"),
        )

    view = IncrementalAggView(
        spark, str(tmp_path / "v"), t, group_cols=("role",), agg_fn=agg
    )
    view.refresh()  # position now PAST the bad epoch
    t.rollback_to(tag="good")
    apply_batch(spark, t, change_events(spark, 300, n_convs=50, seed=7), epoch=2)
    view.refresh()
    got, want = view.read(), agg(t.read())
    assert _same(got, want), (sorted(got.collect()), sorted(want.collect()))


def test_delta_view_rebuilds_after_rollback(spark, tmp_path):
    t = _good_bad_table(spark, tmp_path)
    view = DeltaAggView(
        spark,
        str(tmp_path / "dv"),
        t,
        ("role",),
        {"n_turns": ("count", "*"), "chars": ("sum", "length(text)")},
        payload_cols=["role", "text"],
        n_buckets=2,
    )
    view.refresh()
    t.rollback_to(tag="good")
    apply_batch(spark, t, change_events(spark, 300, n_convs=50, seed=7), epoch=2)
    view.refresh()
    want = t.read().groupBy("role").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum(F.length("text")).alias("chars"),
    )
    got = view.read()
    assert _same(got, want), (sorted(got.collect()), sorted(want.collect()))


def test_rollback_across_schema_evolution(spark, tmp_path):
    t = _table(spark, tmp_path)
    apply_batch(spark, t, change_events(spark, 500, n_convs=50, seed=1), epoch=0)
    t.tag("pre-evolve")
    pre_next = t.current().next_column_id
    evolved = change_events(spark, 500, n_convs=50, seed=2, evolved_from=0)
    apply_batch(spark, t, evolved, epoch=1)
    assert "tool_meta" in t.read().columns
    post_next = t.current().next_column_id

    t.rollback_to(tag="pre-evolve")
    snap = t.current()
    assert "tool_meta" not in [f.name for f in snap.schema.fields]
    # id allocator stays monotone across the abandoned era: re-evolution
    # can never re-mint a column id the rolled-back era used
    assert snap.next_column_id == max(pre_next, post_next)
    apply_batch(spark, t, evolved, epoch=1)
    assert "tool_meta" in t.read().columns
    assert t.current().column_ids["tool_meta"] >= post_next


def test_rollback_reverts_props(spark, tmp_path):
    t = _good_bad_table(spark, tmp_path)
    t.update_props({"index.sets": ["role"]})
    assert "index.sets" in t.props
    t.rollback_to(tag="good")
    assert "index.sets" not in t.props


def test_replace_commit_racing_rollback_is_rejected(spark, tmp_path):
    t = _good_bad_table(spark, tmp_path)
    base_sid = t.tags()["good"]
    t.rollback_to(tag="good")
    # a compaction computed against `base_sid` that tries to rebase over
    # the rollback must fail loudly, never resurrect rolled-back rows
    with pytest.raises(CommitConflictError, match="rolled back"):
        t._rebase_replace({}, base_sid, t.current())


def test_stale_layout_append_is_rejected(spark, tmp_path):
    t = _good_bad_table(spark, tmp_path)
    with pytest.raises(CommitConflictError, match="layout changed"):
        t._next_commit(
            {},
            t.current().schema,
            {"operation": "merge"},
            None,
            replace_buckets=False,
            written_n_buckets=t.current().n_buckets + 4,
        )
