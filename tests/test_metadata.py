"""Metadata scale contracts: O(batch) bytes per commit, manifest pruning
at compaction, and epoch-watermark commit-key compression.

At 10^10 events in ~10^3 epochs the old design (every snapshot
re-serializing the cumulative file map + cumulative commit keys) wrote
metadata quadratic in commits; these tests pin the replacement."""

from __future__ import annotations

import os

from postgres_to_snowflake_data_pipeline_spark.cdc.apply import apply_batch, replay_feed
from postgres_to_snowflake_data_pipeline_spark.cdc.generator import change_events, write_feed
from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import TRANSCRIPT_SCHEMA
from postgres_to_snowflake_data_pipeline_spark.lake.metadata import fold_commit_keys
from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable


def _snapshot_bytes(table: LakeTable) -> dict[int, int]:
    meta = table.log.meta_dir
    return {
        int(f[1:-5]): os.path.getsize(os.path.join(meta, f))
        for f in os.listdir(meta)
        if f.startswith("v") and f.endswith(".json")
    }


def test_snapshot_metadata_stays_o_batch(spark, tmp_path):
    """Snapshot JSON size must plateau across epochs (manifest-list
    indirection + watermark compression), not grow with history."""
    feed = str(tmp_path / "feed")
    write_feed(change_events(spark, 12_000, n_convs=300), feed, n_files=4)
    table = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, ("conv_id", "turn_idx"),
        n_buckets=8,
    )
    replay_feed(spark, table, feed, epochs=16, compact_every=4)
    sizes = _snapshot_bytes(table)
    # the commit pattern is a sawtooth (merges accumulate manifests until a
    # compaction prunes them); compare the PEAK of the first cycle with the
    # peak of the last — a design that accumulates per-commit metadata
    # would show the late peak far above the early one
    n = max(sizes)
    early_peak = max(v for k, v in sizes.items() if 1 <= k <= 5)
    late_peak = max(v for k, v in sizes.items() if k >= n - 5)
    assert late_peak <= early_peak * 1.5 + 512, (
        f"snapshot metadata grows with history: early peak={early_peak}B, "
        f"late peak={late_peak}B"
    )
    # watermark swallowed the contiguous epochs: no residual key list
    snap = table.current()
    assert snap.epoch_watermark == 15
    assert snap.commit_keys == []
    assert snap.commit_count == 16
    # manifest pruning: compaction replaced the delta manifests, so the
    # list is O(commits since last compaction), not O(all commits)
    assert len(snap.manifests) <= 8, snap.manifests


def test_commit_key_watermark_handles_out_of_order_epochs(spark, tmp_path):
    table = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, ("conv_id", "turn_idx"),
        n_buckets=4,
    )
    ev = change_events(spark, 200, n_convs=10)
    apply_batch(spark, table, ev, epoch=0)
    apply_batch(spark, table, ev, epoch=2)  # gap: epoch 1 missing
    snap = table.current()
    assert snap.epoch_watermark == 0 and snap.commit_keys == ["epoch:2"]
    assert table.has_commit_key("epoch:0")
    assert table.has_commit_key("epoch:2")
    assert not table.has_commit_key("epoch:1")
    apply_batch(spark, table, ev, epoch=1)  # gap closes -> watermark jumps
    snap = table.current()
    assert snap.epoch_watermark == 2 and snap.commit_keys == []
    for e in range(3):
        assert apply_batch(spark, table, ev, epoch=e).skipped


def test_fold_commit_keys_pure():
    assert fold_commit_keys(None, -1, [], "epoch:0") == (0, 0, [])
    assert fold_commit_keys(0, 0, [], "epoch:5") == (0, 0, ["epoch:5"])
    assert fold_commit_keys(0, 0, ["epoch:5"], "epoch:1") == (0, 1, ["epoch:5"])
    # chain absorption: 2,3,4 queued then 1 arrives
    assert fold_commit_keys(0, 0, ["epoch:2", "epoch:3", "epoch:4"], "epoch:1") == (0, 4, [])
    # non-epoch keys never compress
    assert fold_commit_keys(0, 3, [], "manual:x") == (0, 3, ["manual:x"])
    # base anchors at the FIRST epoch — resumed checkpoints (batch ids
    # starting at N>0) still compress, and epochs below base stay unknown
    assert fold_commit_keys(None, -1, [], "epoch:50") == (50, 50, [])
    assert fold_commit_keys(50, 50, [], "epoch:51") == (50, 51, [])
    # an epoch below base stays residual (never falsely "committed")
    assert fold_commit_keys(50, 51, [], "epoch:10") == (50, 51, ["epoch:10"])


def test_watermark_compresses_for_nonzero_first_epoch(spark, tmp_path):
    """A table added to a fleet mid-stream (first commit at epoch 50) must
    still compress contiguous epochs AND report pre-base epochs as not
    committed."""
    table = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, ("conv_id", "turn_idx"),
        n_buckets=4,
    )
    ev = change_events(spark, 200, n_convs=10)
    for e in (50, 51, 52):
        apply_batch(spark, table, ev, epoch=e)
    snap = table.current()
    assert snap.epoch_base == 50 and snap.epoch_watermark == 52
    assert snap.commit_keys == []
    assert table.has_commit_key("epoch:51")
    assert not table.has_commit_key("epoch:0")
    assert not table.has_commit_key("epoch:49")


def test_expire_gcs_unreferenced_manifests(spark, tmp_path):
    table = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, ("conv_id", "turn_idx"),
        n_buckets=4,
    )
    for e in range(6):
        apply_batch(spark, table, change_events(spark, 300, n_convs=20, seed=e), epoch=e)
    table.compact()
    before = set(table.log.list_manifests())
    table.expire_snapshots(keep_last=2, orphan_grace_seconds=0)
    after = set(table.log.list_manifests())
    live = {m["path"] for s in table.snapshots() for m in s.manifests}
    assert after == live, "manifest GC left unreferenced manifests"
    assert after <= before
    # table still fully readable
    assert table.read().count() > 0


def test_driver_and_distributed_stats_paths_agree(spark, tmp_path):
    """The adaptive stats collection must yield identical per-bucket
    lineage whichever side of the file-count threshold it takes."""
    ev = change_events(spark, 2_000, n_convs=60)
    lineages = []
    for name, threshold in (("drv", 10**9), ("dist", 0)):
        table = LakeTable.create(
            spark, str(tmp_path / name), TRANSCRIPT_SCHEMA,
            ("conv_id", "turn_idx"), n_buckets=8,
        )
        table.STATS_DRIVER_THRESHOLD = threshold
        apply_batch(spark, table, ev, epoch=0)
        lineages.append(table.current().summary["bucket_lineage"])
    assert lineages[0] == lineages[1]


def test_commit_atop_v1_snapshot_preserves_old_data(spark, tmp_path):
    """Upgrade path: the first commit on top of a format-v1 snapshot
    (inline cumulative file map, no manifests) must persist a
    self-contained manifest chain — after a process restart the old data
    is still visible and GC must not delete it."""
    import json
    import os

    from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable as LT

    root = str(tmp_path / "t")
    table = LT.create(spark, root, TRANSCRIPT_SCHEMA, ("conv_id", "turn_idx"),
                      n_buckets=4)
    apply_batch(spark, table, change_events(spark, 500, n_convs=30, seed=1), epoch=0)
    apply_batch(spark, table, change_events(spark, 500, n_convs=30, seed=2), epoch=1)
    rows_before = table.read().count()

    # rewrite the current snapshot as format v1 and drop its manifests,
    # simulating a table written by round-1 code
    snap = table.current()
    d = snap.to_json()
    del d["manifests"], d["epoch_watermark"], d["epoch_base"], d["commit_count"]
    d["format_version"] = 1
    d["files"] = snap.files
    d["commit_keys"] = ["epoch:0", "epoch:1"]
    with open(os.path.join(root, "_meta", f"v{snap.snapshot_id}.json"), "w") as f:
        json.dump(d, f)
    for m in table.log.list_manifests():
        table.log.delete_manifest(m)

    # fresh handle (fresh caches) = new process; commit one more epoch
    t2 = LT.load(spark, root)
    assert t2.has_commit_key("epoch:1")  # v1 cumulative keys still honored
    apply_batch(spark, t2, change_events(spark, 500, n_convs=30, seed=3), epoch=2)

    # another fresh handle: everything must resolve from persisted manifests
    t3 = LT.load(spark, root)
    assert t3.read().count() >= rows_before
    assert t3.read().filter("conv_id is not null").count() == t3.read().count()
    gc = t3.expire_snapshots(keep_last=1, orphan_grace_seconds=0)
    # GC kept every referenced pre-upgrade file: table still fully readable
    assert t3.read().count() >= rows_before
    assert gc["deleted_files"] >= 0
