"""Event-time row retention (``LakeTable.expire_rows``) and targeted key
erasure (``LakeTable.delete_keys``).

The scale claims under test:

- a bucket/slice wholly below the cutoff leaves METADATA-ONLY (its files
  are not read, not deleted — ``expire_snapshots`` owns bytes);
- only cutoff-straddling buckets rewrite, and the rewrite preserves every
  tombstone (deletes keep guarding late lower-LSN arrivals);
- a file that carries null-ts rows (tombstones) is never dropped
  wholesale (``ts_nulls`` manifest stat);
- expiry is a BARRIER to incremental consumers (``changes()`` raises,
  mirrors re-baseline) because state changed without a delta;
- ``delete_keys`` is the changefeed-friendly opposite: ordinary
  tombstone merges, idempotent re-run, physical purge via compact.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from postgres_to_snowflake_data_pipeline_spark.cdc.apply import apply_batch
from postgres_to_snowflake_data_pipeline_spark.cdc.generator import change_events
from postgres_to_snowflake_data_pipeline_spark.cdc.mirror import TableMirror
from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import (
    CHANGE_EVENT_SCHEMA,
    TRANSCRIPT_SCHEMA,
)
from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable

UTC = dt.timezone.utc


def _table(spark, tmp_path, epochs=3, n=4000, **kw):
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        TRANSCRIPT_SCHEMA,
        ("conv_id", "turn_idx"),
        n_buckets=4,
        **kw,
    )
    for e in range(epochs):
        apply_batch(
            spark, t,
            change_events(spark, n, n_convs=250, seed=e + 1),
            epoch=e,
        )
    return t


def _feed(spark, rows, ts=dt.datetime(2026, 1, 1)):
    return spark.createDataFrame(
        [(l, o, c, t, r, x, g, ts) for (l, o, c, t, r, x, g) in rows],
        CHANGE_EVENT_SCHEMA,
    )


def _median_ts(t):
    return t.read().select(
        F.expr("percentile(cast(ts as double), 0.5)").alias("m")
    ).first()["m"]


def _expected_after(t, cutoff):
    return {
        (r.conv_id, r.turn_idx, r.text)
        for r in t.read()
        .filter(F.col("ts") >= F.lit(cutoff))
        .select("conv_id", "turn_idx", "text")
        .collect()
    }


def test_expire_matches_filter_oracle_and_is_idempotent(spark, tmp_path):
    t = _table(spark, tmp_path)
    cutoff = dt.datetime.fromtimestamp(_median_ts(t), tz=UTC)
    want = _expected_after(t, cutoff)
    out = t.expire_rows(cutoff)
    assert out is not None
    assert out.summary["operation"] == "expire_rows"
    got = {
        (r.conv_id, r.turn_idx, r.text)
        for r in t.read().select("conv_id", "turn_idx", "text").collect()
    }
    assert got == want and len(want) > 0
    # re-run at the same cutoff: nothing left to expire
    assert t.expire_rows(cutoff) is None


def test_whole_bucket_drop_is_metadata_only(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.compact()
    pre = t.current()
    on_disk = [
        os.path.join(t.root, e["path"])
        for es in pre.files.values()
        for e in es
    ]
    # cutoff beyond every row: every bucket drops wholesale
    out = t.expire_rows(dt.datetime(2027, 1, 1, tzinfo=UTC))
    assert out is not None
    assert out.summary["buckets_rewritten"] == 0
    assert out.summary["buckets_dropped"] == sum(
        1 for es in pre.files.values() if es
    )
    assert t.read().count() == 0
    # metadata-only: the dropped files still exist (expire_snapshots owns
    # physical deletion) and remain readable via time travel
    assert all(os.path.exists(p) for p in on_disk)
    assert t.read(snapshot_id=pre.snapshot_id).count() > 0


def test_slice_drop_on_ts_clustered_table(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.compact(ts_slices=4)
    snap = t.current()
    zid = snap.column_ids["ts"]
    # cutoff just above the lowest slice's ts_max: that slice (per bucket)
    # is droppable metadata-only, the next one straddles
    first_max = min(
        e["ts_max"]
        for es in snap.files.values()
        for e in es
        if e.get("ts_id") == zid and e.get("ts_nulls") == 0
    )
    cutoff = dt.datetime.fromtimestamp((first_max + 1) / 1e6, tz=UTC)
    want = _expected_after(t, cutoff)
    out = t.expire_rows(cutoff)
    assert out is not None
    assert out.summary["files_dropped"] >= 1
    # not every bucket was rewritten: at least the dropped slices' siblings
    # with clean ranges stayed in place
    n_nonempty = sum(1 for es in snap.files.values() if es)
    assert out.summary["buckets_rewritten"] < n_nonempty or (
        out.summary["files_dropped"] > 0
    )
    got = {
        (r.conv_id, r.turn_idx, r.text)
        for r in t.read().select("conv_id", "turn_idx", "text").collect()
    }
    assert got == want


def test_rewrite_keeps_post_cutoff_tombstones(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        ("conv_id", "turn_idx"), n_buckets=2,
    )
    old = dt.datetime(2026, 1, 1)
    new = dt.datetime(2026, 6, 1)
    apply_batch(
        spark, t,
        _feed(spark, [
            (10, "insert", "k-old", 0, "user", "ancient", None),
            (11, "insert", "k-new", 0, "user", "recent", None),
        ], ts=old).withColumn(
            "ts",
            F.when(F.col("conv_id") == "k-new", F.lit(new)).otherwise(F.col("ts")),
        ),
        epoch=0,
    )
    apply_batch(  # delete k-new: tombstone in a bucket that must rewrite
        spark, t,
        _feed(spark, [(20, "delete", "k-new", 0, None, None, None)], ts=new),
        epoch=1,
    )
    cutoff = dt.datetime(2026, 3, 1, tzinfo=UTC)
    out = t.expire_rows(cutoff)
    assert out is not None and out.summary["buckets_rewritten"] >= 1
    assert t.read().count() == 0  # ancient expired, recent deleted
    # the delete's event time is post-cutoff, so its tombstone survived
    # and still guards: a late lower-LSN upsert of k-new loses
    apply_batch(
        spark, t,
        _feed(spark, [(15, "insert", "k-new", 0, "user", "late-echo", None)], ts=new),
        epoch=2,
    )
    assert t.read().filter(F.col("conv_id") == "k-new").count() == 0


def test_pre_cutoff_tombstone_retires_with_its_era(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        ("conv_id", "turn_idx"), n_buckets=1,
    )
    old = dt.datetime(2026, 1, 1)
    apply_batch(
        spark, t,
        _feed(spark, [
            (10, "insert", "a", 0, "user", "ancient", None),
            (11, "delete", "b", 0, None, None, None),
        ], ts=old),
        epoch=0,
    )
    t.compact()
    out = t.expire_rows(dt.datetime(2027, 1, 1, tzinfo=UTC))
    assert out is not None
    assert t.read().count() == 0
    # delete.retention semantics: b's guard was pre-cutoff, so a late
    # lower-LSN echo re-enters (until the next retention cadence run)
    apply_batch(
        spark, t,
        _feed(spark, [(5, "insert", "b", 0, "user", "older-echo", None)], ts=old),
        epoch=1,
    )
    assert t.read().filter(F.col("conv_id") == "b").count() == 1


def test_null_ts_rows_never_expire(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        ("conv_id", "turn_idx"), n_buckets=1,
    )
    old = dt.datetime(2026, 1, 1)
    apply_batch(
        spark, t,
        _feed(spark, [(10, "insert", "a", 0, "user", "ancient", None)], ts=old),
        epoch=0,
    )
    # a delete_keys tombstone carries NULL ts: unageable, must survive
    t.delete_keys(spark.createDataFrame([("a", 0)], "conv_id string, turn_idx int"))
    t.compact()
    out = t.expire_rows(dt.datetime(2027, 1, 1, tzinfo=UTC))
    # the only file holds just the null-ts tombstone after compaction?
    # No — compaction keeps the tombstone AND drops nothing else here;
    # either way the bucket must NOT be dropped wholesale (ts_nulls > 0)
    if out is not None:
        assert out.summary["buckets_dropped"] == 0
    assert t.read().count() == 0
    # the erasure guard survives the expiry: a late lower-LSN echo loses
    apply_batch(
        spark, t,
        _feed(spark, [(5, "insert", "a", 0, "user", "older-echo", None)], ts=old),
        epoch=1,
    )
    assert t.read().filter(F.col("conv_id") == "a").count() == 0


def test_expire_is_incremental_barrier(spark, tmp_path):
    t = _table(spark, tmp_path, epochs=2)
    pos = t.current().snapshot_id
    cutoff = dt.datetime.fromtimestamp(_median_ts(t), tz=UTC)
    t.expire_rows(cutoff)
    assert t.rollback_in_range(pos)
    with pytest.raises(ValueError, match="expire_rows"):
        t.changes(pos)
    # a window closed before the expiry stays clean
    t.changes(pos - 1, until_snapshot_id=pos)


def _state(table):
    return {
        (x.conv_id, x.turn_idx, x.text)
        for x in table.read().select("conv_id", "turn_idx", "text").collect()
    }


def test_mirror_expire_passthrough(spark, tmp_path):
    """Replication stays O(delta) through retention: the follower replays
    the SAME expiry rule locally instead of re-reading the source."""
    t = _table(spark, tmp_path, epochs=2)
    m = TableMirror(spark, str(tmp_path / "m"), t)
    while m.sync() is not None:
        pass
    cutoff = dt.datetime.fromtimestamp(_median_ts(t), tz=UTC)
    t.expire_rows(cutoff)
    # deltas AFTER the barrier ride the same sync
    apply_batch(
        spark, t, change_events(spark, 2000, n_convs=250, seed=9), epoch=7,
    )
    r = m.sync()
    assert r is not None and r["mode"] == "expire+incremental"
    assert _state(t) == _state(m.follower)
    # position advanced past the barrier; next sync is a plain no-op
    assert m.sync() is None
    # and the follower is itself consistent for ITS consumers: its own
    # expire commit is a barrier there too
    assert m.follower.rollback_in_range(0)


def test_thin_mirror_without_ts_rebaselines_on_expiry(spark, tmp_path):
    t = _table(spark, tmp_path, epochs=2)
    m = TableMirror(
        spark, str(tmp_path / "m"), t, columns=["role", "text"],
    )
    while m.sync() is not None:
        pass
    cutoff = dt.datetime.fromtimestamp(_median_ts(t), tz=UTC)
    t.expire_rows(cutoff)
    r = m.sync()
    # no ts column on the follower: the retention rule cannot replay
    # locally, so the mirror re-baselines in one full read
    assert r is not None and r["mode"] == "rebuild-overwrite"
    src = {
        (x.conv_id, x.turn_idx, x.text)
        for x in t.read().select("conv_id", "turn_idx", "text").collect()
    }
    fol = {
        (x.conv_id, x.turn_idx, x.text)
        for x in m.follower.read().select("conv_id", "turn_idx", "text").collect()
    }
    assert src == fol


def test_expire_rejected_on_patch_tables(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        ("conv_id", "turn_idx"), n_buckets=2,
        props={"patch.columns": ["text"], "patch.sentinel": "\x00unchanged\x00"},
    )
    with pytest.raises(ValueError, match="partial-update"):
        t.expire_rows(dt.datetime(2027, 1, 1, tzinfo=UTC))


def test_delete_keys_tombstones_and_is_idempotent(spark, tmp_path):
    t = _table(spark, tmp_path, epochs=2)
    victims = (
        t.read().select("conv_id", "turn_idx").orderBy("conv_id", "turn_idx").limit(5)
    )
    vk = [(r.conv_id, r.turn_idx) for r in victims.collect()]
    n0 = t.read().count()
    out = t.delete_keys(victims)
    assert out is not None
    assert t.read().count() == n0 - 5
    remaining = {
        (r.conv_id, r.turn_idx)
        for r in t.read().select("conv_id", "turn_idx").collect()
    }
    assert not (set(vk) & remaining)
    # idempotent: the keys have no live winner any more
    assert t.delete_keys(victims) is None
    # late lower-LSN re-delivery of a victim row still loses
    c0, i0 = vk[0]
    apply_batch(
        spark, t,
        _feed(spark, [(1, "insert", c0, i0, "user", "late-echo", None)]),
        epoch=99,
    )
    assert t.read().filter(
        (F.col("conv_id") == c0) & (F.col("turn_idx") == i0)
    ).count() == 0
    # changefeed stays incremental (unlike expire_rows): the delete commit
    # is an ordinary merge visible as deltas
    assert not t.rollback_in_range(0)


def test_delete_keys_physical_purge_via_compact(spark, tmp_path):
    t = _table(spark, tmp_path, epochs=2)
    victim = t.read().select("conv_id").orderBy("conv_id").limit(1)
    conv = victim.first()["conv_id"]
    keys = t.read().filter(F.col("conv_id") == conv).select("conv_id", "turn_idx")
    t.delete_keys(keys)
    t.compact()
    t.expire_snapshots(keep_last=1, orphan_grace_seconds=0)
    # the conversation's text is gone from every surviving data file
    paths = [
        os.path.join(t.root, e["path"])
        for es in t.current().files.values()
        for e in es
    ]
    raw = spark.read.parquet(*paths)
    assert raw.filter(
        (F.col("conv_id") == conv) & F.col("text").isNotNull()
    ).count() == 0


def test_delete_keys_on_patch_table(spark, tmp_path):
    sentinel = "\x00unchanged\x00"
    t = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        ("conv_id", "turn_idx"), n_buckets=2,
        props={"patch.columns": ["text", "tool"], "patch.sentinel": sentinel},
    )
    apply_batch(
        spark, t,
        _feed(spark, [
            (10, "insert", "a", 0, "user", "v1", "grep"),
            (20, "update", "a", 0, "user", sentinel, "sed"),  # text unchanged
            (10, "insert", "b", 0, "user", "keep", None),
        ]),
        epoch=0,
    )
    assert t.read().filter(F.col("conv_id") == "a").first()["text"] == "v1"
    t.delete_keys(spark.createDataFrame([("a", 0)], "conv_id string, turn_idx int"))
    assert t.read().count() == 1
    # a late lower-LSN patch for the deleted key cannot resurrect values
    apply_batch(
        spark, t,
        _feed(spark, [(15, "update", "a", 0, "user", sentinel, "awk")]),
        epoch=1,
    )
    assert t.read().filter(F.col("conv_id") == "a").count() == 0
