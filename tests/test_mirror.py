"""Changefeed-driven replication (cdc/mirror.py) and its table primitives.

Invariants:

- ``dead_merge_ids`` / ``live_snapshots``: the ceiling walk resolves nested
  rollbacks; dead and live partition the retained merges.
- ``changes(skip_rolled_back=True)``: a consumer positioned at or before
  the rollback target consumes ACROSS the rollback and sees exactly the
  live merges; a consumer that ingested rolled-back merges still raises.
- ``overwrite``: atomic full-state replacement — replaces every bucket,
  carries tombstones (late lower-LSN rows still lose), preserves history
  for pinned readers, and is flagged as a non-delta barrier to incremental
  consumers.
- ``TableMirror``: the table's own changefeed replayed into a follower
  reconverges it exactly (CDC closure) — incrementally, across source
  rollbacks (propagated as follower rollbacks, metadata-only), across
  history expiry (rebuild), under re-layout, additive schema evolution and
  partial-update (patch) sources; position is exactly-once and resumable
  from the follower alone.

Reference analog: the reference replicates by clear-and-reload every run
(/root/reference/scripts/load_data.py:119-131); the mirror ships deltas.
"""

from __future__ import annotations

import datetime as dt

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

TS = dt.datetime(2026, 1, 1)


def _table(spark, tmp_path, name="src", n_buckets=4, **kw):
    return LakeTable.create(
        spark,
        str(tmp_path / name),
        TRANSCRIPT_SCHEMA,
        ("conv_id", "turn_idx"),
        n_buckets=n_buckets,
        **kw,
    )


def _same(a, b):
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def _epoch(spark, t, epoch, seed, n=1200, n_convs=80):
    return apply_batch(
        spark, t, change_events(spark, n, n_convs=n_convs, seed=seed),
        epoch=epoch,
    )


def _feed(spark, rows):
    """rows: (lsn, op, conv, turn, role, text, tool)"""
    return spark.createDataFrame(
        [(l, o, c, t, r, x, g, TS) for (l, o, c, t, r, x, g) in rows],
        CHANGE_EVENT_SCHEMA,
    )


# ---------------------------------------------------------------- walks
def test_dead_merge_ids_nested_rollbacks(spark, tmp_path):
    t = _table(spark, tmp_path)
    s1 = _epoch(spark, t, 0, seed=1).snapshot_id
    s2 = _epoch(spark, t, 1, seed=2).snapshot_id
    s3 = _epoch(spark, t, 2, seed=3).snapshot_id
    t.rollback_to(snapshot_id=s2)          # kills s3
    s5 = _epoch(spark, t, 3, seed=4).snapshot_id
    t.rollback_to(snapshot_id=s1)          # kills s2, s5 (nested target)
    dead = t.dead_merge_ids()
    assert dead == {s2, s3, s5}
    live_ids = {s.snapshot_id for s in t.live_snapshots()}
    assert s1 in live_ids and not (dead & live_ids)
    # every retained merge is either dead or live
    merges = {
        s.snapshot_id
        for s in t.snapshots()
        if s.summary.get("operation") == "merge"
    }
    assert merges == dead | (merges & live_ids)
    # the walk respects a closed window: at until=s3, only s3 is dead
    assert t.dead_merge_ids(until_snapshot_id=s5 - 1) == {s3}


def test_changes_skip_rolled_back(spark, tmp_path):
    t = _table(spark, tmp_path)
    good = _epoch(spark, t, 0, seed=1).snapshot_id
    bad_sid = apply_batch(
        spark, t,
        change_events(spark, 800, n_convs=80, seed=2).withColumn(
            "text", F.lit("CORRUPTED")
        ),
        epoch=1,
    ).snapshot_id
    rb = t.rollback_to(snapshot_id=good).snapshot_id
    _epoch(spark, t, 1, seed=3)  # corrected epoch re-applies
    # default: spanning the rollback raises
    with pytest.raises(ValueError, match="rollback"):
        t.changes(good)
    # skip_rolled_back from the rollback target: exactly the live merges,
    # i.e. the same rows a post-rollback window sees
    got = t.changes(good, skip_rolled_back=True)
    want = t.changes(rb)
    assert _same(got, want)
    assert got.filter(F.col("text") == "CORRUPTED").isEmpty()
    # a consumer that ingested the rolled-back merge still raises
    with pytest.raises(ValueError, match="rolled-back|rewound"):
        t.changes(bad_sid, skip_rolled_back=True)


# ---------------------------------------------------------------- overwrite
def test_overwrite_replaces_state(spark, tmp_path):
    src = _table(spark, tmp_path, "src")
    _epoch(spark, src, 0, seed=1)
    _epoch(spark, src, 1, seed=2)
    dst = _table(spark, tmp_path, "dst")
    apply_batch(
        spark, dst,
        _feed(spark, [(1, "insert", "zz", 0, "user", "doomed", None)]),
        epoch=0,
    )
    pre = dst.current().snapshot_id
    state = src.read(include_internal=True, include_tombstones=True)
    dst.overwrite(state)
    assert _same(dst.read(), src.read())
    # the pre-overwrite key is gone, but time travel still sees it
    assert dst.read().filter(F.col("conv_id") == "zz").isEmpty()
    assert not dst.read(snapshot_id=pre).filter(
        F.col("conv_id") == "zz"
    ).isEmpty()
    # non-delta barrier: incremental consumers are told loudly
    assert dst.rollback_in_range(pre)
    with pytest.raises(ValueError, match="rollback|overwrite"):
        dst.changes(pre)
    with pytest.raises(ValueError, match="overwrite"):
        dst.changes(pre, skip_rolled_back=True)
    # _lsn is mandatory
    with pytest.raises(ValueError, match="_lsn"):
        dst.overwrite(src.read())


def test_overwrite_keeps_tombstones_as_late_arrival_guards(spark, tmp_path):
    src = _table(spark, tmp_path, "src")
    apply_batch(
        spark, src,
        _feed(spark, [(10, "insert", "k1", 0, "user", "hello", None),
                      (20, "delete", "k1", 0, None, None, None),
                      (11, "insert", "k2", 0, "user", "stays", None)]),
        epoch=0,
    )
    dst = _table(spark, tmp_path, "dst")
    dst.overwrite(src.read(include_internal=True, include_tombstones=True))
    assert _same(dst.read(), src.read())
    # a late LOWER-LSN upsert for the deleted key must still lose
    apply_batch(
        spark, dst,
        _feed(spark, [(15, "insert", "k1", 0, "user", "resurrect?", None)]),
        epoch=1,
    )
    assert dst.read().filter(F.col("conv_id") == "k1").isEmpty()


# ---------------------------------------------------------------- mirror
def test_mirror_bootstrap_incremental_and_resume(spark, tmp_path):
    src = _table(spark, tmp_path, "src")
    m = TableMirror(spark, str(tmp_path / "rep"), src)
    for e in range(3):
        _epoch(spark, src, e, seed=e + 1)
        r = m.sync()
        assert r is not None and r["mode"] == "incremental"
    assert _same(m.read(), src.read())
    assert m.position() == src.current().snapshot_id
    assert m.sync() is None  # already current
    # resumable from the follower alone (fresh object = restarted process)
    m2 = TableMirror(spark, str(tmp_path / "rep"), src)
    assert m2.position() == src.current().snapshot_id
    assert m2.sync() is None
    # a lagging mirror catches up across several commits (incl. compaction,
    # which the changefeed correctly skips) in ONE sync
    _epoch(spark, src, 3, seed=7)
    src.compact()
    _epoch(spark, src, 4, seed=8)
    r = m2.sync()
    assert r["mode"] == "incremental"
    assert _same(m2.read(), src.read())


def test_mirror_rollback_propagates_to_follower(spark, tmp_path):
    src = _table(spark, tmp_path, "src")
    m = TableMirror(spark, str(tmp_path / "rep"), src)
    _epoch(spark, src, 0, seed=1)
    m.sync()
    src.tag("good")
    apply_batch(
        spark, src,
        change_events(spark, 800, n_convs=80, seed=2).withColumn(
            "text", F.lit("CORRUPTED")
        ),
        epoch=1,
    )
    m.sync()  # mirror ingests the bad epoch
    assert not m.read().filter(F.col("text") == "CORRUPTED").isEmpty()
    src.rollback_to(tag="good")
    _epoch(spark, src, 1, seed=3)  # corrected epoch
    r = m.sync()
    assert r["mode"] == "rollback+incremental"
    assert _same(m.read(), src.read())
    assert m.read().filter(F.col("text") == "CORRUPTED").isEmpty()
    # the recovery was a follower ROLLBACK (metadata-only), not a rebuild
    ops = [s.summary.get("operation") for s in m.follower.snapshots()]
    assert "rollback" in ops and "overwrite" not in ops
    # still incremental afterwards
    _epoch(spark, src, 2, seed=4)
    assert m.sync()["mode"] == "incremental"
    assert _same(m.read(), src.read())


def test_mirror_rebuilds_when_history_expired(spark, tmp_path):
    src = _table(spark, tmp_path, "src")
    m = TableMirror(spark, str(tmp_path / "rep"), src)
    _epoch(spark, src, 0, seed=1)
    m.sync()
    for e in (1, 2, 3):
        _epoch(spark, src, e, seed=e + 1)
    src.expire_snapshots(keep_last=1, orphan_grace_seconds=0)
    r = m.sync()
    assert r["mode"] == "rebuild-expired"
    assert _same(m.read(), src.read())
    # back to incremental on the next window
    _epoch(spark, src, 4, seed=9)
    assert m.sync()["mode"] == "incremental"
    assert _same(m.read(), src.read())


def test_mirror_relayout_and_additive_evolution(spark, tmp_path):
    src = _table(spark, tmp_path, "src")
    m = TableMirror(spark, str(tmp_path / "rep"), src, n_buckets=8)
    _epoch(spark, src, 0, seed=1)
    m.sync()
    assert m.follower.current().n_buckets == 8
    # additive source evolution flows through the changefeed merge
    apply_batch(
        spark, src,
        change_events(spark, 600, n_convs=80, seed=2, evolved_from=0),
        epoch=1,
    )
    m.sync()
    assert _same(m.read(), src.read())
    assert {"tool_meta", "latency_ms"} <= set(m.read().columns)


# ------------------------------------------------------------ partial/thin
def test_mirror_partial_key_shards_union_to_source(spark, tmp_path):
    """Key-predicate shards: each follower holds exactly its shard and the
    shards' union is the source — the scale-out replica shape (the
    predicate is a pure key function, so rows never move between shards
    and no out-of-subset tombstones accumulate for live keys)."""
    src = _table(spark, tmp_path, "src")
    pred = "pmod(cast(substr(conv_id, 6) as int), 2) = {r}"
    shards = [
        TableMirror(
            spark, str(tmp_path / f"shard{r}"), src,
            filter_expr=pred.format(r=r),
        )
        for r in (0, 1)
    ]
    for e in range(2):
        _epoch(spark, src, e, seed=e + 1)
        for s in shards:
            assert s.sync()["mode"] == "incremental"
    full = src.read()
    for r, s in enumerate(shards):
        assert _same(s.read(), full.filter(F.expr(pred.format(r=r))))
        assert s.follower.props["mirror.filter"] == pred.format(r=r)
        # key-only regime: the follower holds NOTHING for foreign keys —
        # not even tombstones (the drop regime, not synthesized deletes)
        internal = s.follower.read(
            include_internal=True, include_tombstones=True
        )
        assert internal.filter(~F.expr(pred.format(r=r))).isEmpty()
    assert _same(shards[0].read().unionByName(shards[1].read()), full)
    # a shard REBUILD also costs (and contains) exactly its shard
    for e in (2, 3):
        _epoch(spark, src, e, seed=e + 1)
    src.expire_snapshots(keep_last=1, orphan_grace_seconds=0)
    for r, s in enumerate(shards):
        assert s.sync()["mode"] == "rebuild-expired"
        assert _same(s.read(), src.read().filter(F.expr(pred.format(r=r))))
        internal = s.follower.read(
            include_internal=True, include_tombstones=True
        )
        assert internal.filter(~F.expr(pred.format(r=r))).isEmpty()


def test_sync_group_shares_one_window_read(spark, tmp_path, monkeypatch):
    """Fan-out sync: N replicas of one source at the same position read
    the changefeed window ONCE (cached + shared), yet each converges to
    its own subset; a lagging member gets its own window without
    disturbing the group."""
    src = _table(spark, tmp_path, "src")
    pred = "pmod(cast(substr(conv_id, 6) as int), 2) = {r}"
    reps = [
        TableMirror(
            spark, str(tmp_path / f"g{r}"), src, filter_expr=pred.format(r=r)
        )
        for r in (0, 1)
    ] + [TableMirror(spark, str(tmp_path / "gfull"), src)]
    _epoch(spark, src, 0, seed=1)
    assert all(
        s["mode"] == "incremental" for s in TableMirror.sync_group(reps)
    )
    _epoch(spark, src, 1, seed=2)
    reps[2].sync()  # the full replica runs ahead...
    _epoch(spark, src, 2, seed=3)  # ...and now lags differently
    calls = 0
    orig = LakeTable.changes

    def counting(self, *a, **kw):
        nonlocal calls
        calls += 1
        return orig(self, *a, **kw)

    monkeypatch.setattr(LakeTable, "changes", counting)
    stats = TableMirror.sync_group(reps)
    # two shards share one window; the differently-positioned full
    # replica needs its own — 2 reads for 3 syncs, not 3
    assert calls == 2
    assert all(s is not None and s["mode"] == "incremental" for s in stats)
    full = src.read()
    for r in (0, 1):
        assert _same(reps[r].read(), full.filter(F.expr(pred.format(r=r))))
    assert _same(reps[2].read(), full)


def test_mirror_partial_subset_movement(spark, tmp_path):
    """A payload predicate: updates move rows in and out of the subset;
    an out-move is evicted from the follower (synthesized delete), an
    in-move lands, source deletes pass through."""
    src = _table(spark, tmp_path, "src")
    m = TableMirror(
        spark, str(tmp_path / "rep"), src, filter_expr="role = 'user'"
    )
    apply_batch(
        spark, src,
        _feed(spark, [(1, "insert", "c1", 0, "user", "in", None),
                      (2, "insert", "c2", 0, "assistant", "out", None)]),
        epoch=0,
    )
    m.sync()
    assert _same(m.read(), src.read().filter("role = 'user'"))
    assert m.read().count() == 1
    apply_batch(
        spark, src,
        _feed(spark, [(5, "update", "c1", 0, "assistant", "left", None),
                      (6, "update", "c2", 0, "user", "joined", None)]),
        epoch=1,
    )
    m.sync()
    assert _same(m.read(), src.read().filter("role = 'user'"))
    assert m.read().filter("conv_id = 'c1'").isEmpty()
    assert m.read().filter("conv_id = 'c2'").count() == 1
    # a source delete of an in-subset row passes through
    apply_batch(
        spark, src,
        _feed(spark, [(9, "delete", "c2", 0, None, None, None)]),
        epoch=2,
    )
    m.sync()
    assert m.read().isEmpty()


def test_mirror_thin_projection(spark, tmp_path):
    """columns= restricts the carried payload (keys always ride); content
    index declarations are scoped to carried columns; the predicate may
    reference a column the replica does not carry (full pre-image)."""
    src = LakeTable.create(
        spark,
        str(tmp_path / "src"),
        TRANSCRIPT_SCHEMA,
        ("conv_id", "turn_idx"),
        n_buckets=4,
        props={"index.sets": ["role"], "index.tokens": "text"},
    )
    m = TableMirror(
        spark, str(tmp_path / "rep"), src,
        filter_expr="role in ('user', 'assistant')",
        columns=["role", "ts"],
    )
    _epoch(spark, src, 0, seed=1)
    _epoch(spark, src, 1, seed=2)
    m.sync()
    assert set(m.read().columns) == {"conv_id", "turn_idx", "role", "ts"}
    assert _same(
        m.read(),
        src.read()
        .filter("role in ('user', 'assistant')")
        .select("conv_id", "turn_idx", "role", "ts"),
    )
    # index declarations scoped: role's set index rides, text's token
    # index (uncarried column) is dropped; the subset definition is pinned
    props = m.follower.props
    assert props.get("index.sets") == ["role"]
    assert "index.tokens" not in props
    assert props["mirror.columns"] == ["role", "ts"]
    # fresh instance with the same definition resumes; changed ones refuse
    m2 = TableMirror(
        spark, str(tmp_path / "rep"), src,
        filter_expr="role in ('user', 'assistant')",
        columns=["role", "ts"],
    )
    assert m2.sync() is None
    with pytest.raises(ValueError, match="subset definition"):
        TableMirror(spark, str(tmp_path / "rep"), src)
    with pytest.raises(ValueError, match="subset definition"):
        TableMirror(
            spark, str(tmp_path / "rep"), src, filter_expr="role = 'user'",
            columns=["role", "ts"],
        )
    with pytest.raises(ValueError, match="not in the source schema"):
        TableMirror(
            spark, str(tmp_path / "x"), src, columns=["nope"]
        ).sync()


def test_mirror_partial_rebuild_on_expiry(spark, tmp_path):
    """Payload-predicate rebuild: out-of-subset live rows become
    tombstones at their own LSN — the guard that makes a LATER window's
    lower-LSN batch winner (the changefeed emits batch winners, not
    global winners) still lose. The epochs here have overlapping LSN
    ranges, so the post-rebuild incremental window genuinely exercises
    that late-arrival path."""
    src = _table(spark, tmp_path, "src")
    m = TableMirror(
        spark, str(tmp_path / "rep"), src, filter_expr="role = 'user'"
    )
    _epoch(spark, src, 0, seed=1)
    m.sync()
    for e in (1, 2, 3):
        _epoch(spark, src, e, seed=e + 1)
    src.expire_snapshots(keep_last=1, orphan_grace_seconds=0)
    r = m.sync()
    assert r["mode"] == "rebuild-expired"
    assert _same(m.read(), src.read().filter("role = 'user'"))
    # out-of-subset keys are tombstoned (payload NULLed), never live
    internal = m.follower.read(
        include_internal=True, include_tombstones=True
    )
    foreign = internal.filter(~F.coalesce(F.expr("role = 'user'"), F.lit(False)))
    assert not foreign.isEmpty()
    assert foreign.filter(~F.col("_deleted")).isEmpty()
    assert foreign.filter(F.col("text").isNotNull()).isEmpty()
    # back to incremental afterwards, still subset-correct (this window
    # delivers lower-LSN batch winners for out-of-subset keys)
    _epoch(spark, src, 4, seed=9)
    assert m.sync()["mode"] == "incremental"
    assert _same(m.read(), src.read().filter("role = 'user'"))


def test_mirror_partial_rejects_patch_sources(spark, tmp_path):
    src = LakeTable.create(
        spark,
        str(tmp_path / "src"),
        TRANSCRIPT_SCHEMA,
        ("conv_id", "turn_idx"),
        n_buckets=4,
        props={"patch.columns": ["text"]},
    )
    with pytest.raises(ValueError, match="patch"):
        TableMirror(
            spark, str(tmp_path / "r1"), src, filter_expr="role = 'user'"
        )
    with pytest.raises(ValueError, match="patch"):
        TableMirror(spark, str(tmp_path / "r2"), src, columns=["text"])
    # a patch declaration arriving AFTER the mirror exists is caught too
    src2 = _table(spark, tmp_path, "src2")
    m = TableMirror(
        spark, str(tmp_path / "r3"), src2, filter_expr="role = 'user'"
    )
    _epoch(spark, src2, 0, seed=1)
    m.sync()
    src2.update_props({"patch.columns": ["text"]})
    with pytest.raises(ValueError, match="patch"):
        m.sync()


def test_mirror_patch_source(spark, tmp_path):
    src = LakeTable.create(
        spark,
        str(tmp_path / "src"),
        TRANSCRIPT_SCHEMA,
        ("conv_id", "turn_idx"),
        n_buckets=4,
        props={"patch.columns": ["text", "tool"]},
    )
    m = TableMirror(spark, str(tmp_path / "rep"), src)
    apply_batch(
        spark, src,
        _feed(spark, [(1, "insert", "c1", 0, "user", "hello", "t0"),
                      (2, "insert", "c2", 0, "user", "other", None)]),
        epoch=0,
    )
    m.sync()
    # patch declaration reached the follower ahead of the data
    assert m.follower.props.get("patch.columns") == ["text", "tool"]
    # partial update: text omitted (NULL = unchanged on a patch table)
    apply_batch(
        spark, src,
        _feed(spark, [(5, "update", "c1", 0, "user", None, "t1")]),
        epoch=1,
    )
    m.sync()
    assert _same(m.read(), src.read())
    row = m.read().filter(F.col("conv_id") == "c1").first()
    assert row["text"] == "hello" and row["tool"] == "t1"
