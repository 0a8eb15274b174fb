"""Multi-writer optimistic concurrency: CAS snapshot commits, conflict
rebase, cross-writer exactly-once, and compaction racing a merge.

The commit protocol (lake/metadata.py) mirrors Iceberg's
HadoopTableOperations: snapshot files are CAS-created (``os.link`` fails
EEXIST), ``_current`` is an advisory hint with forward probing, and
``LakeTable._next_commit`` rebases + retries on a lost race. These tests
drive real thread races AND deterministic injected conflicts.
"""

from __future__ import annotations

import os
import threading

import pytest
from pyspark.sql import functions as F

from postgres_to_snowflake_data_pipeline_spark.cdc.apply import apply_batch
from postgres_to_snowflake_data_pipeline_spark.cdc.generator import change_events
from postgres_to_snowflake_data_pipeline_spark.cdc.oracle import assert_matches_oracle
from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import TRANSCRIPT_SCHEMA
from postgres_to_snowflake_data_pipeline_spark.lake.metadata import CommitConflictError
from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable

PAYLOAD = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _mk_table(spark, tmp_path, n_buckets=8):
    return LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        key_cols=("conv_id", "turn_idx"), n_buckets=n_buckets,
    )


def _half_feeds(spark, n_events=4000, n_convs=200):
    """Two disjoint event slices of one deterministic feed (split by LSN
    parity so both halves touch every bucket)."""
    ev = change_events(spark, n_events, n_convs=n_convs).localCheckpoint()
    return ev, ev.filter(F.col("lsn") % 2 == 0), ev.filter(F.col("lsn") % 2 == 1)


def test_threaded_merges_both_survive(spark, tmp_path):
    """Two writers (separate LakeTable handles on the same root) commit
    different epochs concurrently; neither commit may be lost."""
    table = _mk_table(spark, tmp_path)
    ev, even, odd = _half_feeds(spark)
    w1 = LakeTable.load(spark, table.root)
    w2 = LakeTable.load(spark, table.root)
    errs: list[Exception] = []

    def run(writer, events, epoch):
        try:
            apply_batch(spark, writer, events, epoch=epoch)
        except Exception as exc:  # surfaced below — a thread must not die
            errs.append(exc)

    ts = [
        threading.Thread(target=run, args=(w1, even, 0)),
        threading.Thread(target=run, args=(w2, odd, 1)),
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs
    final = LakeTable.load(spark, table.root)
    cur = final.current()
    assert cur.commit_count == 2
    assert final.has_commit_key("epoch:0") and final.has_commit_key("epoch:1")
    # state == sequential application of the full feed
    assert_matches_oracle(final.read(), ev, PAYLOAD)


def test_injected_conflict_rebases_and_keeps_both(spark, tmp_path):
    """Deterministic race: writer A loses the CAS to writer B exactly once
    (B's merge is injected between A's data write and A's commit). A must
    rebase onto B's snapshot and both batches must land."""
    table = _mk_table(spark, tmp_path)
    ev, even, odd = _half_feeds(spark)
    loser = LakeTable.load(spark, table.root)
    racer = LakeTable.load(spark, table.root)

    real_commit = loser.log.commit
    fired = {"n": 0}

    def commit_with_race(snap, new_manifest=None):
        if fired["n"] == 0:
            fired["n"] = 1
            apply_batch(spark, racer, odd, epoch=1)  # steals our snapshot id
        return real_commit(snap, new_manifest=new_manifest)

    loser.log.commit = commit_with_race  # type: ignore[method-assign]
    res = apply_batch(spark, loser, even, epoch=0)
    assert not res.skipped
    assert fired["n"] == 1
    final = LakeTable.load(spark, table.root)
    assert final.current().commit_count == 2
    assert_matches_oracle(final.read(), ev, PAYLOAD)


def test_same_commit_key_raced_applies_exactly_once(spark, tmp_path):
    """Two writers replay the SAME epoch (crash-recovery double-fire): the
    CAS loser must detect the racer's identical commit key at rebase time
    and back off — table state identical to a single apply."""
    table = _mk_table(spark, tmp_path)
    ev = change_events(spark, 3000, n_convs=150).localCheckpoint()
    loser = LakeTable.load(spark, table.root)
    racer = LakeTable.load(spark, table.root)

    real_commit = loser.log.commit
    fired = {"n": 0}

    def commit_with_race(snap, new_manifest=None):
        if fired["n"] == 0:
            fired["n"] = 1
            apply_batch(spark, racer, ev, epoch=0)  # same epoch wins first
        return real_commit(snap, new_manifest=new_manifest)

    loser.log.commit = commit_with_race  # type: ignore[method-assign]
    res = apply_batch(spark, loser, ev, epoch=0)
    assert res.skipped  # loser reports the skip, exactly-once across writers
    final = LakeTable.load(spark, table.root)
    assert final.current().commit_count == 1
    assert_matches_oracle(final.read(), ev, PAYLOAD)


def test_compaction_racing_merge_keeps_late_deltas(spark, tmp_path):
    """A merge that lands between compaction's read and its commit must NOT
    be clobbered by the compaction's bucket-replace: the rebase re-appends
    the late delta files, and LWW keeps their rows authoritative."""
    table = _mk_table(spark, tmp_path)
    ev, even, odd = _half_feeds(spark)
    apply_batch(spark, table, even, epoch=0)

    compactor = LakeTable.load(spark, table.root)
    merger = LakeTable.load(spark, table.root)
    real_commit = compactor.log.commit
    fired = {"n": 0}

    def commit_with_race(snap, new_manifest=None):
        if fired["n"] == 0:
            fired["n"] = 1
            apply_batch(spark, merger, odd, epoch=1)  # delta lands mid-compact
        return real_commit(snap, new_manifest=new_manifest)

    compactor.log.commit = commit_with_race  # type: ignore[method-assign]
    compactor.compact()
    assert fired["n"] == 1
    final = LakeTable.load(spark, table.root)
    assert final.has_commit_key("epoch:1")  # the racer's commit survives
    assert_matches_oracle(final.read(), ev, PAYLOAD)


def test_current_id_ignores_stale_hint(spark, tmp_path):
    """_current is advisory: a regressed hint (delayed write from a slow
    racer) must not roll the table back — forward probing finds the truth."""
    table = _mk_table(spark, tmp_path)
    ev = change_events(spark, 1000, n_convs=50)
    apply_batch(spark, table, ev, epoch=0)
    apply_batch(spark, table, ev.withColumn("lsn", F.col("lsn") + 10_000_000),
                epoch=1)
    latest = table.current().snapshot_id
    with open(os.path.join(table.root, "_meta", "_current"), "w") as f:
        f.write("0")  # simulate a lost/regressed hint write
    fresh = LakeTable.load(spark, table.root)
    assert fresh.current().snapshot_id == latest


def test_cas_create_is_exclusive(tmp_path):
    from postgres_to_snowflake_data_pipeline_spark.lake.metadata import MetadataLog

    log = MetadataLog(str(tmp_path))
    os.makedirs(log.meta_dir, exist_ok=True)
    p = os.path.join(log.meta_dir, "v9.json")
    assert log._cas_create(p, "{}") is True
    assert log._cas_create(p, "{}") is False  # second writer loses
    assert open(p).read() == "{}"
    # no temp litter
    assert not [f for f in os.listdir(log.meta_dir) if f.endswith(".tmp")]


def test_retry_bound_raises(spark, tmp_path):
    """If every attempt conflicts (pathological), _next_commit fails loudly
    instead of spinning forever."""
    table = _mk_table(spark, tmp_path)
    ev = change_events(spark, 500, n_convs=20)

    def always_conflict(snap, new_manifest=None):
        raise CommitConflictError("injected")

    table.log.commit = always_conflict  # type: ignore[method-assign]
    table.MAX_COMMIT_ATTEMPTS = 3
    with pytest.raises(CommitConflictError, match="gave up"):
        apply_batch(spark, table, ev, epoch=0)


def test_four_writers_with_concurrent_compaction(spark, tmp_path):
    """Stress: four writers commit disjoint epochs while a fifth thread
    compacts twice — every commit survives, final state is exact."""
    table = _mk_table(spark, tmp_path)
    ev = change_events(spark, 8000, n_convs=300).localCheckpoint()
    slices = [ev.filter(F.col("lsn") % 4 == i) for i in range(4)]
    writers = [LakeTable.load(spark, table.root) for _ in range(4)]
    compactor = LakeTable.load(spark, table.root)
    errs: list[Exception] = []

    def merge_one(w, df, e):
        try:
            apply_batch(spark, w, df, epoch=e)
        except Exception as exc:
            errs.append(exc)

    def compact_twice():
        try:
            for _ in range(2):
                compactor.compact()
        except Exception as exc:
            errs.append(exc)

    ts = [
        threading.Thread(target=merge_one, args=(writers[i], slices[i], i))
        for i in range(4)
    ] + [threading.Thread(target=compact_twice)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs
    final = LakeTable.load(spark, table.root)
    assert final.current().commit_count == 4
    for e in range(4):
        assert final.has_commit_key(f"epoch:{e}")
    assert_matches_oracle(final.read(), ev, PAYLOAD)


def test_repair_hint_picks_highest_snapshot(tmp_path):
    """A lost _current must repair to the HIGHEST v{N}.json — a detached
    tag-pinned old snapshot below a gap must not roll the table back."""
    import json

    from postgres_to_snowflake_data_pipeline_spark.lake.metadata import MetadataLog

    log = MetadataLog(str(tmp_path))
    os.makedirs(log.meta_dir, exist_ok=True)
    for sid in (1, 5, 6):  # 1 = old tag-pinned detached; 5-6 = live chain
        with open(os.path.join(log.meta_dir, f"v{sid}.json"), "w") as f:
            json.dump({}, f)
    log.repair_hint()
    assert log.current_id() == 6
