"""Declarative audit gate (write-audit-publish in the pipeline spec).

Invariants: a passing audit publishes (oracle parity, frontier advances,
report rides the result); a failing audit with on_fail='reject' quarantines
the batch, folds an applied-as-rejected commit (exactly-once: replay is a
no-op) and the frontier still advances; on_fail='fail' halts with the batch
left staged, resumes AT THE AUDIT (no double data write), and a manual
publish unblocks the epoch; checks validate at spec load and round-trip
through JSON; reject is crash-idempotent like publish.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from postgres_to_snowflake_data_pipeline_spark.cdc.apply import (
    AuditFailed,
    apply_audited_batch,
    apply_batch,
)
from postgres_to_snowflake_data_pipeline_spark.cdc.generator import change_events
from postgres_to_snowflake_data_pipeline_spark.cdc.multi import latest_frontier
from postgres_to_snowflake_data_pipeline_spark.cdc.oracle import (
    assert_matches_oracle,
)
from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import TRANSCRIPT_SCHEMA
from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable
from postgres_to_snowflake_data_pipeline_spark.orchestrate import (
    AuditSpec,
    Pipeline,
    PipelineSpec,
    compile_audit,
)

PAYLOAD = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
KEYS = ("conv_id", "turn_idx")


def _tagged(ev):
    tag = F.when(F.abs(F.xxhash64("lsn")) % 2 == 0, "ta").otherwise("tb")
    return ev.withColumn("_table", tag)


def _spec(tmp_path, checks, on_fail):
    return PipelineSpec.from_dict({
        "lake_root": str(tmp_path / "lake"),
        "sources": [{"name": "wal", "kind": "dataframe"}],
        "tables": [
            {"name": "ta", "key_cols": ["conv_id", "turn_idx"], "n_buckets": 4},
            {"name": "tb", "key_cols": ["conv_id", "turn_idx"], "n_buckets": 4},
        ],
        "audits": [{"table": "ta", "checks": checks, "on_fail": on_fail}],
    })


def test_spec_validation_and_json_round_trip(tmp_path):
    checks = [
        {"kind": "expr", "expr": "turn_idx >= 0", "label": "non-neg"},
        {"kind": "not_null", "columns": ["conv_id", "role"]},
        {"kind": "min_rows", "value": 1},
        {"kind": "max_rows", "value": 10, "scope": "merged"},
    ]
    spec = _spec(tmp_path, checks, "reject")
    spec2 = PipelineSpec.from_json(json.dumps(spec.to_dict()))
    assert spec == spec2
    with pytest.raises(ValueError, match="unknown check kind"):
        AuditSpec(table="t", checks=({"kind": "exprr", "expr": "1=1"},))
    with pytest.raises(ValueError, match="needs a SQL string"):
        AuditSpec(table="t", checks=({"kind": "expr"},))
    with pytest.raises(ValueError, match="non-empty 'columns'"):
        AuditSpec(table="t", checks=({"kind": "not_null", "columns": []},))
    with pytest.raises(ValueError, match="int 'value'"):
        AuditSpec(table="t", checks=({"kind": "min_rows", "value": "x"},))
    with pytest.raises(ValueError, match="scope"):
        AuditSpec(table="t", checks=({"kind": "expr", "expr": "1=1",
                                      "scope": "table"},))
    with pytest.raises(ValueError, match="on_fail"):
        AuditSpec(table="t", checks=({"kind": "min_rows", "value": 1},),
                  on_fail="quarantine")
    with pytest.raises(ValueError, match="checks must be non-empty"):
        AuditSpec(table="t", checks=())
    # typo'd optional keys are rejected, not silently defaulted
    with pytest.raises(ValueError, match="unknown keys.*scopes"):
        AuditSpec(table="t", checks=(
            {"kind": "expr", "expr": "1=1", "scopes": "merged"},))
    with pytest.raises(ValueError, match="unknown keys.*max_violation"):
        AuditSpec(table="t", checks=(
            {"kind": "not_null", "columns": ["a"], "max_violation": 5},))
    raw = spec.to_dict()
    raw["audits"][0]["table"] = "nope"
    with pytest.raises(ValueError, match="unknown table"):
        PipelineSpec.from_dict(raw)
    raw["audits"] = [
        {"table": "ta", "checks": [{"kind": "min_rows", "value": 1}]},
        {"table": "ta", "checks": [{"kind": "max_rows", "value": 9}]},
    ]
    with pytest.raises(ValueError, match="multiple audits"):
        PipelineSpec.from_dict(raw)


def test_pipeline_audit_passes_and_publishes(spark, tmp_path):
    ev = change_events(spark, 3000, n_convs=150).localCheckpoint()
    lo, hi = ev.select(F.min("lsn"), F.max("lsn")).first()
    mid = (lo + hi) // 2
    epochs = {0: _tagged(ev.filter(F.col("lsn") <= mid)),
              1: _tagged(ev.filter(F.col("lsn") > mid))}
    spec = _spec(tmp_path, [
        {"kind": "expr", "expr": "turn_idx >= 0", "label": "non-neg-turn"},
        {"kind": "not_null", "columns": ["conv_id", "role"]},
        {"kind": "min_rows", "value": 1},
    ], "fail")
    pipe = Pipeline(spark, spec)
    for e in (0, 1):
        res = pipe.run_epoch(e, feeds={"wal": epochs[e]})
        rep = res["audits"]["ta"]
        assert rep["passed"] and len(rep["checks"]) == 3
        assert all(c["passed"] for c in rep["checks"])
        assert res["tables"]["ta"].audit is rep
        assert not res["tables"]["ta"].rejected
        assert res["tables"]["ta"].snapshot_id is not None
    full = epochs[0].unionByName(epochs[1])
    for name in ("ta", "tb"):
        expected = full.filter(F.col("_table") == name).drop("_table")
        assert_matches_oracle(pipe.tables[name].read(), expected, PAYLOAD)
    assert latest_frontier(os.path.join(spec.lake_root, "_frontier")).epoch == 1
    # the publish is visible in history — WITH the green-lighting report —
    # and nothing is left staged
    pubs = [s for s in pipe.tables["ta"].snapshots()
            if s.summary.get("operation_detail") == "publish-staged"]
    assert len(pubs) == 2
    assert all(s.summary["audit"]["passed"] for s in pubs)
    assert pipe.tables["ta"].staged() == {}


def test_pipeline_audit_reject_quarantines_and_continues(spark, tmp_path):
    ev = change_events(spark, 3000, n_convs=150).localCheckpoint()
    lo, hi = ev.select(F.min("lsn"), F.max("lsn")).first()
    mid = (lo + hi) // 2
    # epoch 0 poisons role=NULL on ta-routed rows; epoch 1 is clean
    e0 = _tagged(ev.filter(F.col("lsn") <= mid))
    e0 = e0.withColumn(
        "role",
        F.when(F.col("_table") == "ta", F.lit(None).cast("string"))
        .otherwise(F.col("role")),
    )
    e1 = _tagged(ev.filter(F.col("lsn") > mid))
    spec = _spec(tmp_path, [
        {"kind": "not_null", "columns": ["role"], "label": "role-set"},
    ], "reject")
    pipe = Pipeline(spark, spec)

    res0 = pipe.run_epoch(0, feeds={"wal": e0})
    assert res0["audits"]["ta"]["passed"] is False
    assert res0["tables"]["ta"].rejected
    assert res0["tables"]["ta"].snapshot_id is not None  # the reject commit
    assert not res0["tables"]["tb"].skipped  # tb applied normally
    # ta shows none of the poisoned rows; tb has its slice
    assert pipe.tables["ta"].read().count() == 0
    assert_matches_oracle(
        pipe.tables["tb"].read(),
        e0.filter(F.col("_table") == "tb").drop("_table"), PAYLOAD,
    )
    # frontier advanced PAST the rejected epoch
    assert latest_frontier(os.path.join(spec.lake_root, "_frontier")).epoch == 0
    # the rejection is recorded with a reason, and the files are quarantined
    ta = pipe.tables["ta"]
    rej = [s for s in ta.snapshots()
           if s.summary.get("operation") == "audit-reject"]
    assert len(rej) == 1
    assert "role-set" in rej[0].summary["reject_reason"]
    assert rej[0].summary["epoch"] == 0
    # the structured report rides the reject commit too
    bad = [c for c in rej[0].summary["audit"]["checks"] if not c["passed"]]
    assert bad and bad[0]["label"] == "role-set" and bad[0]["violations"] > 0
    qroot = os.path.join(ta.root, "_quarantine")
    qfiles = [os.path.join(d, f) for d, _s, fs in os.walk(qroot) for f in fs]
    assert len(qfiles) > 0
    assert rej[0].summary["quarantine_path"] == os.path.join(
        "_quarantine", "audit-epoch-0"
    )
    # nothing of the rejected batch is left under data/ to be GC'd or read
    data_files = {
        f for _d, _s, fs in os.walk(os.path.join(ta.root, "data")) for f in fs
    }
    assert not data_files & {os.path.basename(p) for p in qfiles}
    assert ta.staged() == {}
    # exactly-once: replaying the rejected epoch is a skip, rows stay out
    res0b = pipe.run_epoch(0, feeds={"wal": e0})
    assert res0b["tables"]["ta"].skipped
    assert pipe.tables["ta"].read().count() == 0
    # the gate evaluates every epoch fresh: clean epoch 1 publishes
    res1 = pipe.run_epoch(1, feeds={"wal": e1})
    assert res1["audits"]["ta"]["passed"]
    assert_matches_oracle(
        pipe.tables["ta"].read(),
        e1.filter(F.col("_table") == "ta").drop("_table"), PAYLOAD,
    )
    assert latest_frontier(os.path.join(spec.lake_root, "_frontier")).epoch == 1


def test_pipeline_audit_fail_halts_resumes_at_audit_and_unblocks(spark, tmp_path):
    ev = change_events(spark, 2000, n_convs=100).localCheckpoint()
    feed = _tagged(ev).withColumn(
        "role",
        F.when(F.col("_table") == "ta", F.lit(None).cast("string"))
        .otherwise(F.col("role")),
    )
    spec = _spec(tmp_path, [{"kind": "not_null", "columns": ["role"]}], "fail")
    pipe = Pipeline(spark, spec)
    with pytest.raises(AuditFailed) as ei:
        pipe.run_epoch(0, feeds={"wal": feed})
    assert ei.value.staged_name == "audit-epoch-0"
    ta = pipe.tables["ta"]
    # the epoch is NOT applied; the batch is staged and inspectable
    assert not ta.has_commit_key("epoch:0")
    assert ta.read().count() == 0
    staged_rows = ta.read_staged("audit-epoch-0").count()
    assert staged_rows > 0
    desc = ta.staged()["audit-epoch-0"]
    files_before = sorted(
        e["path"]
        for es in ta.log._load_manifest(desc["manifest"]).values()
        for e in es
    )
    # frontier never advanced (the failed table halts the epoch)
    assert latest_frontier(os.path.join(spec.lake_root, "_frontier")) is None
    # replaying the epoch resumes AT THE AUDIT: same verdict, no second
    # data write (identical staged manifest + file set)
    with pytest.raises(AuditFailed):
        pipe.run_epoch(0, feeds={"wal": feed})
    desc2 = ta.staged()["audit-epoch-0"]
    assert desc2["manifest"] == desc["manifest"]
    files_after = sorted(
        e["path"]
        for es in ta.log._load_manifest(desc2["manifest"]).values()
        for e in es
    )
    assert files_after == files_before
    # operator waives the gate: publish, then the replayed epoch is a
    # no-op everywhere and the frontier catches up
    assert ta.publish_staged("audit-epoch-0") is not None
    res = pipe.run_epoch(0, feeds={"wal": feed})
    # ta replays as a no-op (epoch key folded by the publish); tb — never
    # reached on the halted attempts — applies now
    assert res["tables"]["ta"].skipped
    assert not res["tables"]["tb"].skipped
    assert res["audits"] == {}
    assert latest_frontier(os.path.join(spec.lake_root, "_frontier")).epoch == 0
    assert ta.read().count() == staged_rows


def test_streaming_pipeline_audit_rejects_poisoned_microbatch(spark, tmp_path):
    """The audit gate under run_stream: one WAL file carries poisoned
    ta-rows (role=NULL). Its micro-batch is audit-rejected for ta (and
    applied for tb); the stream keeps draining, a RESTART re-delivers
    nothing (rejection folded the epoch key), and the final states equal
    the oracle over the feed minus the rejected slice."""
    ev = change_events(spark, 3000, n_convs=150).localCheckpoint()
    lo, hi = ev.select(F.min("lsn"), F.max("lsn")).first()
    step = (hi - lo + 1) // 3 + 1
    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()
    slice_cond = {
        i: (F.col("lsn") >= lo + i * step) & (F.col("lsn") < lo + (i + 1) * step)
        for i in range(3)
    }

    def emit(i, poison=False):
        part = _tagged(ev.filter(slice_cond[i]))
        if poison:
            part = part.withColumn(
                "role",
                F.when(F.col("_table") == "ta", F.lit(None).cast("string"))
                .otherwise(F.col("role")),
            )
        part.coalesce(1).write.parquet(str(tmp_path / f"stage{i}"))
        import glob
        import shutil
        src = glob.glob(str(tmp_path / f"stage{i}" / "*.parquet"))[0]
        shutil.move(src, feed_dir / f"slice-{i}.parquet")

    emit(0)
    emit(1, poison=True)
    spec = _spec(tmp_path, [
        {"kind": "not_null", "columns": ["role"], "label": "role-set"},
    ], "reject")
    ckpt = str(tmp_path / "ckpt")
    pipe = Pipeline(spark, spec)
    stream_schema = spark.read.parquet(str(feed_dir)).schema
    q = pipe.run_stream(str(feed_dir), stream_schema, ckpt)
    assert q.awaitTermination(300)
    # exactly one audit-reject commit, for the poisoned slice
    rejects = [s for s in pipe.tables["ta"].snapshots()
               if s.summary.get("operation") == "audit-reject"]
    assert len(rejects) == 1
    # restart with a clean third slice: re-delivered batches are no-ops
    emit(2)
    pipe2 = Pipeline(spark, spec)
    q = pipe2.run_stream(str(feed_dir), stream_schema, ckpt)
    assert q.awaitTermination(300)
    full = _tagged(ev)
    expected_ta = full.filter(
        (F.col("_table") == "ta") & ~slice_cond[1]
    ).drop("_table")
    expected_tb = full.filter(F.col("_table") == "tb").drop("_table")
    assert_matches_oracle(pipe2.tables["ta"].read(), expected_ta, PAYLOAD)
    assert_matches_oracle(pipe2.tables["tb"].read(), expected_tb, PAYLOAD)
    rejects = [s for s in pipe2.tables["ta"].snapshots()
               if s.summary.get("operation") == "audit-reject"]
    assert len(rejects) == 1  # the restart did not re-reject or re-apply
    # dead-letter completion: the operator fixes and re-admits the
    # quarantined micro-batch through the same gate — the stream's state
    # converges to the FULL feed with the poisoned slice repaired
    ta = pipe2.tables["ta"]
    (qname,) = ta.quarantined()
    out = pipe2.reprocess(
        "ta", qname,
        fix=lambda e: e.withColumn(
            "role", F.coalesce(F.col("role"), F.lit("repaired"))
        ),
    )
    assert out["result"].audit["passed"]
    expected_ta_full = (
        full.filter(F.col("_table") == "ta")
        .withColumn(
            "role",
            F.when(slice_cond[1], F.lit("repaired")).otherwise(F.col("role")),
        )
        .drop("_table")
    )
    assert_matches_oracle(ta.read(), expected_ta_full, PAYLOAD)
    assert ta.quarantined() == {}


def test_max_violations_and_merged_scope(spark, tmp_path):
    table = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        key_cols=KEYS, n_buckets=4,
    )
    ev = change_events(spark, 1500, n_convs=75).localCheckpoint()
    lo, hi = ev.select(F.min("lsn"), F.max("lsn")).first()
    mid = (lo + hi) // 2
    e0, e1 = ev.filter(F.col("lsn") <= mid), ev.filter(F.col("lsn") > mid)
    apply_batch(spark, table, e0, epoch=0)
    base_rows = table.read().count()

    # a tolerance wide enough passes even though every row "violates"
    lax = compile_audit(AuditSpec(table="t", checks=(
        {"kind": "expr", "expr": "turn_idx < 0", "max_violations": 10**9,
         "label": "lax"},
        {"kind": "max_rows", "value": 10**9, "scope": "merged",
         "label": "merged-cap"},
    )))
    res = apply_audited_batch(spark, table, e1, epoch=1, audit_fn=lax)
    assert res.audit["passed"] and res.snapshot_id is not None
    by_label = {c["label"]: c for c in res.audit["checks"]}
    assert by_label["lax"]["violations"] == by_label["lax"]["rows"] > 0
    assert by_label["lax"]["scope"] == "batch"
    # merged scope saw base + staged LWW state, not just the batch
    assert by_label["merged-cap"]["rows"] >= base_rows
    assert by_label["merged-cap"]["rows"] == table.read().count()


def test_reject_loses_race_to_publish_leaves_published_files_live(spark, tmp_path):
    """The corruption scenario the commit-first ordering exists for: a
    publish wins the publish-key CAS, then a stale reject of the same
    staged name runs. The reject must NOT touch the (now live) data files
    — it sees the key folded by a publish and cleans up metadata only."""
    table = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        key_cols=KEYS, n_buckets=4,
    )
    ev = change_events(spark, 1000, n_convs=50)
    apply_batch(spark, table, ev, epoch=0, stage="gate")
    desc = dict(table.staged()["gate"])
    manifest = dict(table.log._load_manifest(desc["manifest"]))
    snap = table.publish_staged("gate")
    assert snap is not None
    rows = table.read().count()
    # a stale racer still holds the descriptor view: resurrect it
    table.log._atomic_write(
        table.log.manifest_path(desc["manifest"]),
        json.dumps({"files": manifest}),
    )
    assert table.log.write_staged("gate", desc)
    assert table.reject_staged("gate", reason="stale") is None
    # the published files are intact and readable; nothing was quarantined
    assert table.read().count() == rows
    assert_matches_oracle(table.read(), ev, PAYLOAD)
    assert not os.path.isdir(os.path.join(table.root, "_quarantine", "gate"))
    assert table.staged() == {}


def test_audited_batch_race_paths(spark, tmp_path):
    """apply_audited_batch degrades to skipped under cross-writer races
    (like apply_batch), resumes from a concurrent stager's batch, and
    re-raises only on an out-of-band discard."""
    table = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        key_cols=KEYS, n_buckets=4,
    )
    ev = change_events(spark, 1000, n_convs=50).localCheckpoint()
    passing = compile_audit(AuditSpec(table="t", checks=(
        {"kind": "min_rows", "value": 1},)))
    # (a) another writer staged the same epoch first: we resume from its
    # batch (no second data write) and carry it to publish
    apply_batch(spark, table, ev, epoch=0, stage="audit-epoch-0")
    desc = table.staged()["audit-epoch-0"]
    res = apply_audited_batch(spark, table, ev, epoch=0, audit_fn=passing)
    assert not res.skipped and res.audit["passed"]
    assert res.snapshot_id is not None and res.rows_in == ev.count()
    assert table.staged() == {}
    mpath = table.log.manifest_path(desc["manifest"])
    assert not os.path.exists(mpath)  # consumed, not duplicated
    # (b) racer fully applied the epoch already: skipped at entry
    res = apply_audited_batch(spark, table, ev, epoch=0, audit_fn=passing)
    assert res.skipped
    # (c) out-of-band discard racing MID-AUDIT: loud, not silently
    # skipped — the epoch key never folded, so reporting it applied
    # would hide the discard
    apply_batch(spark, table, ev, epoch=1, stage="audit-epoch-1")

    def discarding_audit(t, n):
        t.discard_staged(n)  # operator discards while we audit
        t.read_staged(n)     # raises: no such staged commit

    with pytest.raises(ValueError, match="no such staged commit"):
        apply_audited_batch(
            spark, table, ev, epoch=1, audit_fn=discarding_audit,
        )
    assert not table.has_commit_key("epoch:1")


def test_reject_staged_is_crash_idempotent(spark, tmp_path):
    table = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        key_cols=KEYS, n_buckets=4,
    )
    ev = change_events(spark, 1000, n_convs=50)
    apply_batch(spark, table, ev, epoch=0, stage="gate")
    desc = dict(table.staged()["gate"])
    manifest = dict(table.log._load_manifest(desc["manifest"]))
    snap = table.reject_staged("gate", reason="because")
    assert snap is not None and snap.summary["reject_reason"] == "because"
    assert table.has_commit_key("epoch:0")
    sid = table.current().snapshot_id
    # resurrect descriptor + manifest as if cleanup never ran, retry
    table.log._atomic_write(
        table.log.manifest_path(desc["manifest"]),
        json.dumps({"files": manifest}),
    )
    assert table.log.write_staged("gate", desc)
    assert table.reject_staged("gate") is None  # no double commit
    assert table.current().snapshot_id == sid
    assert table.staged() == {} and table.read().count() == 0
    # changefeed-style consumers skip the reject (no rows were added)
    assert apply_batch(spark, table, ev, epoch=0).skipped
