"""Dead-letter reprocessing: re-admitting a quarantined (audit-rejected)
batch — the missing half of the write-audit-publish lifecycle.

Invariants: a fixed batch re-enters under its ORIGINAL LSNs, so later data
still wins (LWW-sound re-admission); the reprocess commit is exactly-once
under ``reprocess:{name}`` (replay is a no-op that finishes cleanup); a
still-failing re-audit keeps the quarantined originals untouched; lineage
reconciliation (sum(rows_in) == feed count) survives the whole
reject-then-reprocess cycle; a crashed audited attempt resumes at the
audit without a second data write.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from postgres_to_snowflake_data_pipeline_spark.cdc.apply import (
    AuditFailed,
    apply_audited_batch,
    apply_batch,
    lineage_df,
    reprocess_quarantined,
)
from postgres_to_snowflake_data_pipeline_spark.cdc.generator import change_events
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

GATE = compile_audit(AuditSpec(table="t", checks=(
    {"kind": "not_null", "columns": ["role"], "label": "role-set"},
)))


def _fix(events):
    return events.withColumn("role", F.coalesce(F.col("role"), F.lit("repaired")))


def _poisoned_split(spark, n=2000, convs=100):
    """(poisoned lower-lsn half, clean upper half, full-fixed oracle feed).
    Poison = role NULLed on upserts; the oracle feed carries the repaired
    role, exactly what reject-then-fix-then-reprocess must converge to."""
    ev = change_events(spark, n, n_convs=convs).localCheckpoint()
    lo, hi = ev.select(F.min("lsn"), F.max("lsn")).first()
    mid = (lo + hi) // 2
    low = ev.filter(F.col("lsn") <= mid)
    poisoned = low.withColumn(
        "role",
        F.when(F.col("op") != "delete", F.lit(None).cast("string")),
    )
    fixed_low = low.withColumn(
        "role",
        F.when(F.col("op") != "delete", F.lit("repaired")).otherwise(
            F.col("role")
        ),
    )
    upper = ev.filter(F.col("lsn") > mid)
    return poisoned, upper, fixed_low.unionByName(upper)


def _table(spark, tmp_path, name="t"):
    return LakeTable.create(
        spark, str(tmp_path / name), TRANSCRIPT_SCHEMA,
        key_cols=KEYS, n_buckets=4,
    )


def test_reprocess_readmits_fixed_batch_lww_sound(spark, tmp_path):
    table = _table(spark, tmp_path)
    poisoned, upper, oracle_feed = _poisoned_split(spark)
    res0 = apply_audited_batch(
        spark, table, poisoned, epoch=0, audit_fn=GATE, on_fail="reject"
    )
    assert res0.rejected
    apply_batch(spark, table, upper, epoch=1)

    q = table.quarantined()
    assert list(q) == ["audit-epoch-0"]
    info = q["audit-epoch-0"]
    assert info["n_files"] > 0 and info["bytes"] > 0
    assert info["epoch"] == 0 and not info["reprocessed"]
    assert "role-set" in info["reject_reason"]

    res = reprocess_quarantined(
        spark, table, "audit-epoch-0", fix=_fix, audit_fn=GATE
    )
    assert res.audit["passed"] and res.snapshot_id is not None
    assert not res.skipped and res.rows_in > 0
    assert res.epoch == 0  # origin epoch recovered from the reject commit

    # the final state is the LWW replay of the FIXED feed: keys present in
    # both halves keep their upper-half (higher-lsn) winners — re-admission
    # under original LSNs never clobbers later data
    overlap = (
        poisoned.select("conv_id", "turn_idx")
        .intersect(upper.select("conv_id", "turn_idx"))
        .count()
    )
    assert overlap > 0, "fixture must exercise cross-half LWW keys"
    assert_matches_oracle(table.read(), oracle_feed, PAYLOAD)

    # quarantine cleaned up; the commit is inspectable in history
    assert table.quarantined() == {}
    pub = [
        s for s in table.snapshots()
        if s.summary.get("origin_staged_name") == "audit-epoch-0"
    ]
    assert len(pub) == 1
    s = pub[0].summary
    # audited re-admissions surface as a publish of the reprocess stage
    assert s["operation_detail"] == "publish-staged"
    assert s["staged_name"] == "reprocess-audit-epoch-0"
    assert s["origin_epoch"] == 0 and s["fixed"] and s["audit"]["passed"]
    assert "epoch" not in s  # lineage must not double-count the batch

    # exactly-once: a replayed reprocess is a pure no-op
    res2 = reprocess_quarantined(
        spark, table, "audit-epoch-0", fix=_fix, audit_fn=GATE
    )
    assert res2.skipped
    assert_matches_oracle(table.read(), oracle_feed, PAYLOAD)


def test_reprocess_lineage_reconciles(spark, tmp_path):
    table = _table(spark, tmp_path)
    poisoned, upper, _oracle = _poisoned_split(spark, n=1500, convs=75)
    apply_audited_batch(
        spark, table, poisoned, epoch=0, audit_fn=GATE, on_fail="reject"
    )
    apply_batch(spark, table, upper, epoch=1)
    reprocess_quarantined(spark, table, "audit-epoch-0", fix=_fix)
    lin = lineage_df(spark, table)
    # one lineage row per EPOCH (reject included, reprocess excluded), and
    # the feed is counted exactly once through the whole cycle
    assert lin.count() == 2
    assert lin.select(F.sum("rows_in")).first()[0] == (
        poisoned.count() + upper.count()
    )


def test_reprocess_audit_still_failing_keeps_quarantine(spark, tmp_path):
    table = _table(spark, tmp_path)
    poisoned, _upper, _oracle = _poisoned_split(spark, n=1000, convs=50)
    apply_audited_batch(
        spark, table, poisoned, epoch=0, audit_fn=GATE, on_fail="reject"
    )
    before = table.quarantined()["audit-epoch-0"]
    with pytest.raises(AuditFailed):  # no fix: the gate fails again
        reprocess_quarantined(spark, table, "audit-epoch-0", audit_fn=GATE)
    assert not table.has_commit_key("reprocess:audit-epoch-0")
    assert table.staged() == {}  # the failed attempt was unwound
    after = table.quarantined()["audit-epoch-0"]
    assert after["n_files"] == before["n_files"]
    assert after["bytes"] == before["bytes"]
    assert table.read().count() == 0
    # a later fixed attempt still succeeds from the untouched originals
    res = reprocess_quarantined(
        spark, table, "audit-epoch-0", fix=_fix, audit_fn=GATE
    )
    assert res.audit["passed"] and res.rows_in > 0


def test_reprocess_unaudited_and_crash_cleanup(spark, tmp_path):
    table = _table(spark, tmp_path)
    poisoned, _upper, _oracle = _poisoned_split(spark, n=1000, convs=50)
    apply_audited_batch(
        spark, table, poisoned, epoch=0, audit_fn=GATE, on_fail="reject"
    )
    # gate-waived direct merge, quarantine kept (forensics / crash window)
    res = reprocess_quarantined(
        spark, table, "audit-epoch-0", keep_quarantine=True
    )
    assert res.snapshot_id is not None and res.audit is None
    q = table.quarantined()["audit-epoch-0"]
    # the key is bound to the rejecting snapshot, not the bare name
    assert table.has_commit_key(
        f"reprocess:audit-epoch-0@s{q['rejected_snapshot_id']}"
    )
    assert q["reprocessed"]  # commit landed, cleanup pending
    # the retry (crash recovery) is a no-op that finishes the cleanup
    res2 = reprocess_quarantined(spark, table, "audit-epoch-0")
    assert res2.skipped
    assert table.quarantined() == {}
    # unknown names are loud
    with pytest.raises(ValueError, match="no quarantined batch"):
        reprocess_quarantined(spark, table, "nope")


def test_reprocess_resumes_at_audit_without_second_write(spark, tmp_path):
    table = _table(spark, tmp_path)
    poisoned, _upper, oracle_low = _poisoned_split(spark, n=1000, convs=50)
    apply_audited_batch(
        spark, table, poisoned, epoch=0, audit_fn=GATE, on_fail="reject"
    )

    def crashing_audit(t, n):
        raise RuntimeError("auditor died")

    with pytest.raises(RuntimeError, match="auditor died"):
        reprocess_quarantined(
            spark, table, "audit-epoch-0", fix=_fix, audit_fn=crashing_audit
        )
    desc = table.staged()["reprocess-audit-epoch-0"]
    staged_files = sorted(
        e["path"]
        for es in table.log._load_manifest(desc["manifest"]).values()
        for e in es
    )
    data_before = {
        os.path.join(d, f)
        for d, _s, fs in os.walk(os.path.join(table.root, "data"))
        for f in fs
    }
    # the retry resumes AT THE AUDIT: publish is metadata-only (the staged
    # files become live; nothing new lands under data/)
    res = reprocess_quarantined(
        spark, table, "audit-epoch-0", fix=_fix, audit_fn=GATE
    )
    assert res.audit["passed"] and res.snapshot_id is not None
    data_after = {
        os.path.join(d, f)
        for d, _s, fs in os.walk(os.path.join(table.root, "data"))
        for f in fs
    }
    assert data_after == data_before
    live = sorted(
        e["path"]
        for es in table.current().files.values()
        for e in es
    )
    assert live == staged_files
    assert table.quarantined() == {} and table.staged() == {}


def test_reprocess_name_reuse_never_aliases(spark, tmp_path):
    """The reprocess identity is bound to the REJECTING snapshot, not the
    staged name: after a name's first reject+reprocess cycle, a LATER
    rejection under the same name is a new batch — the early-skip path
    must not mistake it for the already-reprocessed one (and silently
    destroy it)."""
    table = _table(spark, tmp_path)
    ev = change_events(spark, 2000, n_convs=100).localCheckpoint()
    lo, hi = ev.select(F.min("lsn"), F.max("lsn")).first()
    mid = (lo + hi) // 2
    poison = lambda df: df.withColumn(
        "role", F.when(F.col("op") != "delete", F.lit(None).cast("string"))
    )
    # cycle 1: epoch 0 rejected under the REUSED name, fixed, re-admitted
    apply_audited_batch(
        spark, table, poison(ev.filter(F.col("lsn") <= mid)), epoch=0,
        audit_fn=GATE, on_fail="reject", staged_name="gate",
    )
    r1 = reprocess_quarantined(spark, table, "gate", fix=_fix, audit_fn=GATE)
    assert not r1.skipped and r1.epoch == 0
    n1 = table.read().count()
    # cycle 2: epoch 1 rejected under the SAME name
    apply_audited_batch(
        spark, table, poison(ev.filter(F.col("lsn") > mid)), epoch=1,
        audit_fn=GATE, on_fail="reject", staged_name="gate",
    )
    q = table.quarantined()["gate"]
    assert q["epoch"] == 1 and not q["reprocessed"], (
        "a fresh rejection under a reused name must not read as already "
        "reprocessed"
    )
    r2 = reprocess_quarantined(spark, table, "gate", fix=_fix, audit_fn=GATE)
    assert not r2.skipped and r2.epoch == 1, "second batch must merge, not skip"
    assert table.read().count() >= n1
    # the full fixed feed is the final state — nothing was destroyed
    assert_matches_oracle(table.read(), _fix(poison(ev)), PAYLOAD)
    assert table.quarantined() == {}


def test_reprocess_preserves_evolved_columns(spark, tmp_path):
    """A quarantined batch that carried schema-evolved columns (the reject
    deliberately keeps the table unevolved) re-admits them additively —
    parity with what a direct apply of the same events would have done."""
    table = _table(spark, tmp_path)
    ev = change_events(spark, 1200, n_convs=60, evolved_from=0).localCheckpoint()
    evolved_cols = set(ev.columns) - {
        "lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"
    }
    assert evolved_cols, "fixture must carry evolved columns"
    poisoned = ev.withColumn(
        "role", F.when(F.col("op") != "delete", F.lit(None).cast("string"))
    )
    apply_audited_batch(
        spark, table, poisoned, epoch=0, audit_fn=GATE, on_fail="reject"
    )
    assert evolved_cols - {f.name for f in table.schema().fields} == evolved_cols
    res = reprocess_quarantined(
        spark, table, "audit-epoch-0", fix=_fix, audit_fn=GATE
    )
    assert res.audit["passed"]
    got = table.read()
    assert evolved_cols <= set(got.columns), "evolved columns were dropped"
    for c in evolved_cols:
        assert got.filter(F.col(c).isNotNull()).count() > 0, (
            f"evolved column {c} lost its values through quarantine"
        )


def test_expire_quarantine(spark, tmp_path):
    """Dead-letter retention: young un-reprocessed batches survive; aged
    ones (and reprocessed-pending-cleanup leftovers, age-independent)
    are deleted."""
    table = _table(spark, tmp_path)
    poisoned, _upper, _oracle = _poisoned_split(spark, n=1000, convs=50)
    apply_audited_batch(
        spark, table, poisoned, epoch=0, audit_fn=GATE, on_fail="reject"
    )
    # young + never reprocessed: kept under any sane policy
    assert table.expire_quarantine(older_than_seconds=3600) == {
        "expired_batches": 0, "deleted_files": 0, "freed_bytes": 0,
    }
    assert "audit-epoch-0" in table.quarantined()
    # aged out (threshold 0): deleted, with real counts
    res = table.expire_quarantine(older_than_seconds=0)
    assert res["expired_batches"] == 1
    assert res["deleted_files"] > 0 and res["freed_bytes"] > 0
    assert table.quarantined() == {}
    # reprocessed-pending-cleanup: eligible regardless of age
    apply_audited_batch(
        spark, table, poisoned, epoch=1, audit_fn=GATE, on_fail="reject",
        staged_name="late",
    )
    reprocess_quarantined(spark, table, "late", fix=_fix, keep_quarantine=True)
    assert table.quarantined()["late"]["reprocessed"]
    rows = table.read().count()
    res = table.expire_quarantine(older_than_seconds=10**9)
    assert res["expired_batches"] == 1
    assert table.quarantined() == {}
    assert table.read().count() == rows  # live data untouched


def test_pipeline_reprocess_through_spec_gate(spark, tmp_path):
    ev = change_events(spark, 2000, n_convs=100).localCheckpoint()
    tag = F.when(F.abs(F.xxhash64("lsn")) % 2 == 0, "ta").otherwise("tb")
    feed = ev.withColumn("_table", tag)
    poisoned = feed.withColumn(
        "role",
        F.when(
            (F.col("_table") == "ta") & (F.col("op") != "delete"),
            F.lit(None).cast("string"),
        ).otherwise(F.col("role")),
    )
    spec = PipelineSpec.from_dict({
        "lake_root": str(tmp_path / "lake"),
        "sources": [{"name": "wal", "kind": "dataframe"}],
        "tables": [
            {"name": "ta", "key_cols": ["conv_id", "turn_idx"], "n_buckets": 4},
            {"name": "tb", "key_cols": ["conv_id", "turn_idx"], "n_buckets": 4},
        ],
        "audits": [{"table": "ta", "on_fail": "reject", "checks": [
            {"kind": "not_null", "columns": ["role"], "label": "role-set"},
        ]}],
    })
    pipe = Pipeline(spark, spec)
    res0 = pipe.run_epoch(0, feeds={"wal": poisoned})
    assert res0["tables"]["ta"].rejected
    assert pipe.tables["ta"].read().count() == 0

    # the fix must satisfy the SAME spec gate on re-admission
    out = pipe.reprocess("ta", "audit-epoch-0", fix=_fix)
    assert out["result"].audit["passed"]
    expected_ta = _fix(
        poisoned.filter(F.col("_table") == "ta").drop("_table")
    )
    assert_matches_oracle(pipe.tables["ta"].read(), expected_ta, PAYLOAD)
    assert pipe.tables["ta"].quarantined() == {}
    with pytest.raises(ValueError, match="unknown table"):
        pipe.reprocess("nope", "audit-epoch-0")
