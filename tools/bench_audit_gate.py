"""Measure what the write-audit-publish gate costs on the CDC replay path.

Replays the SAME epoch-sliced feed into fresh tables two ways:

- plain: ``apply_batch`` per epoch (the bench.py baseline shape);
- gated: ``apply_audited_batch`` per epoch with a 3-check audit
  (not_null + expr + min_rows, all passing) — stage, ONE aggregate pass
  over the staged batch, metadata-only publish.

The gate's cost model is O(delta), not O(table): the audit re-scans only
the epoch's just-written delta files (one agg job), and the publish folds
metadata. The measured overhead percentage is therefore expected to hold
at 100 TB table size as long as epochs stay a constant fraction of it.

Also measures the failure path once: a poisoned epoch's reject
(stage + audit + quarantine move + empty commit) and its dead-letter
reprocess (read quarantine + fix + re-audit + publish).

    python tools/bench_audit_gate.py [n_events] [epochs] [trials]

Prints one JSON line; medians of ``trials`` full replays per mode.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from pyspark.sql import functions as F

    from postgres_to_snowflake_data_pipeline_spark.cdc.apply import (
        apply_audited_batch,
        apply_batch,
        reprocess_quarantined,
    )
    from postgres_to_snowflake_data_pipeline_spark.cdc.generator import (
        change_events,
        write_feed,
    )
    from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import (
        ORDER_COL,
        TRANSCRIPT_SCHEMA,
    )
    from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable
    from postgres_to_snowflake_data_pipeline_spark.orchestrate import (
        AuditSpec,
        compile_audit,
    )
    from postgres_to_snowflake_data_pipeline_spark.session import get_spark

    spark = get_spark("bench-audit-gate")
    work = os.path.join(tempfile.gettempdir(), "bench_audit_gate")
    shutil.rmtree(work, ignore_errors=True)
    feed_path = os.path.join(work, "feed")
    write_feed(
        change_events(spark, n_events, n_convs=max(n_events // 800, 1)),
        feed_path,
        n_files=32,
    )
    feed = spark.read.parquet(feed_path)
    lo, hi = feed.select(F.min(ORDER_COL), F.max(ORDER_COL)).first()
    step = max((hi - lo + 1) // epochs, 1)

    def slices():
        for e in range(epochs):
            a = lo + e * step
            b = hi + 1 if e == epochs - 1 else lo + (e + 1) * step
            yield e, feed.filter((F.col(ORDER_COL) >= a) & (F.col(ORDER_COL) < b))

    gate = compile_audit(AuditSpec(table="t", checks=(
        {"kind": "not_null", "columns": ["conv_id"], "label": "key-set"},
        {"kind": "expr", "expr": "turn_idx >= 0", "label": "turn-range"},
        {"kind": "min_rows", "value": 1, "label": "non-empty"},
    )))

    def replay(mode: str, run: int) -> float:
        root = os.path.join(work, f"{mode}-{run}")
        table = LakeTable.create(
            spark, root, TRANSCRIPT_SCHEMA, ("conv_id", "turn_idx"),
            n_buckets=32,
        )
        t0 = time.monotonic()
        for e, batch in slices():
            if mode == "plain":
                res = apply_batch(spark, table, batch, epoch=e, salt_buckets=0)
            else:
                res = apply_audited_batch(
                    spark, table, batch, epoch=e, audit_fn=gate,
                    salt_buckets=0,
                )
                assert res.audit["passed"]
            assert not res.skipped
        wall = time.monotonic() - t0
        shutil.rmtree(root, ignore_errors=True)
        return wall

    walls: dict[str, list[float]] = {"plain": [], "gated": []}
    for run in range(trials):
        for mode in ("plain", "gated"):
            walls[mode].append(replay(mode, run))

    plain = statistics.median(walls["plain"])
    gated = statistics.median(walls["gated"])

    # failure path, once: reject a poisoned epoch, then reprocess it
    root = os.path.join(work, "reject")
    table = LakeTable.create(
        spark, root, TRANSCRIPT_SCHEMA, ("conv_id", "turn_idx"), n_buckets=32,
    )
    _, batch0 = next(slices())
    poisoned = batch0.withColumn(
        "role", F.when(F.col("op") != "delete", F.lit(None).cast("string"))
    )
    role_gate = compile_audit(AuditSpec(table="t", checks=(
        {"kind": "not_null", "columns": ["role"], "label": "role-set"},)))
    t0 = time.monotonic()
    res = apply_audited_batch(
        spark, table, poisoned, epoch=0, audit_fn=role_gate,
        on_fail="reject", salt_buckets=0,
    )
    reject_s = time.monotonic() - t0
    assert res.rejected
    t0 = time.monotonic()
    rep = reprocess_quarantined(
        spark, table, "audit-epoch-0",
        fix=lambda ev: ev.withColumn(
            "role", F.coalesce(F.col("role"), F.lit("repaired"))
        ),
        audit_fn=role_gate,
    )
    reprocess_s = time.monotonic() - t0
    assert rep.audit["passed"] and not rep.skipped

    print(json.dumps({
        "n_events": n_events,
        "epochs": epochs,
        "trials": trials,
        "plain_s": round(plain, 2),
        "gated_s": round(gated, 2),
        "overhead_pct": round((gated / plain - 1) * 100, 1),
        "plain_events_per_sec": round(n_events / plain, 1),
        "gated_events_per_sec": round(n_events / gated, 1),
        "reject_epoch_s": round(reject_s, 2),
        "reprocess_epoch_s": round(reprocess_s, 2),
        "reprocess_rows": rep.rows_in,
    }))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
