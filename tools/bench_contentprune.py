"""Measure what per-file content indexes buy on a value-filtered read —
and what they cost on the write path.

Builds the canonical shape the indexes exist for — an ingest whose tool
label drifts over time (each epoch's delta files carry ONE label, the way
a rolling agent-framework upgrade or tenant onboarding looks in a
transcript feed) — then answers "all current rows with tool = X" two ways
over the SAME table:

- full:   ``table.read()`` + a residual filter (every file opened);
- pruned: ``table.read(eq_prune={"tool": X})`` — manifest value sets drop
          files BEFORE the scan plan is built, under the LWW lsn-floor
          soundness rule.

Two labels are probed to show the floor rule's asymmetry honestly: the
LATEST label prunes everything older (floor = the candidate's own lsn
range), while a MID-HISTORY label must retain every newer file (any of
them could hold a winner that superseded a matching row). After
time-clustered compaction the single-pass group shortcut removes that
asymmetry: each slice is fully LWW-resolved, so only slices whose value
set contains the label are opened, for ANY label.

Write cost: the same ingest runs into a second table with NO indexes
declared; the delta is the price of the per-file column read + set/Bloom
build (the text column here is high-entropy, so every file takes the
Bloom path — the worst case).

    python tools/bench_contentprune.py [n_epochs] [rows_per_epoch]
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
    n_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rows_per_epoch = int(sys.argv[2]) if len(sys.argv) > 2 else 62_500

    import datetime as dt

    from pyspark.sql import functions as F

    from postgres_to_snowflake_data_pipeline_spark.cdc.apply import apply_batch
    from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import (
        TRANSCRIPT_SCHEMA,
    )
    from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable
    from postgres_to_snowflake_data_pipeline_spark.session import get_spark

    spark = get_spark("bench-contentprune")
    work = os.path.join(tempfile.gettempdir(), "bench_contentprune")
    shutil.rmtree(work, ignore_errors=True)

    day0 = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)

    def batch(e: int):
        return spark.range(rows_per_epoch).select(
            (F.lit(e * rows_per_epoch) + F.col("id")).alias("lsn"),
            F.lit("insert").alias("op"),
            F.concat(F.lit(f"d{e:03d}-c"),
                     F.format_string("%06d", F.col("id") % 20_000))
            .alias("conv_id"),
            (F.col("id") / 20_000).cast("int").alias("turn_idx"),
            F.lit("user").alias("role"),
            F.concat(F.lit("msg "), F.col("id")).alias("text"),
            F.lit(f"tool{e:02d}").alias("tool"),
            (F.lit(day0 + dt.timedelta(days=e)) + F.make_interval(
                secs=(F.col("id") % 86_400).cast("double"))).alias("ts"),
        )

    def ingest(root: str, indexed: bool) -> float:
        t = LakeTable.create(
            spark, root, TRANSCRIPT_SCHEMA, ("conv_id", "turn_idx"),
            n_buckets=32,
        )
        if indexed:
            t.update_props(
                {"index.sets": ["tool"], "index.tokens": "text"}
            )
        t0 = time.perf_counter()
        for e in range(n_epochs):
            apply_batch(spark, t, batch(e), epoch=e)
        return time.perf_counter() - t0

    # warmup: JVM/codegen/scan-path warmup otherwise lands entirely on
    # whichever ingest runs first and poisons the overhead comparison
    shutil.rmtree(os.path.join(work, "warm"), ignore_errors=True)
    LakeTable.create(
        spark, os.path.join(work, "warm"), TRANSCRIPT_SCHEMA,
        ("conv_id", "turn_idx"), n_buckets=32,
    )
    warm = LakeTable(spark, os.path.join(work, "warm"))
    for e in range(2):
        apply_batch(spark, warm, batch(e), epoch=e)

    ingest_plain_sec = ingest(os.path.join(work, "plain"), indexed=False)
    ingest_indexed_sec = ingest(os.path.join(work, "t"), indexed=True)
    table = LakeTable(spark, os.path.join(work, "t"))

    def probe(label: str) -> dict:
        def run(df) -> tuple[float, int, tuple]:
            n_files = len(df.inputFiles())
            t0 = time.perf_counter()
            row = df.agg(
                F.count(F.lit(1)), F.countDistinct("conv_id"), F.max("_lsn")
            ).first()
            return time.perf_counter() - t0, n_files, tuple(row)

        fulls, pruneds = [], []
        for _ in range(3):
            tf, files_full, row_full = run(
                table.read(include_internal=True).filter(
                    F.col("tool") == label
                )
            )
            tp, files_pruned, row_pruned = run(
                table.read(eq_prune={"tool": label}, include_internal=True)
            )
            assert row_full == row_pruned, (label, row_full, row_pruned)
            fulls.append(tf)
            pruneds.append(tp)
        return {
            "label": label,
            "files_full": files_full,
            "files_pruned": files_pruned,
            "full_sec": round(statistics.median(fulls), 3),
            "pruned_sec": round(statistics.median(pruneds), 3),
            "speedup": round(
                statistics.median(fulls) / statistics.median(pruneds), 2
            ),
        }

    latest = probe(f"tool{n_epochs - 1:02d}")
    mid = probe(f"tool{n_epochs // 2:02d}")

    # time-clustered compaction: labels track time, so each slice's value
    # set stays tight AND the single-pass group shortcut lifts the floor
    # rule — any label now opens only its own slices
    table.compact(ts_slices=8)
    latest_c = probe(f"tool{n_epochs - 1:02d}")
    mid_c = probe(f"tool{n_epochs // 2:02d}")

    out = {
        "metric": "contentprune_eq_read",
        "n_epochs": n_epochs,
        "rows_total": n_epochs * rows_per_epoch,
        "delta_files": {"latest_label": latest, "mid_label": mid},
        "compacted_ts8": {"latest_label": latest_c, "mid_label": mid_c},
        "ingest_plain_sec": round(ingest_plain_sec, 1),
        "ingest_indexed_sec": round(ingest_indexed_sec, 1),
        "index_write_overhead_pct": round(
            100 * (ingest_indexed_sec - ingest_plain_sec) / ingest_plain_sec,
            1,
        ),
        "results_identical": True,
    }
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
