"""Measure what the manifest ts zone maps buy on a time-windowed read.

Builds the canonical shape the zone maps exist for — a daily CDC ingest
where each epoch's delta files carry that day's event-time range — then
answers "last day's activity" two ways over the SAME table:

- full:   ``table.read()`` + a residual ts filter (the only option
          without zone maps; every data file is opened, the predicate is
          applied row-by-row after parquet row-group stats);
- pruned: ``table.read(ts_prune=(lo, hi))`` — manifest ts min/max
          drops non-covering files BEFORE the scan plan is built (with
          the LWW lsn-floor soundness rule), so Spark schedules tasks
          only over covering files.

Results must be identical; reports files opened + wall medians of 3.
At scale the ratio is days-retained/days-queried: a 1-day window over a
year of 100 TB opens ~1/365 of the files, and the win arrives before
any executor starts (fewer tasks, not faster tasks).

    python tools/bench_zonemap.py [n_epochs] [rows_per_epoch]
"""

from __future__ import annotations

import datetime as dt
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

    from pyspark.sql import functions as F

    from postgres_to_snowflake_data_pipeline_spark.cdc.apply import apply_batch
    from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import (
        TRANSCRIPT_SCHEMA,
    )
    from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable
    from postgres_to_snowflake_data_pipeline_spark.session import get_spark

    spark = get_spark("bench-zonemap")
    work = os.path.join(tempfile.gettempdir(), "bench_zonemap")
    shutil.rmtree(work, ignore_errors=True)

    table = LakeTable.create(
        spark, os.path.join(work, "t"), TRANSCRIPT_SCHEMA,
        ("conv_id", "turn_idx"), n_buckets=32,
    )

    day0 = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
    for e in range(n_epochs):
        day = day0 + dt.timedelta(days=e)
        batch = (
            spark.range(rows_per_epoch)
            .select(
                (F.lit(e * rows_per_epoch) + F.col("id")).alias("lsn"),
                F.lit("insert").alias("op"),
                F.concat(F.lit(f"d{e:03d}-c"),
                         F.format_string("%06d", F.col("id") % 20_000))
                .alias("conv_id"),
                (F.col("id") / 20_000).cast("int").alias("turn_idx"),
                F.lit("user").alias("role"),
                F.concat(F.lit("msg "), F.col("id")).alias("text"),
                F.lit(None).cast("string").alias("tool"),
                (F.lit(day) + F.make_interval(
                    secs=(F.col("id") % 86_400).cast("double"))).alias("ts"),
            )
        )
        apply_batch(spark, table, batch, epoch=e)

    last_day = day0 + dt.timedelta(days=n_epochs - 1)
    window = (last_day, last_day + dt.timedelta(days=1))

    def run_full() -> tuple[float, int, tuple]:
        df = table.read().filter(
            (F.col("ts") >= F.lit(window[0])) & (F.col("ts") <= F.lit(window[1]))
        )
        n_files = len(df.inputFiles())
        t0 = time.perf_counter()
        row = df.agg(
            F.count(F.lit(1)), F.countDistinct("conv_id"), F.max("ts")
        ).first()
        return time.perf_counter() - t0, n_files, tuple(row)

    def run_pruned() -> tuple[float, int, tuple]:
        df = table.read(ts_prune=window)
        n_files = len(df.inputFiles())
        t0 = time.perf_counter()
        row = df.agg(
            F.count(F.lit(1)), F.countDistinct("conv_id"), F.max("ts")
        ).first()
        return time.perf_counter() - t0, n_files, tuple(row)

    full_times, pruned_times = [], []
    for _ in range(3):
        tf, full_files, full_row = run_full()
        tp, pruned_files, pruned_row = run_pruned()
        assert full_row == pruned_row, (full_row, pruned_row)
        full_times.append(tf)
        pruned_times.append(tp)

    # after TIME-CLUSTERED compaction the zone maps must stay selective:
    # plain compaction folds each bucket into one full-time-span file
    # (nothing skippable); ts_slices keeps per-file ranges disjoint
    table.compact(ts_slices=8)
    compact_full, compact_pruned = [], []
    for _ in range(3):
        tf, cfull_files, full_row = run_full()
        tp, cpruned_files, pruned_row = run_pruned()
        assert full_row == pruned_row, (full_row, pruned_row)
        compact_full.append(tf)
        compact_pruned.append(tp)

    out = {
        "metric": "zonemap_window_read",
        "n_epochs": n_epochs,
        "rows_total": n_epochs * rows_per_epoch,
        "window_days": 1,
        "files_full": full_files,
        "files_pruned": pruned_files,
        "full_sec": round(statistics.median(full_times), 3),
        "pruned_sec": round(statistics.median(pruned_times), 3),
        "full_trials": [round(t, 3) for t in full_times],
        "pruned_trials": [round(t, 3) for t in pruned_times],
        "speedup": round(
            statistics.median(full_times) / statistics.median(pruned_times), 2
        ),
        "compacted": {
            "ts_slices": 8,
            "files_full": cfull_files,
            "files_pruned": cpruned_files,
            "full_sec": round(statistics.median(compact_full), 3),
            "pruned_sec": round(statistics.median(compact_pruned), 3),
            "speedup": round(
                statistics.median(compact_full)
                / statistics.median(compact_pruned), 2
            ),
        },
        "results_identical": True,
    }
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
