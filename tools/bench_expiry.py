"""Measure what zone-stat row expiry buys over the naive rewrite.

Builds the canonical retention shape — a daily CDC ingest, time-clustered
with ``compact(ts_slices=8)`` so each bucket's base files carry disjoint
day ranges — then expires everything older than a cutoff two ways over
the SAME starting snapshot (restored between runs by O(metadata)
``rollback_to``, so both run on identical bytes):

- expire:  ``table.expire_rows(cutoff)`` — manifest ts/ts_nulls stats
           drop dead buckets/slices METADATA-ONLY; only cutoff-straddling
           buckets are read and rewritten;
- naive:   ``read(include_internal, include_tombstones)`` + the residual
           ts filter + ``overwrite()`` — the only option without
           per-file stats: every byte of the table is read and every
           surviving byte rewritten.

End states must be value-identical. At scale the expire cost is
O(straddling buckets) while naive is O(table) — with a year retained and
a month expired, the ratio is the table-to-boundary size ratio, and the
metadata drops land before any executor starts.

    python tools/bench_expiry.py [n_epochs] [rows_per_epoch]
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
    keep_days = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from pyspark.sql import functions as F

    from postgres_to_snowflake_data_pipeline_spark.cdc.apply import apply_batch
    from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import (
        TRANSCRIPT_SCHEMA,
    )
    from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable
    from postgres_to_snowflake_data_pipeline_spark.session import get_spark

    spark = get_spark("bench-expiry")
    work = os.path.join(tempfile.gettempdir(), "bench_expiry")
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
    table.compact(ts_slices=8)
    table.tag("pre-expiry")
    cutoff = day0 + dt.timedelta(days=n_epochs - keep_days)

    def fingerprint() -> tuple:
        row = table.read().agg(
            F.count(F.lit(1)), F.countDistinct("conv_id"),
            F.min("ts"), F.max("ts"),
        ).first()
        return tuple(row)

    def run_expire() -> tuple[float, dict]:
        t0 = time.perf_counter()
        snap = table.expire_rows(cutoff)
        wall = time.perf_counter() - t0
        s = snap.summary
        return wall, {
            k: s[k]
            for k in (
                "buckets_dropped",
                "files_dropped",
                "buckets_rewritten",
                "slices_rewritten",
            )
        }

    def run_naive() -> float:
        t0 = time.perf_counter()
        state = table.read(
            include_internal=True, include_tombstones=True
        ).filter(F.col("ts").isNull() | (F.col("ts") >= F.lit(cutoff)))
        table.overwrite(state)
        return time.perf_counter() - t0

    expire_times, naive_times = [], []
    detail = None
    want = None
    for _ in range(3):
        w, detail = run_expire()
        expire_times.append(w)
        fp = fingerprint()
        want = want or fp
        assert fp == want, (fp, want)
        table.rollback_to(tag="pre-expiry")
        naive_times.append(run_naive())
        assert fingerprint() == want, "naive end state diverged"
        table.rollback_to(tag="pre-expiry")

    n_files = sum(len(es) for es in table.current().files.values())
    out = {
        "metric": "row_expiry_vs_naive_rewrite",
        "n_epochs": n_epochs,
        "rows_total": n_epochs * rows_per_epoch,
        "keep_days": keep_days,
        "expire_sec": round(statistics.median(expire_times), 3),
        "naive_sec": round(statistics.median(naive_times), 3),
        "speedup": round(
            statistics.median(naive_times) / statistics.median(expire_times), 2
        ),
        # the scale-honest numbers: local wall is job-overhead-dominated,
        # but at 100 TB cost ∝ files/bytes READ — naive reads every file,
        # expire reads only the cutoff-straddling slices
        "files_total": n_files,
        "files_read_naive": n_files,
        "files_read_expire": (detail or {}).get("slices_rewritten"),
        **(detail or {}),
    }
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
