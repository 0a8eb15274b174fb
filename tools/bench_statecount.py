"""Measure what metadata-only state counting buys over the scan it
replaces (BENCH §6k).

Builds a folded CDC table (n_epochs replayed, ~6% deletes, one
``compact()``), then answers "how many live rows / tombstoned keys does
the current state hold" two ways:

- stats: ``table.state_counts()`` — a driver-side manifest fold over the
  per-file ``rows``/``del_rows`` stats; NO Spark job, no data files
  opened (the per-bucket ``via`` map is asserted all-'stats');
- scan:  the only option without the stat — read every bucket through
  the LWW path (``include_internal + include_tombstones``) and
  aggregate counts.

Then one small batch dirties a handful of buckets and ``state_counts``
runs again: the fallback must scan ONLY the dirtied buckets, so the
cost sits between the two extremes and is O(delta), not O(table). Both
paths must agree exactly on (live, deleted) at every step.

At 100 TB the stats answer is a metadata fold (already-resident JSON
manifests) vs a full-table job — the measured ratio here UNDERSTATES
the win, since local[32] hides the object-store scan cost.

    python tools/bench_statecount.py [n_epochs] [rows_per_epoch] [n_buckets]
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
    n_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rows_per_epoch = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    n_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from pyspark.sql import functions as F

    from postgres_to_snowflake_data_pipeline_spark.cdc.apply import apply_batch
    from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import (
        TRANSCRIPT_SCHEMA,
    )
    from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable
    from postgres_to_snowflake_data_pipeline_spark.session import get_spark

    spark = get_spark("bench-statecount")
    work = os.path.join(tempfile.gettempdir(), "bench_statecount")
    shutil.rmtree(work, ignore_errors=True)

    table = LakeTable.create(
        spark, os.path.join(work, "t"), TRANSCRIPT_SCHEMA,
        ("conv_id", "turn_idx"), n_buckets=n_buckets,
    )
    for e in range(n_epochs):
        base = e * rows_per_epoch
        batch = spark.range(rows_per_epoch).select(
            (F.lit(base) + F.col("id")).alias("lsn"),
            F.when((F.col("id") % 17) == 0, "delete")
            .otherwise("insert").alias("op"),
            F.concat(
                F.lit("c"), F.format_string("%07d", F.col("id") % 100_000)
            ).alias("conv_id"),
            ((F.lit(base) + F.col("id")) / 100_000).cast("int")
            .alias("turn_idx"),
            F.when((F.col("id") % 17) != 0, F.lit("user")).alias("role"),
            F.when(
                (F.col("id") % 17) != 0,
                F.concat(F.lit("msg "), F.col("id")),
            ).alias("text"),
            F.lit(None).cast("string").alias("tool"),
            F.timestamp_seconds(F.lit(1_760_000_000) + F.col("id") % 86_400)
            .alias("ts"),
        )
        apply_batch(spark, table, batch, epoch=e)
    table.compact()

    def scan_counts() -> tuple[int, int]:
        r = table.read(
            include_internal=True, include_tombstones=True
        ).agg(
            F.sum(F.col("_deleted").cast("long")).alias("d"),
            F.count(F.lit(1)).alias("n"),
        ).first()
        return int(r["n"]) - int(r["d"]), int(r["d"])

    stats_times, scan_times = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        sc = table.state_counts()
        stats_times.append(time.perf_counter() - t0)
        assert sc["scanned_buckets"] == 0, sc
        t0 = time.perf_counter()
        live, dead = scan_counts()
        scan_times.append(time.perf_counter() - t0)
        assert (sc["live"], sc["deleted"]) == (live, dead), (sc, live, dead)

    # dirty a handful of buckets: 4 conversations' worth of late updates
    late = spark.createDataFrame(
        [
            (n_epochs * rows_per_epoch + j, "insert",
             f"c{j:07d}", 0, "user", "late", None, None)
            for j in range(4)
        ],
        "lsn long, op string, conv_id string, turn_idx int, role string, "
        "text string, tool string, ts timestamp",
    )
    pre_late_sid = table.current().snapshot_id
    apply_batch(spark, table, late, epoch=n_epochs)
    dirty_times, scan_post_times = [], []
    sc2 = None
    for _ in range(3):
        t0 = time.perf_counter()
        sc2 = table.state_counts()
        dirty_times.append(time.perf_counter() - t0)
        # the naive alternative on the SAME (delta-bearing) table: a full
        # read — the per-bucket resolve split keeps the LWW shuffle to the
        # dirtied buckets, but every byte is still scanned
        t0 = time.perf_counter()
        live2, dead2 = scan_counts()
        scan_post_times.append(time.perf_counter() - t0)
        assert (sc2["live"], sc2["deleted"]) == (live2, dead2)
    assert 1 <= sc2["scanned_buckets"] <= 4, sc2

    # keyed state diff across the dirty commit (time-travel diff): the
    # manifest prune reads only the dirtied buckets on BOTH sides
    diff_times, n_diff = [], 0
    for _ in range(3):
        t0 = time.perf_counter()
        n_diff = table.diff(table, snapshot_id=pre_late_sid).count()
        diff_times.append(time.perf_counter() - t0)
    assert n_diff == 4, n_diff  # the 4 late updates, nothing else

    # zero-copy branching on the same table: the clone + publish pair
    # must be METADATA-time (independent of the 2M rows referenced)
    t0 = time.perf_counter()
    branch = table.clone_to(os.path.join(work, "branch"))
    clone_s = time.perf_counter() - t0
    assert branch.read().limit(1).count() == 1
    t0 = time.perf_counter()
    table.fast_forward_from(branch)
    publish_s = time.perf_counter() - t0

    out = {
        "metric": "state_count_stats_vs_scan",
        "clone_sec": round(clone_s, 3),
        "publish_sec": round(publish_s, 3),
        "diff_sec": round(statistics.median(diff_times), 3),
        "diff_rows": n_diff,
        "rows_total": n_epochs * rows_per_epoch,
        "n_buckets": n_buckets,
        "live_rows": sc2["live"],
        "deleted_keys": sc2["deleted"],
        "stats_sec": round(statistics.median(stats_times), 4),
        "scan_folded_sec": round(statistics.median(scan_times), 3),
        "scan_delta_sec": round(statistics.median(scan_post_times), 3),
        "dirty_sec": round(statistics.median(dirty_times), 3),
        "dirty_scanned_buckets": sc2["scanned_buckets"],
        "speedup_folded": round(
            statistics.median(scan_times) / statistics.median(stats_times), 1
        ),
        "speedup_dirty": round(
            statistics.median(scan_post_times)
            / statistics.median(dirty_times),
            1,
        ),
    }
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
