"""Measure what KEY-CLUSTERED compaction buys a point lookup (BENCH §6d).

Builds one merged table, then re-lays it out three ways and times
``read_key`` over the same sampled keys on each layout:

- plain:      one base file per bucket (whole key+time span) — a lookup
              opens 1 file but reads the bucket's full bytes;
- key-sliced: ``compact(key_slices=k)`` — disjoint per-file key ranges,
              manifest key stats prune a lookup to ONE slice: 1 file,
              ~1/k of the bucket's bytes;
- ts-sliced:  ``compact(ts_slices=k)`` — the OTHER layout axis; every
              slice spans the bucket's key range, so a lookup fans out
              to all k files (the documented trade-off).

Results must be identical rows on every layout. At 100 TB the bucket is
~24 GB (4096 buckets): plain reads 24 GB per lookup, key-sliced reads
24/k GB from one file — the layout, not the engine, is the index.

    python tools/bench_keycluster.py [n_rows] [n_buckets] [k_slices]
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

N_PROBE_KEYS = 8
TRIALS = 3


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    k_slices = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    n_convs = max(n_rows // 20, 1)

    import datetime as dt

    from pyspark.sql import functions as F

    from postgres_to_snowflake_data_pipeline_spark.cdc.apply import apply_batch
    from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import (
        TRANSCRIPT_SCHEMA,
    )
    from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable
    from postgres_to_snowflake_data_pipeline_spark.session import get_spark

    spark = get_spark("bench-keycluster")
    work = os.path.join(tempfile.gettempdir(), "bench_keycluster")
    shutil.rmtree(work, ignore_errors=True)

    table = LakeTable.create(
        spark, os.path.join(work, "t"), TRANSCRIPT_SCHEMA,
        ("conv_id", "turn_idx"), n_buckets=n_buckets,
    )
    day0 = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
    batch = spark.range(n_rows).select(
        F.col("id").alias("lsn"),
        F.lit("insert").alias("op"),
        F.format_string(f"c%0{len(str(n_convs))}d", F.col("id") % n_convs)
        .alias("conv_id"),
        (F.col("id") / n_convs).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(F.lit("message body for event "), F.col("id")).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        (F.lit(day0) + F.make_interval(
            secs=(F.col("id") % 2_592_000).cast("double"))).alias("ts"),
    )
    apply_batch(spark, table, batch, epoch=0)

    # deterministic probe keys spread over the id space
    keys = [
        f"c{(i * n_convs // N_PROBE_KEYS):0{len(str(n_convs))}d}"
        for i in range(N_PROBE_KEYS)
    ]

    def probe() -> tuple[float, float, float, int]:
        """(median lookup sec, avg files, avg MB opened, rows) per key."""
        times, n_files, n_bytes, rows = [], [], [], 0
        for k in keys:
            df = table.read_key(k)
            fs = df.inputFiles()
            n_files.append(len(fs))
            n_bytes.append(
                sum(os.path.getsize(f.removeprefix("file:")) for f in fs)
            )
            per_key = []
            for _ in range(TRIALS):
                t0 = time.perf_counter()
                got = df.collect()
                per_key.append(time.perf_counter() - t0)
            rows += len(got)
            times.append(statistics.median(per_key))
        return (
            statistics.median(times),
            statistics.mean(n_files),
            statistics.mean(n_bytes) / 1e6,
            rows,
        )

    layouts = [
        ("plain", dict(key_slices=1)),
        ("key_sliced", dict(key_slices=k_slices)),
        ("ts_sliced", dict(ts_slices=k_slices)),
    ]
    out: dict = {
        "metric": "keycluster_point_lookup",
        "n_rows": n_rows,
        "n_buckets": n_buckets,
        "k_slices": k_slices,
        "probe_keys": N_PROBE_KEYS,
        "trials": TRIALS,
    }
    row_counts = set()
    for name, kwargs in layouts:
        table.compact(**kwargs)
        sec, files, mb, rows = probe()
        row_counts.add(rows)
        out[name] = {
            "lookup_sec_median": round(sec, 4),
            "files_per_lookup": round(files, 2),
            "mb_per_lookup": round(mb, 2),
        }
    out["results_identical"] = len(row_counts) == 1
    assert out["results_identical"], row_counts
    out["speedup_key_vs_plain"] = round(
        out["plain"]["lookup_sec_median"]
        / out["key_sliced"]["lookup_sec_median"], 2
    )
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
