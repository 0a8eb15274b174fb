"""Measure the partial-update (patch) merge engine's overhead vs plain LWW.

Replays the SAME generated feed (derived partial images for the patch run)
through two tables at identical epoch slicing and bucketing:

- plain:  whole-row LWW (`resolve_lww` max-struct) — the baseline shape;
- patch:  `patch.columns=[text, tool]` — per-column set-LSN aggregates in
          the batch dedup, +3 storage columns, per-column resolution on
          every read.

Reports medians of 3 for replay wall, final-state read wall, and the two
state row counts (must match — the partial feed resolves to the same keys).
The interesting number at 100 TB is the replay ratio: the patch path adds
two NULL-skipping max-struct aggregates to the SAME single fused shuffle
(no extra exchange, plan-pinned in tests/test_plans.py-style shape), so
overhead should be a constant factor on CPU, not a new scale term.

    python tools/bench_patch.py [n_events] [epochs]
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
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from pyspark.sql import functions as F

    from postgres_to_snowflake_data_pipeline_spark.cdc.apply import replay_feed
    from postgres_to_snowflake_data_pipeline_spark.cdc.generator import (
        change_events,
        write_feed,
    )
    from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import (
        TRANSCRIPT_SCHEMA,
    )
    from postgres_to_snowflake_data_pipeline_spark.lake.table import (
        PATCH_SENTINEL_DEFAULT as SENT,
        LakeTable,
    )
    from postgres_to_snowflake_data_pipeline_spark.session import get_spark

    spark = get_spark("bench-patch")
    work = tempfile.mkdtemp(prefix="bench-patch-")
    ev = change_events(spark, n_events, n_convs=n_events // 80)
    feeds = {"plain": os.path.join(work, "feed-plain"),
             "patch": os.path.join(work, "feed-patch")}
    write_feed(ev, feeds["plain"], n_files=64)
    is_del = F.col("op") == "delete"
    partial = ev.withColumn(
        "text",
        F.when(is_del, F.lit(None).cast("string"))
        .when(F.col("lsn") % 3 == 0, F.lit(SENT))
        .otherwise(F.col("text")),
    ).withColumn(
        "tool",
        F.when(is_del, F.lit(None).cast("string"))
        .when(F.col("lsn") % 5 < 2, F.lit(SENT))
        .otherwise(F.col("tool")),
    )
    write_feed(partial, feeds["patch"], n_files=64)

    results: dict[str, dict] = {}
    for mode in ("plain", "patch"):
        replay_times, read_times, rows = [], [], None
        for trial in range(3):
            root = os.path.join(work, f"t-{mode}-{trial}")
            props = (
                {"patch.columns": ["text", "tool"]} if mode == "patch" else None
            )
            table = LakeTable.create(
                spark, root, TRANSCRIPT_SCHEMA,
                key_cols=("conv_id", "turn_idx"), n_buckets=128, props=props,
            )
            t0 = time.perf_counter()
            replay_feed(spark, table, feeds[mode], epochs=epochs, compact_every=0)
            replay_times.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            rows = table.read().count()
            read_times.append(time.perf_counter() - t0)
            shutil.rmtree(root, ignore_errors=True)
        results[mode] = {
            "replay_sec": round(statistics.median(replay_times), 2),
            "read_sec": round(statistics.median(read_times), 2),
            "rows": rows,
        }

    assert results["plain"]["rows"] == results["patch"]["rows"], results
    out = {
        "n_events": n_events,
        "epochs": epochs,
        **{f"{m}_{k}": v for m, r in results.items() for k, v in r.items()},
        "replay_overhead": round(
            results["patch"]["replay_sec"] / results["plain"]["replay_sec"], 3
        ),
        "read_overhead": round(
            results["patch"]["read_sec"] / results["plain"]["read_sec"], 3
        ),
    }
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
