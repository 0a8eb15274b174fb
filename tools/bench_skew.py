"""Skew bench: 50%-hot-key replay with WIDE (~4 KB) payloads.

Round 2's §2b showed extreme key skew is harmless at narrow row widths
because map-side partial aggregation collapses the hot key before the
exchange. That defense thins as payloads widen: the partials are FEWER
rows but each carries the full payload struct, so the hot key's reducer
receives (input_partitions × live turns) × ~4 KB. This harness measures
exactly that shape — half of all events on one conversation, texts padded
to ~4 KB — unsalted vs salted, medians of 3 fresh-table replays.

    python tools/bench_skew.py [n_events] [text_bytes]

Prints one JSON line (configs -> {trials, median_sec, events_per_sec}).
Never run concurrently with other work (±20% steal; see CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    text_bytes = int(sys.argv[2]) if len(sys.argv) > 2 else 4096

    from postgres_to_snowflake_data_pipeline_spark.cdc.apply import apply_batch
    from postgres_to_snowflake_data_pipeline_spark.cdc.generator import hot_key_feed
    from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import TRANSCRIPT_SCHEMA
    from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable
    from postgres_to_snowflake_data_pipeline_spark.session import get_spark

    spark = get_spark("bench-skew")
    work = os.path.join(tempfile.gettempdir(), "bench-skew")
    shutil.rmtree(work, ignore_errors=True)

    # the SAME construction the skew correctness tests pin (generator.
    # hot_key_feed) — the benchmarked distribution is the tested one
    feed_path = os.path.join(work, "feed")
    hot_key_feed(spark, n_events, text_bytes=text_bytes).write.parquet(feed_path)
    feed = spark.read.parquet(feed_path)

    out: dict = {
        "n_events": n_events,
        "text_bytes": text_bytes,
        "hot_share": 0.5,
        "configs": {},
    }
    for label, salt in (("unsalted", 0), ("salted32", 32)):
        times = []
        for i in range(3):
            troot = os.path.join(work, f"t-{label}-{i}")
            table = LakeTable.create(
                spark, troot, TRANSCRIPT_SCHEMA,
                key_cols=("conv_id", "turn_idx"), n_buckets=64,
            )
            t0 = time.perf_counter()
            apply_batch(spark, table, feed, epoch=0, salt_buckets=salt)
            table.read().write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 2))
            shutil.rmtree(troot, ignore_errors=True)
        med = sorted(times)[1]
        out["configs"][label] = {
            "trials_sec": times,
            "median_sec": med,
            "events_per_sec": round(n_events / med, 1),
        }

    # AUTO: the batch-local probe sees the hot bucket's input share and
    # salts the same epoch — timing includes the probe, so the comparison
    # against the forced configs is honest about its cost.
    times, engaged = [], []
    for i in range(3):
        troot = os.path.join(work, f"t-auto-{i}")
        table = LakeTable.create(
            spark, troot, TRANSCRIPT_SCHEMA,
            key_cols=("conv_id", "turn_idx"), n_buckets=64,
        )
        t0 = time.perf_counter()
        apply_batch(spark, table, feed, epoch=0)  # salt_buckets=None = auto
        table.read().write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 2))
        engaged.append(table.current().summary.get("salt_buckets", 0))
        shutil.rmtree(troot, ignore_errors=True)
    med = sorted(times)[1]
    out["configs"]["auto"] = {
        "trials_sec": times,
        "median_sec": med,
        "events_per_sec": round(n_events / med, 1),
        "salt_engaged": engaged,
    }
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
