"""Multi-PROCESS writer soak: the CAS commit protocol under real JVMs.

tests/test_concurrency.py races writers as THREADS of one SparkContext —
it proves the rebase algebra, but every contender shares one process, so
the filesystem-level claims (``os.link`` CAS exclusivity, hint staleness,
manifest visibility across processes) are never exercised where they
matter. This soak spawns W INDEPENDENT driver JVMs against one table
root, each committing its own disjoint epoch range while writer 0 also
runs compactions between its merges (replace commits racing appends →
``_rebase_replace`` across processes). The parent then validates:

- every writer exited 0 and every epoch commit key is present;
- no lost updates: the final state equals the distributed LWW oracle of
  the full feed (value-compared, engine-independent);
- lineage sums: per-commit ``rows_in`` totals equal the feed count.

    python tools/soak_writers.py [n_events] [n_writers] [epochs_per_writer]

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def writer(root: str, feed: str, writer_id: int, n_writers: int, epochs: int) -> None:
    """One writer process: load the shared table, commit `epochs` slices
    of the feed (epoch ids disjoint per writer), compact between merges
    on writer 0 so replace commits race other writers' appends."""
    from pyspark.sql import functions as F

    from postgres_to_snowflake_data_pipeline_spark.cdc.apply import apply_batch
    from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable
    from postgres_to_snowflake_data_pipeline_spark.session import get_spark

    spark = get_spark(f"writer-{writer_id}", master="local[4]", shuffle_partitions=8)
    table = LakeTable.load(spark, root)
    feed_df = spark.read.parquet(feed)
    total = n_writers * epochs
    for i in range(epochs):
        e = writer_id * epochs + i
        # slice by lsn mod: every epoch is a deterministic disjoint subset
        batch = feed_df.filter(F.col("lsn") % total == e)
        apply_batch(spark, table, batch, epoch=e)
        if writer_id == 0:
            table.compact()  # replace commits racing appends, cross-process
    print(json.dumps({"writer": writer_id, "epochs": epochs}), flush=True)


def main() -> None:
    if sys.argv[1:2] == ["--writer"]:
        writer(sys.argv[2], sys.argv[3], int(sys.argv[4]), int(sys.argv[5]),
               int(sys.argv[6]))
        return

    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    n_writers = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from postgres_to_snowflake_data_pipeline_spark.cdc.generator import (
        change_events,
        write_feed,
    )
    from postgres_to_snowflake_data_pipeline_spark.cdc.oracle import (
        diff_count,
        lww_state_oracle,
    )
    from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import (
        TRANSCRIPT_SCHEMA,
    )
    from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable
    from postgres_to_snowflake_data_pipeline_spark.session import get_spark

    spark = get_spark("soak-writers-main", master="local[8]", shuffle_partitions=16)
    work = os.path.join(tempfile.gettempdir(), "soak-writers")
    shutil.rmtree(work, ignore_errors=True)
    feed = os.path.join(work, "feed")
    root = os.path.join(work, "table")
    write_feed(change_events(spark, n_events, n_convs=20_000), feed, n_files=32)
    LakeTable.create(
        spark, root, TRANSCRIPT_SCHEMA, key_cols=("conv_id", "turn_idx"),
        n_buckets=16,
    )

    t0 = time.perf_counter()
    # Each writer's output goes straight to its own file: a PIPE left
    # undrained while the parent waits on an earlier writer would block
    # that writer on a full pipe buffer — silently serializing the very
    # cross-process race this soak exists to exercise.
    logs = [open(os.path.join(work, f"writer-{w}.log"), "w+") for w in range(n_writers)]
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--writer", root, feed,
             str(w), str(n_writers), str(epochs)],
            stdout=logs[w], stderr=subprocess.STDOUT, text=True,
            cwd=REPO, env=dict(os.environ, PYTHONPATH=REPO),
        )
        for w in range(n_writers)
    ]
    deadline = time.monotonic() + 1800
    timed_out = False
    exit_codes = []
    for p, log in zip(procs, logs):
        try:
            p.wait(timeout=max(1.0, deadline - time.monotonic()))
        except subprocess.TimeoutExpired:
            timed_out = True
            for q in procs:  # no orphaned JVMs
                if q.poll() is None:
                    q.kill()
            p.wait()
        exit_codes.append(p.returncode)
        if p.returncode != 0:
            log.seek(0, os.SEEK_END)
            log.seek(max(0, log.tell() - 3000))
            sys.stderr.write(log.read())
        log.close()
    wall = time.perf_counter() - t0

    if timed_out:
        # A hung writer leaves the table half-written; validating it would
        # only add noise (and may itself hang). Keep the JSON-line contract.
        print(json.dumps({
            "soak": "multiprocess_writers", "n_events": n_events,
            "n_writers": n_writers, "epochs_per_writer": epochs,
            "wall_sec": round(wall, 1), "writer_exit_codes": exit_codes,
            "timed_out": True, "ok": False,
        }))
        spark.stop()
        sys.exit(1)

    final = LakeTable.load(spark, root)
    snap = final.current()
    keys_present = all(
        snap.has_commit_key(f"epoch:{e}") for e in range(n_writers * epochs)
    )
    # lineage reconciliation across every retained merge commit
    rows_in = sum(
        s.summary.get("rows_in") or 0
        for s in final.snapshots()
        if s.summary.get("operation") == "merge"
    )
    feed_df = spark.read.parquet(feed)
    feed_rows = feed_df.count()
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    oracle = lww_state_oracle(feed_df, ("conv_id", "turn_idx"), cols)
    mismatches = diff_count(final.read().select(*cols), oracle.select(*cols))
    report = {
        "soak": "multiprocess_writers",
        "n_events": n_events,
        "n_writers": n_writers,
        "epochs_per_writer": epochs,
        "wall_sec": round(wall, 1),
        "writer_exit_codes": exit_codes,
        "all_epoch_keys_present": keys_present,
        "commit_count": snap.commit_count,
        "lineage_rows_in": rows_in,
        "feed_rows": feed_rows,
        "state_mismatch_rows": mismatches,
        "ok": (
            all(c == 0 for c in exit_codes)
            and keys_present
            and mismatches == 0
            and rows_in == feed_rows
        ),
    }
    print(json.dumps(report))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    sys.exit(0 if report["ok"] else 1)


if __name__ == "__main__":
    main()
