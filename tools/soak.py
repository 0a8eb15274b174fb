"""Operational soak: producer + continuous stream + crash + retention.

Exercises the engine the way an operator would run it, end to end:

1. a producer appends WAL parquet slices to the feed dir while a
   continuous streaming merge is running (compaction every 4 epochs);
2. the stream is KILLED mid-flight and restarted from its checkpoint;
3. a CONCURRENT READER PROCESS (tools/soak_reader.py, its own JVM)
   samples the table throughout, asserting every snapshot it reads is a
   committed LWW-consistent state (no dup keys, text/_lsn agreement, no
   torn reads) while writers + mid-run retention churn underneath it;
4. after the producer finishes, an availableNow drain catches up;
5. snapshots are expired mid-run (keep_last=8) and at the end
   (keep_last=3) — orphan-file GC under live readers;
6. the final table state is verified row-for-row against the sequential
   replay oracle over the full feed, and lineage must reconcile.

Prints one JSON line; exits non-zero on any violation.

    python tools/soak.py [n_events] [n_slices]
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
    content_index = "--content-index" in sys.argv[1:]
    argv = [a for a in sys.argv[1:] if a != "--content-index"]
    n_events = int(argv[0]) if argv else 1_000_000
    n_slices = int(argv[1]) if len(argv) > 1 else 16

    from pyspark.sql import functions as F

    from postgres_to_snowflake_data_pipeline_spark.cdc.generator import change_events
    from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import (
        CHANGE_EVENT_SCHEMA,
        TRANSCRIPT_SCHEMA,
    )
    from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable
    from postgres_to_snowflake_data_pipeline_spark.session import get_spark
    from postgres_to_snowflake_data_pipeline_spark.streaming.pipeline import run_stream

    spark = get_spark("soak")
    work = os.path.join(tempfile.gettempdir(), "soak")
    shutil.rmtree(work, ignore_errors=True)
    feed = os.path.join(work, "feed")
    os.makedirs(feed)
    ckpt = os.path.join(work, "ckpt")

    full = change_events(spark, n_events, n_convs=20_000).persist()
    max_lsn = full.agg(F.max("lsn")).first()[0]
    step = (max_lsn + n_slices) // n_slices

    table = LakeTable.create(
        spark, os.path.join(work, "t"), TRANSCRIPT_SCHEMA,
        key_cols=("conv_id", "turn_idx"), n_buckets=32,
    )
    if content_index:
        # --content-index: the soak pays the per-commit index build at
        # volume (every commit's files carry value sets + token indexes;
        # 32+ files/commit exercises the DISTRIBUTED content-stats path)
        # and the final validation adds a pruned-vs-naive read check
        table.update_props(
            {"index.sets": ["role", "tool"], "index.tokens": "text"}
        )

    # stream-side lineage listener rides the whole soak (source offsets
    # per micro-batch, reconciled against the feed at the end)
    from postgres_to_snowflake_data_pipeline_spark.streaming.listener import (
        attach_progress_listener,
        read_progress,
    )

    progress_path = os.path.join(work, "progress.jsonl")
    listener = attach_progress_listener(spark, progress_path)

    # an incrementally-maintained mart rides the whole soak (refresh per
    # micro-batch, commit-keyed to source snapshots) — it must survive the
    # kill/restart and end exactly equal to a from-scratch recompute
    from postgres_to_snowflake_data_pipeline_spark.lake.view import IncrementalAggView

    view_agg = lambda rows: rows.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"), F.max("ts").alias("last_ts"))
    view = IncrementalAggView(spark, os.path.join(work, "view"), table,
                              ("conv_id",), view_agg, n_buckets=8)

    # concurrent reader: separate process, own JVM, samples the table the
    # whole run (writers + compaction + mid-run retention churn under it)
    import subprocess

    stop_file = os.path.join(work, "reader.stop")
    samples_path = os.path.join(work, "reader_samples.jsonl")
    reader = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tools", "soak_reader.py"),
         os.path.join(work, "t"), stop_file, samples_path],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )

    # the sawtooth audit needs per-snapshot metadata sizes, which mid-run
    # retention deletes — harvest incrementally as the run goes
    meta = table.log.meta_dir
    all_sizes: dict[int, int] = {}

    def _harvest_meta_sizes() -> None:
        for f in os.listdir(meta):
            if f.startswith("v") and f.endswith(".json"):
                try:
                    all_sizes[int(f[1:-5])] = os.path.getsize(os.path.join(meta, f))
                except OSError:
                    continue  # expired between listdir and stat

    t0 = time.perf_counter()
    q = run_stream(spark, table, feed, CHANGE_EVENT_SCHEMA, ckpt,
                   max_files_per_trigger=2, compact_every=4,
                   compact_max_files=6, available_now=False, views=[view])
    killed = False
    for s in range(n_slices):
        lo, hi = s * step, (s + 1) * step
        (full.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi))
         .coalesce(1).write.mode("append").parquet(feed))
        if s == n_slices // 2 and not killed:
            q.stop()            # crash mid-flight
            if not q.awaitTermination(120):
                raise RuntimeError("stream did not stop within 120s")
            killed = True
            q = run_stream(spark, table, feed, CHANGE_EVENT_SCHEMA, ckpt,
                           max_files_per_trigger=2, compact_every=4,
                           compact_max_files=6, available_now=False,
                           views=[view])
        if s % 4 == 3:
            # retention churn WHILE the stream commits and the reader reads
            # (keep_last=8 leaves the reader's recent pins resolvable; the
            # in-flight commit is protected by the orphan grace period)
            _harvest_meta_sizes()
            table.expire_snapshots(keep_last=8)
        time.sleep(0.5)
    q.stop()
    if not q.awaitTermination(120):
        raise RuntimeError("stream did not stop within 120s")
    # catch-up drain of anything unprocessed. The deadline scales with
    # the feed (~100k events/s is far below the engine's measured floor):
    # an unfinished drain must be REPORTED as such, not allowed to let
    # the oracle comparison run against a half-merged table and report
    # bogus mismatches (bit us at 64M with a fixed 300 s)
    q2 = run_stream(spark, table, feed, CHANGE_EVENT_SCHEMA, ckpt,
                    max_files_per_trigger=4, compact_every=4,
                    compact_max_files=6, views=[view])
    drain_ok = q2.awaitTermination(max(300, n_events // 100_000))
    wall = time.perf_counter() - t0
    # drain the async listener bus before detaching: awaitTermination does
    # not guarantee the final QueryProgressEvent has been dispatched. Wait
    # until the recorded counts go quiet (full coverage is NOT guaranteed —
    # a kill can drop an in-flight event; see the subset-consistency gate).
    expected = spark.read.parquet(feed).count()
    last, quiet_since = -1, time.time()
    deadline = time.time() + 20
    while time.time() < deadline:
        drained = sum(r["num_input_rows"] or 0 for r in read_progress(progress_path))
        if drained != last:
            last, quiet_since = drained, time.time()
        elif time.time() - quiet_since > 2:
            break
        time.sleep(0.5)
    spark.streams.removeListener(listener)
    worst_bucket_files = max(len(fs) for fs in table.current().files.values())

    # stop the concurrent reader and audit its samples: every successful
    # read must have been an LWW-consistent committed state, snapshot ids
    # non-decreasing; gc_races (pin expired mid-read, retry succeeded) are
    # tolerated and reported; unrecovered errors are not
    with open(stop_file, "w"):
        pass
    try:
        reader.wait(timeout=120)
    except subprocess.TimeoutExpired:
        reader.kill()
    samples = []
    if os.path.exists(samples_path):
        with open(samples_path) as f:
            samples = [json.loads(line) for line in f if line.strip()]
    reads = [r for r in samples if "sid" in r]
    reader_consistent = (
        len(reads) > 0
        and all(r["dup_keys"] == 0 and r["bad_text"] == 0 for r in reads)
        and all(r.get("monotonic", True) for r in reads)
        and not any("error" in r for r in samples)
    )
    reader_gc_races = sum(1 for r in samples if r.get("gc_race"))

    # materialize the lineage mirror BEFORE retention prunes the snapshot
    # log (the operational ordering: metrics outlive expired snapshots)
    from postgres_to_snowflake_data_pipeline_spark.cdc.apply import export_lineage

    lineage_path = os.path.join(work, "lineage")
    export_lineage(spark, table, lineage_path)

    # metadata-growth audit: commit metadata must be O(batch), i.e. the
    # per-snapshot bytes sawtooth (merges accumulate manifests until
    # compaction prunes) must not trend upward across the run. Sizes were
    # harvested incrementally (mid-run retention deletes old snapshots).
    _harvest_meta_sizes()
    sizes = all_sizes
    n_snap = max(sizes)
    early_peak = max(v for k, v in sizes.items() if k <= max(6, n_snap // 4))
    late_peak = max(v for k, v in sizes.items() if k >= n_snap - 6)
    meta_bounded = late_peak <= early_peak * 2 + 1024

    # retention + GC, then verify
    gc = table.expire_snapshots(keep_last=3, orphan_grace_seconds=0)

    from postgres_to_snowflake_data_pipeline_spark.cdc.oracle import (
        diff_count,
        lww_state_oracle,
    )

    payload = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    state = table.read().select(*payload).persist()
    n_state = state.count()
    # oracle: LWW winner per key over the FULL feed, deletes dropped
    # (shared distributed twin of the driver-side replay_oracle)
    oracle = lww_state_oracle(full, ["conv_id", "turn_idx"], payload)
    mismatch = diff_count(state, oracle)

    lin = spark.read.parquet(lineage_path)
    rows_in = lin.agg(F.sum("rows_in")).first()[0]
    feed_rows = expected  # counted once above, before the listener drain
    # stream-side lineage is OBSERVABILITY, not the exactly-once ledger: a
    # query stopped mid-flight can lose its in-flight progress event (and a
    # re-delivered batch is counted twice), so total coverage is not a
    # sound invariant under kills. What must hold: every progress row the
    # listener DID record agrees with the commit-side lineage for that
    # batch id (subset consistency).
    progress = [r for r in read_progress(progress_path) if r["num_input_rows"]]
    stream_rows = sum(r["num_input_rows"] for r in progress)
    commit_by_epoch = {r["epoch"]: r["rows_in"] for r in lin.collect()}
    listener_mismatches = sum(
        1 for r in progress
        if r["batch_id"] in commit_by_epoch
        and commit_by_epoch[r["batch_id"]] != r["num_input_rows"]
    )

    # the mart must end exactly equal to a from-scratch recompute over
    # the final table state (a final refresh absorbs the catch-up drain)
    view.refresh()
    vr = view.read()
    want_view = view_agg(table.read())
    view_mismatch = diff_count(vr, want_view)

    # --content-index: pruned reads must equal the naive filters on the
    # final state (exercised across every commit's indexes: deltas,
    # compacted bases, post-GC survivors)
    content_mismatch = 0
    if content_index:
        content_mismatch += diff_count(
            table.read(eq_prune={"role": "assistant"}),
            state.where("role = 'assistant'"),
        )
        from postgres_to_snowflake_data_pipeline_spark.lake.content import (
            TOKEN_SPLIT_SQL,
        )

        content_mismatch += diff_count(
            table.read(token_prune="turn"),
            state.where(F.array_contains(
                F.split(F.lower("text"), TOKEN_SPLIT_SQL), "turn")),
        )

    # metadata-only accounting must agree with the physical read at the
    # end of the churn (kills, GC, compactions, restarts): the del_rows
    # stats survived every write path or this gate trips
    sc = table.state_counts()
    counts_ok = sc["live"] == n_state

    ok = (drain_ok and mismatch == 0 and rows_in == feed_rows and meta_bounded
          and listener_mismatches == 0 and len(progress) > 0
          and view_mismatch == 0 and reader_consistent
          and content_mismatch == 0 and counts_ok)
    print(json.dumps({
        "soak_events": n_events, "slices": n_slices, "killed_and_restarted": killed,
        "drain_ok": drain_ok,
        "wall_sec": round(wall, 1), "final_rows": n_state,
        "state_mismatch_rows": mismatch,
        "lineage_rows_in": rows_in, "feed_rows": feed_rows,
        "listener_rows_in": stream_rows,
        "listener_batches": len(progress),
        "listener_mismatched_batches": listener_mismatches,
        "meta_bytes_early_peak": early_peak, "meta_bytes_late_peak": late_peak,
        "meta_bounded": meta_bounded,
        "worst_bucket_files": worst_bucket_files,
        "view_mismatch_rows": view_mismatch,
        "reader_samples": len(reads),
        "reader_consistent": reader_consistent,
        "reader_gc_races": reader_gc_races,
        "view_refreshes": view._table.current().snapshot_id if view._table else 0,
        "gc": gc, "snapshots_retained": len(table.snapshots()),
        "content_index": content_index,
        "content_mismatch_rows": content_mismatch,
        "state_counts_live": sc["live"],
        "state_counts_stats_buckets": sc["stats_buckets"],
        "state_counts_ok": counts_ok,
        "ok": ok,
    }))
    shutil.rmtree(work, ignore_errors=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
