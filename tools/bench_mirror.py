"""Measure what changefeed replication buys over clear-and-reload.

Builds a source table from ``n_epochs`` CDC epochs, then keeps a follower
in sync three ways over the SAME data:

- steady-state sync: ``TableMirror.sync()`` after every epoch — the cost
  of shipping ONE epoch's delta (read the window's delta manifests,
  one dedup shuffle, one delta append on the follower);
- bootstrap (full-chain catch-up): a FRESH mirror syncing once replays
  every retained delta through the same incremental path;
- rebuild: ``LakeTable.overwrite(source.read(...))`` — the
  clear-and-reload the reference performs EVERY run
  (/root/reference/scripts/load_data.py:119-131), here the rare repair
  path;
- fan-out: 4 key-predicate SHARDS of the source synced per epoch, both
  as 4 independent ``sync()`` calls (4 window reads) and as ONE
  ``sync_group`` (the window read+cached once, shared) — the read
  de-amplification claim behind the scale-out replica shape.

The scale claims under test: steady-state sync cost tracks the DELTA,
not the table — as the table grows epoch over epoch, per-sync wall stays
flat while a rebuild grows with the table; and group-sync cost stays
~flat in shard count where independent syncs grow linearly. All
followers are verified row-equal to their subset at the end (``ok``).

    python tools/bench_mirror.py [n_epochs] [rows_per_epoch]
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
    rows_per_epoch = int(sys.argv[2]) if len(sys.argv) > 2 else 250_000

    from postgres_to_snowflake_data_pipeline_spark.cdc.apply import apply_batch
    from postgres_to_snowflake_data_pipeline_spark.cdc.generator import (
        change_events,
    )
    from postgres_to_snowflake_data_pipeline_spark.cdc.mirror import TableMirror
    from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import (
        TRANSCRIPT_SCHEMA,
    )
    from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable
    from postgres_to_snowflake_data_pipeline_spark.session import get_spark

    spark = get_spark("bench-mirror")
    work = os.path.join(tempfile.gettempdir(), "bench_mirror")
    shutil.rmtree(work, ignore_errors=True)

    src = LakeTable.create(
        spark, os.path.join(work, "src"), TRANSCRIPT_SCHEMA,
        ("conv_id", "turn_idx"), n_buckets=32,
    )
    live = TableMirror(spark, os.path.join(work, "rep_live"), src)

    n_convs = max(rows_per_epoch // 40, 100)
    sync_s: list[float] = []
    for e in range(n_epochs):
        apply_batch(
            spark, src,
            change_events(spark, rows_per_epoch, n_convs=n_convs, seed=e + 1),
            epoch=e,
        )
        t0 = time.monotonic()
        r = live.sync()
        sync_s.append(time.monotonic() - t0)
        assert r is not None and r["mode"] == "incremental", r

    # fresh mirror: one sync replays the whole retained chain
    t0 = time.monotonic()
    boot = TableMirror(spark, os.path.join(work, "rep_boot"), src)
    rb = boot.sync()
    bootstrap_s = time.monotonic() - t0
    assert rb is not None and rb["mode"] == "incremental", rb

    # clear-and-reload: full state read + overwrite (the reference's
    # EVERY-run cost; the mirror's rare repair path)
    dst = LakeTable.create(
        spark, os.path.join(work, "rep_full"), TRANSCRIPT_SCHEMA,
        ("conv_id", "turn_idx"), n_buckets=32,
    )
    t0 = time.monotonic()
    dst.overwrite(
        src.read(include_internal=True, include_tombstones=True)
    )
    rebuild_s = time.monotonic() - t0

    # fan-out: 4 key shards, independent syncs vs one grouped sync. The
    # two shard sets consume DIFFERENT epochs of the same source (solo
    # gets the odd windows, group the even) so each measures a genuine
    # window apply, interleaved to face the same table-growth curve.
    pred = "pmod(conv(substr(md5(conv_id), 1, 15), 16, 10), 4) = {r}"
    solo = [
        TableMirror(
            spark, os.path.join(work, f"sh_solo{r}"), src,
            filter_expr=pred.format(r=r),
        )
        for r in range(4)
    ]
    grp = [
        TableMirror(
            spark, os.path.join(work, f"sh_grp{r}"), src,
            filter_expr=pred.format(r=r),
        )
        for r in range(4)
    ]
    TableMirror.sync_group(grp)  # align both sets to current
    for s in solo:
        s.sync()
    solo_s: list[float] = []
    group_s: list[float] = []
    for e in range(4):
        apply_batch(
            spark, src,
            change_events(
                spark, rows_per_epoch, n_convs=n_convs, seed=100 + e
            ),
            epoch=n_epochs + e,
        )
        if e % 2 == 0:
            t0 = time.monotonic()
            TableMirror.sync_group(grp)
            group_s.append(time.monotonic() - t0)
            for s in solo:
                s.sync()
        else:
            t0 = time.monotonic()
            for s in solo:
                s.sync()
            solo_s.append(time.monotonic() - t0)
            TableMirror.sync_group(grp)

    src_state = src.read()
    rows = src_state.count()
    shard_mism = 0
    for r in range(4):
        want = src_state.filter(pred.format(r=r))
        for m in (solo[r], grp[r]):
            shard_mism += (
                m.read().exceptAll(want).count()
                + want.exceptAll(m.read()).count()
            )
    mism = (
        live.read().exceptAll(src_state).count()
        + src_state.exceptAll(live.read()).count()
        + boot.read().exceptAll(src_state).count()
        + dst.read().exceptAll(src_state).count()
        + shard_mism
    )

    # flatness evidence: last-epoch sync vs first-epoch sync (the table is
    # n_epochs x bigger by the end; the delta is the same size)
    print(json.dumps({
        "events": n_epochs * rows_per_epoch,
        "epochs": n_epochs,
        "final_rows": rows,
        "sync_s_per_epoch": [round(s, 2) for s in sync_s],
        "sync_median_s": round(statistics.median(sync_s), 2),
        "sync_first_s": round(sync_s[0], 2),
        "sync_last_s": round(sync_s[-1], 2),
        "bootstrap_full_chain_s": round(bootstrap_s, 2),
        "rebuild_overwrite_s": round(rebuild_s, 2),
        "fanout_4shards_solo_s": [round(s, 2) for s in solo_s],
        "fanout_4shards_group_s": [round(s, 2) for s in group_s],
        "fanout_solo_median_s": round(statistics.median(solo_s), 2),
        "fanout_group_median_s": round(statistics.median(group_s), 2),
        "mismatch_rows": mism,
        "ok": mism == 0,
    }))


if __name__ == "__main__":
    main()
