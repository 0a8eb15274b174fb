"""Branch-lifecycle soak: the clone → diverge → rebase → publish loop at
engine scale, under compaction, retention GC and branch discards.

Bootstraps a trunk from half the feed, then runs N cycles of:

  1. cut a zero-copy branch;
  2. apply one feed slice to the BRANCH and a different one to the TRUNK
     (true divergence, distinct epochs);
  3. `rebase_branch` (must apply; a second call must no-op);
  4. `fast_forward_from` publishes the branch back (metadata commit);
  5. gates: `state_counts` == physical read, `diff(trunk, branch)` == 0;
  6. every other cycle: compact (localizes adopted references), detach
     the publish pin, DISCARD the branch (drop its trunk pin + rmtree)
     and run `expire_snapshots` — retention must never break the loop.

Final gates: trunk state equals the distributed LWW oracle over EVERY
applied slice (`cdc.oracle.lww_state_oracle` — independent of the merge
path), `fsck` clean, and the retained-snapshot count stays bounded by
the expiry policy (pins released on discard, so GC really collects).

    python tools/soak_branch.py [n_events] [cycles]
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
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    from pyspark.sql import functions as F

    from postgres_to_snowflake_data_pipeline_spark.cdc.apply import (
        apply_batch,
        rebase_branch,
    )
    from postgres_to_snowflake_data_pipeline_spark.cdc.generator import change_events
    from postgres_to_snowflake_data_pipeline_spark.cdc.oracle import (
        diff_count,
        lww_state_oracle,
    )
    from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import (
        TRANSCRIPT_SCHEMA,
    )
    from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable
    from postgres_to_snowflake_data_pipeline_spark.session import get_spark

    spark = get_spark("soak-branch")
    work = os.path.join(tempfile.gettempdir(), "soak_branch")
    shutil.rmtree(work, ignore_errors=True)
    t0 = time.perf_counter()

    feed = change_events(spark, n_events, n_convs=20_000).persist()
    lo, hi = feed.agg(F.min("lsn"), F.max("lsn")).first()
    span = hi - lo + 1
    n_chunks = 1 + 2 * cycles
    # bootstrap takes half the lsn range; each cycle slice takes an equal
    # share of the rest
    b_hi = lo + span // 2
    step = max((hi - b_hi) // (n_chunks - 1), 1)

    def chunk(i: int):
        if i == 0:
            return feed.filter(F.col("lsn") < b_hi)
        a = b_hi + (i - 1) * step
        b = hi + 1 if i == n_chunks - 1 else b_hi + i * step
        return feed.filter((F.col("lsn") >= a) & (F.col("lsn") < b))

    trunk = LakeTable.create(
        spark, os.path.join(work, "trunk"), TRANSCRIPT_SCHEMA,
        ("conv_id", "turn_idx"), n_buckets=16,
    )
    epoch = 0
    apply_batch(spark, trunk, chunk(0), epoch=epoch)
    epoch += 1

    publishes = rebases = discards = 0
    for c in range(cycles):
        broot = os.path.join(work, f"branch{c}")
        branch = trunk.clone_to(broot)
        apply_batch(spark, branch, chunk(1 + 2 * c), epoch=epoch)
        epoch += 1
        apply_batch(spark, trunk, chunk(2 + 2 * c), epoch=epoch)
        epoch += 1
        assert rebase_branch(spark, branch) is not None
        assert rebase_branch(spark, branch) is None
        rebases += 1
        trunk.fast_forward_from(branch)
        publishes += 1
        assert trunk.diff(branch).count() == 0, f"cycle {c}: diverged"
        sc = trunk.state_counts()
        n = trunk.read().count()
        assert sc["live"] == n, (c, sc["live"], n)
        if c % 2 == 1:
            trunk.compact()
            trunk.detach_clone()  # publish pin released (localized)
            # discard the merged branch: drop its trunk pin, remove root
            pin = branch.current().props.get("clone.source_tag")
            if pin is not None and pin in trunk.tags():
                trunk.drop_tag(pin)
            shutil.rmtree(broot, ignore_errors=True)
            discards += 1
            trunk.expire_snapshots(keep_last=3, orphan_grace_seconds=0)

    # final: trunk equals the oracle over EVERY slice ever applied
    payload = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    oracle = lww_state_oracle(feed, ["conv_id", "turn_idx"], payload)
    mismatch = diff_count(trunk.read().select(*payload), oracle)
    rep = trunk.fsck()
    retained = len(trunk.snapshots())
    sc = trunk.state_counts()
    n_final = trunk.read().count()
    ok = (
        mismatch == 0 and rep["ok"] and sc["live"] == n_final
        and retained <= 3 + 2  # keep_last + pinned-by-live-branch slack
    )
    print(json.dumps({
        "soak_events": n_events, "cycles": cycles,
        "publishes": publishes, "rebases": rebases,
        "branch_discards": discards,
        "final_rows": n_final,
        "state_mismatch_rows": mismatch,
        "fsck_ok": rep["ok"],
        "state_counts_ok": sc["live"] == n_final,
        "snapshots_retained": retained,
        "wall_sec": round(time.perf_counter() - t0, 1),
        "ok": ok,
    }))
    shutil.rmtree(work, ignore_errors=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
