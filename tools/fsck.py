"""CLI for the LakeTable invariant checker (lake/fsck.py).

    python tools/fsck.py TABLE_ROOT [--deep] [--snapshot N]

Prints ONE JSON report line; exit status 1 when any error-level issue is
found (warnings — orphans, LSN ties — keep status 0). Run it after an
incident (crash mid-compaction, manual file surgery, suspected feed
duplication) or on a maintenance cadence; ``--deep`` is the
pruning-soundness + bucket-honesty level and costs O(files) footer reads
plus two narrow-column scans.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not args:
        print(__doc__)
        raise SystemExit(2)
    root = args[0]
    deep = "--deep" in sys.argv
    snap = None
    if "--snapshot" in sys.argv:
        snap = int(sys.argv[sys.argv.index("--snapshot") + 1])

    from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable
    from postgres_to_snowflake_data_pipeline_spark.session import get_spark

    spark = get_spark("fsck")
    table = LakeTable.load(spark, root)
    report = table.fsck(deep=deep, snapshot_id=snap)
    print(json.dumps(report))
    raise SystemExit(0 if report["ok"] else 1)


if __name__ == "__main__":
    main()
