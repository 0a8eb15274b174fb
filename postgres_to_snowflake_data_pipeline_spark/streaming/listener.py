"""Streaming progress listener: per-micro-batch source-offset lineage.

The commit-side lineage (epoch LSN ranges + per-bucket rows inside each
snapshot summary, cdc/apply.py) answers "what did each commit apply?".
This listener answers the stream-side question — "which source offsets
fed each micro-batch?" — the analog of the reference's per-run
verification tasks (/root/reference/dags/export_to_s3_dag.py:76-83)
re-expressed on Spark's own StreamingQueryListener bus.

Rows are appended as JSON lines by the driver (listener callbacks run on
the driver and each row is O(100 B) — no Spark job involved): batch id,
per-source start/end offsets, input row count, trigger duration. Together
with the snapshot lineage this closes the loop the north rule names:
source offset range ↔ rows in ↔ commit snapshot id, reconciled in
tests/test_listener.py.
"""

from __future__ import annotations

import json
import os
import threading

from pyspark.sql.streaming import StreamingQueryListener


class FeedProgressListener(StreamingQueryListener):
    def __init__(self, path: str):
        self.path = path
        self._lock = threading.Lock()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    # -- required event hooks -------------------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        row = {
            "batch_id": p.get("batchId"),
            "num_input_rows": p.get("numInputRows"),
            "trigger_ms": (p.get("durationMs") or {}).get("triggerExecution"),
            "timestamp": p.get("timestamp"),
            "sources": [
                {
                    "description": s.get("description"),
                    "start_offset": s.get("startOffset"),
                    "end_offset": s.get("endOffset"),
                    "rows": s.get("numInputRows"),
                }
                for s in p.get("sources", [])
            ],
        }
        with self._lock, open(self.path, "a") as f:
            f.write(json.dumps(row) + "\n")

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def attach_progress_listener(spark, path: str) -> FeedProgressListener:
    """Register a FeedProgressListener on the session's listener bus.
    Returns it so the caller can ``spark.streams.removeListener(l)``."""
    listener = FeedProgressListener(path)
    spark.streams.addListener(listener)
    return listener


def read_progress(path: str) -> list[dict]:
    """The recorded per-batch lineage rows, in arrival order."""
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]
