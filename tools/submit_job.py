"""spark-submit entry point — proves the engine runs as a submitted job
with the package shipped via --py-files (the north rule's deployment
mode; no repo checkout needed on executors).

    python -c "import shutil; shutil.make_archive('/tmp/pkg', 'zip', \
        '<repo>', 'postgres_to_snowflake_data_pipeline_spark')"
    spark-submit --master local[4] --py-files /tmp/pkg.zip \
        tools/submit_job.py [n_events]

Generates a deterministic feed, replays it through the CDC engine, prints
a one-line JSON summary (rows, snapshots, events/sec).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000

    # Under spark-submit the package comes from --py-files; no sys.path
    # surgery here on purpose.
    from pyspark.sql import SparkSession

    from postgres_to_snowflake_data_pipeline_spark.cdc.apply import replay_feed
    from postgres_to_snowflake_data_pipeline_spark.cdc.generator import (
        change_events,
        write_feed,
    )
    from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import TRANSCRIPT_SCHEMA
    from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable

    spark = SparkSession.builder.appName("cdc-submit-demo").getOrCreate()
    work = os.path.join(tempfile.gettempdir(), "submit-demo")
    shutil.rmtree(work, ignore_errors=True)
    feed = os.path.join(work, "feed")
    write_feed(change_events(spark, n_events, n_convs=5_000), feed, n_files=8)

    table = LakeTable.create(
        spark, os.path.join(work, "t"), TRANSCRIPT_SCHEMA,
        key_cols=("conv_id", "turn_idx"), n_buckets=16,
    )
    t0 = time.perf_counter()
    replay_feed(spark, table, feed, epochs=4, compact_every=0)
    rows = table.read().count()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "submitted_via": "spark-submit --py-files",
        "n_events": n_events,
        "final_rows": rows,
        "snapshots": len(table.snapshots()),
        "events_per_sec": round(n_events / dt, 1),
    }))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
