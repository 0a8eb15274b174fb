"""Concurrent snapshot-isolation probe for the soak: a SEPARATE process
(own JVM) that samples the table while writers, compaction, and retention
churn, asserting every successfully-read snapshot is a committed,
LWW-consistent state:

- no duplicate live keys (LWW resolution left exactly one winner);
- every row's text embeds its OWN stored ``_lsn`` (the generator writes
  ``... @lsn={lsn}``), so a read mixing file sets from different commits
  — a torn read — shows up as a text/_lsn disagreement or a dup key;
- observed snapshot ids are non-decreasing (no time-travel-backwards
  anomalies from the advisory ``_current`` hint).

A sample that FAILS to read (snapshot expired between pin and scan) is
retried once on a fresh snapshot and counted as a ``gc_race`` — that is
the documented retention contract (readers must stay within the
retention horizon), not a consistency violation. A sample that reads
successfully but violates an invariant is a hard failure.

    python tools/soak_reader.py <table_root> <stop_file> <out_jsonl>
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    root, stop_file, out_path = sys.argv[1], sys.argv[2], sys.argv[3]

    from pyspark.sql import functions as F

    from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable
    from postgres_to_snowflake_data_pipeline_spark.session import get_spark

    spark = get_spark("soak-reader", master="local[4]", shuffle_partitions=8)
    table = LakeTable(spark, root)
    pat = r"^turn text conv-\d{8}/\d+ @lsn=(\d+)$"
    last_sid = -1

    def sample() -> dict:
        sid = table.log.current_id()
        if sid is None:
            return {"skip": True}
        df = table.read(snapshot_id=sid, include_internal=True)
        n = df.count()
        dups = (
            df.groupBy("conv_id", "turn_idx").count().filter("count > 1").count()
        )
        bad_text = df.filter(
            ~F.col("text").rlike(pat)
            | (F.regexp_extract("text", pat, 1).cast("long") != F.col("_lsn"))
        ).count()
        return {"sid": sid, "rows": n, "dup_keys": dups, "bad_text": bad_text}

    with open(out_path, "w") as out:
        while not os.path.exists(stop_file):
            rec: dict
            try:
                rec = sample()
            except Exception:
                # pinned snapshot may have been expired mid-read: one retry
                # on a fresh pin; only a repeat failure is reported as error
                try:
                    rec = dict(sample(), gc_race=True)
                except Exception as exc:  # noqa: BLE001 - recorded, gated
                    rec = {"error": type(exc).__name__}
            if not rec.get("skip"):
                if "sid" in rec:
                    rec["monotonic"] = rec["sid"] >= last_sid
                    last_sid = max(last_sid, rec["sid"])
                out.write(json.dumps(rec) + "\n")
                out.flush()
            time.sleep(1.0)
    spark.stop()


if __name__ == "__main__":
    main()
