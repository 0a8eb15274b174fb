"""Re-bucketing: rewrite into a new bucket count with CDC continuity.

Invariants: byte-equal state (including tombstone semantics), pruning
model intact under the new N, and the exactly-once commit-key state
carried over so the stream resumes against the new root — replayed
epochs skip, new epochs apply.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_to_snowflake_data_pipeline_spark.cdc.apply import apply_batch, replay_feed
from postgres_to_snowflake_data_pipeline_spark.cdc.generator import change_events, write_feed
from postgres_to_snowflake_data_pipeline_spark.cdc.oracle import assert_matches_oracle
from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import TRANSCRIPT_SCHEMA
from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable

PAYLOAD = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def test_rebucket_preserves_state_and_resumes_cdc(spark, tmp_path):
    src = LakeTable.create(
        spark, str(tmp_path / "small"), TRANSCRIPT_SCHEMA,
        ("conv_id", "turn_idx"), n_buckets=4,
    )
    ev = change_events(spark, 6000, n_convs=250).localCheckpoint()
    feed = str(tmp_path / "feed")
    write_feed(ev, feed, n_files=6)
    replay_feed(spark, src, feed, epochs=3, compact_every=0)

    dst = LakeTable.rebucket(spark, src, str(tmp_path / "big"), n_buckets=16)

    # state identical (payload-level), under the new layout
    a = src.read().select(*PAYLOAD)
    b = dst.read().select(*PAYLOAD)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    assert dst.current().n_buckets == 16
    assert len(dst.current().files) <= 16

    # pruning model intact: point lookup under the new N
    some = src.read().select("conv_id").first()["conv_id"]
    assert dst.read_key(some).count() == src.read_key(some).count()

    # exactly-once carried: a replayed old epoch is a no-op on the NEW table
    res = apply_batch(spark, dst, ev, epoch=1)
    assert res.skipped
    # a genuinely new epoch applies, and the final state matches the oracle
    late = ev.limit(300).withColumn("lsn", F.col("lsn") + 50_000_000)
    res2 = apply_batch(spark, dst, late, epoch=3)
    assert not res2.skipped
    assert_matches_oracle(dst.read(), ev.unionByName(late), PAYLOAD)


def test_rebucket_keeps_tombstones_authoritative(spark, tmp_path):
    """A late LOWER-LSN update for a key deleted before the rebucket must
    stay dead on the new table (tombstone rows carried with their LSNs)."""
    import datetime as dt

    TS = dt.datetime(2026, 1, 1)
    schema = ("lsn long, op string, conv_id string, turn_idx int, role string, "
              "text string, tool string, ts timestamp")
    src = LakeTable.create(
        spark, str(tmp_path / "s"), TRANSCRIPT_SCHEMA,
        ("conv_id", "turn_idx"), n_buckets=2,
    )
    apply_batch(spark, src, spark.createDataFrame(
        [(1, "insert", "cA", 0, "user", "hello", None, TS),
         (5, "delete", "cA", 0, None, None, None, TS),
         (2, "insert", "cB", 0, "user", "alive", None, TS)], schema), epoch=0)

    dst = LakeTable.rebucket(spark, src, str(tmp_path / "d"), n_buckets=8)
    assert dst.read().count() == 1  # only cB

    # the straggler: lsn 3 < the delete's lsn 5 — must NOT resurrect cA
    apply_batch(spark, dst, spark.createDataFrame(
        [(3, "update", "cA", 0, "user", "zombie", None, TS)], schema), epoch=1)
    rows = {r["conv_id"] for r in dst.read().collect()}
    assert rows == {"cB"}
