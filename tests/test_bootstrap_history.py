"""Consistent-snapshot bootstrap (initial load -> CDC handoff at an LSN
floor) and the per-key version-history audit."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from postgres_to_snowflake_data_pipeline_spark.cdc.apply import apply_batch, bootstrap_snapshot
from postgres_to_snowflake_data_pipeline_spark.cdc.generator import change_events
from postgres_to_snowflake_data_pipeline_spark.cdc.oracle import assert_matches_oracle
from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import TRANSCRIPT_SCHEMA
from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable

PAYLOAD = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
TS = dt.datetime(2026, 1, 1)


def _mk_table(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        key_cols=("conv_id", "turn_idx"), n_buckets=8,
    )


def _state_rows(spark, n):
    rows = [(f"c{k}", 0, "user", f"snapshot text {k}", None, TS) for k in range(n)]
    return spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)


def test_bootstrap_then_cdc_handoff(spark, tmp_path):
    """Feed events above the floor override bootstrap rows; stale events at
    or below the floor never do (the snapshot already reflects them)."""
    table = _mk_table(spark, tmp_path)
    res = bootstrap_snapshot(spark, table, _state_rows(spark, 50), lsn_floor=1000)
    assert not res.skipped and res.rows_in == 50 and res.rows_deduped == 50
    assert table.read().count() == 50

    feed = spark.createDataFrame(
        [
            # live: above the floor — must override / delete / insert
            (1001, "update", "c1", 0, "user", "post-snap text", None, TS),
            (1002, "delete", "c2", 0, None, None, None, TS),
            (1003, "insert", "c999", 0, "user", "brand new", None, TS),
            # stale: a re-emitted pre-snapshot WAL prefix — must be ignored
            (999, "update", "c3", 0, "user", "STALE must not appear", None, TS),
            (998, "delete", "c4", 0, None, None, None, TS),
        ],
        "lsn long, op string, conv_id string, turn_idx int, role string, "
        "text string, tool string, ts timestamp",
    )
    apply_batch(spark, table, feed, epoch=0)
    state = {r["conv_id"]: r for r in table.read().collect()}
    assert state["c1"]["text"] == "post-snap text"
    assert "c2" not in state                      # live delete applied
    assert state["c999"]["text"] == "brand new"
    assert state["c3"]["text"] == "snapshot text 3"   # stale update ignored
    assert "c4" in state                          # stale delete ignored
    assert len(state) == 50  # 50 - c2 + c999


def test_bootstrap_is_idempotent(spark, tmp_path):
    table = _mk_table(spark, tmp_path)
    bootstrap_snapshot(spark, table, _state_rows(spark, 20), lsn_floor=500)
    n = table.read().count()
    again = bootstrap_snapshot(spark, table, _state_rows(spark, 20), lsn_floor=500)
    assert again.skipped and table.read().count() == n
    assert table.current().commit_count == 1


def test_bootstrap_plus_feed_matches_oracle(spark, tmp_path):
    """Full equivalence: bootstrap(state, floor) + feed ≡ replaying the
    state as synthetic events at the floor LSN plus the feed."""
    table = _mk_table(spark, tmp_path)
    state = _state_rows(spark, 30)
    bootstrap_snapshot(spark, table, state, lsn_floor=10_000)
    ev = change_events(spark, 2000, n_convs=40).withColumn(
        "lsn", F.col("lsn") + 10_000
    )
    apply_batch(spark, table, ev, epoch=0)
    as_events = state.select(
        F.lit(10_000).cast("long").alias("lsn"), F.lit("insert").alias("op"), "*"
    )
    assert_matches_oracle(table.read(), as_events.unionByName(ev), PAYLOAD)


def test_key_history_audit(spark, tmp_path):
    """key_history returns every retained version of a conversation with
    its commit ids, in (turn, lsn) order — and only that conversation."""
    table = _mk_table(spark, tmp_path)
    mk = lambda lsn, op, text: (lsn, op, "cX", 0, "user", text, None, TS)
    other = [(i, "insert", f"o{i}", 0, "user", f"noise {i}", None, TS)
             for i in range(100, 110)]
    schema = ("lsn long, op string, conv_id string, turn_idx int, role string, "
              "text string, tool string, ts timestamp")
    apply_batch(spark, table, spark.createDataFrame(
        [mk(1, "insert", "v1")] + other, schema), epoch=0)
    apply_batch(spark, table, spark.createDataFrame(
        [mk(2, "update", "v2")], schema), epoch=1)
    apply_batch(spark, table, spark.createDataFrame(
        [mk(3, "delete", None)], schema), epoch=2)

    hist = table.key_history("cX").collect()
    assert [(r["lsn"], r["op"], r["text"]) for r in hist] == [
        (1, "upsert", "v1"), (2, "upsert", "v2"), (3, "delete", None),
    ]
    assert [r["epoch"] for r in hist] == [0, 1, 2]
    assert len({r["snapshot_id"] for r in hist}) == 3
    # unknown key -> empty, correct schema
    assert table.key_history("nope").isEmpty()
    # compaction folds history away for its buckets; the audit horizon is
    # the retention horizon (documented) — here the current version remains
    table.compact()
    table.expire_snapshots(keep_last=1, orphan_grace_seconds=0)
    remaining = table.key_history("cX").collect()
    assert len(remaining) <= 1


def test_key_history_spans_schema_evolution(spark, tmp_path):
    """Versions written before an additive evolution read back with NULLs
    in the new columns; post-evolution versions carry values."""
    table = _mk_table(spark, tmp_path)
    base = ("lsn long, op string, conv_id string, turn_idx int, role string, "
            "text string, tool string, ts timestamp")
    apply_batch(spark, table, spark.createDataFrame(
        [(1, "insert", "cE", 0, "user", "old", None, TS)], base), epoch=0)
    apply_batch(spark, table, spark.createDataFrame(
        [(2, "update", "cE", 0, "user", "new", None, TS, '{"x":1}', 7)],
        base + ", tool_meta string, latency_ms int"), epoch=1)
    hist = table.key_history("cE").collect()
    assert [r["tool_meta"] for r in hist] == [None, '{"x":1}']
    assert [r["latency_ms"] for r in hist] == [None, 7]
