"""LakeTable.history(): SCD2 version intervals from the retained changefeed.

Semantics: one row per key version (batch-collapsed per merge commit),
half-open LSN validity, deletes close their predecessor but emit no row,
`is_current` marks open intervals. Guards: rejected on partial-update
tables and when snapshot expiry truncated the changefeed.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from postgres_to_snowflake_data_pipeline_spark.cdc.apply import apply_batch
from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import (
    CHANGE_EVENT_SCHEMA,
    TRANSCRIPT_SCHEMA,
)
from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable

TS = dt.datetime(2026, 1, 1)


@pytest.fixture()
def table(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        key_cols=("conv_id", "turn_idx"), n_buckets=4,
    )


def _feed(spark, rows):
    return spark.createDataFrame(
        [(l, o, c, t, r, x, None, TS) for (l, o, c, t, r, x) in rows],
        CHANGE_EVENT_SCHEMA,
    )


def _hist(table):
    return {
        (r["conv_id"], r["turn_idx"], r["valid_from_lsn"]):
            (r["text"], r["valid_to_lsn"], r["is_current"])
        for r in table.history().collect()
    }


def test_versions_intervals_and_delete_closure(spark, table):
    # epoch 0: a created, b created; epoch 1: a updated, b deleted;
    # epoch 2: a updated again, b re-created
    apply_batch(spark, table, _feed(spark, [
        (1, "insert", "a", 0, "u", "a-v1"),
        (2, "insert", "b", 0, "u", "b-v1"),
    ]), epoch=0)
    apply_batch(spark, table, _feed(spark, [
        (3, "update", "a", 0, "u", "a-v2"),
        (4, "delete", "b", 0, None, None),
    ]), epoch=1)
    apply_batch(spark, table, _feed(spark, [
        (5, "update", "a", 0, "u", "a-v3"),
        (6, "insert", "b", 0, "u", "b-v2"),
    ]), epoch=2)
    assert _hist(table) == {
        ("a", 0, 1): ("a-v1", 3, False),
        ("a", 0, 3): ("a-v2", 5, False),
        ("a", 0, 5): ("a-v3", None, True),
        ("b", 0, 2): ("b-v1", 4, False),   # closed by the delete at lsn 4
        ("b", 0, 6): ("b-v2", None, True),
    }
    # a currently-deleted key has no open version
    apply_batch(spark, table, _feed(spark, [
        (7, "delete", "b", 0, None, None),
    ]), epoch=3)
    h = _hist(table)
    assert h[("b", 0, 6)] == ("b-v2", 7, False)
    assert not any(k[0] == "b" and v[2] for k, v in h.items())


def test_batch_collapse_one_version_per_commit(spark, table):
    # three in-batch updates collapse to ONE version at the winner's lsn
    apply_batch(spark, table, _feed(spark, [
        (1, "insert", "a", 0, "u", "x1"),
        (2, "update", "a", 0, "u", "x2"),
        (3, "update", "a", 0, "u", "x3"),
    ]), epoch=0)
    assert _hist(table) == {("a", 0, 3): ("x3", None, True)}


def test_history_survives_compaction(spark, table):
    apply_batch(spark, table, _feed(spark, [
        (1, "insert", "a", 0, "u", "v1"),
    ]), epoch=0)
    apply_batch(spark, table, _feed(spark, [
        (2, "update", "a", 0, "u", "v2"),
    ]), epoch=1)
    before = _hist(table)
    table.compact()
    assert _hist(table) == before == {
        ("a", 0, 1): ("v1", 2, False),
        ("a", 0, 2): ("v2", None, True),
    }


def test_history_plan_is_single_exchange(spark, table):
    import re

    from postgres_to_snowflake_data_pipeline_spark.plans.inspect import explain_str

    def n_exchanges(df):
        return len(re.findall(
            r"Exchange (?:hash|range|RoundRobin|Single)", explain_str(df, "simple")
        ))

    apply_batch(spark, table, _feed(spark, [
        (1, "insert", "a", 0, "u", "v1"),
    ]), epoch=0)
    apply_batch(spark, table, _feed(spark, [
        (2, "update", "a", 0, "u", "v2"),
    ]), epoch=1)
    # the (key,lsn) dedup and the lead() window both ride the ONE
    # key-hash repartition (clustering-subset reuse)
    assert n_exchanges(table.history()) == 1


def test_history_rejects_patch_tables_and_expired_feeds(spark, tmp_path):
    pt = LakeTable.create(
        spark, str(tmp_path / "p"), TRANSCRIPT_SCHEMA,
        key_cols=("conv_id", "turn_idx"), n_buckets=4,
        props={"patch.columns": ["text"]},
    )
    with pytest.raises(ValueError, match="partial-update"):
        pt.history()

    t = LakeTable.create(
        spark, str(tmp_path / "e"), TRANSCRIPT_SCHEMA,
        key_cols=("conv_id", "turn_idx"), n_buckets=4,
    )
    for e in range(3):
        apply_batch(spark, t, _feed(spark, [
            (e + 1, "insert", "a", 0, "u", f"v{e}"),
        ]), epoch=e)
    t.expire_snapshots(keep_last=1, orphan_grace_seconds=0)
    if t.snapshots()[0].snapshot_id > 1:
        with pytest.raises(ValueError, match="expired"):
            t.history()
