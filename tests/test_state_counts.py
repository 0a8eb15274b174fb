"""state_counts(): live/tombstone key counts answered from MANIFEST STATS
alone wherever sound — folded (single lww_group base) buckets and
single-delta buckets count as ``sum(rows) - sum(del_rows)`` with no data
files opened; anything else (stacked deltas, mixed passes, patch tables)
falls back to one bucket-pruned Spark read. The ``via`` map pins which
path answered each bucket, so these tests assert BOTH the values (equal
to a real read) and the read amplification (stats vs scan)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from postgres_to_snowflake_data_pipeline_spark.cdc.apply import apply_batch
from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import TRANSCRIPT_SCHEMA
from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable

SCHEMA = ("lsn long, op string, conv_id string, turn_idx int, role string, "
          "text string, tool string, ts timestamp")
D0 = dt.datetime(2026, 1, 1)


def _mk_table(spark, path, n_buckets=2, props=None):
    return LakeTable.create(
        spark, str(path), TRANSCRIPT_SCHEMA, ("conv_id", "turn_idx"),
        n_buckets=n_buckets, props=props,
    )


def _rows(n, lsn0=0, n_convs=20, delete_every=None):
    out = []
    for j in range(n):
        op = (
            "delete"
            if delete_every is not None and j % delete_every == 0
            else "insert"
        )
        dead = op == "delete"
        out.append((
            lsn0 + j, op, f"c{j % n_convs:03d}", (lsn0 + j) // n_convs,
            None if dead else "user", None if dead else f"txt {lsn0 + j}",
            None, D0 + dt.timedelta(hours=j % 48),
        ))
    return out


def _truth(table):
    """(live, deleted) from a real read — the values the stats path must
    reproduce exactly."""
    df = table.read(include_internal=True, include_tombstones=True)
    r = df.agg(
        F.sum(F.col("_deleted").cast("long")).alias("d"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    return int(r["n"]) - int(r["d"]), int(r["d"])


def test_single_delta_bucket_answers_from_stats(spark, tmp_path):
    table = _mk_table(spark, tmp_path / "t")
    apply_batch(
        spark, table,
        spark.createDataFrame(_rows(120, delete_every=7), SCHEMA), epoch=0,
    )
    sc = table.state_counts()
    live, dead = _truth(table)
    assert (sc["live"], sc["deleted"]) == (live, dead)
    assert sc["scanned_buckets"] == 0, sc  # one delta file per bucket
    assert sc["stats_buckets"] >= 1
    # the stat itself rides every manifest entry of the commit
    for fs in table.current().files.values():
        for e in fs:
            assert e["del_rows"] >= 0
            assert e["del_rows"] <= e["rows"]


def test_stacked_deltas_fall_back_to_scan(spark, tmp_path):
    table = _mk_table(spark, tmp_path / "t")
    apply_batch(
        spark, table,
        spark.createDataFrame(_rows(120, delete_every=7), SCHEMA), epoch=0,
    )
    # second batch overwrites some keys and deletes others: per-key row
    # uniqueness is gone, sum(rows - del_rows) would DOUBLE-count
    apply_batch(
        spark, table,
        spark.createDataFrame(_rows(60, lsn0=120, delete_every=5), SCHEMA),
        epoch=1,
    )
    sc = table.state_counts()
    live, dead = _truth(table)
    assert (sc["live"], sc["deleted"]) == (live, dead)
    assert sc["scanned_buckets"] >= 1, sc


def test_compaction_restores_the_stats_path(spark, tmp_path):
    table = _mk_table(spark, tmp_path / "t")
    apply_batch(
        spark, table,
        spark.createDataFrame(_rows(120, delete_every=7), SCHEMA), epoch=0,
    )
    apply_batch(
        spark, table,
        spark.createDataFrame(_rows(60, lsn0=120, delete_every=5), SCHEMA),
        epoch=1,
    )
    before = _truth(table)
    table.compact()
    sc = table.state_counts()
    assert (sc["live"], sc["deleted"]) == before
    assert sc["scanned_buckets"] == 0, sc


def test_sliced_compaction_counts_as_one_pass(spark, tmp_path):
    # ts-sliced layout: several base files per bucket, ONE lww_group —
    # slices are key-disjoint, so the stats path stays sound
    table = _mk_table(spark, tmp_path / "t")
    apply_batch(
        spark, table,
        spark.createDataFrame(_rows(200, delete_every=9), SCHEMA), epoch=0,
    )
    table.compact(ts_slices=4)
    sc = table.state_counts()
    live, dead = _truth(table)
    assert (sc["live"], sc["deleted"]) == (live, dead)
    assert sc["scanned_buckets"] == 0, sc
    assert any(
        len(fs) > 1 for fs in table.current().files.values()
    ), "fixture too small to exercise multi-file buckets"


def test_mixed_clean_and_dirty_buckets_split_paths(spark, tmp_path):
    table = _mk_table(spark, tmp_path / "t", n_buckets=4)
    apply_batch(
        spark, table,
        spark.createDataFrame(_rows(200, delete_every=9), SCHEMA), epoch=0,
    )
    table.compact()
    # a delta touching ONE conversation dirties only its hash bucket
    apply_batch(
        spark, table,
        spark.createDataFrame(
            [(500, "insert", "c003", 0, "user", "late", None, D0)], SCHEMA
        ),
        epoch=1,
    )
    sc = table.state_counts()
    live, dead = _truth(table)
    assert (sc["live"], sc["deleted"]) == (live, dead)
    assert sc["scanned_buckets"] == 1, sc
    assert sc["stats_buckets"] == 3, sc


def test_patch_tables_always_scan(spark, tmp_path):
    # per-column patch resolution can merge several storage rows into one
    # key — rows-minus-tombstones is not the state, so every bucket scans
    table = _mk_table(
        spark, tmp_path / "t", props={"patch.columns": ["text", "tool"]}
    )
    apply_batch(
        spark, table,
        spark.createDataFrame(_rows(60, delete_every=11), SCHEMA), epoch=0,
    )
    sc = table.state_counts()
    live, dead = _truth(table)
    assert (sc["live"], sc["deleted"]) == (live, dead)
    assert sc["stats_buckets"] == 0, sc


def test_time_travel_counts_pinned_snapshot(spark, tmp_path):
    table = _mk_table(spark, tmp_path / "t")
    apply_batch(
        spark, table,
        spark.createDataFrame(_rows(100, delete_every=7), SCHEMA), epoch=0,
    )
    sid = table.current().snapshot_id
    want = table.state_counts()["live"]
    apply_batch(
        spark, table,
        spark.createDataFrame(_rows(50, lsn0=100, delete_every=3), SCHEMA),
        epoch=1,
    )
    assert table.state_counts(snapshot_id=sid)["live"] == want
    assert table.state_counts()["live"] != want
