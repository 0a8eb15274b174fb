"""Multi-table CDC routing (the reference's five-table replication scope)."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_to_snowflake_data_pipeline_spark.cdc.generator import change_events
from postgres_to_snowflake_data_pipeline_spark.cdc.multi import (
    apply_multi_table,
    snapshot_for_epoch,
)
from postgres_to_snowflake_data_pipeline_spark.cdc.oracle import assert_matches_oracle
from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import TRANSCRIPT_SCHEMA
from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable

PAYLOAD = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _tagged_feed(spark, n):
    """Deterministically route events to tables a/b (plus some to an
    unknown table the router must tolerate)."""
    ev = change_events(spark, n, n_convs=100)
    tag = F.when(F.abs(F.xxhash64("lsn")) % 10 < 4, "ta").when(
        F.abs(F.xxhash64("lsn")) % 10 < 8, "tb"
    ).otherwise("unknown")
    return ev.withColumn("_table", tag)


def test_routing_matches_per_table_oracle(spark, tmp_path):
    feed = _tagged_feed(spark, 4000)
    tables = {
        name: LakeTable.create(
            spark, str(tmp_path / name), TRANSCRIPT_SCHEMA, ("conv_id", "turn_idx"), n_buckets=4
        )
        for name in ("ta", "tb")
    }
    res = apply_multi_table(spark, tables, feed, epoch=0)
    assert set(res) == {"ta", "tb"} and not any(r.skipped for r in res.values())
    for name, table in tables.items():
        expected = feed.filter(F.col("_table") == name).drop("_table")
        assert_matches_oracle(table.read(), expected, PAYLOAD)
    # unknown-table rows were tolerated AND counted (ON_ERROR='CONTINUE'
    # with a load report, not a silent drop)
    assert res.unknown_rows == feed.filter("_table = 'unknown'").count() > 0


def test_per_table_idempotency_and_epoch_pinning(spark, tmp_path):
    feed = _tagged_feed(spark, 2000)
    tables = {
        name: LakeTable.create(
            spark, str(tmp_path / name), TRANSCRIPT_SCHEMA, ("conv_id", "turn_idx"), n_buckets=4
        )
        for name in ("ta", "tb")
    }
    apply_multi_table(spark, tables, feed, epoch=0)
    # simulate: table 'tb' crashed before its epoch-1 commit, 'ta' committed
    feed2 = _tagged_feed(spark, 1000)
    from postgres_to_snowflake_data_pipeline_spark.cdc.apply import apply_batch

    apply_batch(spark, tables["ta"], feed2.filter("_table='ta'").drop("_table"), epoch=1)
    # full epoch-1 replay: 'ta' skips, 'tb' applies
    res = apply_multi_table(spark, tables, feed2, epoch=1)
    assert res["ta"].skipped and not res["tb"].skipped
    # cross-table-consistent view as of epoch 0
    for name, table in tables.items():
        sid = snapshot_for_epoch(table, 0)
        assert sid is not None
        assert table.read(snapshot_id=sid).count() > 0


def test_frontier_never_observes_torn_epoch(spark, tmp_path):
    """Crash between table A's epoch-1 commit and table B's: the 'current'
    lake state is torn (A at 1, B at 0), but the latest frontier marker
    still pins epoch 0 — a frontier reader never sees the torn window.
    After the replay completes the epoch, the frontier advances and both
    tables' pinned reads include epoch 1."""
    from postgres_to_snowflake_data_pipeline_spark.cdc.apply import apply_batch
    from postgres_to_snowflake_data_pipeline_spark.cdc.multi import (
        latest_frontier,
        read_at_frontier,
    )

    froot = str(tmp_path / "_frontier")
    tables = {
        name: LakeTable.create(
            spark, str(tmp_path / name), TRANSCRIPT_SCHEMA,
            ("conv_id", "turn_idx"), n_buckets=4,
        )
        for name in ("ta", "tb")
    }
    feed0, feed1 = _tagged_feed(spark, 2000), _tagged_feed(spark, 1000)
    apply_multi_table(spark, tables, feed0, epoch=0, frontier_root=froot)
    f0 = latest_frontier(froot)
    assert f0 is not None and f0.epoch == 0
    counts0 = {n: df.count() for n, df in read_at_frontier(tables, f0).items()}

    # "crash": ta commits epoch 1, tb does not, no marker written
    apply_batch(spark, tables["ta"], feed1.filter("_table='ta'").drop("_table"), epoch=1)
    assert tables["ta"].current().summary.get("epoch") == 1  # current IS torn
    f_mid = latest_frontier(froot)
    assert f_mid.epoch == 0 and f_mid == f0
    mid = {n: df.count() for n, df in read_at_frontier(tables, f_mid).items()}
    assert mid == counts0  # pinned read: exactly the epoch-0 state, no tear

    # replay the full epoch: ta skips (exactly-once), tb applies, marker
    # now appears with BOTH tables' epoch-1 snapshots
    res = apply_multi_table(spark, tables, feed1, epoch=1, frontier_root=froot)
    assert res["ta"].skipped and not res["tb"].skipped
    f1 = latest_frontier(froot)
    assert f1.epoch == 1
    pinned = read_at_frontier(tables, f1)
    for name, table in tables.items():
        both = feed0.union(feed1).filter(F.col("_table") == name).drop("_table")
        assert_matches_oracle(pinned[name], both, PAYLOAD)


def test_null_table_tag_is_counted_not_silently_dropped(spark, tmp_path):
    """A NULL _table must land in unknown_rows — ~isin() alone evaluates
    to NULL for NULL tags and filter() would silently drop them."""
    ev = change_events(spark, 500, n_convs=40)
    feed = ev.withColumn(
        "_table",
        F.when(F.col("lsn") % 3 == 0, F.lit(None).cast("string")).otherwise("ta"),
    )
    tables = {
        "ta": LakeTable.create(
            spark, str(tmp_path / "ta"), TRANSCRIPT_SCHEMA,
            ("conv_id", "turn_idx"), n_buckets=4,
        )
    }
    res = apply_multi_table(spark, tables, feed, epoch=0)
    n_null = feed.filter("_table IS NULL").count()
    assert n_null > 0
    assert res.unknown_rows == n_null
