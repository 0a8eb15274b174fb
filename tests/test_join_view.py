"""IncrementalJoinView: dirty-join-key maintenance of a fact⋈dim view.

Invariant: after any interleaving of (fact epochs, dim merges, refresh),
``view.read()`` equals the join recomputed from scratch over both sources'
current state — including dim-delete fan-out under how='inner' — and a
replayed refresh is an exactly-once no-op. The refresh must read only the
buckets the dirty join keys hash into on BOTH sides (pinned via the
refresh stats' file lists).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from postgres_to_snowflake_data_pipeline_spark.cdc.apply import apply_batch
from postgres_to_snowflake_data_pipeline_spark.cdc.generator import change_events
from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import TRANSCRIPT_SCHEMA
from postgres_to_snowflake_data_pipeline_spark.lake.join_view import (
    IncrementalJoinView,
)
from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable

DIM_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("source_db", T.StringType(), True),
        T.StructField("priority", T.IntegerType(), True),
    ]
)


@pytest.fixture()
def fact(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "fact"), TRANSCRIPT_SCHEMA,
        key_cols=("conv_id", "turn_idx"), n_buckets=8,
    )


@pytest.fixture()
def dim(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "dim"), DIM_SCHEMA,
        key_cols=("conv_id",), n_buckets=4,
    )


def _dim_rows(spark, rows, lsn, deleted=False):
    """rows: [(conv_id, source_db, priority)] -> LWW winners frame."""
    return (
        spark.createDataFrame(
            rows, "conv_id string, source_db string, priority int"
        )
        .withColumn("_lsn", F.lit(lsn).cast("long"))
        .withColumn("_deleted", F.lit(deleted))
    )


def _mk_view(spark, tmp_path, fact, dim, how="inner"):
    return IncrementalJoinView(
        spark, str(tmp_path / f"view_{how}"), fact, dim,
        on_cols=("conv_id",), how=how, n_buckets=4,
    )


def _assert_exact(view, fact, dim, how="inner"):
    got = view.read()
    want = fact.read().join(dim.read(), on=["conv_id"], how=how)
    # align column order to the view schema
    want = want.select(*got.columns)
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


def _convs(df):
    return [r["conv_id"] for r in df.select("conv_id").distinct().collect()]


def test_incremental_equals_full_join_across_epochs(spark, tmp_path, fact, dim):
    ev = change_events(spark, 4000, n_convs=200).localCheckpoint()
    view = _mk_view(spark, tmp_path, fact, dim)
    convs = sorted(_convs(ev))
    # dim rows for 2/3 of the convs (inner join drops the rest)
    dim.merge(_dim_rows(
        spark, [(c, f"db{i % 3}", i % 7) for i, c in enumerate(convs)
                if i % 3 != 2], lsn=1,
    ))
    lo, hi = ev.select(F.min("lsn"), F.max("lsn")).first()
    step = (hi - lo + 1) // 3 + 1
    for e in range(3):
        batch = ev.filter(
            (F.col("lsn") >= lo + e * step) & (F.col("lsn") < lo + (e + 1) * step)
        )
        apply_batch(spark, fact, batch, epoch=e)
        stats = view.refresh()
        assert stats is not None
        _assert_exact(view, fact, dim)
    # dim-side change alone must also propagate
    dim.merge(_dim_rows(spark, [(convs[0], "dbX", 99)], lsn=2))
    stats = view.refresh()
    assert stats is not None and stats["full_rebuild"] is False
    _assert_exact(view, fact, dim)
    got = view.read().filter(F.col("conv_id") == convs[0])
    assert not got.isEmpty()
    assert got.select("source_db").distinct().first()[0] == "dbX"


def test_refresh_is_idempotent_and_resumable(spark, tmp_path, fact, dim):
    ev = change_events(spark, 1500, n_convs=80).localCheckpoint()
    apply_batch(spark, fact, ev, epoch=0)
    dim.merge(_dim_rows(
        spark, [(c, "db0", 1) for c in _convs(ev)], lsn=1,
    ))
    view = _mk_view(spark, tmp_path, fact, dim)
    s1 = view.refresh()
    assert s1 is not None
    assert view.refresh() is None  # already current
    # a NEW handle recovers both positions from the view's own commit log
    view2 = _mk_view(spark, tmp_path, fact, dim)
    assert view2.last_positions() == (
        s1["left_snapshot"], s1["right_snapshot"],
    )
    assert view2.refresh() is None
    _assert_exact(view2, fact, dim)
    # watermark idempotency: refreshes never grow the residual key list
    assert view2._table.current().commit_keys == []


def test_dim_delete_fans_out_under_inner(spark, tmp_path, fact, dim):
    rows = [(i, "insert", f"c{k}", t, "user", f"txt {k}/{t}", None)
            for i, (k, t) in enumerate(
                [(k, t) for k in range(5) for t in range(4)], start=1)]
    df = spark.createDataFrame(
        rows, "lsn long, op string, conv_id string, turn_idx int, "
              "role string, text string, tool string"
    ).withColumn("ts", F.to_timestamp(F.lit("2026-01-01 00:00:00")))
    apply_batch(spark, fact, df, epoch=0)
    dim.merge(_dim_rows(spark, [(f"c{k}", "db0", k) for k in range(5)], lsn=1))
    view = _mk_view(spark, tmp_path, fact, dim)
    view.refresh()
    assert view.read().count() == 20
    # dim delete of c2 -> ALL 4 fact rows of c2 leave the view
    dim.merge(_dim_rows(spark, [("c2", None, None)], lsn=2, deleted=True))
    stats = view.refresh()
    assert stats is not None and stats["full_rebuild"] is False
    _assert_exact(view, fact, dim)
    assert view.read().filter("conv_id = 'c2'").isEmpty()
    assert view.read().count() == 16
    # fact delete of one turn -> exactly that row leaves
    dels = df.filter("conv_id = 'c1' and turn_idx = 0").withColumn(
        "lsn", F.col("lsn") + 1000
    ).withColumn("op", F.lit("delete"))
    apply_batch(spark, fact, dels, epoch=1)
    view.refresh()
    _assert_exact(view, fact, dim)
    assert view.read().count() == 15


def test_left_join_keeps_unmatched_facts(spark, tmp_path, fact, dim):
    ev = change_events(spark, 1200, n_convs=60).localCheckpoint()
    apply_batch(spark, fact, ev, epoch=0)
    convs = sorted(_convs(ev))
    dim.merge(_dim_rows(
        spark, [(c, "db0", 1) for c in convs[: len(convs) // 2]], lsn=1,
    ))
    view = _mk_view(spark, tmp_path, fact, dim, how="left")
    view.refresh()
    _assert_exact(view, fact, dim, how="left")
    unmatched = view.read().filter(F.col("source_db").isNull())
    assert not unmatched.isEmpty()
    # dim delete under how='left' NULLs the dim columns, keeps the facts
    n_before = view.read().count()
    victim = convs[0]
    dim.merge(_dim_rows(spark, [(victim, None, None)], lsn=2, deleted=True))
    view.refresh()
    _assert_exact(view, fact, dim, how="left")
    assert view.read().count() == n_before
    got = view.read().filter(F.col("conv_id") == victim)
    assert got.filter(F.col("source_db").isNotNull()).isEmpty()


def test_refresh_prunes_to_dirty_buckets(spark, tmp_path, fact, dim):
    """A one-conversation delta must open only that conv's bucket files on
    each side, not the table."""
    ev = change_events(spark, 3000, n_convs=150).localCheckpoint()
    apply_batch(spark, fact, ev, epoch=0)
    convs = sorted(_convs(ev))
    dim.merge(_dim_rows(
        spark, [(c, "db0", 1) for c in convs], lsn=1,
    ))
    view = _mk_view(spark, tmp_path, fact, dim)
    view.refresh()
    # single-conv update on the fact side
    one = ev.filter(F.col("conv_id") == convs[0]).limit(1).withColumn(
        "lsn", F.col("lsn") + 10_000
    ).withColumn("text", F.lit("updated"))
    apply_batch(spark, fact, one, epoch=1)
    stats = view.refresh()
    assert stats is not None and stats["dirty_keys"] == 1
    l_all = fact.read().inputFiles()
    r_all = dim.read().inputFiles()
    assert 0 < len(stats["left_files_read"]) < len(l_all)
    assert 0 < len(stats["right_files_read"]) < len(r_all)
    _assert_exact(view, fact, dim)


def test_expired_history_and_rollback_trigger_full_rebuild(
    spark, tmp_path, fact, dim
):
    ev = change_events(spark, 2400, n_convs=120).localCheckpoint()
    apply_batch(spark, fact, ev.filter(F.col("lsn") % 3 == 0), epoch=0)
    dim.merge(_dim_rows(
        spark, [(c, "db0", 1) for c in _convs(ev)], lsn=1,
    ))
    view = _mk_view(spark, tmp_path, fact, dim)
    view.refresh()
    apply_batch(spark, fact, ev.filter(F.col("lsn") % 3 == 1), epoch=1)
    apply_batch(spark, fact, ev.filter(F.col("lsn") % 3 == 2), epoch=2)
    fact.expire_snapshots(keep_last=1, orphan_grace_seconds=0)
    stats = view.refresh()
    assert stats is not None and stats["full_rebuild"] is True
    _assert_exact(view, fact, dim)
    # a dim-side rollback rewinds state: the next refresh must rebuild,
    # not consume a changefeed that spans the rewind
    dim.merge(_dim_rows(spark, [(_convs(ev)[0], "dbZ", 9)], lsn=2))
    view.refresh()
    dim.rollback_to(snapshot_id=stats["right_snapshot"])
    stats2 = view.refresh()
    assert stats2 is not None and stats2["full_rebuild"] is True
    _assert_exact(view, fact, dim)


def test_key_contract_is_validated(spark, tmp_path, fact, dim):
    # join key must be a subset of the left key
    bad_dim = LakeTable.create(
        spark, str(tmp_path / "baddim"),
        T.StructType([
            T.StructField("role", T.StringType(), False),
            T.StructField("rank", T.IntegerType(), True),
        ]),
        key_cols=("role",), n_buckets=2,
    )
    with pytest.raises(ValueError, match="subset of the left key"):
        IncrementalJoinView(
            spark, str(tmp_path / "v1"), fact, bad_dim, on_cols=("role",),
        )
    # right key must equal the join key exactly
    with pytest.raises(ValueError, match="must equal on_cols"):
        IncrementalJoinView(
            spark, str(tmp_path / "v2"), fact, fact, on_cols=("conv_id",),
        )
    # payload name collisions fail loudly
    twin = LakeTable.create(
        spark, str(tmp_path / "twin"),
        T.StructType([
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("role", T.StringType(), True),
        ]),
        key_cols=("conv_id",), n_buckets=2,
    )
    with pytest.raises(ValueError, match="collision"):
        IncrementalJoinView(
            spark, str(tmp_path / "v3"), fact, twin, on_cols=("conv_id",),
        )
    with pytest.raises(ValueError, match="how must be"):
        IncrementalJoinView(
            spark, str(tmp_path / "v4"), fact, dim, on_cols=("conv_id",),
            how="full",
        )
