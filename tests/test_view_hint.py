"""group→bucket inverted hint: non-key-grouped views must prune the
recompute scan to the buckets the dirty groups' rows live in (VERDICT r3
#5) — even for non-decomposable measures (median), where DeltaAggView
cannot help and dirty-group recompute is the only path.

The fixture confines role 'rA' to conv_ids hashing into two specific
source buckets, so an rA-only delta must make the refresh read ONLY those
buckets' files (pinned via the refresh stats' source_files_read)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgres_to_snowflake_data_pipeline_spark.cdc.apply import apply_batch
from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import TRANSCRIPT_SCHEMA
from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable
from postgres_to_snowflake_data_pipeline_spark.lake.view import IncrementalAggView

N_BUCKETS = 8
A_BUCKETS = {0, 1}  # role rA lives only in conv_ids hashing here


def _median_agg(rows):
    return rows.groupBy("role").agg(
        F.expr("percentile(length(text), 0.5)").alias("med_len"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def _mk_view(spark, tmp_path, source):
    return IncrementalAggView(
        spark, str(tmp_path / "view"), source,
        group_cols=("role",), agg_fn=_median_agg, n_buckets=4,
    )


def _assert_exact(view, source):
    got = view.read()
    want = _median_agg(source.read())
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


@pytest.fixture()
def source(spark, tmp_path):
    table = LakeTable.create(
        spark, str(tmp_path / "src"), TRANSCRIPT_SCHEMA,
        key_cols=("conv_id", "turn_idx"), n_buckets=N_BUCKETS,
    )
    # conv ids sorted into role-by-bucket: rA convs hash into A_BUCKETS,
    # rB convs everywhere else — and every bucket gets data
    a_convs, b_convs, b_buckets, i = [], [], set(), 0
    while len(a_convs) < 4 or len(b_buckets) < N_BUCKETS - len(A_BUCKETS):
        c = f"c{i:04d}"
        b = table._bucket_of(c, N_BUCKETS)  # computed ONCE per conv
        if b in A_BUCKETS:
            a_convs.append(c)
        else:
            b_convs.append(c)
            b_buckets.add(b)
        i += 1
    rows = []
    lsn = 0
    for role, convs in (("rA", a_convs[:4]), ("rB", b_convs)):
        for c in convs:
            for t in range(3):
                lsn += 1
                rows.append((lsn, "insert", c, t, role, f"text {c}/{t}", None))
    df = spark.createDataFrame(
        rows, "lsn long, op string, conv_id string, turn_idx int, "
              "role string, text string, tool string"
    ).withColumn("ts", F.to_timestamp(F.lit("2026-01-01 00:00:00")))
    apply_batch(spark, table, df, epoch=0)
    return table, a_convs[:4], lsn


def test_nonkey_median_refresh_reads_only_hinted_buckets(
    spark, tmp_path, source
):
    table, a_convs, lsn = source
    view = _mk_view(spark, tmp_path, table)
    s1 = view.refresh()  # bootstrap: hint built, everything dirty
    assert s1 is not None
    _assert_exact(view, table)

    # epoch 1 touches ONLY role rA (one conv) -> dirty = {rA}
    upd = spark.createDataFrame(
        [(lsn + 1, "update", a_convs[0], 0, "rA", "longer text!", None)],
        "lsn long, op string, conv_id string, turn_idx int, "
        "role string, text string, tool string",
    ).withColumn("ts", F.to_timestamp(F.lit("2026-01-02 00:00:00")))
    apply_batch(spark, table, upd, epoch=1)
    s2 = view.refresh()
    assert s2 is not None and not s2["full_rebuild"]
    _assert_exact(view, table)

    full = set(table.read().inputFiles())
    a_files = set(
        table.read(buckets=sorted(A_BUCKETS)).inputFiles()
    )
    opened = set(s2["source_files_read"])
    assert opened, "refresh read nothing?"
    assert opened <= a_files, (opened - a_files)
    assert opened < full  # strictly fewer buckets than the table has
    assert s2["dirty_buckets"] <= len(A_BUCKETS) < N_BUCKETS


def test_group_move_widens_hint_and_stays_exact(spark, tmp_path, source):
    """An update that MOVES a row from rA to rB dirties both groups; the
    hint must include the moved-to pair (from the delta) and the
    pre-image group — the view stays exact either way."""
    table, a_convs, lsn = source
    view = _mk_view(spark, tmp_path, table)
    view.refresh()
    mv = spark.createDataFrame(
        [(lsn + 1, "update", a_convs[1], 1, "rB", "moved!", None)],
        "lsn long, op string, conv_id string, turn_idx int, "
        "role string, text string, tool string",
    ).withColumn("ts", F.to_timestamp(F.lit("2026-01-02 00:00:00")))
    apply_batch(spark, table, mv, epoch=1)
    s = view.refresh()
    assert s is not None
    _assert_exact(view, table)
    # rB's rows span all non-A buckets plus (now) an A bucket -> wider
    # read than an rA-only delta, still bounded by the hint
    assert s["dirty_buckets"] <= N_BUCKETS


def test_hint_overflow_falls_back_to_full_scan_and_stays_exact(
    spark, tmp_path, source, monkeypatch
):
    table, a_convs, lsn = source
    monkeypatch.setattr(IncrementalAggView, "MAX_HINT_GROUPS", 1)
    view = _mk_view(spark, tmp_path, table)
    view.refresh()
    upd = spark.createDataFrame(
        [(lsn + 1, "update", a_convs[0], 2, "rA", "bigger", None)],
        "lsn long, op string, conv_id string, turn_idx int, "
        "role string, text string, tool string",
    ).withColumn("ts", F.to_timestamp(F.lit("2026-01-02 00:00:00")))
    apply_batch(spark, table, upd, epoch=1)
    s = view.refresh()
    assert s is not None and s["dirty_buckets"] == N_BUCKETS  # no pruning
    _assert_exact(view, table)


def test_group_delete_tombstones_with_hint(spark, tmp_path, source):
    """Deleting every rA row: dirty group has a hint entry, the recompute
    finds no rows, and the view tombstones the group."""
    table, a_convs, lsn = source
    view = _mk_view(spark, tmp_path, table)
    view.refresh()
    rows = [
        (lsn + 1 + j, "delete", c, t, None, None, None)
        for j, (c, t) in enumerate((c, t) for c in a_convs[:4] for t in range(3))
    ]
    dele = spark.createDataFrame(
        rows, "lsn long, op string, conv_id string, turn_idx int, "
              "role string, text string, tool string",
    ).withColumn("ts", F.lit(None).cast("timestamp"))
    apply_batch(spark, table, dele, epoch=1)
    s = view.refresh()
    assert s is not None
    _assert_exact(view, table)
    assert {r["role"] for r in view.read().collect()} == {"rB"}
