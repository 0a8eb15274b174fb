"""State diff (`LakeTable.diff`): keyed added/removed/changed comparison
between two tables or snapshots, with a manifest prune (`diff_buckets`)
that skips every bucket whose immutable file sets match — a branch
diffed against its trunk right after a localized divergence reads only
the touched buckets."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from postgres_to_snowflake_data_pipeline_spark.cdc.apply import apply_batch
from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import TRANSCRIPT_SCHEMA
from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable

SCHEMA = ("lsn long, op string, conv_id string, turn_idx int, role string, "
          "text string, tool string, ts timestamp")
D0 = dt.datetime(2026, 1, 1)


def _mk_table(spark, path, n_buckets=4):
    return LakeTable.create(
        spark, str(path), TRANSCRIPT_SCHEMA, ("conv_id", "turn_idx"),
        n_buckets=n_buckets,
    )


def _rows(n, lsn0=0, n_convs=20, tag="txt"):
    return [
        (lsn0 + j, "insert", f"c{j % n_convs:03d}", (lsn0 + j) // n_convs,
         "user", f"{tag} {lsn0 + j}", None, D0 + dt.timedelta(hours=j % 48))
        for j in range(n)
    ]


def _diff_set(df):
    return {(r["conv_id"], r["turn_idx"], r["change"]) for r in df.collect()}


def test_identical_clone_diffs_empty_without_reading(spark, tmp_path):
    src = _mk_table(spark, tmp_path / "src")
    apply_batch(spark, src, spark.createDataFrame(_rows(100), SCHEMA), epoch=0)
    clone = src.clone_to(str(tmp_path / "dev"))
    same, differ = src.diff_buckets(clone)
    assert differ == []  # every bucket pruned by file identity
    assert src.diff(clone).count() == 0


def test_localized_divergence_prunes_untouched_buckets(spark, tmp_path):
    src = _mk_table(spark, tmp_path / "src")
    apply_batch(spark, src, spark.createDataFrame(_rows(200), SCHEMA), epoch=0)
    src.compact()
    branch = src.clone_to(str(tmp_path / "dev"))
    apply_batch(
        spark, branch,
        spark.createDataFrame(
            [(900, "insert", "c003", 0, "user", "edited", None, D0),
             (901, "insert", "c003", 99, "user", "new turn", None, D0),
             (902, "delete", "c003", 1, None, None, None, D0)],
            SCHEMA,
        ),
        epoch=1,
    )
    same, differ = src.diff_buckets(branch)
    assert len(differ) == 1, (same, differ)  # only c003's bucket read
    got = _diff_set(src.diff(branch))
    assert got == {
        ("c003", 0, "changed"),
        ("c003", 99, "added"),
        ("c003", 1, "removed"),
    }


def test_diff_direction_and_time_travel(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "t")
    apply_batch(spark, t, spark.createDataFrame(_rows(40), SCHEMA), epoch=0)
    sid = t.current().snapshot_id
    apply_batch(
        spark, t,
        spark.createDataFrame(
            [(500, "insert", "c000", 0, "user", "v2", None, D0)], SCHEMA
        ),
        epoch=1,
    )
    # old snapshot vs current: the update reads as 'changed' in one
    # direction and identically in the reverse (symmetric statuses flip)
    fwd = _diff_set(t.diff(t, snapshot_id=sid))
    assert fwd == {("c000", 0, "changed")}
    same, differ = t.diff_buckets(t, snapshot_id=sid)
    assert len(differ) >= 1 and len(same) >= 1


def test_schema_drift_compares_common_columns_only(spark, tmp_path):
    import pyspark.sql.types as T

    a = _mk_table(spark, tmp_path / "a")
    apply_batch(spark, a, spark.createDataFrame(_rows(30), SCHEMA), epoch=0)
    b = a.clone_to(str(tmp_path / "b"))
    # evolve the CLONE only: extra payload column, same values otherwise
    wide = T.StructType(
        list(TRANSCRIPT_SCHEMA.fields)
        + [T.StructField("extra", T.StringType(), True)]
    )
    batch = spark.createDataFrame(
        [(700, "insert", "c001", 0, "user", "same-ish", None, D0, "x")],
        ("lsn long, op string, conv_id string, turn_idx int, role string, "
         "text string, tool string, ts timestamp, extra string"),
    )
    apply_batch(spark, b, batch, epoch=1)
    got = _diff_set(a.diff(b))
    # only the actually-updated key differs; the new column alone never
    # marks untouched keys as changed
    assert got == {("c001", 0, "changed")}
