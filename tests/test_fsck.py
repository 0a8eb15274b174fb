"""Invariants of the offline checker (lake/fsck.py).

Each check is validated in both directions: a healthy table passes, and
the specific corruption the check exists for is detected —

- a manifest-referenced file deleted out-of-band -> missing_files error;
- a stray parquet under data/ -> orphan warning (GC candidate, not fatal);
- a manifest stat edited away from the footer truth -> stats_drift error
  (this is the corruption that silently makes pruning return WRONG rows);
- a caller lying to merge()'s trusted ``_bucket`` fast path -> rows in a
  bucket their key does not hash to -> bucket_mismatch error, REPAIRED by
  compact() (re-clusters every row) and re-verified green;
- a feed minting one LSN twice -> lsn_ties warning;
- an ``ann`` declaration whose vector column left the schema -> props
  error.
"""

from __future__ import annotations

import datetime as dt
import json
import os

from pyspark.sql import functions as F

from postgres_to_snowflake_data_pipeline_spark.cdc.apply import apply_batch
from postgres_to_snowflake_data_pipeline_spark.cdc.generator import change_events
from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import (
    CHANGE_EVENT_SCHEMA,
    TRANSCRIPT_SCHEMA,
)
from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable, bucket_expr

TS = dt.datetime(2026, 1, 1)


def _table(spark, tmp_path, **kw):
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        TRANSCRIPT_SCHEMA,
        ("conv_id", "turn_idx"),
        n_buckets=4,
        **kw,
    )
    for e in range(2):
        apply_batch(
            spark, t,
            change_events(spark, 800, n_convs=60, seed=e + 1),
            epoch=e,
        )
    return t


def _feed(spark, rows):
    return spark.createDataFrame(
        [(l, o, c, t, r, x, g, TS) for (l, o, c, t, r, x, g) in rows],
        CHANGE_EVENT_SCHEMA,
    )


def _data_files(t):
    return [
        os.path.join(t.root, e["path"])
        for es in t.current().files.values()
        for e in es
    ]


def test_fsck_healthy_table_green(spark, tmp_path):
    t = _table(spark, tmp_path, props={"index.sets": ["role"]})
    t.compact()
    r = t.fsck(deep=True)
    assert r["ok"], r
    assert r["errors"] == [] and r["warnings"] == []
    assert r["files"] > 0 and r["snapshots"] >= 3
    assert r["stats_mismatch_files"] == 0
    assert r["bucket_mismatch_rows"] == 0
    assert r["lsn_tie_groups"] == 0
    json.dumps(r)  # report is JSON-serializable as the CLI requires


def test_fsck_detects_missing_file(spark, tmp_path):
    t = _table(spark, tmp_path)
    os.remove(_data_files(t)[0])
    r = t.fsck(deep=True)  # deep must not crash on the hole either
    assert not r["ok"]
    assert any(e["check"] == "missing_files" for e in r["errors"])


def test_fsck_reports_orphans_as_warning(spark, tmp_path):
    t = _table(spark, tmp_path)
    src = _data_files(t)[0]
    with open(src, "rb") as f:
        blob = f.read()
    with open(os.path.join(os.path.dirname(src), "stray.parquet"), "wb") as f:
        f.write(blob)
    r = t.fsck()
    assert r["ok"]  # warnings do not fail the check
    assert r["orphan_files"] == 1
    assert any(w["check"] == "orphans" for w in r["warnings"])
    # expire is the owner of deletion: after GC the warning clears
    t.expire_snapshots(keep_last=1, orphan_grace_seconds=0)
    assert t.fsck()["orphan_files"] == 0


def test_fsck_detects_manifest_stat_drift(spark, tmp_path):
    t = _table(spark, tmp_path)
    snap = t.current()
    name = t.log.own_manifest_pointers(snap)[0]["path"]
    mpath = t.log.manifest_path(name)
    with open(mpath) as f:
        m = json.load(f)["files"]
    entry = next(es[0] for es in m.values() if es)
    assert "lsn_max" in entry
    entry["lsn_max"] = entry["lsn_max"] + 1000  # lie: range wider than data
    with open(mpath, "w") as f:
        json.dump({"files": m}, f)
    t.log._manifest_cache = {}  # type: ignore[attr-defined]
    t2 = LakeTable.load(spark, t.root)
    r = t2.fsck(deep=True)
    assert not r["ok"]
    assert r["stats_mismatch_files"] == 1
    assert any(e["check"] == "stats_drift" for e in r["errors"])


def test_fsck_detects_bucket_misplacement_and_compact_repairs(spark, tmp_path):
    t = _table(spark, tmp_path)
    # the documented foot-gun: hand merge() winners carrying a WRONG
    # trusted _bucket — the fast path skips its clustering exchange
    wrong = (
        t.read(include_internal=True)
        .limit(5)
        .withColumn("_lsn", F.col("_lsn") + 10_000)
        .withColumn(
            "_bucket",
            (bucket_expr("conv_id", t.current().n_buckets) + 1)
            % t.current().n_buckets,
        )
        .repartition(2, F.col("_bucket"))
    )
    t.merge(wrong)
    r = t.fsck(deep=True)
    assert not r["ok"]
    assert r["bucket_mismatch_rows"] == 5
    assert any(e["check"] == "bucket_mismatch" for e in r["errors"])
    n_before = t.read().count()
    # compact() re-clusters every row under bucket_expr — the repair
    t.compact()
    r2 = t.fsck(deep=True)
    assert r2["ok"] and r2["bucket_mismatch_rows"] == 0
    # the repair must not double keys or change the LWW state size
    state = t.read()
    assert state.count() == n_before
    assert (
        state.groupBy("conv_id", "turn_idx").count().filter("count > 1").count()
        == 0
    )


def test_compact_rehomes_into_fully_folded_bucket_without_dup(spark, tmp_path):
    """The sharp variant: the honest destination bucket is FULLY folded
    (base only, not in the repair pass's rewrite set), so the re-homed
    row must land as a DELTA there — a second base file would skip the
    read path's ``has_delta`` LWW gate and the key would appear twice."""
    t = _table(spark, tmp_path)
    t.compact()  # every bucket folds to base-only
    n = t.current().n_buckets
    victim = (
        t.read(include_internal=True)
        .withColumn("_honest", bucket_expr("conv_id", n))
        .filter(F.col("_honest") == 3)
        .drop("_honest")
        .limit(4)
        .withColumn("_lsn", F.col("_lsn") + 10_000)
        .withColumn("_bucket", F.lit(5))
        .repartition(1, F.col("_bucket"))
    )
    n_true = t.read().count()  # the honest LWW state size
    t.merge(victim)  # only bucket 5 now has a delta -> only 5 in todo
    # while the corruption is live, the per-bucket resolve split (reads
    # only resolve delta-bearing buckets — sound under the bucket-honesty
    # invariant this test violates on purpose) surfaces the misplaced
    # keys as duplicates instead of silently collapsing them: fsck flags
    # them, and the repair below removes them
    assert t.read().count() == n_true + 4
    assert t.fsck(deep=True)["bucket_mismatch_rows"] == 4
    t.compact()
    state = t.read()
    assert state.count() == n_true
    assert (
        state.groupBy("conv_id", "turn_idx").count().filter("count > 1").count()
        == 0
    )
    # the bumped-lsn versions won resolution
    assert t.fsck(deep=True)["bucket_mismatch_rows"] == 0
    # destination bucket carries the re-homed rows as a DELTA entry
    kinds3 = {e["kind"] for e in t.current().files["3"]}
    assert "delta" in kinds3
    # the NEXT maintenance compact folds it back to a single-pass base
    t.compact()
    assert {e["kind"] for e in t.current().files["3"]} == {"base"}
    assert t.read().count() == n_true


def test_fsck_surfaces_lsn_ties(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        TRANSCRIPT_SCHEMA,
        ("conv_id", "turn_idx"),
        n_buckets=2,
    )
    apply_batch(
        spark, t,
        _feed(spark, [(10, "insert", "k1", 0, "user", "first", None)]),
        epoch=0,
    )
    apply_batch(  # the SAME lsn minted again with a different payload
        spark, t,
        _feed(spark, [(10, "insert", "k1", 0, "user", "second", None)]),
        epoch=1,
    )
    r = t.fsck(deep=True)
    assert r["ok"]  # a tie is a warning: LWW still resolves it
    assert r["lsn_tie_groups"] == 1
    assert any(w["check"] == "lsn_ties" for w in r["warnings"])


def test_fsck_flags_dangling_ann_declaration(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.update_props({"ann": {"vec_col": "emb", "key_col": "conv_id"}})
    r = t.fsck()
    assert not r["ok"]
    assert any(
        e["check"] == "props" and "vec_col" in e["detail"]
        for e in r["errors"]
    )
