"""Secondary zone maps: manifest ts min/max (epoch micros) + lsn ranges
let time-windowed reads skip non-covering files — with LWW soundness
(`read` keeps every file whose lsn_max >= the covering files' lsn floor,
so a stale in-window version can never beat its out-of-window winner)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from postgres_to_snowflake_data_pipeline_spark.cdc.apply import apply_batch
from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import TRANSCRIPT_SCHEMA
from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable

SCHEMA = ("lsn long, op string, conv_id string, turn_idx int, role string, "
          "text string, tool string, ts timestamp")

# three disjoint one-day event-time windows, one per epoch
D0 = dt.datetime(2026, 1, 1)
D1 = dt.datetime(2026, 2, 1)
D2 = dt.datetime(2026, 3, 1)


def _win(day: dt.datetime) -> tuple[dt.datetime, dt.datetime]:
    return day, day + dt.timedelta(days=1)


def _mk_table(spark, path, n_buckets=2):
    return LakeTable.create(
        spark, str(path), TRANSCRIPT_SCHEMA, ("conv_id", "turn_idx"),
        n_buckets=n_buckets,
    )


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _epoch_rows(keys, lsn0, day, text="t"):
    return [
        (lsn0 + j, "insert", k, 0, "user", f"{text} {k}", None,
         day + dt.timedelta(hours=j % 24))
        for j, k in enumerate(keys)
    ]


def test_manifest_entries_carry_ts_and_lsn_ranges(spark, tmp_path):
    table = _mk_table(spark, tmp_path / "t")
    keys = [f"c{i:03d}" for i in range(20)]
    apply_batch(spark, table, _batch(spark, _epoch_rows(keys, 0, D0)), epoch=0)
    for _b, fs in table.current().files.items():
        for e in fs:
            assert e["ts_min"] <= e["ts_max"], e
            assert e["lsn_min"] <= e["lsn_max"], e
            # micros of 2026-01-01 .. +24h
            lo = int(D0.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
            assert lo <= e["ts_min"] <= e["ts_max"] <= lo + 24 * 3600 * 10**6


def test_recent_window_skips_old_epochs(spark, tmp_path):
    """Disjoint per-epoch time windows with rising lsns: a query for the
    newest window must open ONLY the newest commit's files."""
    table = _mk_table(spark, tmp_path / "t")
    keys = [f"c{i:03d}" for i in range(12)]
    apply_batch(spark, table, _batch(
        spark, _epoch_rows([k + "a" for k in keys], 0, D0)), epoch=0)
    apply_batch(spark, table, _batch(
        spark, _epoch_rows([k + "b" for k in keys], 1000, D1)), epoch=1)
    apply_batch(spark, table, _batch(
        spark, _epoch_rows([k + "c" for k in keys], 2000, D2)), epoch=2)

    full = set(table.read().inputFiles())
    recent = table.read(ts_prune=_win(D2))
    opened = set(recent.inputFiles())
    assert opened < full, (opened, full)
    assert all("commit-3" in f for f in opened), opened
    got = {r["conv_id"] for r in recent.collect()}
    assert got == {k + "c" for k in keys}

    # oldest window: the lsn floor is the oldest commit's -> soundness
    # retains everything; the residual filter still gives exact results
    old = table.read(ts_prune=_win(D0))
    assert {r["conv_id"] for r in old.collect()} == {k + "a" for k in keys}


def test_stale_in_window_version_excluded(spark, tmp_path):
    """Key inserted in window W0, later updated with an out-of-window ts
    (and another key deleted): a W0 query must exclude both — the LWW
    winner decides, not the stale in-window version."""
    table = _mk_table(spark, tmp_path / "t")
    keys = [f"c{i:03d}" for i in range(8)]
    apply_batch(spark, table, _batch(spark, _epoch_rows(keys, 0, D0)), epoch=0)
    moved, deleted = keys[0], keys[1]
    apply_batch(spark, table, _batch(spark, [
        (5000, "update", moved, 0, "user", "moved", None, D2),
        (5001, "delete", deleted, 0, None, None, None, None),
    ]), epoch=1)

    got = {r["conv_id"] for r in table.read(ts_prune=_win(D0)).collect()}
    assert moved not in got and deleted not in got
    assert got == set(keys[2:])
    # and the moved row appears in its new window with the new text
    new = table.read(ts_prune=_win(D2)).collect()
    assert {(r["conv_id"], r["text"]) for r in new} == {(moved, "moved")}


def test_empty_window_reads_zero_files(spark, tmp_path):
    table = _mk_table(spark, tmp_path / "t")
    keys = [f"c{i:03d}" for i in range(6)]
    apply_batch(spark, table, _batch(spark, _epoch_rows(keys, 0, D0)), epoch=0)
    df = table.read(ts_prune=_win(dt.datetime(2030, 1, 1)))
    assert df.inputFiles() == []
    assert df.count() == 0


def test_ts_prune_equals_residual_filter(spark, tmp_path):
    """Invariant: read(ts_prune=w) == read().filter(ts in w) on a mixed
    workload of inserts, cross-window updates, and deletes."""
    from pyspark.sql import functions as F

    table = _mk_table(spark, tmp_path / "t", n_buckets=4)
    keys = [f"c{i:03d}" for i in range(30)]
    apply_batch(spark, table, _batch(spark, _epoch_rows(keys, 0, D0)), epoch=0)
    apply_batch(spark, table, _batch(spark, [
        (1000 + i, "update", keys[i], 0, "user", "m", None, D1)
        for i in range(0, 10)
    ] + [
        (1100 + i, "delete", keys[i], 0, None, None, None, None)
        for i in range(10, 15)
    ]), epoch=1)
    apply_batch(spark, table, _batch(
        spark, _epoch_rows([k + "x" for k in keys[:5]], 2000, D2)), epoch=2)

    for w in (_win(D0), _win(D1), _win(D2), (D0, D2 + dt.timedelta(days=1))):
        pruned = {tuple(r) for r in table.read(ts_prune=w).collect()}
        naive = {
            tuple(r)
            for r in table.read()
            .filter(F.col("ts").between(w[0], w[1]))
            .collect()
        }
        assert pruned == naive, w


def test_compaction_and_distributed_stats_keep_zone_maps(spark, tmp_path):
    """Zone maps survive compaction, and the distributed stats path
    (paths parallelized, executors read the parquet footers) records
    the same ts/lsn ranges as the driver footer path."""
    table = _mk_table(spark, tmp_path / "t")
    keys = [f"c{i:03d}" for i in range(12)]
    apply_batch(spark, table, _batch(spark, _epoch_rows(keys, 0, D0)), epoch=0)
    apply_batch(spark, table, _batch(
        spark, _epoch_rows([k + "b" for k in keys], 1000, D1)), epoch=1)
    table.compact()
    base_entries = [e for fs in table.current().files.values() for e in fs]
    assert all(e.get("ts_min") is not None for e in base_entries)

    # a fresh epoch after compaction: recent-window query opens base +
    # new delta? No — the base's lsn_max >= floor only if it overlaps;
    # here the base is ts-covering for D0..D1 but NOT for D2, and its
    # lsn_max < the new delta's lsn_min -> skipped
    apply_batch(spark, table, _batch(
        spark, _epoch_rows([k + "c" for k in keys], 5000, D2)), epoch=2)
    opened = table.read(ts_prune=_win(D2)).inputFiles()
    assert opened and all("commit-4" in f for f in opened), opened

    # distributed path parity on ts stats
    t2 = _mk_table(spark, tmp_path / "t2")
    t2.STATS_DRIVER_THRESHOLD = 0
    apply_batch(spark, t2, _batch(spark, _epoch_rows(keys, 0, D0)), epoch=0)
    drv = {
        (b, e["path"].split("/")[-2]): (e["ts_min"], e["ts_max"],
                                        e["lsn_min"], e["lsn_max"])
        for b, fs in table.log.load(1).files.items() for e in fs
    }
    dist = {
        (b, e["path"].split("/")[-2]): (e["ts_min"], e["ts_max"],
                                        e["lsn_min"], e["lsn_max"])
        for b, fs in t2.current().files.items() for e in fs
    }
    assert set(drv.values()) == set(dist.values())


def test_ts_prune_rejects_include_tombstones(spark, tmp_path):
    """Tombstones carry NULL event time: their window membership is
    undefined and the residual filter would silently drop them — the
    combination must be rejected loudly, not NULL-shaped."""
    import pytest

    table = _mk_table(spark, tmp_path / "t")
    apply_batch(spark, table, _batch(
        spark, _epoch_rows(["c0", "c1"], 0, D0)), epoch=0)
    with pytest.raises(ValueError, match="tombstones"):
        table.read(ts_prune=_win(D0), include_tombstones=True)


def test_drop_of_zone_column_invalidates_stale_ts_stats(spark, tmp_path):
    """After drop_column of the zone-map timestamp column, old manifest
    entries' ts stats describe the DROPPED column (a different field id)
    and must not prune: a file whose new-zone-column values ARE in the
    window would otherwise be skipped when its lsn range sits below the
    covering floor."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("k", T.StringType(), False),
        T.StructField("created_ts", T.TimestampType(), True),
        T.StructField("updated_ts", T.TimestampType(), True),
    ])
    t = LakeTable.create(spark, str(tmp_path / "t"), schema, ("k",),
                         n_buckets=2)

    def _merge(rows, ddl):
        w = spark.createDataFrame(rows, ddl) \
            .withColumn("_deleted", F.lit(False))
        t.merge(w)

    # commit 1 (zone col = created_ts, Jan): updated_ts lives in MARCH
    _merge([(f"a{i}", D0, D2, i) for i in range(8)],
           "k string, created_ts timestamp, updated_ts timestamp, _lsn long")
    t.drop_column("created_ts")
    # commit 2 (zone col = updated_ts, March) with strictly higher lsns:
    # its entries form the covering set; commit 1's stale Jan stats would
    # classify its file non-covering and its lsn_max < floor skips it
    _merge([(f"b{i}", D2, 100 + i) for i in range(8)],
           "k string, updated_ts timestamp, _lsn long")

    got = {r["k"] for r in t.read(ts_prune=_win(D2)).collect()}
    assert got == {f"a{i}" for i in range(8)} | {f"b{i}" for i in range(8)}
    # invariant vs the naive residual filter, all windows
    for w in (_win(D0), _win(D2)):
        pruned = {tuple(r) for r in t.read(ts_prune=w).collect()}
        naive = {
            tuple(r)
            for r in t.read().filter(F.col("updated_ts").between(*w)).collect()
        }
        assert pruned == naive, w


def test_ts_sliced_compaction_preserves_window_pruning(spark, tmp_path):
    """compact(ts_slices=3) splits each bucket's base at event-time
    quantiles: a newest-day window over the COMPACTED table still opens a
    strict subset of files (un-sliced compaction collapses each bucket to
    one full-span file that can never be skipped), with identical
    results."""
    table = _mk_table(spark, tmp_path / "t", n_buckets=4)
    keys = [f"c{i:03d}" for i in range(24)]
    for e, day in enumerate((D0, D1, D2)):
        apply_batch(spark, table, _batch(
            spark, _epoch_rows([k + "abc"[e] for k in keys], e * 1000, day)),
            epoch=e)
    before = {tuple(r) for r in table.read().collect()}
    table.compact(ts_slices=3)
    after_files = set(table.read().inputFiles())
    assert {tuple(r) for r in table.read().collect()} == before
    pruned = table.read(ts_prune=_win(D2))
    opened = set(pruned.inputFiles())
    assert opened < after_files, (len(opened), len(after_files))
    # exactly one slice of each bucket covers the newest day
    slices_opened = {f.rsplit("/_bdir", 1)[0] for f in opened}
    assert len(slices_opened) == 1, slices_opened
    got = {r["conv_id"] for r in pruned.collect()}
    assert got == {k + "c" for k in keys}


def test_ts_sliced_bucket_is_not_recompacted(spark, tmp_path):
    """A bucket holding only one pass's slices (no deltas) is already
    folded — a second compact() must be a no-op, not a rewrite."""
    table = _mk_table(spark, tmp_path / "t", n_buckets=2)
    keys = [f"c{i:03d}" for i in range(12)]
    apply_batch(spark, table, _batch(
        spark, _epoch_rows([k + "a" for k in keys], 0, D0)), epoch=0)
    apply_batch(spark, table, _batch(
        spark, _epoch_rows([k + "b" for k in keys], 1000, D1)), epoch=1)
    snap1 = table.compact(ts_slices=2)
    assert any(len(fs) > 1 for fs in snap1.files.values())  # really sliced
    snap2 = table.compact()
    assert snap2.snapshot_id == snap1.snapshot_id


def test_late_low_lsn_arrival_after_sliced_compaction_stays_invisible(
    spark, tmp_path
):
    """The soundness case the lsn-floor rule exists for, on a sliced base:
    a key's winner lives in an OLD time slice; a later-applied but
    LOWER-lsn update carries an in-window ts. The window read must keep
    the out-of-window winner file (mixed covering -> floor rule, no
    same-group shortcut) so the stale in-window version loses and the key
    stays absent."""
    table = _mk_table(spark, tmp_path / "t", n_buckets=2)
    keys = [f"c{i:03d}" for i in range(12)]
    apply_batch(spark, table, _batch(
        spark, _epoch_rows([k + "a" for k in keys], 1000, D0)), epoch=0)
    apply_batch(spark, table, _batch(
        spark, _epoch_rows([k + "b" for k in keys], 2000, D1)), epoch=1)
    table.compact(ts_slices=2)
    # late lower-lsn update of an epoch-0 key, event-time in the D2 window
    stale = [(5, "update", keys[0] + "a", 0, "user", "stale", None, D2)]
    apply_batch(spark, table, _batch(spark, stale), epoch=2)
    win = table.read(ts_prune=_win(D2))
    assert win.filter(f"conv_id = '{keys[0]}a'").count() == 0
    assert win.count() == 0
    # and the full read still shows the true winner, not the stale text
    row = table.read().filter(f"conv_id = '{keys[0]}a'").collect()
    assert len(row) == 1 and row[0]["text"] != "stale"


def test_default_compact_preserves_time_clustering(spark, tmp_path):
    """A default-args maintenance compact() (replay_feed's cadence) must
    keep the table's existing slicing, not fold it back to one full-span
    file per bucket."""
    table = _mk_table(spark, tmp_path / "t", n_buckets=2)
    keys = [f"c{i:03d}" for i in range(12)]
    apply_batch(spark, table, _batch(
        spark, _epoch_rows([k + "a" for k in keys], 0, D0)), epoch=0)
    apply_batch(spark, table, _batch(
        spark, _epoch_rows([k + "b" for k in keys], 1000, D1)), epoch=1)
    table.compact(ts_slices=2)
    # new deltas arrive, then someone runs a default compact()
    apply_batch(spark, table, _batch(
        spark, _epoch_rows([k + "c" for k in keys], 2000, D2)), epoch=2)
    snap = table.compact()
    for fs in snap.files.values():
        assert all(e.get("ts_k") == 2 for e in fs), fs
    assert any(len(fs) > 1 for fs in snap.files.values())


def test_explicit_reslice_rewrites_folded_buckets(spark, tmp_path):
    """compact(ts_slices=k') on a quiescent table folded at k != k' is a
    layout request: buckets are rewritten at the new k (previously a
    silent no-op)."""
    table = _mk_table(spark, tmp_path / "t", n_buckets=2)
    keys = [f"c{i:03d}" for i in range(12)]
    for e, day in enumerate((D0, D1, D2)):
        apply_batch(spark, table, _batch(
            spark, _epoch_rows([k + "abc"[e] for k in keys], e * 1000, day)),
            epoch=e)
    snap2 = table.compact(ts_slices=2)
    before = {tuple(r) for r in table.read().collect()}
    snap3 = table.compact(ts_slices=3)
    assert snap3.snapshot_id > snap2.snapshot_id
    for fs in snap3.files.values():
        assert all(e.get("ts_k") == 3 for e in fs), fs
    assert {tuple(r) for r in table.read().collect()} == before


def test_explicit_slices_without_timestamp_column_raises(spark, tmp_path):
    import pyspark.sql.types as T
    import pytest

    schema = T.StructType([
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("n", T.LongType()),
    ])
    table = LakeTable.create(
        spark, str(tmp_path / "t"), schema, ("conv_id", "turn_idx"),
        n_buckets=2,
    )
    with pytest.raises(ValueError, match="no timestamp column"):
        table.compact(ts_slices=4)


def test_file_count_guard_treats_folded_slices_as_one(spark, tmp_path):
    """buckets_needing_compaction must not fire on a steady-state sliced
    layout (slices would otherwise consume the whole file budget), but
    must still fire as deltas pile on top of it."""
    table = _mk_table(spark, tmp_path / "t", n_buckets=2)
    keys = [f"c{i:03d}" for i in range(12)]
    apply_batch(spark, table, _batch(
        spark, _epoch_rows([k + "a" for k in keys], 0, D0)), epoch=0)
    apply_batch(spark, table, _batch(
        spark, _epoch_rows([k + "b" for k in keys], 1000, D1)), epoch=1)
    table.compact(ts_slices=3)
    assert table.buckets_needing_compaction(max_files=2) == []
    for e in range(2, 5):
        apply_batch(spark, table, _batch(
            spark, _epoch_rows([k + f"x{e}" for k in keys], e * 1000, D2)),
            epoch=e)
    assert table.buckets_needing_compaction(max_files=2) != []


def test_dropped_zone_column_collapses_inherited_slicing(spark, tmp_path):
    """After the zone ts column is dropped, a default compact() must fold
    to k=1 (and say so in ts_k) rather than tag unsliceable single files
    with the old k — the manifest must not lie about the layout."""
    table = _mk_table(spark, tmp_path / "t", n_buckets=2)
    keys = [f"c{i:03d}" for i in range(12)]
    apply_batch(spark, table, _batch(
        spark, _epoch_rows([k + "a" for k in keys], 0, D0)), epoch=0)
    apply_batch(spark, table, _batch(
        spark, _epoch_rows([k + "b" for k in keys], 1000, D1)), epoch=1)
    table.compact(ts_slices=2)
    table.drop_column("ts")
    # new deltas under the evolved (ts-less) schema, then maintenance
    evolved = [
        (2000 + j, "insert", k + "z", 0, "user", f"t {k}z", None)
        for j, k in enumerate(keys)
    ]
    sch = ("lsn long, op string, conv_id string, turn_idx int, role string, "
           "text string, tool string")
    apply_batch(spark, table, spark.createDataFrame(evolved, sch), epoch=2)
    snap = table.compact()
    for fs in snap.files.values():
        assert all(e.get("ts_k") == 1 for e in fs), fs


def test_ts_prune_with_columns_keeps_requested_schema(spark, tmp_path):
    """read(columns=..., ts_prune=...) must still read the ts column for
    the residual window filter, but must NOT leak it into the returned
    schema when the caller did not ask for it (ADVICE r3)."""
    table = _mk_table(spark, tmp_path / "t")
    keys = [f"c{i:03d}" for i in range(8)]
    apply_batch(spark, table, _batch(spark, _epoch_rows(keys, 0, D0)), epoch=0)
    apply_batch(spark, table, _batch(
        spark, _epoch_rows(keys, 1000, D1, text="v2")), epoch=1)

    out = table.read(columns=["role"], ts_prune=_win(D1))
    # keys always ride along (documented); ts must not
    assert set(out.columns) == {"conv_id", "turn_idx", "role"}
    assert out.count() == len(keys)
    # asking for the ts column explicitly still returns it
    out2 = table.read(columns=["role", "ts"], ts_prune=_win(D1))
    assert set(out2.columns) == {"conv_id", "turn_idx", "role", "ts"}
    # include_internal variant also drops the unrequested ts
    out3 = table.read(columns=["role"], ts_prune=_win(D1), include_internal=True)
    assert "ts" not in out3.columns and "_lsn" in out3.columns


def test_ntz_timestamp_column_gets_zone_map(spark, tmp_path):
    """A TimestampNTZ event-time column is zone-mapped the same as a tz
    one (stats are tz-free epoch micros either way) — ADVICE r3."""
    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField("k", T.StringType(), False),
        T.StructField("v", T.StringType(), True),
        T.StructField("ts", T.TimestampNTZType(), True),
    ])
    table = LakeTable.create(
        spark, str(tmp_path / "ntz"), schema, ("k",), n_buckets=2)
    rows = [(f"k{i}", "x", D0 + dt.timedelta(hours=i)) for i in range(6)]
    df = spark.createDataFrame(rows, "k string, v string, ts timestamp_ntz")
    df = df.withColumn("_lsn", F.monotonically_increasing_id()) \
           .withColumn("_deleted", F.lit(False))
    table.merge(df, commit_key="epoch:0")
    for _b, fs in table.current().files.items():
        for e in fs:
            assert e.get("ts_min") is not None and e["ts_min"] <= e["ts_max"]
    got = table.read(ts_prune=(D0, D0 + dt.timedelta(hours=2)))
    assert {r["k"] for r in got.collect()} == {"k0", "k1", "k2"}
