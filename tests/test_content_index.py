"""Content indexes (lake/content.py): per-file value sets / token indexes
in the manifests let ``read(eq_prune=...)`` / ``read(token_prune=...)``
skip files — with the SAME LWW floor-retention soundness rule as the ts
zone map (a stale matching version can never beat its non-matching
winner, because the winner's file is always retained)."""

from __future__ import annotations

import datetime as dt

import pytest

from postgres_to_snowflake_data_pipeline_spark.cdc.apply import apply_batch
from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import TRANSCRIPT_SCHEMA
from postgres_to_snowflake_data_pipeline_spark.lake import content
from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable

SCHEMA = ("lsn long, op string, conv_id string, turn_idx int, role string, "
          "text string, tool string, ts timestamp")

D0 = dt.datetime(2026, 1, 1)


def _mk_table(spark, path, n_buckets=2):
    t = LakeTable.create(
        spark, str(path), TRANSCRIPT_SCHEMA, ("conv_id", "turn_idx"),
        n_buckets=n_buckets,
    )
    t.update_props({"index.sets": ["tool", "role"], "index.tokens": "text"})
    return t


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _epoch_rows(keys, lsn0, tool, text):
    return [
        (lsn0 + j, "insert", k, 0, "user", f"{text} {k}", tool,
         D0 + dt.timedelta(hours=j % 24))
        for j, k in enumerate(keys)
    ]


def _entries(table):
    return [e for _b, fs in table.current().files.items() for e in fs]


# ---------------------------------------------------------------------------
# manifest stats
# ---------------------------------------------------------------------------


def test_manifest_entries_carry_content_stats(spark, tmp_path):
    table = _mk_table(spark, tmp_path / "t")
    keys = [f"c{i:03d}" for i in range(20)]
    apply_batch(
        spark, table,
        _batch(spark, _epoch_rows(keys, 0, "search", "alpha beta")),
        epoch=0,
    )
    snap = table.current()
    tool_id = str(snap.column_ids["tool"])
    role_id = str(snap.column_ids["role"])
    text_id = snap.column_ids["text"]
    for e in _entries(table):
        assert e["sets"][tool_id] == ["search"]
        assert e["sets"][role_id] == ["user"]
        tok = e["tok"]
        assert tok["id"] == text_id
        # small vocab -> exact token list, and it contains the words
        assert {"alpha", "beta"} <= set(tok["s"])


def test_pre_declaration_files_have_no_index_and_stay_candidates(
    spark, tmp_path
):
    table = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        ("conv_id", "turn_idx"), n_buckets=2,
    )
    keys = [f"c{i:03d}" for i in range(10)]
    apply_batch(
        spark, table, _batch(spark, _epoch_rows(keys, 0, "old", "legacy")),
        epoch=0,
    )
    assert all("sets" not in e and "tok" not in e for e in _entries(table))
    table.update_props({"index.sets": ["tool"], "index.tokens": "text"})
    apply_batch(
        spark, table, _batch(spark, _epoch_rows(keys, 100, "new", "fresh")),
        epoch=1,
    )
    # statless files are candidates: the old epoch's rows are still found
    got = table.read(eq_prune={"tool": "old"}).select("conv_id").collect()
    assert got == []  # every key's winner is the epoch-1 version
    got = {
        r.conv_id
        for r in table.read(eq_prune={"tool": "new"})
        .select("conv_id")
        .collect()
    }
    assert got == set(keys)


# ---------------------------------------------------------------------------
# eq_prune: values + file skipping + soundness
# ---------------------------------------------------------------------------


def test_eq_prune_skips_files_and_matches_naive_filter(spark, tmp_path):
    table = _mk_table(spark, tmp_path / "t")
    keys = [f"c{i:03d}" for i in range(30)]
    # three epochs, disjoint tool labels, disjoint key ranges (no updates:
    # pruning visibility is the point here; soundness is tested below)
    for ep in range(3):
        ks = keys[ep * 10 : (ep + 1) * 10]
        apply_batch(
            spark, table,
            _batch(spark, _epoch_rows(ks, ep * 100, f"tool{ep}", "w")),
            epoch=ep,
        )
    pruned = table.read(eq_prune={"tool": "tool2"})
    want = {(r.conv_id, r.tool) for r in pruned.collect()}
    assert want == {(k, "tool2") for k in keys[20:30]}
    # the last epoch's files are the only candidates, and the lsn floor
    # (their lsn_min) rules out BOTH earlier epochs' files
    assert set(pruned.inputFiles()) < set(table.read().inputFiles())


def test_eq_prune_lww_sound_under_updates(spark, tmp_path):
    table = _mk_table(spark, tmp_path / "t")
    # epoch 0: k0,k1 tagged 'x'; epoch 1 retags k0 to 'y' (k0's winner no
    # longer matches 'x' — a naive candidate-only read would resurrect the
    # stale epoch-0 version) and inserts k2 tagged 'x'
    apply_batch(
        spark, table,
        _batch(spark, _epoch_rows(["k0", "k1"], 0, "x", "v0")),
        epoch=0,
    )
    apply_batch(
        spark, table,
        _batch(
            spark,
            _epoch_rows(["k0"], 100, "y", "v1")
            + _epoch_rows(["k2"], 200, "x", "v1"),
        ),
        epoch=1,
    )
    got = {
        (r.conv_id, r.text)
        for r in table.read(eq_prune={"tool": "x"})
        .select("conv_id", "text")
        .collect()
    }
    assert got == {("k1", "v0 k1"), ("k2", "v1 k2")}
    # and a tombstoned winner never resurfaces through the index
    apply_batch(
        spark, table,
        _batch(spark, [(300, "delete", "k1", 0, None, None, None, None)]),
        epoch=2,
    )
    got = {
        r.conv_id for r in table.read(eq_prune={"tool": "x"}).collect()
    }
    assert got == {"k2"}


def test_eq_prune_composes_with_ts_prune(spark, tmp_path):
    table = _mk_table(spark, tmp_path / "t")
    keys = [f"c{i:03d}" for i in range(12)]
    apply_batch(
        spark, table, _batch(spark, _epoch_rows(keys, 0, "a", "w")), epoch=0
    )
    lo, hi = D0, D0 + dt.timedelta(hours=5)
    got = table.read(
        ts_prune=(lo, hi), eq_prune={"tool": "a", "role": "user"}
    ).collect()
    naive = (
        table.read()
        .where("tool = 'a' and role = 'user'")
        .where(f"ts between '{lo}' and '{hi}'")
        .collect()
    )
    assert {r.conv_id for r in got} == {r.conv_id for r in naive}
    assert len(got) == 6  # hours 0..5 of the 12-key batch


# ---------------------------------------------------------------------------
# token_prune
# ---------------------------------------------------------------------------


def test_token_prune_skips_files_and_matches_naive_filter(spark, tmp_path):
    table = _mk_table(spark, tmp_path / "t")
    keys = [f"c{i:03d}" for i in range(20)]
    apply_batch(
        spark, table,
        _batch(spark, _epoch_rows(keys[:10], 0, "t", "common quark")),
        epoch=0,
    )
    apply_batch(
        spark, table,
        _batch(spark, _epoch_rows(keys[10:], 100, "t", "common Gluon42!")),
        epoch=1,
    )
    pruned = table.read(token_prune="gluon42")
    assert {r.conv_id for r in pruned.collect()} == set(keys[10:])
    assert set(pruned.inputFiles()) < set(table.read().inputFiles())
    # a token in every file prunes nothing but stays correct
    both = table.read(token_prune="common")
    assert both.count() == 20
    # the predicate column is read (residual filter) but does not leak
    # into the caller's schema (key columns always ride a projection)
    only = table.read(columns=["conv_id"], token_prune="gluon42")
    assert only.columns == ["conv_id", "turn_idx"]
    assert only.count() == 10


def test_token_prune_validates_input(spark, tmp_path):
    table = _mk_table(spark, tmp_path / "t")
    apply_batch(
        spark, table, _batch(spark, _epoch_rows(["k0"], 0, "t", "w")),
        epoch=0,
    )
    with pytest.raises(ValueError, match="ONE lowercase"):
        table.read(token_prune="Two words")
    with pytest.raises(ValueError, match="unknown column"):
        table.read(eq_prune={"nope": 1})
    with pytest.raises(ValueError, match="NULL"):
        table.read(eq_prune={"tool": None})
    with pytest.raises(ValueError, match="tombstones"):
        table.read(eq_prune={"tool": "t"}, include_tombstones=True)
    t2 = LakeTable.create(
        spark, str(tmp_path / "t2"), TRANSCRIPT_SCHEMA,
        ("conv_id", "turn_idx"), n_buckets=2,
    )
    with pytest.raises(ValueError, match="no token column"):
        t2.read(token_prune="w")
    # a type-mismatched value would silently prune files the SQL predicate
    # matches (Python `'5' in [5]` is False, Spark coerces) — reject loudly
    with pytest.raises(ValueError, match="native type"):
        table.read(eq_prune={"turn_idx": "0"})
    with pytest.raises(ValueError, match="native type"):
        table.read(eq_prune={"tool": 5})


def test_index_props_validated_at_commit(spark, tmp_path):
    table = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
        ("conv_id", "turn_idx"), n_buckets=2,
    )
    # a bare string would be iterated character-by-character and silently
    # index nothing — every declaration error must raise at commit time
    with pytest.raises(ValueError, match="list of column names"):
        table.update_props({"index.sets": "tool"})
    with pytest.raises(ValueError, match="non-indexable type"):
        table.update_props({"index.sets": ["ts"]})
    with pytest.raises(ValueError, match="ONE column name"):
        table.update_props({"index.tokens": ["text"]})
    with pytest.raises(ValueError, match="string required"):
        table.update_props({"index.tokens": "turn_idx"})
    # declaring a column the schema does not have YET is allowed (ahead of
    # an evolution); it activates when the column appears
    table.update_props({"index.sets": ["future_col"]})
    # and clearing a declaration is always allowed
    table.update_props({"index.sets": None})


def test_bloom_index_on_mid_size_vocab(spark, tmp_path):
    table = _mk_table(spark, tmp_path / "t", n_buckets=1)
    # one file with ~600 distinct tokens -> bloom (over TOKEN_EXACT_CAP)
    rows = [
        (j, "insert", f"c{j:04d}", 0, "user",
         " ".join(f"w{j}x{i}" for i in range(3)), "t", D0)
        for j in range(200)
    ]
    apply_batch(spark, table, _batch(spark, rows), epoch=0)
    (entry,) = _entries(table)
    assert "b" in entry["tok"] and "s" not in entry["tok"]
    got = table.read(token_prune="w7x1").collect()
    assert [r.conv_id for r in got] == ["c0007"]
    # absent token: bloom may false-positive (open the file) but the
    # residual filter returns nothing
    assert table.read(token_prune="zzzz").count() == 0


def test_over_cap_vocab_degrades_to_candidate(spark, tmp_path):
    table = _mk_table(spark, tmp_path / "t", n_buckets=1)
    rows = [
        (j, "insert", f"c{j:05d}", 0, "user",
         " ".join(f"t{j}q{i}" for i in range(30)), f"tool{j}", D0)
        for j in range(300)
    ]
    apply_batch(spark, table, _batch(spark, rows), epoch=0)
    (entry,) = _entries(table)
    # 9000 distinct tokens > TOKEN_CAP -> no token index; 300 distinct
    # tool values > SET_CAP -> no set for tool (role still indexed)
    assert "tok" not in entry
    snap = table.current()
    assert str(snap.column_ids["tool"]) not in entry.get("sets", {})
    assert entry["sets"][str(snap.column_ids["role"])] == ["user"]
    # reads stay correct: the file is always a candidate
    assert table.read(token_prune="t7q1").count() == 1
    assert table.read(eq_prune={"tool": "tool42"}).count() == 1


# ---------------------------------------------------------------------------
# lifecycle: compaction, rename, column identity
# ---------------------------------------------------------------------------


def test_compaction_recomputes_indexes_and_pruning_survives(spark, tmp_path):
    table = _mk_table(spark, tmp_path / "t")
    keys = [f"c{i:03d}" for i in range(20)]
    apply_batch(
        spark, table, _batch(spark, _epoch_rows(keys[:10], 0, "a", "w")),
        epoch=0,
    )
    apply_batch(
        spark, table, _batch(spark, _epoch_rows(keys[10:], 100, "b", "w")),
        epoch=1,
    )
    table.compact(key_slices=2)
    for e in _entries(table):
        assert "sets" in e  # compacted base files carry fresh indexes
    got = {r.conv_id for r in table.read(eq_prune={"tool": "b"}).collect()}
    assert got == set(keys[10:])
    # key-sliced bases: the 'b' keys live in slices whose sets say so;
    # at least the all-'a' slices are skipped
    pruned = table.read(eq_prune={"tool": "a"})
    assert set(pruned.inputFiles()) < set(table.read().inputFiles())


def test_rename_keeps_index_identity(spark, tmp_path):
    table = _mk_table(spark, tmp_path / "t")
    keys = [f"c{i:03d}" for i in range(10)]
    apply_batch(
        spark, table, _batch(spark, _epoch_rows(keys, 0, "a", "w")), epoch=0
    )
    table.rename_column("tool", "agent_tool")
    table.update_props({"index.sets": ["agent_tool"]})
    got = table.read(eq_prune={"agent_tool": "a"})
    assert got.count() == 10  # old entries' sets prune by field id, not name


def test_token_index_geometry_roundtrip():
    # exact path
    idx = content.build_token_index({"a", "b"})
    assert content.token_maybe(idx, "a") and not content.token_maybe(idx, "c")
    # bloom path: no false negatives
    toks = {f"tok{i}" for i in range(1000)}
    idx = content.build_token_index(toks)
    assert "b" in idx
    assert all(content.token_maybe(idx, t) for t in toks)
    # over-cap -> None -> always maybe
    assert content.build_token_index({f"t{i}" for i in range(5000)}) is None
    assert content.token_maybe(None, "anything")
