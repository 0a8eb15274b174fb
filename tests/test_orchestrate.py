"""Declarative pipeline config + runner (the reference's Variables-driven
multi-database DAG re-expressed as a JSON spec over the engine surface).

Invariants: env interpolation matches Variable.get semantics (default /
loud-missing); an epoch run routes every source to its table with oracle
parity; re-running a completed epoch is a per-table no-op and leaves the
frontier unchanged; declared views stay equal to recompute; exports land
date-partitioned.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from postgres_to_snowflake_data_pipeline_spark.cdc.generator import change_events
from postgres_to_snowflake_data_pipeline_spark.cdc.multi import latest_frontier
from postgres_to_snowflake_data_pipeline_spark.cdc.oracle import assert_matches_oracle
from postgres_to_snowflake_data_pipeline_spark.orchestrate import (
    Pipeline,
    PipelineSpec,
    SourceSpec,
    interpolate,
)

PAYLOAD = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def test_interpolation_matches_variable_get_semantics(monkeypatch):
    monkeypatch.setenv("ORCH_HOST", "db.example")
    monkeypatch.delenv("ORCH_MISSING", raising=False)
    assert interpolate("jdbc://${ORCH_HOST}:5432") == "jdbc://db.example:5432"
    assert interpolate("${ORCH_MISSING:fallback}") == "fallback"
    assert interpolate({"a": ["${ORCH_HOST}"]}) == {"a": ["db.example"]}
    with pytest.raises(KeyError, match="ORCH_MISSING"):
        interpolate("${ORCH_MISSING}")


def test_spec_json_round_trip_and_validation(tmp_path):
    raw = {
        "lake_root": str(tmp_path / "lake"),
        "sources": [
            {"name": "wal", "kind": "parquet_feed",
             "options": {"path": str(tmp_path / "feed/epoch={epoch}")}},
            {"name": "seed", "kind": "csv", "table": "ta",
             "options": {"path": str(tmp_path / "seed.csv"),
                         "schema_ddl": "conv_id string, turn_idx int"}},
        ],
        "tables": [
            {"name": "ta", "key_cols": ["conv_id", "turn_idx"], "n_buckets": 4},
            {"name": "tb", "key_cols": ["conv_id", "turn_idx"], "n_buckets": 4},
        ],
        "views": [
            {"name": "by_role", "table": "ta", "group_cols": ["role"],
             "measures": {"n": ["count", "*"], "chars": ["sum", "length(text)"]}},
        ],
        "exports": [{"table": "tb", "path": str(tmp_path / "out/e{epoch}")}],
    }
    spec = PipelineSpec.from_json(json.dumps(raw))
    spec2 = PipelineSpec.from_json(json.dumps(spec.to_dict()))
    assert spec == spec2
    # validation is loud
    bad = dict(raw, views=[{"name": "v", "table": "nope", "group_cols": ["r"],
                            "measures": {"n": ["count", "*"]}}])
    with pytest.raises(ValueError, match="unknown table"):
        PipelineSpec.from_dict(bad)
    with pytest.raises(ValueError, match="unknown kind"):
        SourceSpec(name="s", kind="kafka", options={})
    with pytest.raises(ValueError, match="missing options"):
        SourceSpec(name="s", kind="jdbc", options={"url": "x"})


def _tagged(ev):
    tag = F.when(F.abs(F.xxhash64("lsn")) % 2 == 0, "ta").otherwise("tb")
    return ev.withColumn("_table", tag)


def test_epoch_run_routes_views_frontier_exports(spark, tmp_path):
    ev = change_events(spark, 4000, n_convs=200).localCheckpoint()
    lo, hi = ev.select(F.min("lsn"), F.max("lsn")).first()
    mid = (lo + hi) // 2
    epochs = {0: _tagged(ev.filter(F.col("lsn") <= mid)),
              1: _tagged(ev.filter(F.col("lsn") > mid))}

    spec = PipelineSpec.from_dict({
        "lake_root": str(tmp_path / "lake"),
        "sources": [{"name": "wal", "kind": "dataframe"}],
        "tables": [
            {"name": "ta", "key_cols": ["conv_id", "turn_idx"], "n_buckets": 4},
            {"name": "tb", "key_cols": ["conv_id", "turn_idx"], "n_buckets": 4},
        ],
        "views": [
            {"name": "by_role", "table": "ta", "group_cols": ["role"],
             "measures": {"n": ["count", "*"], "chars": ["sum", "length(text)"]},
             "payload_cols": ["role", "text"], "n_buckets": 2},
            {"name": "per_conv", "table": "tb", "group_cols": ["conv_id"],
             "kind": "incremental",
             "aggs": {"n_turns": "count(1)", "last_ts": "max(ts)"},
             "n_buckets": 2},
        ],
        "exports": [{"table": "ta", "path": str(tmp_path / "out/e{epoch}")}],
    })
    pipe = Pipeline(spark, spec)
    for e in (0, 1):
        res = pipe.run_epoch(e, feeds={"wal": epochs[e]})
        assert set(res["tables"]) == {"ta", "tb"}
        assert not any(r.skipped for r in res["tables"].values())
        assert res["unknown_rows"] == 0

    # per-table oracle parity over the concatenated feed
    full = epochs[0].unionByName(epochs[1])
    for name in ("ta", "tb"):
        expected = full.filter(F.col("_table") == name).drop("_table")
        assert_matches_oracle(pipe.tables[name].read(), expected, PAYLOAD)

    # views equal recompute
    got = {tuple(r) for r in pipe.view("by_role").collect()}
    want = {
        tuple(r)
        for r in pipe.tables["ta"].read().groupBy("role").agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.length("text")).alias("chars"),
        ).collect()
    }
    assert got == want
    got = {tuple(r) for r in pipe.view("per_conv").collect()}
    want = {
        tuple(r)
        for r in pipe.tables["tb"].read().groupBy("conv_id").agg(
            F.count(F.lit(1)).alias("n_turns"), F.max("ts").alias("last_ts")
        ).collect()
    }
    assert got == want

    # frontier pinned at the last fully-applied epoch
    fr = latest_frontier(os.path.join(spec.lake_root, "_frontier"))
    assert fr is not None and fr.epoch == 1 and set(fr.snapshot_ids) == {"ta", "tb"}

    # export landed date-partitioned
    assert any(d.startswith("_y=") for d in os.listdir(tmp_path / "out/e1"))

    # re-running a completed epoch: every table skips, frontier unchanged
    res = pipe.run_epoch(1, feeds={"wal": epochs[1]})
    assert all(r.skipped for r in res["tables"].values())
    assert latest_frontier(os.path.join(spec.lake_root, "_frontier")).epoch == 1
    # and a fresh Pipeline over the same spec resumes cleanly (load path)
    pipe2 = Pipeline(spark, spec)
    assert pipe2.run_epoch(0, feeds={"wal": epochs[0]})["tables"]["ta"].skipped


def test_csv_snapshot_source_bootstraps_table(spark, tmp_path):
    """The reference's seed-CSV load: snapshot rows become inserts at a
    constant LSN; later WAL epochs update over them."""
    rows = [
        ("c0", 0, "user", "seed zero", "", "2026-01-01 00:00:00"),
        ("c1", 0, "assistant", "seed one", "grep", "2026-01-01 00:00:00"),
    ]
    csv_path = tmp_path / "seed.csv"
    with open(csv_path, "w") as f:
        f.write("conv_id,turn_idx,role,text,tool,ts\n")
        for r in rows:
            f.write(",".join(map(str, r)) + "\n")
    ddl = ("conv_id string, turn_idx int, role string, text string, "
           "tool string, ts timestamp")
    spec = PipelineSpec.from_dict({
        "lake_root": str(tmp_path / "lake"),
        "sources": [{"name": "seed", "kind": "csv", "table": "ta",
                     "options": {"path": str(csv_path), "schema_ddl": ddl}}],
        "tables": [{"name": "ta", "key_cols": ["conv_id", "turn_idx"],
                    "n_buckets": 2, "schema_ddl": ddl}],
        "frontier": False,
    })
    pipe = Pipeline(spark, spec)
    pipe.run_epoch(0)
    got = {r["conv_id"]: r for r in pipe.tables["ta"].read().collect()}
    assert set(got) == {"c0", "c1"}
    assert got["c1"]["tool"] == "grep"
    assert got["c0"]["tool"] is None  # empty string -> NULL (P5)
    # a WAL epoch with a higher lsn updates over the seed
    upd = spark.createDataFrame(
        [(10, "update", "c0", 0, "user", "updated", None, None)],
        "lsn long, op string, conv_id string, turn_idx int, role string, "
        "text string, tool string, ts timestamp",
    ).withColumn("_table", F.lit("ta"))
    spec2 = PipelineSpec.from_dict(dict(spec.to_dict(), sources=[
        {"name": "wal", "kind": "dataframe"}]))
    pipe2 = Pipeline(spark, spec2)
    pipe2.run_epoch(1, feeds={"wal": upd})
    got = {r["conv_id"]: r["text"] for r in pipe2.tables["ta"].read().collect()}
    assert got == {"c0": "updated", "c1": "seed one"}


def test_streaming_pipeline_resumes_exactly_once(spark, tmp_path):
    """run_stream drains the feed as micro-batch epochs (routing + frontier
    + views per batch); a restart with the same checkpoint applies only new
    files, and the final state matches the LWW oracle over the whole feed."""
    from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import (
        CHANGE_EVENT_SCHEMA,
    )

    ev = change_events(spark, 3000, n_convs=150).localCheckpoint()
    lo, hi = ev.select(F.min("lsn"), F.max("lsn")).first()
    step = (hi - lo + 1) // 3 + 1
    feed_dir = tmp_path / "feed"
    feed_dir.mkdir()

    def emit(i):
        part = _tagged(ev.filter(
            (F.col("lsn") >= lo + i * step) & (F.col("lsn") < lo + (i + 1) * step)
        ))
        part.coalesce(1).write.parquet(str(tmp_path / f"stage{i}"))
        import glob, shutil
        src = glob.glob(str(tmp_path / f"stage{i}" / "*.parquet"))[0]
        shutil.move(src, feed_dir / f"slice-{i}.parquet")

    emit(0)
    emit(1)
    spec = PipelineSpec.from_dict({
        "lake_root": str(tmp_path / "lake"),
        "sources": [{"name": "wal", "kind": "dataframe"}],
        "tables": [
            {"name": "ta", "key_cols": ["conv_id", "turn_idx"], "n_buckets": 4},
            {"name": "tb", "key_cols": ["conv_id", "turn_idx"], "n_buckets": 4},
        ],
        "views": [
            {"name": "by_role", "table": "ta", "group_cols": ["role"],
             "measures": {"n": ["count", "*"]},
             "payload_cols": ["role"], "n_buckets": 2}],
    })
    ckpt = str(tmp_path / "ckpt")
    pipe = Pipeline(spark, spec)
    # _table is not part of CHANGE_EVENT_SCHEMA; extend it for the stream
    stream_schema = pipe.spark.read.parquet(str(feed_dir)).schema
    q = pipe.run_stream(str(feed_dir), stream_schema, ckpt)
    q.awaitTermination()
    n_after_2 = pipe.tables["ta"].read().count()
    assert n_after_2 > 0
    # restart: one new slice; re-delivered batches are no-ops
    emit(2)
    pipe2 = Pipeline(spark, spec)
    q = pipe2.run_stream(str(feed_dir), stream_schema, ckpt)
    q.awaitTermination()
    full = _tagged(ev)
    for name in ("ta", "tb"):
        expected = full.filter(F.col("_table") == name).drop("_table")
        assert_matches_oracle(pipe2.tables[name].read(), expected, PAYLOAD)
    # view stayed exact through the stream
    got = {(r["role"], r["n"]) for r in pipe2.view("by_role").collect()}
    want = {
        (r["role"], r["n"])
        for r in pipe2.tables["ta"].read().groupBy("role")
        .agg(F.count(F.lit(1)).cast("long").alias("n")).collect()
    }
    assert got == want
