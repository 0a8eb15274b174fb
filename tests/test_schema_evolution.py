"""Additive schema evolution mid-stream (SURVEY.md §7.2 step 7) and the
Arrow normalizer's name-matching/coercion contract (the engine's analog of
the reference's MATCH_BY_COLUMN_NAME=CASE_INSENSITIVE + ON_ERROR=CONTINUE
load, /root/reference/dags/s3_to_snowflake_dag.py:144-145)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import types as T

from postgres_to_snowflake_data_pipeline_spark.cdc.apply import apply_batch
from postgres_to_snowflake_data_pipeline_spark.cdc.generator import change_events, write_feed
from postgres_to_snowflake_data_pipeline_spark.cdc.normalize import (
    evolve_schema,
    normalize_to_schema,
    schema_diff,
)
from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import (
    CHANGE_EVENT_SCHEMA,
    CHANGE_EVENT_V2_SCHEMA,
    TRANSCRIPT_SCHEMA,
)
from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable
from postgres_to_snowflake_data_pipeline_spark.streaming.pipeline import run_stream


def test_normalizer_fills_missing_and_reorders(spark):
    df = spark.createDataFrame(
        [("c1", 0, 7)],
        T.StructType(
            [
                T.StructField("CONV_ID", T.StringType()),  # case drift
                T.StructField("turn_idx", T.IntegerType()),
                T.StructField("latency_ms", T.IntegerType()),
            ]
        ),
    )
    target = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.LongType()),  # type widening int->long
            T.StructField("role", T.StringType()),     # missing -> NULL
            T.StructField("latency_ms", T.IntegerType()),
        ]
    )
    out = normalize_to_schema(df, target)
    assert [f.name for f in out.schema.fields] == ["conv_id", "turn_idx", "role", "latency_ms"]
    row = out.first()
    assert row["conv_id"] == "c1" and row["turn_idx"] == 0
    assert row["role"] is None and row["latency_ms"] == 7
    assert out.schema["turn_idx"].dataType == T.LongType()


def test_normalizer_fast_path_is_identity(spark):
    df = spark.createDataFrame([("a", 1)], "conv_id string, turn_idx int")
    assert normalize_to_schema(df, df.schema) is df


def test_schema_diff_and_evolve():
    d = schema_diff(CHANGE_EVENT_V2_SCHEMA, CHANGE_EVENT_SCHEMA)
    assert d["added"] == ["tool_meta", "latency_ms"] and d["missing"] == []
    evolved = evolve_schema(TRANSCRIPT_SCHEMA, CHANGE_EVENT_V2_SCHEMA)
    names = [f.name for f in evolved.fields]
    # only genuinely-new fields are appended; keys/op/lsn collide by name or
    # are already present and must not duplicate
    assert names.count("tool_meta") == 1 and names.count("latency_ms") == 1
    assert evolve_schema(evolved, CHANGE_EVENT_V2_SCHEMA) == evolved  # idempotent


def test_evolve_schema_rejects_non_orderable_types():
    """MapType anywhere in an added column fails fast with a clear error —
    the LWW comparator orders a struct of every payload column, and letting
    a map through would fail analysis deep inside dedup/read instead."""
    bad = T.StructType(
        [T.StructField("tool_args", T.MapType(T.StringType(), T.StringType()))]
    )
    with pytest.raises(ValueError, match="tool_args.*not.*orderable|non-orderable"):
        evolve_schema(TRANSCRIPT_SCHEMA, bad)
    # array-of-map is just as bad; array-of-string is fine
    nested = T.StructType(
        [T.StructField("xs", T.ArrayType(T.MapType(T.StringType(), T.LongType())))]
    )
    with pytest.raises(ValueError):
        evolve_schema(TRANSCRIPT_SCHEMA, nested)
    ok = T.StructType([T.StructField("tags", T.ArrayType(T.StringType()))])
    assert evolve_schema(TRANSCRIPT_SCHEMA, ok).fieldNames()[-1] == "tags"


def test_normalizer_coerces_type_conflicting_payloads(spark):
    """The reference tolerates loose typing across hops (dbml says VARCHAR,
    DDL says INTEGER for usuario.idauthuserstatus —
    /root/reference/dbml/tables_diagram.txt:23 vs
    create_schema_with_metadata.py:126-137) via Snowflake's
    MATCH_BY_COLUMN_NAME + ON_ERROR='CONTINUE' COPY. Pin our equivalent:
    convertible values cross type boundaries in both directions through the
    Arrow normalizer."""
    df = spark.createDataFrame(
        [("c1", "7", 123), ("c2", "42", 456)],
        T.StructType(
            [
                T.StructField("conv_id", T.StringType()),
                T.StructField("turn_idx", T.StringType()),  # string -> int
                T.StructField("role", T.LongType()),        # int -> string
            ]
        ),
    )
    target = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
        ]
    )
    out = {r["conv_id"]: r for r in normalize_to_schema(df, target).collect()}
    assert out["c1"]["turn_idx"] == 7 and out["c2"]["turn_idx"] == 42
    assert out["c1"]["role"] == "123" and out["c2"]["role"] == "456"
    assert normalize_to_schema(df, target).schema == target


def test_mid_stream_evolution_matches_oracle(spark, tmp_path):
    """Feed v1 events, then v2 events with new columns, through the
    *streaming* path; old rows read back with NULLs, new rows carry values."""
    v1 = change_events(spark, 3000, n_convs=200, seed=42)
    v2 = change_events(spark, 1000, n_convs=200, seed=42, evolved_from=0)
    # shift v2 lsns above v1's so the oracle ordering is unambiguous
    from pyspark.sql import functions as F
    v2 = v2.withColumn("lsn", F.col("lsn") + 1_000_000) \
           .withColumn("text", F.format_string("turn text %s/%s @lsn=%s",
                                               "conv_id", F.col("turn_idx").cast("string"),
                                               F.col("lsn").cast("string")))
    feed = str(tmp_path / "feed")
    write_feed(v1, feed, n_files=3)

    table = LakeTable.create(spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
                             ("conv_id", "turn_idx"), n_buckets=8)
    # phase 1: drain v1 with the v1 schema
    q = run_stream(spark, table, feed, CHANGE_EVENT_SCHEMA, str(tmp_path / "ck1"))
    assert q.awaitTermination(300), "stream did not drain within deadline"
    # producer upgrades: v2 files (new columns) land in the feed
    (v2.repartitionByRange(2, "lsn").write.mode("append").parquet(feed))
    # phase 2: restart stream with the v2 schema (same checkpoint continues;
    # files already processed are not re-read)
    q2 = run_stream(spark, table, feed, CHANGE_EVENT_V2_SCHEMA, str(tmp_path / "ck1"))
    assert q2.awaitTermination(300), "stream did not drain within deadline"

    assert [f.name for f in table.schema().fields][-2:] == ["tool_meta", "latency_ms"]
    state = table.read()
    # rows last written by a v2 event carry tool_meta; v1-only rows are NULL
    assert state.filter("tool_meta is not null").count() > 0
    assert state.filter("tool_meta is null").count() > 0
    # full-state correctness vs oracle over the union feed
    from postgres_to_snowflake_data_pipeline_spark.cdc.oracle import assert_matches_oracle
    union = v1.withColumn("tool_meta", F.lit(None).cast("string")) \
              .withColumn("latency_ms", F.lit(None).cast("int")).unionByName(v2)
    assert_matches_oracle(state, union,
                          ["conv_id", "turn_idx", "role", "text", "tool", "ts",
                           "tool_meta", "latency_ms"])


def test_pre_evolution_feed_into_evolved_table(spark, tmp_path):
    """Old-schema events arriving *after* evolution: missing columns NULL."""
    table = LakeTable.create(spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
                             ("conv_id", "turn_idx"), n_buckets=4)
    v2 = [(1, "insert", "c1", 0, "user", "hi", None, dt.datetime(2026, 1, 1), '{"x":1}', 5)]
    apply_batch(spark, table, spark.createDataFrame(v2, CHANGE_EVENT_V2_SCHEMA), epoch=0)
    v1 = [(2, "insert", "c2", 0, "user", "yo", None, dt.datetime(2026, 1, 1))]
    apply_batch(spark, table, spark.createDataFrame(v1, CHANGE_EVENT_SCHEMA), epoch=1)
    rows = {r["conv_id"]: r for r in table.read().collect()}
    assert rows["c1"]["tool_meta"] == '{"x":1}' and rows["c1"]["latency_ms"] == 5
    assert rows["c2"]["tool_meta"] is None and rows["c2"]["latency_ms"] is None


# ---------------------------------------------------------------------------
# non-additive evolution: rename / drop / widen (Iceberg field-id semantics)
# ---------------------------------------------------------------------------
def test_rename_mid_stream_parity_and_key_history(spark, tmp_path):
    """Rename a payload column AND a key column between epochs; the final
    state must equal a table that ran the whole feed under the new names
    (oracle parity across the boundary), key_history must stay one relation
    across the rename, and time travel must show each era's own names."""
    from pyspark.sql import functions as F

    ev = change_events(spark, 4000, n_convs=200).localCheckpoint()
    h1 = ev.filter(F.col("lsn") % 2 == 0)
    h2 = ev.filter(F.col("lsn") % 2 == 1)
    ren = lambda df: df.withColumnRenamed("text", "content").withColumnRenamed(
        "conv_id", "conversation_id"
    )

    a = LakeTable.create(spark, str(tmp_path / "a"), TRANSCRIPT_SCHEMA,
                         ("conv_id", "turn_idx"), n_buckets=4)
    apply_batch(spark, a, h1, epoch=0)
    pre_rename_sid = a.current().snapshot_id
    a.rename_column("text", "content")
    a.rename_column("conv_id", "conversation_id")
    assert a.current().key_cols[0] == "conversation_id"
    apply_batch(spark, a, ren(h2), epoch=1)

    ref_schema = T.StructType(
        [
            T.StructField(
                {"conv_id": "conversation_id", "text": "content"}.get(f.name, f.name),
                f.dataType, f.nullable,
            )
            for f in TRANSCRIPT_SCHEMA.fields
        ]
    )
    b = LakeTable.create(spark, str(tmp_path / "b"), ref_schema,
                         ("conversation_id", "turn_idx"), n_buckets=4)
    apply_batch(spark, b, ren(h1), epoch=0)
    apply_batch(spark, b, ren(h2), epoch=1)

    got, want = a.read(), b.read()
    assert got.columns == want.columns
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()

    # key_history spans both eras under the CURRENT names
    key = a.read().select("conversation_id").first()[0]
    hist = a.key_history(key)
    assert "content" in hist.columns and "text" not in hist.columns
    epochs = {r["epoch"] for r in hist.collect()}
    assert epochs >= {0} and hist.filter("content IS NOT NULL").count() > 0

    # time travel: the pre-rename snapshot reads under its own era's names
    old = a.read(snapshot_id=pre_rename_sid)
    assert "conv_id" in old.columns and "conversation_id" not in old.columns

    # compaction rewrites everything under the new names and stays exact
    a.compact()
    got2 = a.read()
    assert got2.exceptAll(want).isEmpty() and want.exceptAll(got2).isEmpty()


def test_dropped_and_renamed_names_are_retired(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
                         ("conv_id", "turn_idx"), n_buckets=2)
    ev = change_events(spark, 300, n_convs=20)
    apply_batch(spark, t, ev, epoch=0)
    t.drop_column("tool")
    assert "tool" not in t.read().columns
    # re-introducing a retired name via additive evolution must fail
    with pytest.raises(ValueError, match="resurrect"):
        apply_batch(
            spark, t,
            ev.withColumn("tool", ev["role"]).withColumn(
                "lsn", ev["lsn"] + 10_000
            ),
            epoch=1,
        )
    # renaming onto a retired name must fail too
    with pytest.raises(ValueError, match="reused"):
        t.rename_column("text", "tool")
    with pytest.raises(ValueError, match="cannot drop key column"):
        t.drop_column("conv_id")


def test_widen_mid_stream_lww_across_eras(spark, tmp_path):
    from pyspark.sql import functions as F

    schema = T.StructType(
        [
            T.StructField("k", T.StringType(), False),
            T.StructField("v", T.IntegerType(), True),
            T.StructField("f", T.FloatType(), True),
        ]
    )
    t = LakeTable.create(spark, str(tmp_path / "w"), schema, ("k",), n_buckets=2)
    rows1 = spark.createDataFrame(
        [("a", 1, 1.5), ("b", 2, 2.5)], "k string, v int, f float"
    ).select("*", F.lit(1).cast("long").alias("_lsn"), F.lit(False).alias("_deleted"))
    t.merge(rows1, commit_key="e0")
    pre_widen_sid = t.current().snapshot_id
    t.widen_column("v", T.LongType())
    t.widen_column("f", T.DoubleType())
    big = 2**40
    rows2 = spark.createDataFrame(
        [("b", big, 9.25), ("c", big + 1, 0.5)], "k string, v long, f double"
    ).select("*", F.lit(2).cast("long").alias("_lsn"), F.lit(False).alias("_deleted"))
    t.merge(rows2, commit_key="e1")
    got = {r["k"]: (r["v"], r["f"]) for r in t.read().collect()}
    assert got == {"a": (1, 1.5), "b": (big, 9.25), "c": (big + 1, 0.5)}
    assert dict(t.read().dtypes)["v"] == "bigint"
    # time travel reads the pre-widen era under its own (narrow) types
    assert dict(t.read(snapshot_id=pre_widen_sid).dtypes)["v"] == "int"
    # unsound promotions rejected
    with pytest.raises(ValueError, match="unsupported widening"):
        t.widen_column("k", T.LongType())
    # changes() across the widening boundary resolves to the wide type
    ch = t.changes(0)
    assert dict(ch.dtypes)["v"] == "bigint" and ch.count() == 4
