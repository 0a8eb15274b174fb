"""Data-dictionary generation parity (reference's dictionary DAG)."""

from __future__ import annotations

import json

from postgres_to_snowflake_data_pipeline_spark.cdc.apply import apply_batch
from postgres_to_snowflake_data_pipeline_spark.cdc.generator import change_events
from postgres_to_snowflake_data_pipeline_spark.cdc.schemas import TRANSCRIPT_SCHEMA
from postgres_to_snowflake_data_pipeline_spark.lake.dictionary import (
    dictionary_markdown,
    table_dictionary,
    write_dictionary,
)
from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable


def test_dictionary_structure_and_stats(spark, tmp_path):
    table = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, ("conv_id", "turn_idx"), n_buckets=4
    )
    events = change_events(spark, 3000, n_convs=100)
    apply_batch(spark, table, events, epoch=0)

    doc = table_dictionary(spark, table)
    assert [c["column"] for c in doc["schema"]] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]
    assert doc["primary_key"] == ["conv_id", "turn_idx"]
    assert doc["partitioning"]["n_buckets"] == 4
    assert doc["n_data_files"] > 0 and doc["total_bytes"] > 0
    assert doc["snapshots"][-1]["operation"] == "merge"

    stats = {s["column"]: s for s in doc["column_stats"]}
    n_state = table.read().count()
    assert stats["conv_id"]["non_null"] == n_state and stats["conv_id"]["nulls"] == 0
    # deletes null the payload; surviving rows all carry text
    assert stats["text"]["non_null"] == n_state
    assert 0 < stats["conv_id"]["approx_distinct"] <= 110  # ~100 convs ±5% approx

    md = dictionary_markdown(doc)
    assert "| conv_id | string |" in md and "## Snapshots" in md

    paths = write_dictionary(spark, table, str(tmp_path / "dict"))
    with open(paths["json"]) as f:
        assert json.load(f)["current_snapshot"] == doc["current_snapshot"]
