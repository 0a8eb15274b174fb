"""Data-dictionary generation for lake tables.

Parity with the reference's dictionary DAG, which introspects
information_schema / SHOW commands into JSON + Markdown documents
(/root/reference/scripts/generate_postgres_dictionary.py:153-169 structure,
/root/reference/scripts/generate_snowflake_dictionary.py:169-185, rendered
and shipped by /root/reference/dags/data_dictionary_dag.py:196-217). Our
catalog is the snapshot log, so the structural sections cost zero Spark
jobs; optional per-column statistics run as ONE vectorized aggregation
pass (count/nulls/approx-distinct/min/max per column — the scan is
column-pruned to exactly the profiled columns).
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from postgres_to_snowflake_data_pipeline_spark.lake.table import LakeTable

_PROFILABLE = (
    T.NumericType,
    T.StringType,
    T.TimestampType,
    T.DateType,
    T.BooleanType,
)


def column_stats(spark: SparkSession, table: LakeTable) -> list[dict[str, Any]]:
    """One aggregation pass over the current state: per-column non-null
    count, null count, approx distinct, min, max (analog of the per-column
    detail the reference pulls from catalog metadata)."""
    df = table.read()
    aggs: list[F.Column] = [F.count(F.lit(1)).alias("__rows")]
    fields = [f for f in table.schema().fields if isinstance(f.dataType, _PROFILABLE)]
    for f in fields:
        c = f.name
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            F.approx_count_distinct(c).alias(f"{c}__dv"),
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
        ]
    row = df.agg(*aggs).first().asDict()
    out = []
    for f in fields:
        c = f.name
        out.append(
            {
                "column": c,
                "type": f.dataType.simpleString(),
                "nullable": f.nullable,
                "non_null": int(row[f"{c}__nn"]),
                "nulls": int(row["__rows"]) - int(row[f"{c}__nn"]),
                "approx_distinct": int(row[f"{c}__dv"]),
                "min": None if row[f"{c}__min"] is None else str(row[f"{c}__min"]),
                "max": None if row[f"{c}__max"] is None else str(row[f"{c}__max"]),
            }
        )
    return out


def table_dictionary(
    spark: SparkSession, table: LakeTable, with_stats: bool = True
) -> dict[str, Any]:
    """Structured dictionary document for one lake table: schema, keys,
    partitioning, physical layout, commit history — the union of what the
    reference's Postgres and Snowflake dictionaries record."""
    snap = table.current()
    files = [e for es in snap.files.values() for e in es]
    total_bytes = 0
    for e in files:
        p = os.path.join(table.root, e["path"])
        if table.fs.exists(p):
            total_bytes += table.fs.getsize(p)
    # per-table/per-column COMMENTs (LakeTable.set_comments; the
    # reference's obj_description/col_description analog — stored by
    # stable field id, so renames keep their descriptions)
    comments = table.comments(snap)
    doc: dict[str, Any] = {
        "table_root": table.root,
        "format_version": 1,
        "description": comments["table"],
        "schema": [
            {
                "column": f.name,
                "type": f.dataType.simpleString(),
                "nullable": f.nullable,
                "comment": comments["columns"].get(f.name),
            }
            for f in snap.schema.fields
        ],
        "primary_key": list(snap.key_cols),
        "partitioning": {"kind": "hash_bucket", "column": snap.key_cols[0],
                         "n_buckets": snap.n_buckets},
        "current_snapshot": snap.snapshot_id,
        "n_data_files": len(files),
        "total_bytes": total_bytes,
        "snapshots": [
            {
                "snapshot_id": s.snapshot_id,
                "operation": s.summary.get("operation"),
                "epoch": s.summary.get("epoch"),
                "rows_in": s.summary.get("rows_in"),
                "committed_at_unix": s.summary.get("committed_at_unix"),
            }
            for s in table.snapshots()
        ],
    }
    if with_stats:
        doc["column_stats"] = column_stats(spark, table)
    return doc


def dictionary_markdown(doc: dict[str, Any]) -> str:
    """Render the dictionary as Markdown (the reference ships .md next to
    .json, /root/reference/dags/data_dictionary_dag.py:196-217)."""
    lines = [
        f"# Data dictionary — `{doc['table_root']}`",
        "",
        *([doc["description"], ""] if doc.get("description") else []),
        f"- Primary key: `{', '.join(doc['primary_key'])}`",
        f"- Partitioning: {doc['partitioning']['kind']}"
        f"({doc['partitioning']['column']}, {doc['partitioning']['n_buckets']})",
        f"- Current snapshot: {doc['current_snapshot']}"
        f" · data files: {doc['n_data_files']} · bytes: {doc['total_bytes']}",
        "",
        "## Columns",
        "",
        "| column | type | nullable | comment |",
        "|---|---|---|---|",
    ]
    for c in doc["schema"]:
        lines.append(
            f"| {c['column']} | {c['type']} | {c['nullable']} |"
            f" {c.get('comment') or ''} |"
        )
    if "column_stats" in doc:
        lines += [
            "",
            "## Column statistics",
            "",
            "| column | non-null | nulls | ~distinct | min | max |",
            "|---|---|---|---|---|---|",
        ]
        for s in doc["column_stats"]:
            lines.append(
                f"| {s['column']} | {s['non_null']} | {s['nulls']} |"
                f" {s['approx_distinct']} | {s['min']} | {s['max']} |"
            )
    lines += ["", "## Snapshots", "", "| id | operation | epoch | rows_in |", "|---|---|---|---|"]
    for s in doc["snapshots"]:
        lines.append(
            f"| {s['snapshot_id']} | {s['operation']} | {s['epoch']} | {s['rows_in']} |"
        )
    return "\n".join(lines) + "\n"


def write_dictionary(
    spark: SparkSession, table: LakeTable, out_dir: str, with_stats: bool = True
) -> dict[str, str]:
    """Write `<name>.json` + `<name>.md` under ``out_dir``; returns paths."""
    os.makedirs(out_dir, exist_ok=True)
    doc = table_dictionary(spark, table, with_stats=with_stats)
    name = os.path.basename(table.root.rstrip("/")) or "table"
    jp = os.path.join(out_dir, f"{name}.json")
    mp = os.path.join(out_dir, f"{name}.md")
    with open(jp, "w") as f:
        json.dump(doc, f, indent=2)
    with open(mp, "w") as f:
        f.write(dictionary_markdown(doc))
    return {"json": jp, "markdown": mp}
