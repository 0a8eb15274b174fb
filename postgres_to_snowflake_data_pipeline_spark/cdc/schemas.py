"""Schemas for the transcripts table and its CDC feed.

The transcripts shape is mandated by BASELINE.json ``input_hint``:
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp)``. The change-event shape mirrors a Postgres logical-decoding
(WAL) record: a strictly increasing LSN, an op tag, the key, and the payload
— the streaming analog of the reference's snapshot extraction row
(/root/reference/scripts/export_to_s3.py:74-86), whose ``source_database`` /
``export_timestamp`` lineage columns become our per-epoch lineage rows.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Logical primary key of the transcripts table (enforced by the merge).
KEY_COLS = ("conv_id", "turn_idx")

#: Total-order column of the change feed (WAL log sequence number).
ORDER_COL = "lsn"

#: Operation tags carried by change events.
OPS = ("insert", "update", "delete")

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

CHANGE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

#: Additive-evolution variant (FIXTURES.md §2a): two new nullable columns.
CHANGE_EVENT_V2_SCHEMA = T.StructType(
    CHANGE_EVENT_SCHEMA.fields
    + [
        T.StructField("tool_meta", T.StringType(), True),
        T.StructField("latency_ms", T.IntegerType(), True),
    ]
)

#: Payload columns (everything that is not key/order/op).
def payload_cols(schema: T.StructType) -> list[str]:
    skip = set(KEY_COLS) | {ORDER_COL, "op"}
    return [f.name for f in schema.fields if f.name not in skip]
