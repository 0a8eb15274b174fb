"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real pipelines carry image/audio/video as `binary` columns with a typed
metadata struct and decode/feature-extract in Arrow-batched Python
(`mapInPandas`). The image/audio codecs aren't available in this
container, so the decode is a clearly-marked deterministic fake — a pure
function of the payload bytes — while everything Spark-side (schema,
Arrow batch shape, partition-parallel execution) is real and tested.

At 100 TB the decode stage is the pattern that matters: mapInPandas
streams Arrow record batches through the Python worker — constant memory
per batch, parallel per partition, no driver involvement, no per-row
Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from postgres_to_snowflake_data_pipeline_spark.queries.base import load

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)


def m01_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary ingestion + Arrow-batched decode: text → utf-8 payload bytes
    (standing in for image blobs) → mapInPandas fake decode → typed
    metadata. Oracle-checkable because the fake decode is a pure function
    of octet length.

    The decode fn is a *closure* on purpose: cloudpickle serializes local
    functions by value, so Python workers never import this package —
    the UDF runs even when the driver wasn't launched with --py-files."""

    def fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # STUB decoder (deterministic fake): 'image dimensions' purely from
        # payload byte length, vectorized per Arrow batch. A real deployment
        # swaps the body for PIL/ffmpeg calls with identical schema.
        for pdf in batches:
            n = pdf["payload"].map(len).astype("int32")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n,
                    "width": (n % 640 + 1).astype("int32"),
                    "height": (n * 7 % 480 + 1).astype("int32"),
                    "n_frames": (n % 30 + 1).astype("int32"),
                }
            )

    d = load(spark, sf_dir, "documents")
    with_payload = d.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
    )
    return with_payload.mapInPandas(fake_decode, DECODED_SCHEMA)


M01_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image/png'
            WHEN doc_id % 3 = 1 THEN 'audio/wav'
            ELSE 'video/mp4' END AS media_type,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width,
       CAST(octet_length(encode(text)) * 7 % 480 + 1 AS INTEGER) AS height,
       CAST(octet_length(encode(text)) % 30 + 1 AS INTEGER) AS n_frames
FROM documents
"""


# ---------------------------------------------------------------------------
# m02 — frame sampling: 1→N Arrow-batched decode (each video payload yields
# n_frames rows). The mapInPandas generator shape is exactly a real
# ffmpeg-based sampler's: consume a batch of payloads, emit a frame table.
# Deterministic fake => oracle-checkable via unnest(range(...)).
# ---------------------------------------------------------------------------
FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ts_ms", T.IntegerType(), False),
        T.StructField("frame_sig", T.StringType(), False),
    ]
)

FPS = 4  # fake sampling rate: one frame per 250 ms


def m02_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    fps = FPS

    def fake_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # STUB frame sampler (deterministic fake): n_frames from byte
        # length, per-frame signature from (doc_id, frame_idx) — vectorized
        # via repeat + groupwise cumcount. Closure => serialized by value,
        # workers need no package import.
        import hashlib

        for pdf in batches:
            n = pdf["payload"].map(len) % 30 + 1  # same n_frames rule as m01
            doc_ids = pdf["doc_id"].repeat(n).reset_index(drop=True)
            frame_idx = doc_ids.groupby(doc_ids).cumcount().astype("int32")
            sig = (doc_ids.astype(str) + "#" + frame_idx.astype(str)).map(
                lambda s: hashlib.md5(s.encode()).hexdigest()[:16]
            )
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "frame_idx": frame_idx,
                    "frame_ts_ms": (frame_idx * (1000 // fps)).astype("int32"),
                    "frame_sig": sig,
                }
            )

    d = load(spark, sf_dir, "documents")
    with_payload = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return with_payload.mapInPandas(fake_frames, FRAME_SCHEMA)


M02_SQL = f"""
SELECT doc_id,
       CAST(f AS INTEGER) AS frame_idx,
       CAST(f * (1000 // {FPS}) AS INTEGER) AS frame_ts_ms,
       substr(md5(concat(CAST(doc_id AS VARCHAR), '#', CAST(f AS VARCHAR))), 1, 16)
           AS frame_sig
FROM documents,
     LATERAL unnest(range(0, octet_length(encode(text)) % 30 + 1)) AS t(f)
"""


# ---------------------------------------------------------------------------
# m03 — resize stub: Arrow-batched image resize to a fixed 224×224 target
# (the training-prep normalization step). The fake scales the byte count by
# the area ratio — a pure function of the m01 fake dimensions, so the whole
# decode→resize chain stays oracle-checkable.
# ---------------------------------------------------------------------------
RESIZE_TO = 224

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("src_width", T.IntegerType(), True),
        T.StructField("src_height", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("resized_n_bytes", T.LongType(), True),
    ]
)


def m03_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    target = RESIZE_TO

    def fake_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # STUB resizer (deterministic fake): byte count scales with the
        # area ratio; a real deployment calls PIL.Image.resize here with
        # the identical batch shape. Closure => shipped by value.
        for pdf in batches:
            area_ratio = (target * target) / (pdf["width"] * pdf["height"])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "src_width": pdf["width"],
                    "src_height": pdf["height"],
                    "width": target,
                    "height": target,
                    "resized_n_bytes": (pdf["n_bytes"] * area_ratio)
                    .astype("int64"),
                }
            )

    decoded = m01_multimodal_decode(spark, sf_dir)
    return decoded.mapInPandas(fake_resize, RESIZED_SCHEMA)


M03_SQL = f"""
WITH d AS (
  SELECT doc_id,
         CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
         CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS w,
         CAST(octet_length(encode(text)) * 7 % 480 + 1 AS INTEGER) AS h
  FROM documents
)
SELECT doc_id, w AS src_width, h AS src_height,
       {RESIZE_TO} AS width, {RESIZE_TO} AS height,
       CAST(trunc(n_bytes * (({RESIZE_TO} * {RESIZE_TO}) / CAST(w * h AS DOUBLE))) AS BIGINT)
           AS resized_n_bytes
FROM d
"""
