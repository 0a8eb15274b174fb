"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real pipelines carry image/audio/video as `binary` columns with a typed
metadata struct and decode/feature-extract in Arrow-batched Python
(`mapInPandas`). PIL/ffmpeg aren't in this container, but PNG needs only
stdlib zlib and WAV only stdlib `wave` — so TWO modalities are GENUINE
codec round-trips: m01's image rows carry real PNG blobs
(signature/IHDR/IDAT/CRC, all five scanline filters) and its audio rows
carry real WAV blobs (RIFF header, 16-bit mono PCM frames), both built
from the document text; the decode stages parse them back, and the
decoded dimensions / sample rate / frame counts flow into the
oracle-checked outputs of m01 and m02, so a decoder bug is a
correctness failure, not a silent fake. Only VIDEO decode remains a
clearly-marked deterministic fake with the identical batch shape (swap
the body for ffmpeg in a real deployment).

At 100 TB the decode stage is the pattern that matters: mapInPandas
streams Arrow record batches through the Python worker — constant memory
per batch, parallel per partition, no driver involvement, no per-row
Python (codec work is inherently per-blob; the parallelism is the
partitioning).

The codec module is registered for pickle-BY-VALUE: closures reference
it, and workers must run it without importing this package (the driver
may run from a foreign cwd without --py-files — CLAUDE.md).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.cloudpickle as _cloudpickle

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from postgres_to_snowflake_data_pipeline_spark.functions import png as _png
from postgres_to_snowflake_data_pipeline_spark.functions import wav as _wav
from postgres_to_snowflake_data_pipeline_spark.queries.base import load

_cloudpickle.register_pickle_by_value(_png)
_cloudpickle.register_pickle_by_value(_wav)

# deterministic audio-encode parameters, pure functions of the text byte
# count n — the encode closures inline the same formulas (closures ship by
# value; package helpers would force workers to import the package), and
# the DuckDB oracles splice these SQL fragments verbatim
WAV_RATE = "(8000 + (n % 8) * 1000)"  # 8..15 kHz
WAV_FRAMES = "(n * 7 % 6000 + 1)"  # 1..6000 PCM frames, 16-bit mono

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


def build_payloads(
    spark: SparkSession,
    sf_dir: str,
    encode_media: frozenset[str] | None = None,
    only_media: str | None = None,
) -> DataFrame:
    """Binary ingestion stage: image rows (doc_id % 3 == 0) become REAL PNG
    blobs — dimensions derived from the text length, pixels = the utf-8
    text cycled to fill the raster; audio rows (doc_id % 3 == 1) become
    REAL WAV blobs — 16-bit mono PCM at a text-derived sample rate, frames
    = the utf-8 text cycled to fill the buffer; video rows carry the raw
    utf-8 bytes as an opaque stand-in blob. ``src_n_bytes`` preserves the
    pre-encode byte count — encoded blob sizes are compression-dependent
    (PNG) and must never leak into oracle math.

    ``encode_media`` limits which media types get REAL encoding (others
    pass the raw bytes through): a consumer that only decodes audio (m02)
    must not pay the per-row Python PNG encode for blobs it never opens.
    None = encode every encodable modality.

    ``only_media`` restricts the OUTPUT to one media type: the filter is
    applied to the raw projection BELOW the encode UDF (Catalyst cannot
    push a filter through ``mapInPandas``), so a single-modality consumer
    (m04) never ships the other two-thirds of the corpus through the
    Python worker at all."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                n = len(data)
                if doc_id % 3 == 0 and (
                    encode_media is None or "image/png" in encode_media
                ):
                    w, h = n % 64 + 1, n * 7 % 48 + 1
                    need = w * h * 3
                    rgb = (data * (need // max(n, 1) + 1))[:need] if n else bytes(need)
                    blobs.append(_png.encode_png(w, h, rgb))
                elif doc_id % 3 == 1 and (
                    encode_media is None or "audio/wav" in encode_media
                ):
                    need = 2 * (n * 7 % 6000 + 1)  # WAV_FRAMES 16-bit frames
                    pcm = (data * (need // max(n, 1) + 1))[:need] if n else bytes(need)
                    blobs.append(
                        _wav.encode_wav(8000 + (n % 8) * 1000, 1, 2, pcm)
                    )
                else:
                    blobs.append(data)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload": blobs,
                    "src_n_bytes": pdf["src_n_bytes"],
                }
            )

    d = load(spark, sf_dir, "documents")
    raw = d.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.octet_length(F.encode("text", "UTF-8")).alias("src_n_bytes"),
    )
    if only_media is not None:
        raw = raw.filter(F.col("media_type") == only_media)
    return raw.mapInPandas(
        encode,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType(), False),
                T.StructField("media_type", T.StringType(), True),
                T.StructField("payload", T.BinaryType(), True),
                T.StructField("src_n_bytes", T.IntegerType(), True),
            ]
        ),
    )


def m01_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode: PNG payloads are parsed by the REAL stdlib
    codec (chunk walk, CRC check, inflate, unfilter) — width/height/n_bytes
    come from the decoded raster — and WAV payloads by the REAL stdlib
    `wave` parser — (n_bytes, width, height, n_frames) = (pcm bytes,
    sample rate, channels, frame count) from the RIFF/fmt headers. Both
    flow into the oracle's value-hash check, so each decoder is verified.
    Only video goes through the deterministic fake with the same batch
    shape.

    Closures + by-value-registered codec modules: workers never import
    this package, so the UDF runs even without --py-files."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, media_type, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                data = bytes(payload)
                # dispatch on the TYPED metadata, not content sniffing: a
                # video blob is raw text bytes and can legally start with
                # ASCII "RIFF..WAVE" — content-routing it into the WAV
                # parser would crash (or diverge from the media_type
                # contract). A mislabeled/corrupt blob fails LOUDLY inside
                # its decoder instead of silently taking the fake path.
                if media_type == "image/png":
                    w, h, rgb = _png.decode_png(data)  # REAL decode
                    rows.append((doc_id, media_type, len(rgb), w, h, 1))
                elif media_type == "audio/wav":
                    rate, ch, _sw, nf, pcm = _wav.decode_wav(data)  # REAL
                    rows.append((doc_id, media_type, len(pcm), rate, ch, nf))
                else:
                    # STUB for codec-less modalities (deterministic fake)
                    n = len(data)
                    rows.append(
                        (doc_id, media_type, n, n % 640 + 1, n * 7 % 480 + 1,
                         n % 30 + 1)
                    )
            out = pd.DataFrame(
                rows,
                columns=["doc_id", "media_type", "n_bytes", "width", "height",
                         "n_frames"],
            )
            for c in ("n_bytes", "width", "height", "n_frames"):
                out[c] = out[c].astype("int32")
            yield out

    return build_payloads(spark, sf_dir).mapInPandas(decode, DECODED_SCHEMA)


M01_SQL = f"""
WITH d AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image/png'
            WHEN doc_id % 3 = 1 THEN 'audio/wav'
            ELSE 'video/mp4' END AS media_type,
       CAST(CASE WHEN doc_id % 3 = 0
                 THEN (n % 64 + 1) * (n * 7 % 48 + 1) * 3
                 WHEN doc_id % 3 = 1 THEN {WAV_FRAMES} * 2
                 ELSE n END AS INTEGER) AS n_bytes,
       CAST(CASE WHEN doc_id % 3 = 0 THEN n % 64 + 1
                 WHEN doc_id % 3 = 1 THEN {WAV_RATE}
                 ELSE n % 640 + 1 END AS INTEGER) AS width,
       CAST(CASE WHEN doc_id % 3 = 0 THEN n * 7 % 48 + 1
                 WHEN doc_id % 3 = 1 THEN 1
                 ELSE n * 7 % 480 + 1 END AS INTEGER) AS height,
       CAST(CASE WHEN doc_id % 3 = 0 THEN 1
                 WHEN doc_id % 3 = 1 THEN {WAV_FRAMES}
                 ELSE n % 30 + 1 END AS INTEGER) AS n_frames
FROM d
"""


# ---------------------------------------------------------------------------
# m02 — frame sampling: 1→N Arrow-batched decode (each payload yields a
# variable number of frame rows). AUDIO rows are REAL: the sampler parses
# the WAV header (stdlib `wave`), takes one frame every rate/FPS PCM
# frames, and stamps each sampled frame's true timestamp from the decoded
# sample rate — so the oracle's hash check covers the parser. Image/video
# rows keep the deterministic fake over the ORIGINAL byte count (an
# encoded PNG's length is compression-dependent and must not drive
# oracle math). The mapInPandas generator shape is exactly a real
# ffmpeg-based sampler's: consume a batch of payloads, emit a frame table.
# ---------------------------------------------------------------------------
FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ts_ms", T.IntegerType(), False),
        T.StructField("frame_sig", T.StringType(), False),
    ]
)

FPS = 4  # sampling rate: one frame per 250 ms


def m02_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    fps = FPS

    def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Closure => serialized by value, workers need no package import.
        import hashlib

        for pdf in batches:
            rows = []
            for doc_id, media_type, payload, src_n in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"], pdf["src_n_bytes"]
            ):
                data = bytes(payload)
                # typed dispatch (see m01): a video blob may legally start
                # with ASCII "RIFF..WAVE" — never content-sniff it into the
                # WAV parser; malformed audio fails loudly in decode_wav
                if media_type == "audio/wav":
                    # REAL path: sample every (rate // fps)-th PCM frame
                    rate, _ch, _sw, nf, _pcm = _wav.decode_wav(data)
                    hop = rate // fps
                    for i in range((nf + hop - 1) // hop):
                        rows.append((doc_id, i, i * hop * 1000 // rate))
                else:
                    # STUB for codec-less modalities (deterministic fake)
                    for i in range(int(src_n) % 30 + 1):
                        rows.append((doc_id, i, i * (1000 // fps)))
            out = pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_ts_ms"]
            )
            out["frame_idx"] = out["frame_idx"].astype("int32")
            out["frame_ts_ms"] = out["frame_ts_ms"].astype("int32")
            out["frame_sig"] = (
                out["doc_id"].astype(str) + "#" + out["frame_idx"].astype(str)
            ).map(lambda s: hashlib.md5(s.encode()).hexdigest()[:16])
            yield out

    # audio-only encoding: the sampler never opens image/video blobs, so
    # paying the per-row PNG encode for a third of the corpus (only to
    # read src_n_bytes) would be pure wasted wall-clock in a headline query
    return build_payloads(
        spark, sf_dir, encode_media=frozenset({"audio/wav"})
    ).mapInPandas(sample_frames, FRAME_SCHEMA)


M02_SQL = f"""
WITH d AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
p AS (
  SELECT doc_id, n, {WAV_RATE} AS rate, {WAV_FRAMES} AS nf,
         {WAV_RATE} // {FPS} AS hop
  FROM d
),
counted AS (
  SELECT doc_id, rate, hop,
         CASE WHEN doc_id % 3 = 1 THEN (nf + hop - 1) // hop
              ELSE n % 30 + 1 END AS n_out
  FROM p
)
SELECT doc_id,
       CAST(f AS INTEGER) AS frame_idx,
       CAST(CASE WHEN doc_id % 3 = 1 THEN f * hop * 1000 // rate
                 ELSE f * (1000 // {FPS}) END AS INTEGER) AS frame_ts_ms,
       substr(md5(concat(CAST(doc_id AS VARCHAR), '#', CAST(f AS VARCHAR))), 1, 16)
           AS frame_sig
FROM counted, LATERAL unnest(range(0, n_out)) AS t(f)
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
WITH n0 AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
d AS (
  SELECT doc_id,
         CAST(CASE WHEN doc_id % 3 = 0
                   THEN (n % 64 + 1) * (n * 7 % 48 + 1) * 3
                   WHEN doc_id % 3 = 1 THEN {WAV_FRAMES} * 2
                   ELSE n END AS INTEGER) AS n_bytes,
         CAST(CASE WHEN doc_id % 3 = 0 THEN n % 64 + 1
                   WHEN doc_id % 3 = 1 THEN {WAV_RATE}
                   ELSE n % 640 + 1 END AS INTEGER) AS w,
         CAST(CASE WHEN doc_id % 3 = 0 THEN n * 7 % 48 + 1
                   WHEN doc_id % 3 = 1 THEN 1
                   ELSE n * 7 % 480 + 1 END AS INTEGER) AS h
  FROM n0
)
SELECT doc_id, w AS src_width, h AS src_height,
       {RESIZE_TO} AS width, {RESIZE_TO} AS height,
       CAST(trunc(n_bytes * (({RESIZE_TO} * {RESIZE_TO}) / CAST(w * h AS DOUBLE))) AS BIGINT)
           AS resized_n_bytes
FROM d
"""


# ---------------------------------------------------------------------------
# m04 — audio feature extraction over REAL PCM: each WAV blob is decoded
# by the stdlib parser and its int16 samples reduced to exact integer
# features (energy = Σ v², peak = max |v|, zero crossings = adjacent
# sign flips). All three are pure functions of the decoded sample
# stream, and the generator's PCM is the utf-8 text cycled — so the
# DuckDB oracle re-derives EVERY sample arithmetically (hex-pair byte
# extraction + int16 two's complement) and the value-hash check covers
# the full decode → frombuffer → reduce chain sample-by-sample. Integer
# features (not float RMS) keep the hash bit-exact across engines.
#
# At 100 TB this is the canonical audio-curation stage: mapInPandas
# streams Arrow batches through the worker, numpy reduces each blob
# vectorized (no per-sample Python), nothing but (doc_id, 5 ints)
# crosses the UDF boundary, and only the audio third of the corpus is
# shipped to Python at all (only_media pushes the modality filter below
# the encode).
# ---------------------------------------------------------------------------
AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("energy", T.LongType(), False),
        T.StructField("peak", T.IntegerType(), False),
        T.StructField("zero_crossings", T.IntegerType(), False),
    ]
)


def m04_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Closure => serialized by value, workers need no package import.
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, _ch, _sw, _nf, pcm = _wav.decode_wav(bytes(payload))
                s = np.frombuffer(pcm, dtype="<i2").astype(np.int64)
                sg = np.where(s >= 0, 1, -1)
                rows.append(
                    (
                        doc_id,
                        rate,
                        s.size,
                        int((s * s).sum()),
                        int(np.abs(s).max()) if s.size else 0,
                        int((sg[1:] != sg[:-1]).sum()),
                    )
                )
            out = pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "n_samples", "energy", "peak",
                    "zero_crossings",
                ],
            )
            for c in ("sample_rate", "n_samples", "peak", "zero_crossings"):
                out[c] = out[c].astype("int32")
            out["energy"] = out["energy"].astype("int64")
            yield out

    return build_payloads(
        spark,
        sf_dir,
        encode_media=frozenset({"audio/wav"}),
        only_media="audio/wav",
    ).mapInPandas(extract, AUDIO_FEATURES_SCHEMA)


# The oracle rebuilds the PCM stream arithmetically: sample i's two
# little-endian bytes sit at cycled text positions 2i and 2i+1 (hex-pair
# substr + 0x-cast, the CLAUDE.md hex→int trick), two's complement folds
# values ≥ 2^15, and a lag window recovers the sign-flip count. n = 0
# degenerates to one silent sample on both engines.
M04_SQL = f"""
WITH d AS (
  SELECT doc_id, octet_length(encode(text)) AS n, hex(encode(text)) AS h
  FROM documents WHERE doc_id % 3 = 1
),
p AS (
  SELECT doc_id, n, h, {WAV_RATE} AS rate, {WAV_FRAMES} AS nf FROM d
),
raw AS (
  SELECT doc_id, rate, nf, i,
         CASE WHEN n = 0 THEN 0
              ELSE CAST(concat('0x', substr(h, ((2*i) % n)*2 + 1, 2)) AS INTEGER)
         END AS lo,
         CASE WHEN n = 0 THEN 0
              ELSE CAST(concat('0x', substr(h, ((2*i+1) % n)*2 + 1, 2)) AS INTEGER)
         END AS hi
  FROM p, LATERAL unnest(range(0, nf)) AS t(i)
),
s AS (
  SELECT doc_id, rate, i,
         CASE WHEN lo + 256*hi >= 32768 THEN lo + 256*hi - 65536
              ELSE lo + 256*hi END AS v
  FROM raw
),
w AS (
  SELECT doc_id, rate, v,
         CASE WHEN v >= 0 THEN 1 ELSE -1 END AS sg,
         lag(CASE WHEN v >= 0 THEN 1 ELSE -1 END)
             OVER (PARTITION BY doc_id ORDER BY i) AS prev_sg
  FROM s
)
SELECT doc_id,
       CAST(min(rate) AS INTEGER) AS sample_rate,
       CAST(count(*) AS INTEGER) AS n_samples,
       CAST(sum(v * v) AS BIGINT) AS energy,
       CAST(max(abs(v)) AS INTEGER) AS peak,
       CAST(sum(CASE WHEN prev_sg IS NOT NULL AND sg <> prev_sg
                     THEN 1 ELSE 0 END) AS INTEGER) AS zero_crossings
FROM w
GROUP BY doc_id
"""
