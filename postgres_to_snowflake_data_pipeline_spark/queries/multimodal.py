"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real pipelines carry image/audio/video as `binary` columns with a typed
metadata struct and decode/feature-extract in Arrow-batched Python
(`mapInPandas`). PIL/ffmpeg aren't in this container, but PNG needs only
stdlib zlib, WAV only stdlib `wave`, and APNG (animated PNG — the video
container here) is chunks over the same PNG machinery — so ALL THREE
modalities are GENUINE codec round-trips: image rows carry real PNG
blobs (signature/IHDR/IDAT/CRC, all five scanline filters), audio rows
real WAV blobs (RIFF header, 16-bit mono PCM frames), video rows real
APNG blobs (acTL/fcTL/fdAT with per-frame delays and sequence numbers),
all built from the document text. The decode stages parse them back, and
the decoded dimensions / sample rates / frame counts / frame timestamps /
frame PIXELS flow into the oracle-checked outputs of m01–m04, so a codec
bug is a correctness failure, not a silent fake. (An mp4/H.264 deployment
swaps ffmpeg into the same mapInPandas bodies — batch shape unchanged.)

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

from postgres_to_snowflake_data_pipeline_spark.functions import apng as _apng
from postgres_to_snowflake_data_pipeline_spark.functions import png as _png
from postgres_to_snowflake_data_pipeline_spark.functions import wav as _wav
from postgres_to_snowflake_data_pipeline_spark.queries.base import load

_cloudpickle.register_pickle_by_value(_png)
_cloudpickle.register_pickle_by_value(_wav)
_cloudpickle.register_pickle_by_value(_apng)

# deterministic encode parameters, pure functions of the text byte count n
# — the encode closures inline the same formulas (closures ship by value;
# package helpers would force workers to import the package), and the
# DuckDB oracles splice these SQL fragments verbatim
WAV_RATE = "(8000 + (n % 8) * 1000)"  # 8..15 kHz
WAV_FRAMES = "(n * 7 % 6000 + 1)"  # 1..6000 PCM frames, 16-bit mono
VID_W = "(n % 16 + 1)"  # 1..16 px — frames stay small: nf rasters per doc
VID_H = "(n * 7 % 12 + 1)"  # 1..12 px
VID_FRAMES = "(n % 30 + 1)"  # 1..30 frames
# frame i is displayed for 125*(1 + i%3) ms (fcTL num=1+i%3, den=8) — a
# VARIABLE frame rate, so m02's tick sampling has real work to do. The
# cumulative presentation timestamp of frame i has the closed form below
# (groups of 3 frames span 125+250+375 = 750 ms), which is what lets the
# DuckDB oracle re-derive the sampler's output without a codec.
VID_TS = "((i // 3) * 750 + CASE WHEN i % 3 = 0 THEN 0 WHEN i % 3 = 1 THEN 125 ELSE 375 END)"

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
    only_media: str | frozenset[str] | None = None,
) -> DataFrame:
    """Binary ingestion stage: image rows (doc_id % 3 == 0) become REAL PNG
    blobs — dimensions derived from the text length, pixels = the utf-8
    text cycled to fill the raster; audio rows (doc_id % 3 == 1) become
    REAL WAV blobs — 16-bit mono PCM at a text-derived sample rate, frames
    = the utf-8 text cycled to fill the buffer; video rows (doc_id % 3 ==
    2) become REAL APNG blobs — small text-derived frame dimensions,
    frame i's raster = the utf-8 text cycled starting at byte offset i
    (so every frame differs), variable per-frame fcTL delays.
    ``src_n_bytes`` preserves the pre-encode byte count — encoded blob
    sizes are compression-dependent and must never leak into oracle math.

    ``encode_media`` limits which media types get REAL encoding (others
    pass the raw bytes through): a consumer that only decodes audio (m04)
    must not pay the per-row Python PNG/APNG encode for blobs it never
    opens. None = encode every modality.

    ``only_media`` restricts the OUTPUT to the given media type(s): the
    filter is applied to the raw projection BELOW the encode UDF (Catalyst
    cannot push a filter through ``mapInPandas``), so a modality-scoped
    consumer (m02/m03/m04) never ships the excluded corpus slice through
    the Python worker at all."""

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
                elif doc_id % 3 == 2 and (
                    encode_media is None or "video/apng" in encode_media
                ):
                    w, h = n % 16 + 1, n * 7 % 12 + 1  # VID_W / VID_H
                    nf = n % 30 + 1  # VID_FRAMES
                    need = w * h * 3
                    frames = []
                    for i in range(nf):
                        if n:
                            rot = data[i % n:] + data[: i % n]
                            frames.append(
                                (rot * (need // n + 1))[:need]
                            )
                        else:
                            frames.append(bytes(need))
                    delays = [(1 + i % 3, 8) for i in range(nf)]  # VID_TS
                    blobs.append(_apng.encode_apng(w, h, frames, delays))
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
        .otherwise("video/apng")
        .alias("media_type"),
        F.octet_length(F.encode("text", "UTF-8")).alias("src_n_bytes"),
    )
    if isinstance(only_media, str):
        raw = raw.filter(F.col("media_type") == only_media)
    elif only_media is not None:
        raw = raw.filter(F.col("media_type").isin(*sorted(only_media)))
    # codec work is CPU-bound Python per blob: its parallelism IS the
    # partition count. At 100 TB the scan has thousands of splits; a
    # small local table arrives as ONE file → one Arrow worker, so fan
    # out to the session's parallelism before the encode (round-robin,
    # no key needed — blobs are row-independent).
    cores = spark.sparkContext.defaultParallelism
    if raw.rdd.getNumPartitions() < cores:
        raw = raw.repartition(cores)
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
    """Arrow-batched decode, every modality REAL: PNG payloads are parsed
    by the stdlib codec (chunk walk, CRC check, inflate, unfilter) —
    width/height/n_bytes come from the decoded raster; WAV payloads by the
    stdlib `wave` parser — (n_bytes, width, height, n_frames) = (pcm
    bytes, sample rate, channels, frame count) from the RIFF/fmt headers;
    APNG video payloads by the stdlib animated-PNG codec — width/height
    from IHDR, n_frames from acTL (cross-checked against the actual fcTL
    count), n_bytes = total decoded raster bytes across frames. All three
    flow into the oracle's value-hash check, so each decoder is verified.

    Closures + by-value-registered codec modules: workers never import
    this package, so the UDF runs even without --py-files."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, media_type, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                data = bytes(payload)
                # dispatch on the TYPED metadata, not content sniffing: an
                # APNG is also a syntactically valid PNG (decode_png would
                # read frame 0 and silently drop the animation) — the
                # media_type contract picks the decoder, and a mislabeled/
                # corrupt blob fails LOUDLY inside it.
                if media_type == "image/png":
                    w, h, rgb = _png.decode_png(data)  # REAL decode
                    rows.append((doc_id, media_type, len(rgb), w, h, 1))
                elif media_type == "audio/wav":
                    rate, ch, _sw, nf, pcm = _wav.decode_wav(data)  # REAL
                    rows.append((doc_id, media_type, len(pcm), rate, ch, nf))
                else:
                    w, h, frames, _delays = _apng.decode_apng(data)  # REAL
                    rows.append(
                        (doc_id, media_type,
                         sum(len(f) for f in frames), w, h, len(frames))
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
            ELSE 'video/apng' END AS media_type,
       CAST(CASE WHEN doc_id % 3 = 0
                 THEN (n % 64 + 1) * (n * 7 % 48 + 1) * 3
                 WHEN doc_id % 3 = 1 THEN {WAV_FRAMES} * 2
                 ELSE {VID_W} * {VID_H} * 3 * {VID_FRAMES} END AS INTEGER)
           AS n_bytes,
       CAST(CASE WHEN doc_id % 3 = 0 THEN n % 64 + 1
                 WHEN doc_id % 3 = 1 THEN {WAV_RATE}
                 ELSE {VID_W} END AS INTEGER) AS width,
       CAST(CASE WHEN doc_id % 3 = 0 THEN n * 7 % 48 + 1
                 WHEN doc_id % 3 = 1 THEN 1
                 ELSE {VID_H} END AS INTEGER) AS height,
       CAST(CASE WHEN doc_id % 3 = 0 THEN 1
                 WHEN doc_id % 3 = 1 THEN {WAV_FRAMES}
                 ELSE {VID_FRAMES} END AS INTEGER) AS n_frames
FROM d
"""


# ---------------------------------------------------------------------------
# m02 — frame sampling over time-based media (audio + video), 1→N
# Arrow-batched decode (each payload yields a variable number of frame
# rows), both paths REAL:
#   - AUDIO: the sampler parses the WAV header (stdlib `wave`), takes one
#     frame every rate/FPS PCM frames, and stamps each sampled frame's
#     true timestamp from the decoded sample rate.
#   - VIDEO: the sampler decodes the APNG, accumulates the fcTL delay of
#     each frame into its presentation timestamp, and emits the first
#     frame of every FPS-tick (variable frame rate, so ticks land
#     mid-sequence); each sampled frame's signature is the md5 of its
#     DECODED RASTER (hex form) — the hash check covers the full chunk
#     walk → inflate → unfilter pixel path, not just the metadata.
# The DuckDB oracle re-derives the video timestamps from the closed-form
# delay schedule (VID_TS) and rebuilds each raster's hex by rotating and
# cycling the document's hex string — so both engines hash identical
# pixel content. The mapInPandas generator shape is exactly a real
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

        tick_ms = 1000 // fps
        for pdf in batches:
            rows = []
            for doc_id, media_type, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                data = bytes(payload)
                # typed dispatch (see m01): a WAV blob and an APNG blob are
                # both self-describing, but the media_type contract picks
                # the decoder; malformed blobs fail loudly inside it
                if media_type == "audio/wav":
                    # REAL path: sample every (rate // fps)-th PCM frame;
                    # the sampled "frame" has no pixel content, so its
                    # signature is positional (doc#idx)
                    rate, _ch, _sw, nf, _pcm = _wav.decode_wav(data)
                    hop = rate // fps
                    for i in range((nf + hop - 1) // hop):
                        sig = hashlib.md5(
                            f"{doc_id}#{i}".encode()
                        ).hexdigest()[:16]
                        rows.append((doc_id, i, i * hop * 1000 // rate, sig))
                else:
                    # REAL path: decode the APNG, accumulate fcTL delays
                    # into presentation timestamps, emit the first frame
                    # of each fps-tick; signature = md5 of the decoded
                    # raster's hex (both engines hash identical content)
                    _w, _h, frames, delays_ms = _apng.decode_apng(data)
                    ts = 0
                    prev_tick = None
                    for i, (raster, d_ms) in enumerate(
                        zip(frames, delays_ms)
                    ):
                        tick = ts // tick_ms
                        if prev_tick is None or tick > prev_tick:
                            sig = hashlib.md5(
                                raster.hex().upper().encode()
                            ).hexdigest()[:16]
                            rows.append((doc_id, i, ts, sig))
                            prev_tick = tick
                        ts += d_ms
            out = pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "frame_ts_ms", "frame_sig"],
            )
            out["frame_idx"] = out["frame_idx"].astype("int32")
            out["frame_ts_ms"] = out["frame_ts_ms"].astype("int32")
            yield out

    # time-based media only: images have no frame axis, and the modality
    # filter is pushed below the encode, so the image third of the corpus
    # never ships through the Python worker at all
    media = frozenset({"audio/wav", "video/apng"})
    return build_payloads(
        spark, sf_dir, encode_media=media, only_media=media
    ).mapInPandas(sample_frames, FRAME_SCHEMA)


# Video raster re-derivation: frame i's pixels are the document's bytes
# cycled from offset i, so its hex is the document's hex ROTATED by i
# byte-pairs and cycled to raster length; tick selection compares each
# frame's closed-form timestamp tick against its predecessor's (lag).
M02_SQL = f"""
WITH d AS (
  SELECT doc_id, octet_length(encode(text)) AS n, hex(encode(text)) AS hh
  FROM documents WHERE doc_id % 3 <> 0
),
p AS (
  SELECT doc_id, n, hh, {WAV_RATE} AS rate, {WAV_FRAMES} AS nfa,
         {WAV_RATE} // {FPS} AS hop,
         {VID_W} AS vw, {VID_H} AS vh, {VID_FRAMES} AS nfv
  FROM d
),
a AS (
  SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
         CAST(f * hop * 1000 // rate AS INTEGER) AS frame_ts_ms,
         substr(md5(concat(CAST(doc_id AS VARCHAR), '#',
                           CAST(f AS VARCHAR))), 1, 16) AS frame_sig
  FROM p, LATERAL unnest(range(0, (nfa + hop - 1) // hop)) AS t(f)
  WHERE doc_id % 3 = 1
),
v0 AS (
  SELECT doc_id, n, hh, vw, vh, i, {VID_TS} AS ts
  FROM p, LATERAL unnest(range(0, nfv)) AS t(i)
  WHERE doc_id % 3 = 2
),
v1 AS (
  SELECT *, lag(ts) OVER (PARTITION BY doc_id ORDER BY i) AS pts FROM v0
),
v AS (
  SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
         CAST(ts AS INTEGER) AS frame_ts_ms,
         substr(md5(
           CASE WHEN n = 0 THEN repeat('00', vw * vh * 3)
                ELSE substr(
                       repeat(concat(substr(hh, (i % n) * 2 + 1),
                                     substr(hh, 1, (i % n) * 2)),
                              CAST(vw * vh * 3 // greatest(n, 1) + 1
                                   AS INTEGER)),
                       1, vw * vh * 3 * 2)
           END), 1, 16) AS frame_sig
  FROM v1
  WHERE pts IS NULL OR ts // (1000 // {FPS}) > pts // (1000 // {FPS})
)
SELECT * FROM a UNION ALL SELECT * FROM v
"""


# ---------------------------------------------------------------------------
# m03 — REAL image resize: Arrow-batched nearest-neighbor resample of each
# decoded PNG raster to a fixed 224×224 target (the training-prep
# normalization step; PIL-free — NN resize is two integer index maps over
# the numpy raster, fully vectorized per image). The output carries a
# GRID CHECKSUM — a weighted sum over an 8×8 pixel grid of the RESIZED
# raster — which the DuckDB oracle re-derives arithmetically (resized
# pixel (x,y,c) = source pixel (x*w//224, y*h//224, c) = text byte
# ((py*w+px)*3+c) mod n, extracted as a hex pair), so the value-hash
# check covers the decode → resample pixel math end-to-end. A bilinear
# or PIL deployment swaps the two index-map lines; the batch shape and
# checksum contract stay.
# ---------------------------------------------------------------------------
RESIZE_TO = 224
GRID = 8  # checksum samples an 8×8 grid of the resized raster

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("src_width", T.IntegerType(), True),
        T.StructField("src_height", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("grid_checksum", T.LongType(), False),
    ]
)


def m03_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    target = RESIZE_TO
    grid = GRID

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Closure => shipped by value; numpy does the per-image work.
        import numpy as np

        step = target // grid
        weights = np.arange(1, grid * grid * 3 + 1).reshape(grid, grid, 3)
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, rgb = _png.decode_png(bytes(payload))  # REAL decode
                a = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
                ys = (np.arange(target) * h) // target  # NN index maps
                xs = (np.arange(target) * w) // target
                resized = a[ys][:, xs]  # REAL resample (224, 224, 3)
                g = resized[::step, ::step].astype(np.int64)
                rows.append(
                    (doc_id, w, h, target, target, int((g * weights).sum()))
                )
            out = pd.DataFrame(
                rows,
                columns=["doc_id", "src_width", "src_height", "width",
                         "height", "grid_checksum"],
            )
            for c in ("src_width", "src_height", "width", "height"):
                out[c] = out[c].astype("int32")
            out["grid_checksum"] = out["grid_checksum"].astype("int64")
            yield out

    # images only, filter pushed below the encode (see build_payloads)
    return build_payloads(
        spark,
        sf_dir,
        encode_media=frozenset({"image/png"}),
        only_media="image/png",
    ).mapInPandas(resize, RESIZED_SCHEMA)


# Grid sample k (0..191) decomposes as (gy, gx, c) = (k//24, (k//3)%8,
# k%3); the resized grid pixel (28*gx, 28*gy) NN-maps to source pixel
# (gx*w//8, gy*h//8) — since (28*g*dim)//224 == (g*dim)//8 exactly — and
# source byte index ((py*w+px)*3+c) mod n is a hex pair of the text.
M03_SQL = f"""
WITH d AS (
  SELECT doc_id, octet_length(encode(text)) AS n, hex(encode(text)) AS hh
  FROM documents WHERE doc_id % 3 = 0
),
p AS (
  SELECT doc_id, n, hh, (n % 64 + 1) AS w, (n * 7 % 48 + 1) AS h FROM d
),
g AS (
  SELECT doc_id, w, h, k,
         CASE WHEN n = 0 THEN 0
              ELSE CAST(concat('0x', substr(hh,
                     (((((k // 24) * h) // 8) * w
                        + (((k // 3) % 8) * w) // 8) * 3 + k % 3)
                       % greatest(n, 1) * 2 + 1, 2)) AS INTEGER)
         END AS b
  FROM p, LATERAL unnest(range(0, {GRID * GRID * 3})) AS t(k)
)
SELECT doc_id,
       CAST(w AS INTEGER) AS src_width,
       CAST(h AS INTEGER) AS src_height,
       {RESIZE_TO} AS width, {RESIZE_TO} AS height,
       CAST(sum(b * (k + 1)) AS BIGINT) AS grid_checksum
FROM g
GROUP BY doc_id, w, h
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
