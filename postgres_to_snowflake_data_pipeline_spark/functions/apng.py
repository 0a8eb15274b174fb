"""Minimal, REAL APNG (animated PNG) codec — Python stdlib only.

The container has no ffmpeg (probed round 2), but APNG is a public spec
(PNG third edition §4.6 / the original Mozilla spec) layered on chunks the
repo's PNG codec already implements, so the VIDEO modality's decode path
can be genuine too: ``encode_apng`` writes a standard animated PNG —
signature, IHDR, ``acTL`` (frame count), then per frame an ``fcTL``
(frame control: dimensions, offsets, delay fraction) followed by the
frame's own zlib datastream (``IDAT`` for the first frame, ``fdAT`` with
a sequence-number prefix for the rest) — and ``decode_apng`` parses any
such file back: chunk walk with CRC verification, acTL/fcTL field checks,
strict sequence-number ordering, per-frame inflate + scanline unfilter
(shared with the still-image codec in ``png.py``).

Scope (mirrors png.py's): 8-bit RGB, full-canvas frames (no partial
x/y offsets, dispose/blend 0) — every frame the encoder writes. Anything
else raises ValueError: decode errors must be loud, not NULL-shaped.

Used by queries/multimodal.py: generated video payloads are real APNG
bytes; the decoded frame count, dimensions, per-frame delays and frame
PIXELS flow into oracle-checked outputs (m01 metadata, m02 sampled-frame
timestamps + content signatures), so a codec bug is a correctness
failure. Per-blob Python is the honest shape for codec work — the
parallelism lives in the Arrow batching and Spark partitioning, exactly
as it would with ffmpeg bindings.
"""

from __future__ import annotations

import struct
import zlib

from postgres_to_snowflake_data_pipeline_spark.functions.png import (
    _SIG,
    _chunk,
    filter_raster,
    unfilter_raster,
)


def encode_apng(
    width: int,
    height: int,
    frames: list[bytes],
    delays: list[tuple[int, int]],
) -> bytes:
    """8-bit RGB animated PNG. Each frame must be width*height*3 raster
    bytes; ``delays[i]`` is the (numerator, denominator-of-a-second)
    display time of frame i, written verbatim into its fcTL."""
    if not frames:
        raise ValueError("APNG needs at least one frame")
    if len(delays) != len(frames):
        raise ValueError("one delay per frame required")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    out = bytearray(_SIG)
    out += _chunk(b"IHDR", ihdr)
    out += _chunk(b"acTL", struct.pack(">II", len(frames), 0))  # 0 = loop
    seq = 0
    for i, (rgb, (num, den)) in enumerate(zip(frames, delays)):
        fctl = struct.pack(
            ">IIIIIHHBB", seq, width, height, 0, 0, num, den, 0, 0
        )
        out += _chunk(b"fcTL", fctl)
        seq += 1
        z = zlib.compress(filter_raster(width, height, rgb), 6)
        if i == 0:
            out += _chunk(b"IDAT", z)
        else:
            out += _chunk(b"fdAT", struct.pack(">I", seq) + z)
            seq += 1
    out += _chunk(b"IEND", b"")
    return bytes(out)


def is_apng(data: bytes) -> bool:
    """Signature + an acTL chunk before the first IDAT (the spec's rule
    for distinguishing an animated PNG from a still one)."""
    if data[:8] != _SIG:
        return False
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos: pos + 4])
        tag = data[pos + 4: pos + 8]
        if tag == b"acTL":
            return True
        if tag in (b"IDAT", b"IEND"):
            return False
        pos += 12 + length
    return False


def decode_apng(
    data: bytes,
) -> tuple[int, int, list[bytes], list[int]]:
    """Parse an 8-bit RGB APNG back to (width, height, frame rasters,
    per-frame delays in milliseconds). Verifies chunk CRCs, acTL/fcTL
    consistency and sequence-number order; reverses all five scanline
    filters per frame. Raises ValueError on anything malformed."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    n_frames = None
    # per-frame accumulation: fcTL opens a frame, IDAT/fdAT append to it
    streams: list[bytearray] = []
    delays_ms: list[int] = []
    expect_seq = 0
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos: pos + 4])
        tag = data[pos + 4: pos + 8]
        if pos + 12 + length > len(data):
            raise ValueError(f"truncated APNG ({tag!r} chunk exceeds data)")
        body = data[pos + 8: pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length: pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, depth, ctype = struct.unpack(">IIBB", body[:10])
            if depth != 8 or ctype != 2:
                raise ValueError(
                    f"unsupported APNG (bit depth {depth}, color type "
                    f"{ctype}); this codec handles 8-bit RGB"
                )
        elif tag == b"acTL":
            n_frames, _plays = struct.unpack(">II", body)
            if n_frames < 1:
                raise ValueError("acTL declares zero frames")
        elif tag == b"fcTL":
            (seq, fw, fh, xo, yo, num, den, _disp, _blend) = struct.unpack(
                ">IIIIIHHBB", body
            )
            if seq != expect_seq:
                raise ValueError(
                    f"fcTL sequence {seq}, expected {expect_seq}"
                )
            expect_seq += 1
            if (fw, fh, xo, yo) != (width, height, 0, 0):
                raise ValueError(
                    "unsupported APNG (partial-canvas frame); this codec "
                    "handles full-canvas frames only"
                )
            streams.append(bytearray())
            # spec: denominator 0 means 1/100ths of a second
            delays_ms.append(num * 1000 // (den if den else 100))
        elif tag == b"IDAT":
            if not streams:
                raise ValueError("IDAT before the first fcTL")
            streams[-1] += body
        elif tag == b"fdAT":
            (seq,) = struct.unpack(">I", body[:4])
            if seq != expect_seq:
                raise ValueError(
                    f"fdAT sequence {seq}, expected {expect_seq}"
                )
            expect_seq += 1
            if not streams:
                raise ValueError("fdAT before the first fcTL")
            streams[-1] += body[4:]
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None or n_frames is None:
        raise ValueError("truncated APNG (missing IHDR/acTL)")
    if len(streams) != n_frames:
        raise ValueError(
            f"acTL declares {n_frames} frames, found {len(streams)} fcTL"
        )
    frames = []
    for z in streams:
        if not z:
            raise ValueError("frame with no image data")
        try:
            raw = zlib.decompress(bytes(z))
        except zlib.error as e:
            raise ValueError(f"truncated APNG (bad frame stream: {e})") from e
        frames.append(unfilter_raster(width, height, raw))
    return width, height, frames, delays_ms
