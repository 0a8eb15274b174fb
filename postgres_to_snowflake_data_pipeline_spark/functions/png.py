"""Minimal, REAL PNG codec — Python stdlib only (zlib + struct).

The container has no PIL/ffmpeg (probed round 2), but PNG's format is
public and zlib ships in the stdlib, so one modality's decode path can be
genuine: ``encode_png`` writes standard 8-bit RGB PNGs (signature, IHDR,
IDAT with per-scanline filters, IEND, CRC-32 per chunk) and ``decode_png``
parses any such file back — chunk walk, CRC verification, zlib inflate,
and reversal of all five scanline filters (None/Sub/Up/Average/Paeth,
PNG spec §9). The encoder deliberately cycles through every filter type
so the decoder's unfiltering is exercised end-to-end, not just filter 0.

Used by queries/multimodal.py (m01): generated image payloads are real
PNG bytes and the decoded dimensions flow into the oracle-checked output.
Decoding is vectorized per Arrow batch there; this module is per-image
(codec work is inherently per-blob — the parallelism lives in the Spark
partitioning, exactly as it would with PIL).
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def filter_raster(width: int, height: int, rgb: bytes) -> bytes:
    """Apply PNG scanline filtering to a raw RGB raster: the filtered byte
    stream that goes into an IDAT (or APNG fdAT) zlib stream. Scanline y
    uses filter type y % 5 — every decoder filter path gets traffic."""
    stride = width * 3
    if len(rgb) != stride * height:
        raise ValueError(f"need {stride * height} RGB bytes, got {len(rgb)}")
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = rgb[y * stride: (y + 1) * stride]
        ft = y % 5
        raw.append(ft)
        if ft == 0:  # None
            raw += line
        elif ft == 1:  # Sub
            raw += bytes(
                (line[i] - (line[i - 3] if i >= 3 else 0)) & 0xFF
                for i in range(stride)
            )
        elif ft == 2:  # Up
            raw += bytes((line[i] - prev[i]) & 0xFF for i in range(stride))
        elif ft == 3:  # Average
            raw += bytes(
                (line[i] - (((line[i - 3] if i >= 3 else 0) + prev[i]) >> 1)) & 0xFF
                for i in range(stride)
            )
        else:  # Paeth
            raw += bytes(
                (
                    line[i]
                    - _paeth(
                        line[i - 3] if i >= 3 else 0,
                        prev[i],
                        prev[i - 3] if i >= 3 else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        prev = line
    return bytes(raw)


def encode_png(width: int, height: int, rgb: bytes) -> bytes:
    """8-bit RGB (color type 2) PNG. ``rgb`` must be width*height*3 bytes."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(filter_raster(width, height, rgb), 6))
        + _chunk(b"IEND", b"")
    )


def is_png(data: bytes) -> bool:
    return data[:8] == _SIG


def decode_png(data: bytes) -> tuple[int, int, bytes]:
    """Parse an 8-bit RGB PNG back to (width, height, rgb bytes). Verifies
    chunk CRCs and reverses all five filter types. Raises ValueError on
    anything malformed — decode errors must be loud, not NULL-shaped."""
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos: pos + 4])
        tag = data[pos + 4: pos + 8]
        if pos + 12 + length > len(data):
            # cut off mid-chunk: body or CRC runs past EOF — keep the
            # documented ValueError contract (not struct.error)
            raise ValueError(f"truncated PNG ({tag!r} chunk exceeds data)")
        body = data[pos + 8: pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length: pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, depth, ctype = struct.unpack(">IIBB", body[:10])
            if depth != 8 or ctype != 2:
                raise ValueError(
                    f"unsupported PNG (bit depth {depth}, color type {ctype}); "
                    "this codec handles 8-bit RGB"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        # e.g. IDAT split across chunks and the stream cut at a chunk
        # boundary: loud ValueError, same contract as every other path
        raise ValueError(f"truncated PNG (bad IDAT stream: {e})") from e
    return width, height, unfilter_raster(width, height, raw)


def unfilter_raster(width: int, height: int, raw: bytes) -> bytes:
    """Reverse PNG scanline filtering: inflated IDAT/fdAT bytes back to the
    raw RGB raster. Raises ValueError on size mismatch or unknown filter."""
    stride = width * 3
    if len(raw) != (stride + 1) * height:
        raise ValueError("inflated size does not match dimensions")
    out = bytearray()
    prev = bytes(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1: (y + 1) * (stride + 1)])
        if ft == 1:  # Sub
            for i in range(3, stride):
                line[i] = (line[i] + line[i - 3]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                left = line[i - 3] if i >= 3 else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                left = line[i - 3] if i >= 3 else 0
                ul = prev[i - 3] if i >= 3 else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown filter type {ft}")
        out += line
        prev = bytes(line)
    return bytes(out)
