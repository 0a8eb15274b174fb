"""The stdlib PNG codec: round-trip identity (hypothesis), every filter
type exercised, loud failures on corruption / unsupported formats."""

from __future__ import annotations

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from postgres_to_snowflake_data_pipeline_spark.functions.png import (
    decode_png,
    encode_png,
    is_png,
)


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 17),
    h=st.integers(1, 13),  # >= 6 rows covers all 5 filter types
    seed=st.integers(0, 2**32 - 1),
)
def test_round_trip_identity(w, h, seed):
    import random

    rgb = bytes(random.Random(seed).randrange(256) for _ in range(w * h * 3))
    blob = encode_png(w, h, rgb)
    assert is_png(blob)
    ww, hh, back = decode_png(blob)
    assert (ww, hh, back) == (w, h, rgb)


def test_crc_corruption_is_loud():
    blob = bytearray(encode_png(4, 6, bytes(range(72))))
    blob[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(blob))


def test_unsupported_color_type_is_loud():
    # hand-build a grayscale IHDR: the codec must refuse, not misparse
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    chunk = (
        struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError, match="color type"):
        decode_png(b"\x89PNG\r\n\x1a\n" + chunk)


def test_not_a_png_is_loud():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"RIFF....WAVE")


def test_m01_image_payloads_are_genuine_pngs(spark):
    """The pipeline stage really emits standard PNGs and the decode stage's
    output equals a direct decode of the blob (no fake shortcut)."""
    from postgres_to_snowflake_data_pipeline_spark.queries.multimodal import (
        build_payloads,
        m01_multimodal_decode,
    )

    sf = "/root/testdata/sf0.001"
    blobs = {
        r["doc_id"]: bytes(r["payload"])
        for r in build_payloads(spark, sf).filter("doc_id % 3 = 0").limit(5).collect()
    }
    ids = ", ".join(str(i) for i in blobs)
    decoded = {
        r["doc_id"]: r
        for r in m01_multimodal_decode(spark, sf)
        .filter(f"doc_id IN ({ids})").collect()
    }
    assert blobs
    for doc_id, blob in blobs.items():
        assert is_png(blob)
        w, h, rgb = decode_png(blob)
        row = decoded[doc_id]
        assert (row["width"], row["height"], row["n_bytes"]) == (w, h, len(rgb))


def test_truncated_png_is_loud_valueerror():
    """Cuts inside a chunk (body or CRC) must raise the documented
    ValueError, never struct.error / zlib.error."""
    blob = encode_png(4, 6, bytes(range(72)))
    for cut in (len(blob) - 2,   # inside IEND's CRC
                len(blob) - 14,  # inside IDAT's CRC region
                45,              # inside IDAT body
                20):             # inside IHDR body
        with pytest.raises(ValueError):
            decode_png(blob[:cut])


def test_length_field_past_eof_is_loud():
    # a chunk whose declared length points past the end of the data
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    chunk = struct.pack(">I", 999_999) + b"IHDR" + ihdr
    with pytest.raises(ValueError, match="truncated"):
        decode_png(b"\x89PNG\r\n\x1a\n" + chunk)
