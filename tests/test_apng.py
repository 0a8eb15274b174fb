"""The stdlib APNG codec: multi-frame round-trip identity (hypothesis),
delay semantics, strict sequence numbers, loud failures on corruption —
plus the pipeline-level check that video payloads are genuine APNGs whose
decoded metadata matches m01's output (no fake shortcut)."""

from __future__ import annotations

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from postgres_to_snowflake_data_pipeline_spark.functions.apng import (
    decode_apng,
    encode_apng,
    is_apng,
)
from postgres_to_snowflake_data_pipeline_spark.functions.png import (
    encode_png,
    is_png,
)


def _frames(w: int, h: int, n: int, seed: int) -> list[bytes]:
    import random

    rng = random.Random(seed)
    return [
        bytes(rng.randrange(256) for _ in range(w * h * 3)) for _ in range(n)
    ]


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 13),
    h=st.integers(1, 11),
    n=st.integers(1, 7),
    seed=st.integers(0, 2**32 - 1),
)
def test_round_trip_identity(w, h, n, seed):
    frames = _frames(w, h, n, seed)
    delays = [(1 + i % 3, 8) for i in range(n)]
    blob = encode_apng(w, h, frames, delays)
    assert is_apng(blob)
    ww, hh, back, delays_ms = decode_apng(blob)
    assert (ww, hh) == (w, h)
    assert back == frames
    assert delays_ms == [125 * (1 + i % 3) for i in range(n)]


def test_still_png_is_not_apng():
    assert not is_apng(encode_png(2, 2, bytes(12)))


def test_zero_denominator_means_hundredths():
    # PNG spec: delay_den == 0 is to be read as 100 (1/100ths of a second)
    blob = encode_apng(2, 2, _frames(2, 2, 1, 7), [(5, 0)])
    _, _, _, delays_ms = decode_apng(blob)
    assert delays_ms == [50]


def test_crc_corruption_is_loud():
    blob = bytearray(encode_apng(4, 6, _frames(4, 6, 3, 1), [(1, 4)] * 3))
    # flip a byte inside the first fdAT body (second frame's data)
    idx = bytes(blob).find(b"fdAT") + 8
    blob[idx] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_apng(bytes(blob))


def test_out_of_order_sequence_is_loud():
    blob = encode_apng(3, 3, _frames(3, 3, 2, 2), [(1, 4)] * 2)
    # corrupt the second fcTL's sequence number (and fix its CRC so the
    # sequence check, not the CRC check, is what fires)
    pos = 8
    seen_fctl = 0
    data = bytearray(blob)
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", bytes(data[pos: pos + 4]))
        tag = bytes(data[pos + 4: pos + 8])
        if tag == b"fcTL":
            seen_fctl += 1
            if seen_fctl == 2:
                struct.pack_into(">I", data, pos + 8, 99)
                body = bytes(data[pos + 8: pos + 8 + length])
                struct.pack_into(
                    ">I", data, pos + 8 + length,
                    zlib.crc32(tag + body) & 0xFFFFFFFF,
                )
                break
        pos += 12 + length
    with pytest.raises(ValueError, match="sequence"):
        decode_apng(bytes(data))


def test_frame_count_mismatch_is_loud():
    # acTL declaring more frames than are present must not pass silently
    blob = encode_apng(3, 3, _frames(3, 3, 2, 3), [(1, 4)] * 2)
    data = bytearray(blob)
    idx = bytes(data).find(b"acTL") + 4
    struct.pack_into(">I", data, idx, 5)
    body = bytes(data[idx: idx + 8])
    struct.pack_into(
        ">I", data, idx + 8, zlib.crc32(b"acTL" + body) & 0xFFFFFFFF
    )
    with pytest.raises(ValueError, match="declares 5 frames"):
        decode_apng(bytes(data))


def test_truncated_apng_is_loud_valueerror():
    blob = encode_apng(4, 5, _frames(4, 5, 3, 4), [(1, 4)] * 3)
    for cut in (len(blob) - 2, len(blob) // 2, 30):
        with pytest.raises(ValueError):
            decode_apng(blob[:cut])


def test_m01_video_payloads_are_genuine_apngs(spark):
    """The pipeline stage really emits standard APNGs and m01's output
    equals a direct decode of the blob: dimensions from IHDR, frame count
    from acTL, n_bytes from the decoded rasters themselves."""
    from postgres_to_snowflake_data_pipeline_spark.queries.multimodal import (
        build_payloads,
        m01_multimodal_decode,
    )

    sf = "/root/testdata/sf0.001"
    blobs = {
        r["doc_id"]: bytes(r["payload"])
        for r in build_payloads(spark, sf)
        .filter("doc_id % 3 = 2").limit(5).collect()
    }
    ids = ", ".join(str(i) for i in blobs)
    decoded = {
        r["doc_id"]: r
        for r in m01_multimodal_decode(spark, sf)
        .filter(f"doc_id IN ({ids})").collect()
    }
    assert blobs
    for doc_id, blob in blobs.items():
        assert is_png(blob) and is_apng(blob)
        w, h, frames, _delays = decode_apng(blob)
        row = decoded[doc_id]
        assert (row["width"], row["height"], row["n_frames"]) == (
            w, h, len(frames),
        )
        assert row["n_bytes"] == sum(len(f) for f in frames)
