"""The stdlib WAV codec: round-trip identity (hypothesis), header fields
preserved, loud failures on corruption — mirror of tests/test_png.py for
the audio modality (VERDICT r3 #4)."""

from __future__ import annotations

import pytest
import wave as _stdlib_wave
from hypothesis import given, settings
from hypothesis import strategies as st

from postgres_to_snowflake_data_pipeline_spark.functions.wav import (
    decode_wav,
    encode_wav,
    is_wav,
)


@settings(max_examples=30, deadline=None)
@given(
    rate=st.sampled_from([8000, 11025, 16000, 44100]),
    channels=st.integers(1, 2),
    sampwidth=st.sampled_from([1, 2]),
    n_frames=st.integers(1, 500),
    seed=st.integers(0, 2**32 - 1),
)
def test_round_trip_identity(rate, channels, sampwidth, n_frames, seed):
    import random

    step = channels * sampwidth
    pcm = bytes(
        random.Random(seed).randrange(256) for _ in range(n_frames * step)
    )
    blob = encode_wav(rate, channels, sampwidth, pcm)
    assert is_wav(blob)
    r, ch, sw, nf, back = decode_wav(blob)
    assert (r, ch, sw, nf, back) == (rate, channels, sampwidth, n_frames, pcm)


def test_misaligned_frames_are_loud():
    with pytest.raises(ValueError, match="multiple"):
        encode_wav(8000, 2, 2, b"abc")  # 3 bytes, frame step 4


def test_corruption_is_loud():
    blob = bytearray(encode_wav(8000, 1, 2, bytes(64)))
    blob[:4] = b"JUNK"
    assert not is_wav(bytes(blob))
    with pytest.raises(_stdlib_wave.Error):
        decode_wav(bytes(blob))


def test_audio_payloads_are_real_wav(spark, sf_dir):
    """build_payloads must emit genuine RIFF/PCM blobs for audio rows with
    the documented text-derived parameters — not a byte-blob stand-in."""
    from postgres_to_snowflake_data_pipeline_spark.queries import multimodal

    rows = (
        multimodal.build_payloads(spark, sf_dir)
        .filter("doc_id % 3 = 1")
        .limit(5)
        .collect()
    )
    assert rows
    for r in rows:
        data = bytes(r["payload"])
        assert is_wav(data)
        rate, ch, sw, nf, pcm = decode_wav(data)
        n = r["src_n_bytes"]
        assert (rate, ch, sw) == (8000 + (n % 8) * 1000, 1, 2)
        assert nf == n * 7 % 6000 + 1 and len(pcm) == 2 * nf


def test_m04_features_match_direct_decode(spark, sf_dir):
    """m04's Arrow-batched feature extraction must equal a direct per-blob
    decode+reduce done here in the test process — pins the Spark plumbing
    (batch shapes, dtypes, only_media filter) against the codec itself."""
    import numpy as np

    from postgres_to_snowflake_data_pipeline_spark.queries import multimodal

    got = {
        r["doc_id"]: r.asDict()
        for r in multimodal.m04_audio_features(spark, sf_dir).collect()
    }
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter("doc_id % 3 = 1")
        .limit(8)
        .collect()
    }
    assert docs and set(docs) <= set(got)
    # every audio doc appears exactly once, and ONLY audio docs appear
    assert all(d % 3 == 1 for d in got)
    for doc_id, text in docs.items():
        data = text.encode("utf-8")
        n = len(data)
        need = 2 * (n * 7 % 6000 + 1)
        pcm = (data * (need // max(n, 1) + 1))[:need] if n else bytes(need)
        blob = encode_wav(8000 + (n % 8) * 1000, 1, 2, pcm)
        rate, _ch, _sw, _nf, back = decode_wav(blob)
        s = np.frombuffer(back, dtype="<i2").astype(np.int64)
        sg = np.where(s >= 0, 1, -1)
        r = got[doc_id]
        assert r["sample_rate"] == rate
        assert r["n_samples"] == s.size
        assert r["energy"] == int((s * s).sum())
        assert r["peak"] == int(np.abs(s).max())
        assert r["zero_crossings"] == int((sg[1:] != sg[:-1]).sum())
