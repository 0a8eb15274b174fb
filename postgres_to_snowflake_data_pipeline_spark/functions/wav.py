"""Minimal, REAL WAV (RIFF/PCM) codec — Python stdlib only (`wave`).

The container has no ffmpeg/soundfile (probed round 2), but WAV's format
is public and the stdlib `wave` module reads/writes genuine RIFF headers
and PCM frames — so the AUDIO modality's decode path can be real, the
same move round 3 made for images with ``functions/png.py``:
``encode_wav`` writes standard PCM WAV bytes (RIFF chunk, fmt chunk with
rate/channels/sample-width, data chunk) and ``decode_wav`` parses any
such file back. Used by queries/multimodal.py: generated audio payloads
are real WAV bytes, and the decoded sample rate / frame count flow into
the oracle-checked outputs of m01 (decode) and m02 (frame sampling), so
a parser bug is a correctness failure, not a silent fake.

Per-blob by design — codec work is inherently per-blob; the parallelism
lives in the Spark partitioning (Arrow-batched mapInPandas), exactly as
it would with a native audio library.
"""

from __future__ import annotations

import io
import wave


def encode_wav(
    sample_rate: int, channels: int, sampwidth: int, frames: bytes
) -> bytes:
    """PCM WAV bytes. ``frames`` length must be a multiple of
    channels*sampwidth (one frame = one sample per channel)."""
    step = channels * sampwidth
    if len(frames) % step:
        raise ValueError(f"frame bytes {len(frames)} not a multiple of {step}")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(sample_rate)
        w.writeframes(frames)
    return buf.getvalue()


def is_wav(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def decode_wav(data: bytes) -> tuple[int, int, int, int, bytes]:
    """Parse WAV bytes -> (sample_rate, channels, sampwidth, n_frames,
    pcm_frames). Raises on malformed input (wave.Error)."""
    with wave.open(io.BytesIO(data), "rb") as w:
        rate = w.getframerate()
        ch = w.getnchannels()
        sw = w.getsampwidth()
        n = w.getnframes()
        frames = w.readframes(n)
    return rate, ch, sw, n, frames
