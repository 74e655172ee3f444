"""RIFF/WAVE PCM codec in pure numpy — the audio leg of the multimodal
columns, decoded for REAL (WAV needs no codec lib, unlike MP3/H.264
which stay env-gated in sources/multimodal.py).

Scope: canonical RIFF little-endian, PCM (format 1) 16-bit, any channel
count/rate; chunks other than fmt/data are skipped (word-aligned);
float/compressed WAVs are rejected loudly.
"""

from __future__ import annotations

import struct

import numpy as np


def wav_encode(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """int16 (n,) mono or (n, ch) interleaved → WAV bytes."""
    samples = np.asarray(samples)
    if samples.dtype != np.int16:
        raise ValueError(f"wav_encode needs int16 samples, got {samples.dtype}")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = np.ascontiguousarray(samples.astype("<i2")).tobytes()
    block = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 samples (n,) mono / (n, ch) multi, sample rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    rate = channels = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos: pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"only PCM-16 WAV supported (fmt={audio_fmt}, bits={bits})"
                )
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or pcm is None:
        raise ValueError("WAV missing fmt or data chunk")
    samples = np.frombuffer(pcm, dtype="<i2")
    if channels > 1:
        samples = samples[: len(samples) // channels * channels].reshape(
            -1, channels
        )
    return samples, rate


def audio_feature_vector(samples: np.ndarray, rate: int) -> dict:
    """Per-clip features (whole-array numpy): duration, RMS, zero-crossing
    rate, spectral centroid (Hz), peak amplitude.  Multi-channel clips are
    averaged to mono first."""
    x = samples.astype("float64")
    if x.ndim == 2:
        x = x.mean(axis=1)
    n = len(x)
    if n == 0:
        return {"duration_sec": 0.0, "rms": 0.0, "zcr": 0.0,
                "spectral_centroid_hz": 0.0, "peak": 0.0}
    spec = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    power = spec.sum()
    centroid = float((freqs * spec).sum() / power) if power > 0 else 0.0
    return {
        "duration_sec": n / rate,
        "rms": float(np.sqrt((x ** 2).mean())),
        "zcr": float((np.diff(np.signbit(x)) != 0).sum() / max(n - 1, 1)),
        "spectral_centroid_hz": centroid,
        "peak": float(np.abs(x).max()),
    }
