"""WAV codec + audio features: roundtrip, chunk handling, goldens."""

import struct

import numpy as np
import pytest

from veranda_spark.functions.wav import (
    audio_feature_vector,
    wav_decode,
    wav_encode,
)


def test_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(2)
    mono = rng.integers(-30000, 30000, 4001).astype(np.int16)
    out, rate = wav_decode(wav_encode(mono, 22050))
    assert rate == 22050
    np.testing.assert_array_equal(out, mono)
    stereo = rng.integers(-30000, 30000, (1000, 2)).astype(np.int16)
    out, rate = wav_decode(wav_encode(stereo, 8000))
    assert out.shape == (1000, 2) and rate == 8000
    np.testing.assert_array_equal(out, stereo)


def test_decoder_skips_foreign_chunks():
    # a LIST chunk (odd size → word padding) between fmt and data must be
    # skipped, per RIFF
    base = wav_encode(np.arange(100, dtype=np.int16), 16000)
    fmt_end = base.index(b"data")
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # padded
    patched = base[:fmt_end] + extra + base[fmt_end:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    out, rate = wav_decode(patched)
    np.testing.assert_array_equal(out, np.arange(100, dtype=np.int16))


def test_non_pcm_rejected():
    data = bytearray(wav_encode(np.zeros(10, np.int16)))
    i = data.index(b"fmt ")
    struct.pack_into("<H", data, i + 8, 3)  # IEEE float fmt code
    with pytest.raises(ValueError, match="PCM-16"):
        wav_decode(bytes(data))
    with pytest.raises(ValueError, match="RIFF"):
        wav_decode(b"garbage")


def test_pure_sine_features():
    rate, freq = 16000, 440.0
    t = np.arange(rate) / rate  # exactly 1 s
    pcm = np.round(20000 * np.sin(2 * np.pi * freq * t)).astype(np.int16)
    f = audio_feature_vector(pcm, rate)
    assert abs(f["duration_sec"] - 1.0) < 1e-9
    # RMS of a sine = peak/sqrt(2)
    assert abs(f["rms"] - 20000 / np.sqrt(2)) < 50
    # a 440 Hz sine crosses zero 2*440 times/sec
    assert abs(f["zcr"] * rate - 2 * freq) < 5
    # spectral centroid sits at the tone (leakage pulls it slightly)
    assert abs(f["spectral_centroid_hz"] - freq) < 15


def test_audio_pipeline(spark):
    from veranda_spark.fixtures import generate_audio
    from veranda_spark.sources.multimodal import extract_audio_features

    clips = generate_audio(spark, 40)
    feats = {r["audio_id"]: r for r in extract_audio_features(clips).collect()}
    assert len(feats) == 40
    # golden for clip 0: recompute driver-side from the same formula
    f1, f2 = 200.0 + 0, 150.0 + 0
    t = np.arange(8000) / 16000
    x = 0.5 * np.sin(2 * np.pi * f1 * t) + 0.3 * np.sin(2 * np.pi * f2 * t)
    pcm = np.round(x * 20000).astype(np.int16)
    want = audio_feature_vector(pcm, 16000)
    got = feats["clip_00000000"]
    for k in ("duration_sec", "rms", "zcr", "spectral_centroid_hz", "peak"):
        assert abs(got[k] - want[k]) < 1e-9, k


# ---- property-based fuzz (round 8, same strategy as tiff/netcdf fuzz) ------

from hypothesis import given, settings, strategies as st  # noqa: E402

from veranda_spark.functions.wav import wav_decode, wav_encode  # noqa: E402


@settings(max_examples=60, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(0, 5000),
    ch=st.sampled_from([1, 2, 6]),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_fuzz_wav_roundtrip_exact(seed, n, ch, rate):
    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, (n, ch), dtype=np.int16)
    if ch == 1:
        s = s[:, 0]
    out, r = wav_decode(wav_encode(s, rate=rate))
    assert r == rate
    np.testing.assert_array_equal(out.reshape(-1), s.reshape(-1))


@settings(max_examples=80, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), n_flips=st.integers(1, 6))
def test_fuzz_wav_decode_corruption_is_loud(seed, n_flips):
    rng = np.random.default_rng(seed)
    s = rng.integers(-1000, 1000, 400, dtype=np.int16)
    blob = bytearray(wav_encode(s))
    for _ in range(n_flips):
        blob[int(rng.integers(0, len(blob)))] = int(rng.integers(0, 256))
    try:
        out, r = wav_decode(bytes(blob))
        assert out.dtype == np.int16 and out.size <= 10_000_000
    except Exception as e:  # noqa: BLE001
        assert not isinstance(e, (SystemExit, KeyboardInterrupt))
