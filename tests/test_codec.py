"""Codec unit tests (SURVEY.md §5 level (a)): encode/decode vs NumPy
reference, scale/offset/nodata decode parity with the reference's
auto-decode math (native/geotiff.py:354-357; fixtures F3)."""

import numpy as np
import pytest

from veranda_spark.functions.codec import (
    auto_decode,
    decode_image,
    encode_image,
    encode_values,
    png_decode,
    png_encode,
    psnr,
)


def test_png_roundtrip_gray():
    rng = np.random.default_rng(42)
    arr = rng.integers(0, 256, (48, 32), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(arr)), arr)


def test_png_roundtrip_rgb():
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(arr)), arr)


def test_raw_roundtrip_dtypes():
    for dt in ["uint8", "int16", "int32", "float32", "float64"]:
        arr = (np.arange(50 * 60).reshape(50, 60) % 251).astype(dt)
        data = encode_image(arr, "raw")
        back = decode_image(data, "raw", 50, 60, dtype=np.dtype(dt))
        assert np.array_equal(back, arr)


def test_auto_decode_matches_reference_math():
    # complex_ds golden: decoded data1 == raw*2+3 (mosaic geotiff test:40-45)
    raw = np.ones((5, 6), dtype="float32")
    raw[0, 0] = -9999
    dec = auto_decode(raw, nodataval=-9999, scale_factor=2, add_offset=3)
    assert np.isnan(dec[0, 0])
    assert np.all(dec[raw != -9999] == 5.0)


def test_encode_decode_inverse():
    vals = np.array([[5.0, 7.0], [np.nan, 9.0]])
    enc = encode_values(vals, nodataval=-9999, scale_factor=2, add_offset=3, dtype="int32")
    assert enc[1, 0] == -9999
    dec = auto_decode(enc, nodataval=-9999, scale_factor=2, add_offset=3)
    assert np.isnan(dec[1, 0])
    assert dec[0, 0] == 5.0 and dec[1, 1] == 9.0


def test_psnr_identity_and_bound():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 256, (32, 32)).astype("float64")
    assert psnr(a, a) == float("inf")
    noisy = a + rng.normal(0, 1, a.shape)
    assert psnr(a, noisy) >= 40.0


def test_unsupported_fmt_is_stubbed():
    # jpg is real since round 3 (functions/jpeg.py); a truly unknown fmt
    # still fails loudly
    with pytest.raises(NotImplementedError):
        encode_image(np.zeros((2, 2), np.uint8), "webp")
