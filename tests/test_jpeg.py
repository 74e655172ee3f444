"""Baseline JFIF codec: analytic hand-crafted stream, encoder round-trips,
dispatch wiring.  The hand-crafted test decodes a bitstream built from the
spec by hand (canonical huffman codes, category/extend, dequant, IDCT) —
it would catch an encoder/decoder bug that cancels in round-trip."""

import struct

import numpy as np
import pytest

from veranda_spark.functions.codec import decode_image, encode_image, psnr
from veranda_spark.functions.jpeg import (
    DC_LUMA_HUFF,
    STD_LUMA_Q,
    ZIGZAG,
    _canonical_codes,
    jpeg_decode,
    jpeg_encode,
)


def _handmade_const_jpeg() -> bytes:
    """8x8 grayscale, quant table = all ones, one DC-only block.

    DC quantized value 64 (constant pixel 136: (136-128)*8 = 64 via the
    orthonormal DCT), category 7 → DC-luma code 11110 + 7 value bits
    1000000, then EOB (00 in the minimal AC table below), padded with 1s:
    11110100 00000011 = 0xF4 0x03."""
    out = bytearray(b"\xff\xd8")
    q = bytes([0]) + bytes([1] * 64)  # table 0, all ones (zigzag irrelevant)
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(q)) + q
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc_th, (bits, values) in ((0x00, DC_LUMA_HUFF),):
        body = bytes([tc_th]) + bytes(bits) + bytes(values)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    # minimal AC table: only EOB (symbol 0x00) at length 2 → code 00
    ac_body = bytes([0x10]) + bytes([0, 1] + [0] * 14) + bytes([0x00])
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(ac_body)) + ac_body
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    # DC cat7: 11110 + 1000000, EOB: 00 → 11110100 000000 0 + pad(11)
    out += bytes([0b11110100, 0b00000000 | 0b11])  # 1111 0100 0000 0011
    out += b"\xff\xd9"
    return bytes(out)


def test_handmade_stream_decodes_to_constant():
    arr = jpeg_decode(_handmade_const_jpeg())
    assert arr.shape == (8, 8) and arr.dtype == np.uint8
    np.testing.assert_array_equal(arr, np.full((8, 8), 136, np.uint8))


def test_dc_huffman_codes_match_spec():
    # spot-check canonical code assignment against hand-derived values
    codes = _canonical_codes(*DC_LUMA_HUFF)
    assert codes[0] == (0b00, 2)
    assert codes[1] == (0b010, 3)
    assert codes[5] == (0b110, 3)
    assert codes[6] == (0b1110, 4)
    assert codes[11] == (0b111111110, 9)


def test_gray_roundtrip_psnr():
    y, x = np.mgrid[0:48, 0:56]
    img = ((np.sin(x / 11.0) + np.cos(y / 7.0) + 2) / 4 * 255).astype(np.uint8)
    out = jpeg_decode(jpeg_encode(img, quality=90))
    assert out.shape == img.shape
    assert psnr(img.astype(float), out.astype(float)) >= 40.0


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:2", "4:2:0"])
def test_rgb_roundtrip_all_subsamplings(sub):
    y, x = np.mgrid[0:37, 0:51]
    rgb = np.stack(
        [(x * 3) % 256, np.full_like(x, 100), (y * 2) % 256], axis=-1
    ).astype(np.uint8)
    out = jpeg_decode(jpeg_encode(rgb, quality=92, subsampling=sub))
    assert out.shape == rgb.shape
    assert psnr(rgb.astype(float), out.astype(float)) >= 38.0


def test_restart_markers_roundtrip():
    rng = np.random.default_rng(3)
    img = rng.integers(100, 140, (40, 72), np.uint8)  # low-contrast noise
    plain = jpeg_decode(jpeg_encode(img, quality=95))
    with_rst = jpeg_decode(jpeg_encode(img, quality=95, restart_interval=2))
    # restart segmentation must not change decoded pixels
    np.testing.assert_array_equal(plain, with_rst)


def test_progressive_rejected():
    data = bytearray(jpeg_encode(np.zeros((8, 8), np.uint8)))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # flip SOF0 → SOF2 (progressive)
    with pytest.raises(ValueError, match="baseline"):
        jpeg_decode(bytes(data))


def test_codec_dispatch_jpg():
    img = np.full((16, 24), 77, np.uint8)
    payload = encode_image(img, "jpg")
    assert payload[:3] == b"\xff\xd8\xff"
    out = decode_image(payload, "jpg", 16, 24)
    assert psnr(img.astype(float), out.astype(float)) >= 40.0


def test_dctq_dct_is_jpeg_dct():
    # the shared orthonormal DCT matrix IS the JPEG FDCT: a one-block
    # image with quant=1 must carry exactly (pixel-128)*8 in its DC slot
    img = np.full((8, 8), 200, np.uint8)
    from veranda_spark.functions.jpeg import _forward_blocks

    zz = _forward_blocks(img.astype(np.float64), np.ones((8, 8)))
    assert zz.shape == (1, 1, 64)
    assert zz[0, 0, 0] == (200 - 128) * 8
    assert np.all(zz[0, 0, 1:] == 0)


def test_quant_tables_written_in_zigzag():
    # decoder must un-zigzag DQT payloads: a gradient image encoded at
    # q=50 (raw Annex K tables) survives only if both sides agree
    y, x = np.mgrid[0:16, 0:16]
    img = ((x + y) * 8).astype(np.uint8)
    out = jpeg_decode(jpeg_encode(img, quality=50))
    assert psnr(img.astype(float), out.astype(float)) >= 25.0
    # and the table bytes in the stream really are zigzag order (q=85
    # gives a non-uniform table, so order actually matters)
    data = jpeg_encode(img, quality=85)
    i = data.find(b"\xff\xdb")
    tab = np.frombuffer(data, np.uint8, 64, i + 5).astype(np.float64)
    from veranda_spark.functions.jpeg import UNZIGZAG, _quality_scale

    np.testing.assert_array_equal(
        tab[UNZIGZAG].reshape(8, 8), _quality_scale(STD_LUMA_Q, 85)
    )


def test_fixture_images_meet_psnr_invariant():
    # input_hint: decoded-pixel PSNR>=40dB for lossy fmts — holds for the
    # dispatch default (quality 95) on every fixture image shape/seed
    from veranda_spark.fixtures import make_image_array

    worst = 1e9
    for i in range(40):
        h, w = [16, 32, 48][i % 3], [16, 32, 64][i % 3]
        arr = make_image_array(i, h, w)
        out = decode_image(encode_image(arr, "jpg"), "jpg", h, w)
        worst = min(worst, psnr(arr.astype(float), out.astype(float)))
    assert worst >= 40.0, worst


# ---- property-based fuzz (round 8, same strategy as tiff/netcdf fuzz) ------

from hypothesis import given, settings, strategies as st  # noqa: E402

from veranda_spark.functions.jpeg import jpeg_decode, jpeg_encode  # noqa: E402


def _psnr(a, b):
    mse = float(np.mean((a.astype("f8") - b.astype("f8")) ** 2))
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    gray=st.booleans(),
    quality=st.sampled_from([60, 85, 95]),
    sub=st.sampled_from(["4:4:4", "4:2:2", "4:2:0"]),
    rst=st.sampled_from([0, 1, 3]),
)
def test_fuzz_jpeg_roundtrip_smooth_psnr(seed, h, w, gray, quality, sub, rst):
    """Lossy codec property: SMOOTH content must survive encode∘decode
    above a PSNR floor at every size/subsampling/restart combination
    (odd dims exercise the padding paths; rst>0 the restart markers)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        120 + 60 * np.sin(xx / 9.0 + rng.uniform(0, 6))
        + 50 * np.cos(yy / 7.0 + rng.uniform(0, 6))
    )
    if gray:
        arr = np.clip(base, 0, 255).astype("uint8")
        blob = jpeg_encode(arr, quality=quality, restart_interval=rst)
    else:
        arr = np.clip(
            np.stack([base, base * 0.8 + 20, 255 - base], axis=-1), 0, 255
        ).astype("uint8")
        blob = jpeg_encode(arr, quality=quality, subsampling=sub,
                           restart_interval=rst)
    out = jpeg_decode(blob)
    assert out.shape == arr.shape
    floor = 28.0 if quality == 60 else 30.0
    if not gray and sub != "4:4:4":
        floor -= 4.0  # chroma decimation on a saturated gradient
    assert _psnr(arr, out) >= floor, (arr.shape, quality, sub)


@settings(max_examples=80, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), n_flips=st.integers(1, 6))
def test_fuzz_jpeg_decode_corruption_is_loud(seed, n_flips):
    """Mutated JFIF bytes must raise a normal exception or decode to a
    bounded uint8 array — never hang or crash the interpreter."""
    rng = np.random.default_rng(seed)
    arr = (np.arange(24 * 17, dtype="uint8").reshape(24, 17) * 3) % 251
    blob = bytearray(jpeg_encode(arr, quality=85))
    for _ in range(n_flips):
        blob[int(rng.integers(0, len(blob)))] = int(rng.integers(0, 256))
    try:
        out = jpeg_decode(bytes(blob))
        assert isinstance(out, np.ndarray) and out.dtype == np.uint8
        assert out.size <= 50_000_000
    except Exception as e:  # noqa: BLE001 — loudness is the property
        assert not isinstance(e, (SystemExit, KeyboardInterrupt))
