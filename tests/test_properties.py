"""Property-based tests (hypothesis) for the pure kernels: codec
round-trips, PIP ray cast vs an independent winding-number reference,
cell pack/unpack, cover arithmetic."""

import numpy as np
from hypothesis import given, settings, strategies as st

from veranda_spark.functions.codec import png_decode, png_encode
from veranda_spark.functions.geometry import points_in_polygon


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    c=st.sampled_from([1, 3]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(h, w, c, seed):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (h, w) if c == 1 else (h, w, c), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(arr)), arr)


def _winding_inside(px, py, poly):
    """Independent reference: winding number via atan2 angle sum."""
    poly = np.asarray(poly, dtype=float)
    ang = 0.0
    for i in range(len(poly)):
        ax, ay = poly[i] - (px, py)
        bx, by = poly[(i + 1) % len(poly)] - (px, py)
        ang += np.arctan2(ax * by - ay * bx, ax * bx + ay * by)
    return abs(ang) > np.pi  # ~2*pi inside, ~0 outside


@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    n_pts=st.integers(1, 50),
)
def test_raycast_matches_winding_number(seed, n_pts):
    rng = np.random.default_rng(seed)
    # random convex-ish polygon: sorted angles around a center
    k = rng.integers(3, 8)
    angles = np.sort(rng.uniform(0, 2 * np.pi, k))
    radius = rng.uniform(5, 20, k)
    poly = np.stack([50 + radius * np.cos(angles), 50 + radius * np.sin(angles)], axis=1)
    # offset by 0.5 so integer test points never sit exactly on edges
    poly += 0.5
    px = rng.integers(20, 80, n_pts).astype(float)
    py = rng.integers(20, 80, n_pts).astype(float)
    got = points_in_polygon(px, py, poly)
    want = np.array([_winding_inside(x, y, poly) for x, y in zip(px, py)])
    assert np.array_equal(got, want)


@settings(max_examples=50, deadline=None)
@given(
    ix=st.integers(-(2**27), 2**27 - 1),
    iy=st.integers(-(2**27), 2**27 - 1),
    res=st.integers(0, 16),
)
def test_cell_pack_unpack_roundtrip_math(ix, iy, res):
    # mirror of cells.pack/unpack as plain ints (the Column exprs use the
    # same arithmetic; SQL parity is covered by the oracle queries)
    from veranda_spark.cells import CELL_OFFSET

    cell = res * (1 << 58) + (iy + CELL_OFFSET) * (1 << 29) + (ix + CELL_OFFSET)
    r2 = cell // (1 << 58)
    rem = cell - r2 * (1 << 58)
    iy2 = rem // (1 << 29) - CELL_OFFSET
    ix2 = rem % (1 << 29) - CELL_OFFSET
    assert (r2, ix2, iy2) == (res, ix, iy)


@settings(max_examples=50, deadline=None)
@given(
    r0=st.integers(-500, 500),
    c0=st.integers(-500, 500),
    h=st.integers(1, 200),
    w=st.integers(1, 200),
    tile=st.sampled_from([16, 25, 64, 256]),
)
def test_cover_bounds_property(r0, c0, h, w, tile):
    # the slice-phase cover loop must tile the footprint exactly: windows
    # are disjoint, cover the footprint, and never exceed tile bounds
    total = 0
    for tr in range(r0 // tile, (r0 + h - 1) // tile + 1):
        for tc in range(c0 // tile, (c0 + w - 1) // tile + 1):
            ov_r0, ov_r1 = max(r0, tr * tile), min(r0 + h, tr * tile + tile)
            ov_c0, ov_c1 = max(c0, tc * tile), min(c0 + w, tc * tile + tile)
            assert ov_r1 > ov_r0 and ov_c1 > ov_c0
            assert 0 <= ov_r0 - tr * tile < tile and 0 <= ov_c0 - tc * tile < tile
            total += (ov_r1 - ov_r0) * (ov_c1 - ov_c0)
    assert total == h * w


@settings(max_examples=40, deadline=None)
@given(data=st.binary(max_size=4000))
def test_lzw_roundtrip_property(data):
    from veranda_spark.functions.tiff import lzw_decode, lzw_encode

    assert lzw_decode(lzw_encode(data)) == data


@settings(max_examples=40, deadline=None)
@given(data=st.binary(max_size=4000))
def test_packbits_roundtrip_property(data):
    from veranda_spark.functions.tiff import packbits_decode, packbits_encode

    assert packbits_decode(packbits_encode(data)) == data


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 50),
    w=st.integers(1, 50),
    dtype=st.sampled_from(["uint8", "uint16", "int16", "int32", "float32", "float64"]),
    compression=st.sampled_from(["none", "lzw", "deflate", "packbits"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_tiff_roundtrip_property(h, w, dtype, compression, seed):
    from veranda_spark.functions.tiff import tiff_decode, tiff_encode

    rng = np.random.default_rng(seed)
    if dtype.startswith("float"):
        arr = (rng.standard_normal((h, w)) * 50).astype(dtype)
    else:
        info = np.iinfo(dtype)
        arr = rng.integers(info.min, info.max, (h, w), dtype=dtype)
    out = tiff_decode(tiff_encode(arr, compression=compression))
    assert out.dtype == np.dtype(dtype)
    np.testing.assert_array_equal(out, arr)


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(1, 120),
    w=st.integers(1, 120),
    tile=st.sampled_from([16, 64]),
    f=st.sampled_from([2, 3]),
    seed=st.integers(0, 2**31 - 1),
)
def test_cog_roundtrip_property(h, w, tile, f, seed):
    from veranda_spark.functions.tiff import tiff_decode, tiff_encode_cog

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (h, w), dtype=np.uint8)
    blob = tiff_encode_cog(arr, tile=tile, overviews=(f,))
    np.testing.assert_array_equal(tiff_decode(blob), arr)
    ov = tiff_decode(blob, ifd=1)
    assert ov.shape == ((h + f - 1) // f, (w + f - 1) // f)


@settings(max_examples=60, deadline=None)
@given(
    base=st.integers(-(2**63), 2**63 - 1),
    bits=st.lists(st.integers(0, 63), min_size=0, max_size=3, unique=True),
)
def test_pigeonhole_block_share_property(base, bits):
    # any pair with hamming <= 3 must share at least one 16-bit block —
    # the completeness guarantee behind simhash_pairs / phash_neardup_pairs
    a = base & (2**64 - 1)
    b = a
    for bit in bits:
        b ^= 1 << bit
    blocks_a = [(a >> (i * 16)) & 0xFFFF for i in range(4)]
    blocks_b = [(b >> (i * 16)) & 0xFFFF for i in range(4)]
    assert any(x == y for x, y in zip(blocks_a, blocks_b))


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
    quality=st.integers(60, 100),
    gray=st.booleans(),
)
def test_jpeg_roundtrip_property(h, w, seed, quality, gray):
    from veranda_spark.functions.jpeg import jpeg_decode, jpeg_encode

    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    out = jpeg_decode(jpeg_encode(img, quality=quality))
    assert out.shape == img.shape and out.dtype == np.uint8
    # lossy but bounded: even pure noise at q60 stays within byte range
    # and reasonable error energy
    err = np.abs(out.astype(int) - img.astype(int)).mean()
    assert err <= 64.0


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(0, 3000),
    ch=st.integers(1, 4),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, ch, rate, seed):
    from veranda_spark.functions.wav import wav_decode, wav_encode

    rng = np.random.default_rng(seed)
    shape = (n,) if ch == 1 else (n, ch)
    pcm = rng.integers(-32768, 32767, shape).astype(np.int16)
    out, got_rate = wav_decode(wav_encode(pcm, rate))
    assert got_rate == rate
    if ch == 1:
        np.testing.assert_array_equal(out, pcm)
    else:
        np.testing.assert_array_equal(out, pcm.reshape(-1, ch))


@settings(max_examples=25, deadline=None)
@given(
    lon=st.floats(-179.9, 179.9),
    lat=st.floats(-84.9, 84.9),
)
def test_webmerc_roundtrip_property(lon, lat):
    from veranda_spark.functions.crs import (
        NP, lonlat_to_webmerc, webmerc_to_lonlat,
    )

    x, y = lonlat_to_webmerc(NP, np.array([lon]), np.array([lat]))
    lo, la = webmerc_to_lonlat(NP, x, y)
    assert abs(lo[0] - lon) < 1e-9 and abs(la[0] - lat) < 1e-9


# ---- round-5: CRS round-trip property over every family --------------------

_CRS_DOMAINS = [
    # (sref, lon range, lat range) — points drawn inside each
    # projection's validity domain
    ("EPSG:3857", (-179.0, 179.0), (-85.0, 85.0)),
    ("EPSG:32632", (6.5, 11.5), (-79.0, 83.0)),
    ("EPSG:2154", (-4.5, 8.5), (41.5, 51.0)),
    ("EPSG:3035", (-10.0, 35.0), (34.0, 71.0)),
    ("EPSG:3413", (-179.0, 179.0), (55.0, 89.0)),
    ("EPSG:3031", (-179.0, 179.0), (-89.0, -55.0)),
    ("EPSG:5070", (-124.0, -67.0), (25.0, 49.0)),
    ("SINU:0", (-179.0, 179.0), (-85.0, 85.0)),
    ("AEQD:53,24", (-10.0, 60.0), (20.0, 75.0)),
    ("TMERC:49,2,0.9996", (-1.0, 5.0), (-79.0, 83.0)),
    ("LAEA:48,12", (-20.0, 45.0), (25.0, 72.0)),
    ("AEA:23,-96,29.5,45.5", (-125.0, -65.0), (22.0, 52.0)),
    ("STERE:-71,0", (-179.0, 179.0), (-89.0, -50.0)),
]


@settings(max_examples=60, deadline=None)
@given(
    idx=st.integers(0, len(_CRS_DOMAINS) - 1),
    u=st.floats(0.0, 1.0),
    v=st.floats(0.0, 1.0),
)
def test_crs_roundtrip_property(idx, u, v):
    # forward∘inverse identity within each family's validity domain, for
    # arbitrary points — catches domain-edge regressions systematically
    from veranda_spark.functions.crs import NP, transform

    sref, (lo0, lo1), (la0, la1) = _CRS_DOMAINS[idx]
    lon = np.array([lo0 + u * (lo1 - lo0)])
    lat = np.array([la0 + v * (la1 - la0)])
    x, y = transform(NP, "EPSG:4326", sref, lon, lat)
    assert np.isfinite(x[0]) and np.isfinite(y[0])
    lo, la = transform(NP, sref, "EPSG:4326", x, y)
    dl = (lo[0] - lon[0] + 180.0) % 360.0 - 180.0
    assert abs(dl) < 1e-6, (sref, lon[0], lat[0], lo[0])
    assert abs(la[0] - lat[0]) < 1e-6, (sref, lon[0], lat[0], la[0])
    # and the returned longitude is always in range
    assert -180.0 <= lo[0] <= 180.0
