"""warp_window: identity / same-CRS scale / cross-CRS vs numpy golden."""

import numpy as np
import pytest

from veranda_spark.grid import RegularGrid
from veranda_spark.operators.raster import read_window, warp_window


def _reg(spark, arr, sref=None, x0=0, y0=0):
    rows = [(1, arr.tobytes(), arr.shape[1], arr.shape[0], "raw", "uint8", x0, y0)]
    return spark.createDataFrame(
        rows,
        "image_id long, bytes binary, w int, h int, fmt string, dtype string, "
        "px_col0 long, px_row0 long",
    )


def _canvas(row):
    return np.frombuffer(row["bytes"], dtype=row["dtype"]).reshape(row["h"], row["w"])


@pytest.fixture(scope="module")
def pattern():
    y, x = np.mgrid[0:64, 0:64]
    return ((x * 3 + y * 5) % 251).astype(np.uint8)


def test_identity_warp_equals_read_window(spark, pattern):
    g = RegularGrid(tile_cols=32, tile_rows=32, n_tile_cols=4, n_tile_rows=4)
    df = _reg(spark, pattern)
    direct = _canvas(read_window(df, g, 8, 8, 40, 40).collect()[0])
    warped = _canvas(warp_window(df, g, g, 8, 8, 40, 40).collect()[0])
    np.testing.assert_array_equal(warped, direct)


def test_same_crs_downscale_nearest(spark, pattern):
    src = RegularGrid(ul_x=0, ul_y=0, psx=1.0, psy=1.0,
                      tile_cols=32, tile_rows=32, n_tile_cols=4, n_tile_rows=4)
    dst = RegularGrid(ul_x=0, ul_y=0, psx=2.0, psy=2.0,
                      tile_cols=32, tile_rows=32, n_tile_cols=4, n_tile_rows=4)
    df = _reg(spark, pattern)
    out = _canvas(warp_window(df, src, dst, 0, 0, 32, 32).collect()[0])
    # dst pixel (i,j) center = world (2j+1, -(2i+1)) → src px (2j+0.5, 2i+0.5)
    # → nearest src index round(2j+0.5)=2j (banker's: 0.5 → even)
    want = np.full((32, 32), -9999 % 256, np.uint8)
    for i in range(32):
        for j in range(32):
            si, sj = int(np.rint(2 * i + 0.5)), int(np.rint(2 * j + 0.5))
            if si < 64 and sj < 64:
                want[i, j] = pattern[si, sj]
    np.testing.assert_array_equal(out, want)


def test_cross_crs_warp_4326_to_3857(spark, pattern):
    # a lon/lat-registered image warped into a Web Mercator frame: every
    # output pixel must equal the numpy-side gather through the same
    # transform (plumbing golden; the transform math is tested in
    # test_crs against independent integration)
    from veranda_spark.functions.crs import NP, transform

    src = RegularGrid(ul_x=10.0, ul_y=50.0, psx=0.01, psy=0.01,
                      tile_cols=32, tile_rows=32, n_tile_cols=2, n_tile_rows=2,
                      sref="EPSG:4326")
    # dst frame roughly covering the same area in meters
    x0, y1 = transform(NP, "EPSG:4326", "EPSG:3857",
                       np.array([10.0]), np.array([50.0]))
    dst = RegularGrid(ul_x=float(x0[0]), ul_y=float(y1[0]), psx=800.0, psy=800.0,
                      tile_cols=32, tile_rows=32, n_tile_cols=2, n_tile_rows=2,
                      sref="EPSG:3857")
    df = _reg(spark, pattern)
    out = _canvas(warp_window(df, src, dst, 0, 0, 48, 48).collect()[0])

    jj, ii = np.meshgrid(np.arange(48, dtype="float64"),
                         np.arange(48, dtype="float64"))
    gx = dst.ul_x + (jj + 0.5) * dst.psx
    gy = dst.ul_y - (ii + 0.5) * dst.psy
    sx, sy = transform(NP, "EPSG:3857", "EPSG:4326", gx, gy)
    ic = np.rint((sx - src.ul_x) / src.psx - 0.5).astype("int64")
    ir = np.rint((src.ul_y - sy) / src.psy - 0.5).astype("int64")
    ok = (ir >= 0) & (ir < 64) & (ic >= 0) & (ic < 64)
    want = np.full((48, 48), -9999 % 256, np.uint8)
    want[ok] = pattern[ir[ok], ic[ok]]
    np.testing.assert_array_equal(out, want)
    assert ok.sum() > 500  # the warp actually covered real pixels


def test_bilinear_matches_manual_blend(spark, pattern):
    src = RegularGrid(ul_x=0, ul_y=0, psx=1.0, psy=1.0,
                      tile_cols=32, tile_rows=32, n_tile_cols=4, n_tile_rows=4)
    dst = RegularGrid(ul_x=0, ul_y=0, psx=0.5, psy=0.5,
                      tile_cols=32, tile_rows=32, n_tile_cols=4, n_tile_rows=4)
    df = _reg(spark, pattern)
    row = warp_window(df, src, dst, 10, 10, 20, 20, method="bilinear").collect()[0]
    out = np.frombuffer(row["bytes"], dtype=row["dtype"]).reshape(20, 20)
    assert row["dtype"] == "float64"
    # dst px (i,j) center world ((j+10.5)*0.5, -(i+10.5)*0.5) → src frac px
    for i, j in [(0, 0), (7, 3), (19, 19)]:
        fr = (10.5 + i) * 0.5 - 0.5
        fc = (10.5 + j) * 0.5 - 0.5
        r0, c0 = int(np.floor(fr)), int(np.floor(fc))
        wr, wc = fr - r0, fc - c0
        v = (pattern[r0, c0] * (1 - wr) * (1 - wc)
             + pattern[r0, c0 + 1] * (1 - wr) * wc
             + pattern[r0 + 1, c0] * wr * (1 - wc)
             + pattern[r0 + 1, c0 + 1] * wr * wc)
        assert abs(out[i, j] - v) < 1e-9, (i, j)


def test_bilinear_integer_nodata_excluded(spark):
    # uint8 tiles store nodata WRAPPED (-9999 -> 241): bilinear must
    # exclude those pixels, not blend 241 into neighbours (ADVICE r3)
    nod8 = np.full((), -9999.0).astype(np.uint8)[()]  # 241
    arr = np.full((64, 64), 100, np.uint8)
    arr[0:8, 0:8] = nod8  # a nodata hole
    g = RegularGrid(ul_x=0, ul_y=0, psx=1.0, psy=1.0,
                    tile_cols=32, tile_rows=32, n_tile_cols=4, n_tile_rows=4)
    # half-pixel-shifted dst grid forces a genuine 4-neighbour blend
    dst = RegularGrid(ul_x=0.5, ul_y=-0.5, psx=1.0, psy=1.0,
                      tile_cols=32, tile_rows=32, n_tile_cols=4, n_tile_rows=4)
    df = _reg(spark, arr)
    out = _canvas(
        warp_window(df, g, dst, 0, 0, 32, 32, method="bilinear").collect()[0]
    )
    # blends adjacent to the hole: all-valid neighbours -> exactly 100;
    # any blend touching the hole -> nodata (never a 241-contaminated mix)
    assert set(np.unique(out)) <= {100.0, -9999.0}
    assert out[20, 20] == 100.0
    assert out[3, 3] == -9999.0  # inside the hole: all four corners nodata
