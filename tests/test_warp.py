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


def test_cubic_reproduces_linear_ramp(spark):
    # Catmull-Rom interpolates degree-<=1 exactly: warping a linear ramp
    # through a half-pixel shift must return the shifted ramp (interior)
    y, x = np.mgrid[0:64, 0:64]
    ramp = (2.0 * x + 3.0 * y).astype(np.float64)
    rows = [(1, ramp.tobytes(), 64, 64, "raw", "float64", 0, 0)]
    df = spark.createDataFrame(
        rows,
        "image_id long, bytes binary, w int, h int, fmt string, dtype string, "
        "px_col0 long, px_row0 long",
    )
    g = RegularGrid(ul_x=0, ul_y=0, psx=1.0, psy=1.0,
                    tile_cols=32, tile_rows=32, n_tile_cols=4, n_tile_rows=4)
    dst = RegularGrid(ul_x=0.5, ul_y=-0.5, psx=1.0, psy=1.0,
                      tile_cols=32, tile_rows=32, n_tile_cols=4, n_tile_rows=4)
    out = _canvas(warp_window(df, g, dst, 0, 0, 32, 32, method="cubic").collect()[0])
    # dst pixel (i,j) center = src (j+0.5, i+0.5): value 2(j+0.5)+3(i+0.5)
    yi, xi = np.mgrid[0:32, 0:32]
    want = 2.0 * (xi + 0.5) + 3.0 * (yi + 0.5)
    np.testing.assert_allclose(out[1:-1, 1:-1], want[1:-1, 1:-1], rtol=1e-12)


def test_cubic_integer_nodata_stays_nodata(spark):
    nod8 = np.full((), -9999.0).astype(np.uint8)[()]
    arr = np.full((64, 64), 100, np.uint8)
    arr[10:14, 10:14] = nod8
    g = RegularGrid(ul_x=0, ul_y=0, psx=1.0, psy=1.0,
                    tile_cols=32, tile_rows=32, n_tile_cols=4, n_tile_rows=4)
    dst = RegularGrid(ul_x=0.5, ul_y=-0.5, psx=1.0, psy=1.0,
                      tile_cols=32, tile_rows=32, n_tile_cols=4, n_tile_rows=4)
    df = _reg(spark, arr)
    out = _canvas(
        warp_window(df, g, dst, 0, 0, 32, 32, method="cubic").collect()[0]
    )
    # constant field with a nodata hole: every valid output is exactly 100
    # (renormalized weights), hole centers stay nodata, never 241-mixed
    valid = out != -9999.0
    np.testing.assert_allclose(out[valid], 100.0, rtol=1e-9)
    assert (out == -9999.0).any()


def test_average_matches_exact_box_mean(spark):
    # 4x integer downscale: each dst pixel's box is exactly a 4x4 src
    # block -> average must equal the plain block mean
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 200, (64, 64)).astype(np.float64)
    rows = [(1, arr.tobytes(), 64, 64, "raw", "float64", 0, 0)]
    df = spark.createDataFrame(
        rows,
        "image_id long, bytes binary, w int, h int, fmt string, dtype string, "
        "px_col0 long, px_row0 long",
    )
    src = RegularGrid(ul_x=0, ul_y=0, psx=1.0, psy=1.0,
                      tile_cols=32, tile_rows=32, n_tile_cols=4, n_tile_rows=4)
    dst = RegularGrid(ul_x=0, ul_y=0, psx=4.0, psy=4.0,
                      tile_cols=16, tile_rows=16, n_tile_cols=1, n_tile_rows=1)
    out = _canvas(
        warp_window(df, src, dst, 0, 0, 16, 16, method="average").collect()[0]
    )
    want = arr.reshape(16, 4, 16, 4).mean(axis=(1, 3))
    np.testing.assert_allclose(out, want, rtol=1e-12)


def test_average_fractional_box_and_nodata(spark):
    # 2.5x downscale: fractional boxes exercise the integral-image
    # interpolation; golden = direct fractional-overlap integration
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 200, (40, 40)).astype(np.float64)
    arr[0:5, 0:5] = -9999.0  # nodata region must be excluded from means
    rows = [(1, arr.tobytes(), 40, 40, "raw", "float64", 0, 0)]
    df = spark.createDataFrame(
        rows,
        "image_id long, bytes binary, w int, h int, fmt string, dtype string, "
        "px_col0 long, px_row0 long",
    )
    src = RegularGrid(ul_x=0, ul_y=0, psx=1.0, psy=1.0,
                      tile_cols=40, tile_rows=40, n_tile_cols=1, n_tile_rows=1)
    dst = RegularGrid(ul_x=0, ul_y=0, psx=2.5, psy=2.5,
                      tile_cols=16, tile_rows=16, n_tile_cols=1, n_tile_rows=1)
    out = _canvas(
        warp_window(df, src, dst, 0, 0, 16, 16, method="average").collect()[0]
    )
    v = arr.copy()
    v[v == -9999.0] = np.nan

    def frac_mean(r0, r1, c0, c1):
        num = den = 0.0
        for r in range(int(np.floor(r0)), int(np.ceil(r1))):
            for c in range(int(np.floor(c0)), int(np.ceil(c1))):
                w = (min(r + 1, r1) - max(r, r0)) * (min(c + 1, c1) - max(c, c0))
                if w > 0 and not np.isnan(v[r, c]):
                    num += w * v[r, c]
                    den += w
        return num / den if den > 1e-9 else -9999.0

    for i in (0, 1, 7, 15):
        for j in (0, 1, 7, 15):
            want = frac_mean(2.5 * i, 2.5 * (i + 1), 2.5 * j, 2.5 * (j + 1))
            np.testing.assert_allclose(out[i, j], want, rtol=1e-10,
                                       err_msg=f"px {i},{j}")


def test_cross_crs_warp_4326_to_aeqd(spark, pattern):
    # round-4 e2e: warping into an azimuthal-equidistant frame goes
    # through the same lon/lat hub — golden vs the numpy-side gather
    from veranda_spark.functions.crs import NP, transform

    sref = "AEQD:50.2,10.2"
    src = RegularGrid(ul_x=10.0, ul_y=50.3, psx=0.01, psy=0.01,
                      tile_cols=32, tile_rows=32, n_tile_cols=2, n_tile_rows=2,
                      sref="EPSG:4326")
    x0, y1 = transform(NP, "EPSG:4326", sref,
                       np.array([10.0]), np.array([50.3]))
    dst = RegularGrid(ul_x=float(x0[0]), ul_y=float(y1[0]), psx=800.0,
                      psy=800.0, tile_cols=32, tile_rows=32,
                      n_tile_cols=2, n_tile_rows=2, sref=sref)
    df = _reg(spark, pattern)
    out = _canvas(warp_window(df, src, dst, 0, 0, 48, 48).collect()[0])
    # numpy golden: same gather math driver-side
    jj, ii = np.meshgrid(np.arange(48, dtype="float64"),
                         np.arange(48, dtype="float64"))
    gx = dst.ul_x + (jj + 0.5) * dst.psx
    gy = dst.ul_y - (ii + 0.5) * dst.psy
    sx, sy = transform(NP, sref, "EPSG:4326", gx, gy)
    fc = (sx - src.ul_x) / src.psx - 0.5
    fr = (src.ul_y - sy) / src.psy - 0.5
    ir = np.rint(fr).astype("int64")
    ic = np.rint(fc).astype("int64")
    ok = (ir >= 0) & (ir < 64) & (ic >= 0) & (ic < 64)
    want = np.full((48, 48), np.float64(-9999).astype(np.uint8), np.uint8)
    want[ok] = pattern[ir[ok], ic[ok]]
    np.testing.assert_array_equal(out, want)
    assert ok.sum() > 500  # the window genuinely overlaps the source
