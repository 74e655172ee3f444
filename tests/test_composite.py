"""burn_in composite modes vs numpy goldens on overlapping images."""

import numpy as np
import pytest

from veranda_spark.grid import RegularGrid
from veranda_spark.operators.raster import burn_in

GRID = RegularGrid(tile_cols=16, tile_rows=16, n_tile_cols=2, n_tile_rows=2)


def _overlapping(spark):
    a = np.full((8, 8), 10, np.uint8)
    b = np.full((8, 8), 200, np.uint8)
    # b overlaps a's right half: a at (0,0), b at (0,4)
    rows = [
        (1, a.tobytes(), 8, 8, "raw", "uint8", 0, 0),
        (2, b.tobytes(), 8, 8, "raw", "uint8", 4, 0),
    ]
    return spark.createDataFrame(
        rows,
        "image_id long, bytes binary, w int, h int, fmt string, dtype string, "
        "px_col0 long, px_row0 long",
    )


def _tile00(df, **kw):
    tiles = burn_in(df, GRID, per_layer=False, **kw).collect()
    t = next(t for t in tiles if t["tile_id"] == "0_0")
    return np.frombuffer(t["bytes"], dtype=t["dtype"]).reshape(16, 16)


NOD = np.uint8(-9999 % 256)


def test_composite_last_and_first(spark):
    df = _overlapping(spark)
    last = _tile00(df)
    assert (last[0:8, 0:4] == 10).all()
    assert (last[0:8, 4:12] == 200).all()  # image 2 placed later, wins
    first = _tile00(df, composite="first")
    assert (first[0:8, 0:8] == 10).all()  # image 1 holds its ground
    assert (first[0:8, 8:12] == 200).all()  # b's non-overlap still lands
    assert (first[0:8, 12:16] == NOD).all()


def test_composite_max_min_mean(spark):
    df = _overlapping(spark)
    mx = _tile00(df, composite="max")
    assert (mx[0:8, 0:4] == 10).all() and (mx[0:8, 4:8] == 200).all()
    mn = _tile00(df, composite="min")
    assert (mn[0:8, 4:8] == 10).all() and (mn[0:8, 8:12] == 200).all()
    mean = _tile00(df, composite="mean")
    assert (mean[0:8, 4:8] == 105).all()  # (10+200)/2
    assert (mean[0:8, 0:4] == 10).all() and (mean[0:8, 8:12] == 200).all()
    assert (mean[8:16, :] == NOD).all()


def test_composite_mean_float_and_guard(spark):
    df = _overlapping(spark)
    mean = _tile00(df, composite="mean", out_dtype="float64")
    assert mean.dtype == np.float64
    assert np.allclose(mean[0:8, 4:8], 105.0)
    with pytest.raises(ValueError, match="composite"):
        burn_in(df, GRID, composite="median")


def test_composite_ignores_patch_side_nodata(spark):
    # review fix: a nodata pixel INSIDE an image payload must not destroy
    # valid data under min/mean (min(100, -9999) is not a composite)
    a = np.full((8, 8), 100, np.int16)
    b = np.full((8, 8), -9999, np.int16)  # fully-nodata payload
    b[0, 0] = 7  # one real pixel
    rows = [
        (1, a.tobytes(), 8, 8, "raw", "int16", 0, 0),
        (2, b.tobytes(), 8, 8, "raw", "int16", 0, 0),
    ]
    df = spark.createDataFrame(
        rows,
        "image_id long, bytes binary, w int, h int, fmt string, dtype string, "
        "px_col0 long, px_row0 long",
    )
    for mode, at00, elsewhere in (
        ("min", 7, 100), ("max", 100, 100), ("mean", 54, 100)  # round(53.5) half-even
    ):
        t = _tile00(df, composite=mode, out_dtype="int16").astype(int)
        assert t[0, 0] == at00, mode
        assert (t[0:8, 1:8] == elsewhere).all(), mode
