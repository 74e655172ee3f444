"""Custom decoder/encoder hook contract (§2.9: reference
native/geotiff.py:359-363 reader hook, 389-398 writer hook)."""

import numpy as np

from veranda_spark.fixtures import ONE_TILE_GRID, cube_to_rows, simple_cube
from veranda_spark.operators.raster import burn_in, read_window


def test_custom_decoder_hook(spark):
    cube = simple_cube(n_layers=2)
    rows = cube_to_rows(spark, cube, scale_factor=2.0, add_offset=3.0)

    def halve(arr, nodataval=None, scale_factor=1.0, add_offset=0.0, dtype=None):
        # a user codec that ignores attrs and just halves — must win over
        # auto_decode per the hook contract
        return arr.astype("float64") / 2.0

    res = read_window(rows, ONE_TILE_GRID, 0, 0, 50, 60, decoder=halve).collect()
    got = {r["layer_id"]: np.frombuffer(r["bytes"], dtype=r["dtype"]).reshape(50, 60) for r in res}
    np.testing.assert_array_equal(got[1], cube[0] / 2.0)


def test_custom_encoder_hook(spark):
    from veranda_spark.fixtures import MOSAIC_2X2_GRID
    from veranda_spark.operators.select import select_layers

    cube = simple_cube(n_layers=1)
    rows = cube_to_rows(spark, cube)

    def to_int16(arr, nodataval=None, dtype=None):
        return (arr * 100).astype("int16")

    tiles = burn_in(select_layers(rows, [1]), MOSAIC_2X2_GRID,
                    order_col="layer_id", encoder=to_int16).collect()
    for t in tiles:
        assert t["dtype"] == "int16"
        arr = np.frombuffer(t["bytes"], dtype="int16").reshape(25, 30)
        r0, c0 = t["tile_row"] * 25, t["tile_col"] * 30
        want = (cube[0, r0 : r0 + 25, c0 : c0 + 30] * 100).astype("int16")
        np.testing.assert_array_equal(arr, want)
