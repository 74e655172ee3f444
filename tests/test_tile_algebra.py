"""tile_algebra vs numpy golden: NDVI-style math over two burn-ins."""

import numpy as np
from pyspark.sql import functions as F

from veranda_spark.fixtures import generate_images
from veranda_spark.grid import RegularGrid
from veranda_spark.operators.cube import tile_algebra
from veranda_spark.operators.raster import burn_in

GRID = RegularGrid(tile_cols=256, tile_rows=256, n_tile_cols=16, n_tile_rows=8)


def _canvases(tiles):
    return {
        t["tile_id"]: np.frombuffer(t["bytes"], dtype=t["dtype"]).reshape(
            t["h"], t["w"]
        )
        for t in tiles
    }


def test_tile_algebra_matches_numpy(spark):
    a = burn_in(generate_images(spark, 150, seed=42), GRID, per_layer=False).cache()
    b = burn_in(generate_images(spark, 150, seed=43), GRID, per_layer=False).cache()
    got = _canvases(tile_algebra(a, b, lambda x, y: (x - y) / (x + y + 1.0)).collect())
    ca, cb = _canvases(a.collect()), _canvases(b.collect())
    common = set(ca) & set(cb)
    assert set(got) == common and len(common) > 10
    for tid in common:
        x = ca[tid].astype("float64"); x[x == -9999] = np.nan
        y = cb[tid].astype("float64"); y[y == -9999] = np.nan
        want = (x - y) / (x + y + 1.0)
        want = np.where(np.isnan(want), -9999.0, want)
        np.testing.assert_allclose(got[tid], want, rtol=1e-12, err_msg=tid)


def test_tile_algebra_shape_guard(spark):
    a = burn_in(generate_images(spark, 30), GRID, per_layer=False)
    import pytest

    with pytest.raises(Exception, match="shape"):
        tile_algebra(a, a, lambda x, y: np.zeros((2, 2))).collect()


def test_tile_algebra_misaligned_dims_raise(spark):
    import pytest

    rect = RegularGrid(tile_cols=256, tile_rows=128, n_tile_cols=16, n_tile_rows=16)
    a = burn_in(generate_images(spark, 30), rect, per_layer=False)
    # transpose b's h/w: same byte count, wrong layout — must raise, not
    # silently reshape
    swapped = [F.col("w").alias("h") if c == "h"
               else F.col("h").alias("w") if c == "w"
               else F.col(c) for c in a.columns]
    b = a.select(*swapped)
    with pytest.raises(Exception, match="misaligned"):
        tile_algebra(a, b, lambda x, y: x - y).collect()
