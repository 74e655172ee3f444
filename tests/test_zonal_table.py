"""zonal_stats_table == zonal_stats (dict) on identical zones, plus
multi-ring (donut) zonal semantics."""

import numpy as np
from pyspark.sql import functions as F

from veranda_spark.fixtures import generate_images
from veranda_spark.grid import RegularGrid
from veranda_spark.operators.raster import zonal_stats, zonal_stats_table

GRID = RegularGrid(tile_cols=512, tile_rows=512, n_tile_cols=8, n_tile_rows=4)

TRI = [(100.0, -100.0), (900.0, -150.0), (400.0, -800.0)]
SQ = [(1200.0, -200.0), (2000.0, -200.0), (2000.0, -900.0), (1200.0, -900.0)]


def _rows(df):
    return {
        r["polygon_id"]: (r["n_px"], round(r["mean_val"], 9), r["min_val"], r["max_val"])
        for r in df.collect()
    }


def test_table_matches_dict_variant(spark):
    imgs = generate_images(spark, 200).cache()
    want = _rows(zonal_stats(imgs, GRID, {"tri": TRI, "sq": SQ}, auto_decode=False))
    polys = spark.createDataFrame(
        [("tri", [[float(x), float(y)] for x, y in TRI]),
         ("sq", [[float(x), float(y)] for x, y in SQ])],
        "polygon_id string, xy array<array<double>>",
    )
    got = _rows(zonal_stats_table(imgs, GRID, polys, auto_decode=False))
    assert got == want
    assert len(got) == 2 and all(v[0] > 0 for v in got.values())


def test_zonal_dict_accepts_rings(spark):
    imgs = generate_images(spark, 150).cache()
    outer = [(100.0, -100.0), (1100.0, -100.0), (1100.0, -1100.0), (100.0, -1100.0)]
    hole = [(400.0, -400.0), (800.0, -400.0), (800.0, -800.0), (400.0, -800.0)]
    full = _rows(zonal_stats(imgs, GRID, {"z": outer}, auto_decode=False))
    donut = _rows(zonal_stats(imgs, GRID, {"z": [outer, hole]}, auto_decode=False))
    inner = _rows(zonal_stats(imgs, GRID, {"z": hole}, auto_decode=False))
    # even-odd: donut pixel count = outer minus hole
    assert donut["z"][0] == full["z"][0] - inner["z"][0]
    assert donut["z"][0] > 0


def test_table_accepts_rings(spark):
    imgs = generate_images(spark, 150).cache()
    outer = [(100.0, -100.0), (1100.0, -100.0), (1100.0, -1100.0), (100.0, -1100.0)]
    hole = [(400.0, -400.0), (800.0, -400.0), (800.0, -800.0), (400.0, -800.0)]
    want = _rows(zonal_stats(imgs, GRID, {"z": [outer, hole]}, auto_decode=False))
    polys = spark.createDataFrame(
        [("z", [[[float(x), float(y)] for x, y in ring] for ring in (outer, hole)])],
        "polygon_id string, xy array<array<array<double>>>",
    )
    got = _rows(zonal_stats_table(imgs, GRID, polys, auto_decode=False))
    assert got == want and got["z"][0] > 0
