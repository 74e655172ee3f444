"""CRS plumbing: declared sref on the grid asserted against the register
(reference carries sref everywhere, base.py:98-100; WKT round-trip intent
of test_gdal.py:21-49), plus affine footprint re-mapping between grids."""

import numpy as np
import pytest
from pyspark.sql.utils import PythonException

from veranda_spark.grid import RegularGrid, reproject_footprints
from veranda_spark.operators.select import with_tile_id

WKT = (
    'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],'
    'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]'
)


def _reg(spark, sref):
    return spark.createDataFrame(
        [(1, 0, 0, 8, 8, sref), (2, 64, 64, 8, 8, sref)],
        "image_id long, px_col0 long, px_row0 long, w long, h long, sref string",
    )


def test_sref_roundtrip_through_tiles_df(spark):
    g = RegularGrid(tile_cols=32, tile_rows=32, n_tile_cols=2, n_tile_rows=2, sref=WKT)
    tiles = g.tiles_df(spark)
    assert set(r["sref"] for r in tiles.select("sref").distinct().collect()) == {WKT}


def test_sref_match_passes_and_mismatch_raises(spark):
    g = RegularGrid(tile_cols=32, tile_rows=32, sref=WKT)
    ok = with_tile_id(_reg(spark, WKT), g)
    assert ok.count() == 2
    # NULL register sref inherits the grid CRS
    assert with_tile_id(_reg(spark, None), g).count() == 2
    bad = with_tile_id(_reg(spark, "EPSG:3857"), g)
    with pytest.raises(Exception, match="CRS mismatch"):
        bad.count()


def test_sref_guard_noop_without_declarations(spark):
    # no grid sref, or no register column → unchanged behavior
    g = RegularGrid(tile_cols=32, tile_rows=32)
    assert with_tile_id(_reg(spark, "EPSG:3857"), g).count() == 2


def test_reproject_footprints_affine(spark):
    src = RegularGrid(ul_x=0.0, ul_y=0.0, psx=1.0, psy=1.0, sref="EPSG:4326")
    dst = RegularGrid(ul_x=-10.0, ul_y=10.0, psx=0.5, psy=0.5, sref="EPSG:4326")
    df = spark.createDataFrame(
        [(1, 4, 6, 8, 10)], "image_id long, px_col0 long, px_row0 long, w long, h long"
    )
    r = reproject_footprints(df, src, dst).collect()[0]
    # world x of col 4 = 4.0 → dst col = (4 - (-10)) / 0.5 = 28
    assert r["px_col0"] == 28
    # world y of row 6 = -6.0 → dst row = (10 - (-6)) / 0.5 = 32
    assert r["px_row0"] == 32
    assert r["w"] == 16 and r["h"] == 20  # extents scale by psx ratio

    other = RegularGrid(sref="EPSG:3857")
    with pytest.raises(ValueError, match="affine-remap"):
        reproject_footprints(df, src, other)
