"""Multi-band canvases (round-2: reference stitches per-band cubes,
mosaic/geotiff.py:430-468).  A register row may carry a `channels` column;
patches and canvases then flow as (h, w, c) end-to-end."""

import numpy as np
from pyspark.sql import functions as F

from veranda_spark.grid import RegularGrid
from veranda_spark.operators.raster import burn_in, read_window

GRID = RegularGrid(tile_cols=16, tile_rows=16, n_tile_cols=2, n_tile_rows=2)


def _rgb_rows(spark):
    rng = np.random.default_rng(5)
    rows = []
    for i, (c0, r0) in enumerate([(0, 0), (8, 8), (20, 4)]):
        arr = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
        rows.append((i, arr.tobytes(), 8, 8, 3, "raw", "uint8", c0, r0))
    schema = (
        "image_id long, bytes binary, w int, h int, channels int, fmt string, "
        "dtype string, px_col0 long, px_row0 long"
    )
    return spark.createDataFrame(rows, schema), rows, rng


def test_burn_in_multiband_canvas(spark):
    df, rows, _ = _rgb_rows(spark)
    tiles = burn_in(df, GRID, per_layer=False).collect()
    by_id = {t["tile_id"]: t for t in tiles}
    t00 = by_id["0_0"]
    assert t00["channels"] == 3
    canvas = np.frombuffer(t00["bytes"], dtype=t00["dtype"]).reshape(16, 16, 3)
    a0 = np.frombuffer(rows[0][1], dtype=np.uint8).reshape(8, 8, 3)
    a1 = np.frombuffer(rows[1][1], dtype=np.uint8).reshape(8, 8, 3)
    np.testing.assert_array_equal(canvas[0:8, 0:8], a0)
    np.testing.assert_array_equal(canvas[8:16, 8:16], a1)
    assert (canvas[0:8, 8:16] == np.uint8(-9999 % 256)) is not None  # nodata-cast fill
    # image 2 straddles tiles 0_1 and is present there
    assert "0_1" in by_id


def test_read_window_multiband_roundtrip(spark):
    df, rows, _ = _rgb_rows(spark)
    out = read_window(df, GRID, 0, 0, 16, 32).collect()[0]
    assert out["channels"] == 3
    canvas = np.frombuffer(out["bytes"], dtype=out["dtype"]).reshape(16, 32, 3)
    a2 = np.frombuffer(rows[2][1], dtype=np.uint8).reshape(8, 8, 3)
    np.testing.assert_array_equal(canvas[4:12, 20:28], a2)


def test_single_band_unchanged(spark):
    # registers without a channels column keep the 2-D contract
    rows = [(1, np.full((8, 8), 7, np.uint8).tobytes(), 8, 8, "raw", "uint8", 0, 0)]
    df = spark.createDataFrame(
        rows,
        "image_id long, bytes binary, w int, h int, fmt string, dtype string, "
        "px_col0 long, px_row0 long",
    )
    t = burn_in(df, GRID, per_layer=False).collect()[0]
    assert t["channels"] == 1
    canvas = np.frombuffer(t["bytes"], dtype=t["dtype"]).reshape(16, 16)
    assert (canvas[0:8, 0:8] == 7).all()


def test_multiband_lossless_tiff_sink_roundtrip(spark, tmp_path):
    # round-3 (ADVICE): the checkpointed sink re-encodes multi-band
    # canvases with the lossless TIFF family — (h, w, spp) interleaved —
    # and the decoded canvas is bit-identical
    from veranda_spark.functions.tiff import tiff_decode
    from veranda_spark.io.lineage import read_tiles, write_tiles_checkpointed

    df, _, _ = _rgb_rows(spark)
    tiles = burn_in(df, GRID, per_layer=False)
    plain = {
        t["tile_id"]: np.frombuffer(t["bytes"], dtype=t["dtype"]).reshape(
            t["h"], t["w"], t["channels"]
        )
        for t in tiles.collect()
    }
    base = str(tmp_path / "sink3")
    res = write_tiles_checkpointed(tiles, base, run_id="r1", lossy_fmt="tiff_lzw")
    assert res["written"] > 0
    for t in read_tiles(spark, base).collect():
        dec = tiff_decode(bytes(t["bytes"]))
        assert dec.shape == (t["h"], t["w"], 3)
        np.testing.assert_array_equal(dec, plain[t["tile_id"]])


def test_multiband_lossy_sink_still_rejected(spark, tmp_path):
    import pytest

    from veranda_spark.io.lineage import write_tiles_checkpointed

    df, _, _ = _rgb_rows(spark)
    tiles = burn_in(df, GRID, per_layer=False)
    with pytest.raises(Exception, match="single-band"):
        write_tiles_checkpointed(
            tiles, str(tmp_path / "sinkl"), run_id="r1", lossy_fmt="dctq"
        )
