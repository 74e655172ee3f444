"""Register sources (S1/S5/S18, J5-J7 semantics) and vector sink (S15)."""

import numpy as np
from pyspark.sql import functions as F

from veranda_spark.fixtures import generate_images
from veranda_spark.grid import RegularGrid, congruent_tile_ids
from veranda_spark.io.vector import parse_wkb, polygons_df, wkb_point, wkb_polygon, write_geometry
from veranda_spark.sources.register import (
    assign_layers,
    cross_register,
    filename_column,
    register_from_binary_files,
    register_from_table,
    sniff_fmt,
)

GRID = RegularGrid(tile_cols=512, tile_rows=512, n_tile_cols=8, n_tile_rows=4)


def test_register_from_table_layers(spark):
    reg = register_from_table(generate_images(spark, 200), GRID)
    assert {"tile_id", "layer_id"} <= set(reg.columns)
    # layer ids are 1..n_per_tile without gaps (base.py:786-795 parity)
    chk = reg.groupBy("tile_id").agg(
        F.count("*").alias("n"), F.max("layer_id").alias("mx"), F.min("layer_id").alias("mn")
    )
    bad = chk.filter((F.col("mx") != F.col("n")) | (F.col("mn") != 1)).count()
    assert bad == 0


def test_register_from_binary_files_and_sniff(spark, tmp_path):
    from veranda_spark.functions.codec import png_encode

    d = tmp_path / "imgs"
    d.mkdir()
    (d / "a.png").write_bytes(png_encode(np.zeros((4, 4), np.uint8)))
    (d / "b.bin").write_bytes(b"\x01\x02\x03\x04rawdata")
    reg = register_from_binary_files(spark, str(d)).collect()
    fmts = {r["image_id"].split("/")[-1]: r["fmt"] for r in reg}
    assert fmts == {"a.png": "png", "b.bin": "raw"}
    assert all(r["n_bytes"] > 0 for r in reg)


def test_congruent_tile_ids(spark):
    # rows sharing (sref, geotrans, shape) share a tile; layers count up
    rows = [("f%d" % i, "EPSG:4326", "0,1,0,0,0,-1" if i % 2 else "5,1,0,0,0,-1", 50, 60)
            for i in range(10)]
    df = spark.createDataFrame(rows, "filepath string, sref string, geotrans string, h int, w int")
    result = congruent_tile_ids(df, ["sref", "geotrans", "h", "w"])
    # scale guard: the register joins the tiny tile dim via broadcast; the
    # only single-partition exchange allowed is the one numbering the
    # distinct-geometry dim (#tiles rows), never the register itself
    plan = result._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    assert plan.count("Exchange SinglePartition") <= 1
    out = result.collect()
    tiles = {r["tile_nr"] for r in out}
    assert tiles == {0, 1}
    for t in tiles:
        layers = sorted(r["layer_id"] for r in out if r["tile_nr"] == t)
        assert layers == [1, 2, 3, 4, 5]


def test_cross_register_and_filename(spark):
    layers = spark.createDataFrame([(1,), (2,)], "layer_id int")
    tiles = spark.createDataFrame([("0_0",), ("0_1",)], "tile_id string")
    reg = cross_register(layers, tiles)
    assert reg.count() == 4  # J5/J6: every layer on every tile
    named = reg.withColumn(
        "filepath",
        filename_column("L{layer_id}_{tile_id}.tif", {
            "layer_id": F.col("layer_id"), "tile_id": F.col("tile_id")
        }),
    )
    names = {r["filepath"] for r in named.collect()}
    assert names == {"L1_0_0.tif", "L1_0_1.tif", "L2_0_0.tif", "L2_0_1.tif"}


def test_wkb_roundtrip_and_sink(spark, tmp_path):
    assert parse_wkb(wkb_point(3.5, -2.25)) == ("point", (3.5, -2.25))
    kind, pts = parse_wkb(wkb_polygon([(0, 0), (10, 0), (5, 8)]))
    assert kind == "polygon" and pts[0] == pts[-1] == (0.0, 0.0) and len(pts) == 4

    df = spark.createDataFrame([(1, 10, 20), (2, 30, 40)], "point_id int, px int, py int")
    write_geometry(df, str(tmp_path / "geo"), dn_col="point_id")
    back = spark.read.parquet(str(tmp_path / "geo")).collect()
    got = {parse_wkb(bytes(r["geometry"]))[1] for r in back}
    assert got == {(10.0, 20.0), (30.0, 40.0)}
    assert {r["DN"] for r in back} == {1, 2}

    pd_df = polygons_df(spark, {"t": [(0, 0), (1, 0), (0, 1)]})
    assert pd_df.count() == 1


def test_wkb_multiring_roundtrip_and_pip(spark):
    from veranda_spark.io.vector import parse_wkb_rings, with_xy_rings, wkb_polygon
    from veranda_spark.operators.joins import pip_join_table

    outer = [(100.0, 100.0), (900.0, 100.0), (900.0, 900.0), (100.0, 900.0)]
    hole = [(400.0, 400.0), (600.0, 400.0), (600.0, 600.0), (400.0, 600.0)]
    blob = wkb_polygon([outer, hole])
    kind, rings = parse_wkb_rings(blob)
    assert kind == "polygon" and len(rings) == 2
    assert rings[0][0] == (100.0, 100.0) and rings[0][-1] == (100.0, 100.0)

    # GeoParquet-style table -> rings column -> PIP join, end to end
    gdf = spark.createDataFrame(
        [("donut", bytearray(blob))], "polygon_id string, geometry binary"
    )
    polys = with_xy_rings(gdf).drop("geometry")
    pts = spark.createDataFrame(
        [(1, 200.5, 200.5), (2, 500.5, 500.5), (3, 950.5, 950.5)],
        "point_id long, px double, py double",
    )
    got = {r["point_id"] for r in pip_join_table(pts, polys).collect()}
    assert got == {1}  # 2 in the hole, 3 outside
