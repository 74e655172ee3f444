"""Catalog layout: partition pruning (P2 as table layout) + append."""

import os

from pyspark.sql import functions as F

from veranda_spark.fixtures import generate_images
from veranda_spark.grid import RegularGrid
from veranda_spark.io.catalog import create_images_table, partitions_scanned, read_tiles_pruned
from veranda_spark.operators.select import with_tile_id

GRID = RegularGrid(tile_cols=1024, tile_rows=1024, n_tile_cols=4, n_tile_rows=2)


def test_partition_pruning_and_append(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS images_t")
    imgs = with_tile_id(generate_images(spark, 400), GRID)
    create_images_table(imgs, "images_t")
    total_files = len(spark.table("images_t").inputFiles())

    pruned = read_tiles_pruned(spark, "images_t", ["0_0"])
    n_files = partitions_scanned(pruned)
    assert 0 < n_files < total_files  # only the 0_0 partition is listed
    assert pruned.select("tile_id").distinct().collect()[0]["tile_id"] == "0_0"
    n_before = pruned.count()

    # append snapshot (S7 parity): count doubles, pruning still holds
    create_images_table(imgs, "images_t", mode="append")
    assert spark.table("images_t").count() == 800
    assert read_tiles_pruned(spark, "images_t", ["0_0"]).count() == 2 * n_before
    spark.sql("DROP TABLE images_t")


def test_bucketed_agg_avoids_exchange(spark):
    # 100TB property: a table bucketed by the group key aggregates with NO
    # shuffle (the burn-in groupBy becomes partition-local on a bucketed
    # register). Proof: no Exchange in the physical plan.
    spark.sql("DROP TABLE IF EXISTS images_b")
    imgs = with_tile_id(generate_images(spark, 300), GRID)
    (imgs.write.mode("overwrite").bucketBy(8, "tile_id").sortBy("tile_id")
         .format("parquet").saveAsTable("images_b"))
    agg = spark.table("images_b").groupBy("tile_id").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:500]
    assert agg.count() == 8  # 4x2 grid
    spark.sql("DROP TABLE images_b")
