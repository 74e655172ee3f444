"""Structured-Streaming append ingestion.

Maps the reference's append mode (NetCdf4File mode='a' along the
unlimited stack dim, native/netcdf.py:354-358, 565-598; test
test_netcdf4.py:39-51 'writing twice doubles the stack') to its Spark
analog: a file-source stream appended to a tiled sink with an
availableNow trigger — each new batch of image rows becomes new layers;
watermarked windowed counts give per-tile ingest rates.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from veranda_spark.fixtures import IMAGES_SCHEMA
from veranda_spark.grid import RegularGrid


def stream_images(spark: SparkSession, src_dir: str) -> DataFrame:
    """readStream over a parquet drop directory of image rows."""
    return spark.readStream.schema(IMAGES_SCHEMA).parquet(src_dir)


def append_to_tiles(
    stream: DataFrame, grid: RegularGrid, sink_dir: str, checkpoint_dir: str
):
    """Append-mode sink: assign tiles, write partitioned parquet.  With
    Trigger.AvailableNow the stream drains everything present and stops —
    the batch-append parity of the reference's mode='a'."""
    tiled = stream.withColumn(
        "tile_id",
        grid.tile_id_of(
            grid.tile_row_of(F.col("px_row0")), grid.tile_col_of(F.col("px_col0"))
        ),
    )
    return (
        tiled.writeStream.format("parquet")
        .option("path", os.path.join(sink_dir, "tiles"))
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("tile_id")
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )


def windowed_ingest_counts(
    stream: DataFrame, ts_col: str = "ingest_ts", window: str = "10 seconds"
) -> DataFrame:
    """Watermarked tumbling-window counts per tile (late data dropped
    after 30s) — the streaming-agg surface of the engine."""
    return (
        stream.withWatermark(ts_col, "30 seconds")
        .groupBy(F.window(F.col(ts_col), window), F.col("tile_id"))
        .agg(F.count("*").alias("n_rows"))
    )
