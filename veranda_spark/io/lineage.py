"""Checkpointed tiled writes with per-partition lineage + resume.

North-rule addition (no reference analog — veranda is one-shot batch;
closest is its append mode, native/netcdf.py:354-358): every tile-group
write appends a lineage record (tile id, cell range, row counts, pixel
stats/PSNR) to a lineage table; a killed job resumes by anti-joining
completed tiles — no recomputation, no streaming state store
(SURVEY.md §2.8: resume is table-driven by design).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = (
    "tile_id string, tile_row long, tile_col long, n_images long, "
    "run_id string, status string, psnr double, completed_at double"
)


def lineage_path(base: str) -> str:
    return os.path.join(base, "_lineage")


def read_lineage(spark: SparkSession, base: str) -> DataFrame | None:
    p = lineage_path(base)
    try:
        return spark.read.parquet(p)
    except Exception:
        return None


def completed_tiles(spark: SparkSession, base: str) -> DataFrame | None:
    lin = read_lineage(spark, base)
    if lin is None:
        return None
    return lin.filter(F.col("status") == "done").select("tile_id").distinct()


def write_tiles_checkpointed(
    tiles: DataFrame,
    base: str,
    run_id: str | None = None,
    lossy_fmt: str | None = None,
) -> dict:
    """Write burn-in output partitioned by tile_id with lineage records.

    ``tiles`` is the output of ``operators.raster.burn_in`` (one row per
    tile canvas).  Already-completed tiles (per the lineage table) are
    anti-joined away before any pixel work — the resume path.

    With ``lossy_fmt`` (e.g. "dctq") canvases are re-encoded lossily and
    the PER-TILE PSNR vs the exact canvas is recorded in the lineage
    table (north-rule: lineage carries PSNR stats; the input_hint demands
    PSNR >= 40 dB for lossy formats).  Returns counters {written, skipped}.
    """
    spark = tiles.sparkSession
    run_id = run_id or f"run_{int(time.time() * 1000)}"
    done = completed_tiles(spark, base)
    todo = tiles if done is None else tiles.join(done, "tile_id", "left_anti")
    if lossy_fmt is not None:
        from typing import Iterator

        import numpy as np
        import pandas as pd

        from veranda_spark.functions.codec import decode_image, encode_image, psnr

        out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in todo.schema) + ", psnr double, fmt string"

        def reencode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                payloads, psnrs = [], []
                for row in pdf.itertuples(index=False):
                    canvas = np.frombuffer(row.bytes, dtype=row.dtype).reshape(row.h, row.w)
                    enc = encode_image(canvas.astype("uint8"), lossy_fmt)
                    dec = decode_image(enc, lossy_fmt, row.h, row.w)
                    payloads.append(enc)
                    psnrs.append(min(psnr(canvas.astype("float64"), dec), 1e9))
                pdf = pdf.copy()
                pdf["bytes"] = payloads
                pdf["psnr"] = psnrs
                pdf["fmt"] = lossy_fmt
                yield pdf

        todo = todo.mapInPandas(reencode, schema=out_schema)
    todo = todo.cache()
    n_todo = todo.count()
    n_total = tiles.count()
    if n_todo:
        (
            todo.write.mode("append")
            .partitionBy("tile_id")
            .parquet(os.path.join(base, "tiles"))
        )
        lineage = todo.select(
            "tile_id",
            "tile_row",
            "tile_col",
            F.col("n_images").cast("long").alias("n_images"),
            F.lit(run_id).alias("run_id"),
            F.lit("done").alias("status"),
            (F.col("psnr") if lossy_fmt is not None else F.lit(float("nan"))).alias("psnr"),
            F.lit(time.time()).alias("completed_at"),
        )
        lineage.write.mode("append").parquet(lineage_path(base))
    todo.unpersist()
    return {"run_id": run_id, "written": n_todo, "skipped": n_total - n_todo}


def read_tiles(spark: SparkSession, base: str) -> DataFrame:
    """Read back the tiled sink (partition pruning on tile_id applies)."""
    return spark.read.parquet(os.path.join(base, "tiles"))
