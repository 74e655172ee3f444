"""Cube-merge operators (J4: coordinate-aligned merges).

veranda merges cubes with ``xr.combine_by_coords`` (tile stitching,
reference mosaic/netcdf.py:307,461) and ``data.merge`` (variable merge,
native/netcdf.py:492-495).  Relationally those are:

- tile stitching  = ``unionByName`` of per-tile register partitions
- variable merge  = FULL OUTER join of per-variable registers on the
  shared dimension key (layer_id, tile_id)
- layer append    = union + dedupe on the stack coordinate (mode='a'
  semantics with overwrite-on-conflict resolved by recency)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stitch_union(*parts: DataFrame) -> DataFrame:
    """combine_by_coords analog: union tile partitions; missing columns
    null-filled (allowMissingColumns mirrors xarray's outer coords)."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def merge_variables(
    a: DataFrame, b: DataFrame, on: list[str] = ["tile_id", "layer_id"]
) -> DataFrame:
    """Variable merge (data.merge analog): full outer join on the cube
    dims; each side's payload columns are suffixed by its var name."""
    a_var = a.select("var").first()["var"] if "var" in a.columns else "a"
    b_var = b.select("var").first()["var"] if "var" in b.columns else "b"
    pa = a.select(
        *on, *[F.col(c).alias(f"{c}_{a_var}") for c in a.columns if c not in on + ["var"]]
    )
    pb = b.select(
        *on, *[F.col(c).alias(f"{c}_{b_var}") for c in b.columns if c not in on + ["var"]]
    )
    return pa.join(pb, on, "full_outer")


def append_layers(existing: DataFrame, new: DataFrame, on: list[str] = ["tile_id", "var", "layer_id"]) -> DataFrame:
    """Append-mode union (S7, mode='a' along the unlimited dim,
    reference native/netcdf.py:354-358): new layers win on key conflict."""
    tagged = existing.withColumn("_gen", F.lit(0)).unionByName(
        new.withColumn("_gen", F.lit(1)), allowMissingColumns=True
    )
    w = Window.partitionBy(*on).orderBy(F.col("_gen").desc())
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_gen")
    )


def tile_algebra(
    a: DataFrame,
    b: DataFrame,
    fn,
    out_var: str = "algebra",
    nodata: float = -9999.0,
    on: list[str] | None = None,
) -> DataFrame:
    """Per-pixel band math between two ALIGNED tile sets (the xarray
    ``(a - b) / (a + b)`` idiom over burn_in / read-back canvases,
    e.g. NDVI): equi-join canvases on the tile key, one Arrow pass.

    ``fn(arr_a, arr_b) -> arr`` receives float64 arrays with nodata
    already mapped to NaN and must return a same-shaped float64 array;
    NaNs in the result are stored as ``nodata``.  Output rows follow
    TILE_SCHEMA with dtype float64, n_images = a.n + b.n.

    Scale: the join key is (tile_id[, layer_id]) — both sides are
    already partitioned by tile after burn_in, so this co-locates
    without a driver loop; payload bytes move at most once per side.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from veranda_spark.operators.raster import TILE_SCHEMA

    keys = on or [
        k for k in ("tile_id", "layer_id") if k in a.columns and k in b.columns
    ]
    if "tile_id" not in keys:
        raise ValueError("tile_algebra needs tile_id in the join key")
    meta = [c for c in ("tile_row", "tile_col") if c in a.columns]
    left = a.select(
        *keys, *meta,
        F.col("bytes").alias("xba"), F.col("h").alias("xh"), F.col("w").alias("xw"),
        F.col("channels").alias("xca"), F.col("dtype").alias("xda"),
        F.col("n_images").alias("xna"),
    )
    right = b.select(
        *keys,
        F.col("bytes").alias("xbb"), F.col("h").alias("xhb"), F.col("w").alias("xwb"),
        F.col("channels").alias("xcb"),
        F.col("dtype").alias("xdb"), F.col("n_images").alias("xnb"),
    )
    joined = left.join(right, keys)

    def _dec(buf, dt, h, w, ch):
        arr = np.frombuffer(buf, dtype=dt).reshape(
            (h, w) if ch == 1 else (h, w, ch)
        ).astype("float64")
        arr[arr == nodata] = np.nan
        return arr

    def compute(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for row in pdf.itertuples(index=False):
                h, w = int(row.xh), int(row.xw)
                hb, wb = int(row.xhb), int(row.xwb)
                if (hb, wb) != (h, w):
                    # a transposed/mismatched b tile with the same byte
                    # count would reshape "successfully" and compute
                    # silently wrong pixels — fail loudly instead
                    raise ValueError(
                        f"tile_algebra: misaligned tiles on key "
                        f"{tuple(getattr(row, k) for k in keys)}: "
                        f"a is {h}x{w}, b is {hb}x{wb}"
                    )
                va = _dec(row.xba, row.xda, h, w, int(row.xca))
                vb = _dec(row.xbb, row.xdb, h, w, int(row.xcb))
                out = np.asarray(fn(va, vb), dtype="float64")
                if out.shape != va.shape:
                    raise ValueError(
                        f"fn returned shape {out.shape}, expected {va.shape}"
                    )
                out = np.where(np.isnan(out), nodata, out)
                rows.append(
                    (
                        row.tile_id,
                        int(getattr(row, "tile_row", 0)),
                        int(getattr(row, "tile_col", 0)),
                        out_var,
                        int(getattr(row, "layer_id", 1)),
                        np.ascontiguousarray(out).tobytes(),
                        h, w, int(row.xca), "float64",
                        int(row.xna) + int(row.xnb),
                    )
                )
            yield pd.DataFrame(
                rows or None,
                columns=[
                    "tile_id", "tile_row", "tile_col", "var", "layer_id",
                    "bytes", "h", "w", "channels", "dtype", "n_images",
                ],
            )

    return joined.mapInPandas(compute, schema=TILE_SCHEMA)
