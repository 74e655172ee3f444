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
