"""veranda_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch re-expression of the query/data-processing capabilities of
TUW-GEO/veranda (raster/vector datacube IO: file register, mosaic tiling,
spatial selection, stitched reads, tiled writes, per-band encode/decode)
as idiomatic Spark DataFrame operators, plus the scale additions a
web-scale image+caption pipeline needs: cell indexing (H3/S2-style
z-order cells), point-in-polygon joins, kNN by ring expansion, zonal
extraction, tile burn-in, skew salting, and checkpoint/lineage resume.

Design stance (SURVEY.md §7): the "file register" is a DataFrame; tiles
and pixels are derived columns so Catalyst prunes and pushes down; all
pixel work happens inside Arrow-vectorized pandas UDFs; no per-row Python.
"""

from veranda_spark.grid import RegularGrid
from veranda_spark.session import get_spark

__all__ = ["RegularGrid", "get_spark"]
__version__ = "0.1.0"
