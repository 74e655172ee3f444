"""File-register sources: build the engine's register DataFrame.

veranda's entry points construct a file register (pandas DataFrame of
filepath × tile × layer) from file lists or from data
(reference base.py:82-127, 748-797, 971-1101; GeoTiffReader.from_filepaths
mosaic/geotiff.py:129-181).  Spark-first equivalents:

- ``register_from_binary_files``: `spark.read.format("binaryFile")` scan
  of an image directory → one row per file with payload + metadata
  (S1's plain-file analog).
- ``register_from_table``: the Iceberg-shaped image table is already a
  register; attach tile/layer keys.
- ``assign_layers``: layer_id = running 1-based count per tile in file
  order (base.py:786-795) — a window function.
- ``filename_column``: fn_pattern templating with per-column formatters
  (base.py:1086-1101) as format_string/date_format columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from veranda_spark.grid import RegularGrid

PNG_MAGIC = bytes([0x89, 0x50, 0x4E, 0x47])


def sniff_fmt(data_col: F.Column) -> F.Column:
    """Format sniff from payload header bytes (S18 analog: BigTIFF header
    check, reference native/geotiff.py:121-149)."""
    head4 = F.substring(data_col, 1, 4)
    return (
        F.when(head4 == F.lit(PNG_MAGIC), "png")
        .when(head4 == F.lit(b"PK\x03\x04"), "zip")
        .when(F.substring(data_col, 1, 2).isin(F.lit(b"II"), F.lit(b"MM")), "tiff")
        .when(F.substring(data_col, 1, 3) == F.lit(b"\xff\xd8\xff"), "jpg")
        .when(head4.isin(F.lit(b"CDF\x01"), F.lit(b"CDF\x02"),
                         F.lit(b"CDF\x05")), "nc")
        # netCDF-4 rides the HDF5 container — nc_decode reads the
        # NETCDF4-classic subset (functions/hdf5.py) since round 7; the
        # distinct label keeps triage able to tell the containers apart
        .when(head4 == F.lit(b"\x89HDF"), "hdf5")
        .otherwise("raw")
    )


def register_from_binary_files(
    spark: SparkSession, path: str, pattern: str = "*"
) -> DataFrame:
    """Directory of image files → register rows (path, modificationTime,
    length, content) with a sniffed fmt column.  The multi-file scan is
    Spark-native (S5: no VRT needed — manifests/file listing replace it)."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(path)
    )
    return df.select(
        F.col("path").alias("image_id"),
        F.col("content").alias("bytes"),
        F.col("length").alias("n_bytes"),
        sniff_fmt(F.col("content")).alias("fmt"),
    )


def assign_layers(df: DataFrame, tile_col: str = "tile_id", order_col: str = "image_id") -> DataFrame:
    """layer_id = 1-based running count per tile in deterministic order
    (J6/J7 semantics, base.py:786-795, 1052-1054)."""
    w = Window.partitionBy(tile_col).orderBy(F.col(order_col).asc())
    return df.withColumn("layer_id", F.row_number().over(w))


def register_from_table(df: DataFrame, grid: RegularGrid) -> DataFrame:
    """Attach tile keys + layers to an image table carrying integer-pixel
    footprints — the ctor path of RasterData.from_filepaths re-expressed."""
    from veranda_spark.operators.select import with_tile_id

    return assign_layers(with_tile_id(df, grid))


def cross_register(
    layers: DataFrame, tiles: DataFrame
) -> DataFrame:
    """Register = layers × tiles (J5/J6 cross joins, base.py:994-1056):
    the write-side register derivation (every layer exists on every tile)."""
    return layers.crossJoin(F.broadcast(tiles))


def filename_column(
    fn_pattern: str, columns: dict[str, F.Column]
) -> F.Column:
    """fn_pattern templating (base.py:1086-1101): '{tile_id}_{layer_id}.tif'
    with per-column formatter expressions (e.g. date_format for timestamps).

    Implemented with concat of literals + formatted columns — JVM-side,
    no Python formatting per row."""
    import re

    parts: list[F.Column] = []
    pos = 0
    for m in re.finditer(r"\{(\w+)\}", fn_pattern):
        if m.start() > pos:
            parts.append(F.lit(fn_pattern[pos : m.start()]))
        name = m.group(1)
        if name not in columns:
            raise KeyError(f"fn_pattern field {name!r} not provided")
        parts.append(columns[name].cast("string"))
        pos = m.end()
    if pos < len(fn_pattern):
        parts.append(F.lit(fn_pattern[pos:]))
    return F.concat(*parts)


def footprints_from_geotiff(
    df: DataFrame, grid: RegularGrid, bytes_col: str = "bytes"
) -> DataFrame:
    """Recover integer-pixel footprints (px_col0, px_row0) from GeoTIFF
    placement tags in the payload itself — the reference's geotransform
    path (GDAL reads geotrans per file; here an Arrow pass parses the
    ModelPixelScale/ModelTiepoint tags and maps world → grid pixels).

    Only the header/IFD bytes are touched per row (no pixel decode).
    Rows without geo tags get NULL footprints — filter or fail upstream.
    A loud error is raised when a payload's pixel size disagrees with the
    grid (mixed-resolution registers need reproject_footprints first).
    """
    from veranda_spark.functions.tiff import tiff_geotrans

    return _footprints_from_geotrans(df, grid, bytes_col, tiff_geotrans)


def footprints_from_netcdf(
    df: DataFrame, grid: RegularGrid, bytes_col: str = "bytes"
) -> DataFrame:
    """footprints_from_geotiff's `.nc` twin: placement from the classic
    NetCDF payload's grid-mapping GeoTransform attr (or its x/y
    coordinate-variable spacing) — the reference's netCDF georeferencing
    (native/netcdf.py:199-245 spatial attrs / coord variables)."""
    from veranda_spark.functions.netcdf import nc_geotrans

    return _footprints_from_geotrans(df, grid, bytes_col, nc_geotrans)


def _footprints_from_geotrans(
    df: DataFrame, grid: RegularGrid, bytes_col: str, geotrans_of
) -> DataFrame:
    from typing import Iterator

    import pandas as pd

    base = df.drop("px_col0", "px_row0")
    schema = ", ".join(f.name + " " + f.dataType.simpleString() for f in base.schema)
    schema += ", px_col0 long, px_row0 long"

    ul_x, ul_y, psx, psy = grid.ul_x, grid.ul_y, grid.psx, grid.psy
    rot_x, rot_y = grid.rot_x, grid.rot_y
    det = -(psx * psy + rot_x * rot_y)

    def recover(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            cols, rows = [], []
            for payload in pdf[bytes_col]:
                gt = geotrans_of(bytes(payload))
                if gt is None:
                    cols.append(None)
                    rows.append(None)
                    continue
                gx, gpsx, grot1, gy, grot2, gpsy_neg = gt
                if abs(grot1 - rot_x) > 1e-9 or abs(grot2 - rot_y) > 1e-9:
                    # rot terms must MATCH the grid's (round 5c:
                    # ModelTransformationTag payloads register against
                    # an equally sheared grid; a mismatch would
                    # mis-place every pixel — fail loudly)
                    raise ValueError(
                        f"payload geotransform rotation ({grot1}, "
                        f"{grot2}) != grid ({rot_x}, {rot_y}); "
                        "warp to the grid's frame first"
                    )
                if abs(gpsx - psx) > 1e-9 or abs(-gpsy_neg - psy) > 1e-9:
                    raise ValueError(
                        f"payload pixel size ({gpsx}, {-gpsy_neg}) != grid "
                        f"({psx}, {psy}); reproject first"
                    )
                # inverse affine of the payload ORIGIN (north-up reduces
                # to the round-3 formulas exactly)
                dx, dy = gx - ul_x, gy - ul_y
                cols.append(int(round((-psy * dx - rot_x * dy) / det)))
                rows.append(int(round((-rot_y * dx + psx * dy) / det)))
            out = pdf.copy()
            out["px_col0"] = pd.array(cols, dtype="Int64")
            out["px_row0"] = pd.array(rows, dtype="Int64")
            yield out

    return base.mapInPandas(recover, schema=schema)
