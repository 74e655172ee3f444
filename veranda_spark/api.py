"""High-level chained API mirroring the reference's user surface.

veranda users write method chains like::

    GeoTiffReader.from_filepaths(paths).select_bbox(bbox).read(bands=...)
    NetCdfWriter(mosaic, data=ds).select_layers([...]).export()

(reference mosaic/geotiff.py:129-181, base.py:297-557, 868-905).  This
module provides the same ergonomics over the Spark engine: a
``RasterReader``/``RasterWriter`` pair whose ``select_*`` methods are
copy-on-write (each returns a NEW reader over a narrowed DataFrame —
veranda's ``inplace=False`` deepcopy semantics, base.py:316-318, for free
from immutable DataFrames) and whose ``read``/``export`` execute.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from veranda_spark.grid import RegularGrid
from veranda_spark.operators import select as _sel
from veranda_spark.operators.raster import burn_in, read_window


class RasterReader:
    """Stitched-read entry point (GeoTiffReader/NetCdfReader analog)."""

    def __init__(self, register: DataFrame, grid: RegularGrid, mask_polygon=None):
        self._df = register
        self.grid = grid
        self._mask = mask_polygon

    # ---- constructors (from_filepaths analogs) ---------------------------

    @classmethod
    def from_table(cls, df: DataFrame, grid: RegularGrid) -> "RasterReader":
        """Bind a register DataFrame (the engine's 'file list')."""
        return cls(df, grid)

    @classmethod
    def from_parquet(cls, spark: SparkSession, path: str, grid: RegularGrid) -> "RasterReader":
        return cls(spark.read.parquet(path), grid)

    @classmethod
    def from_sink(
        cls,
        spark: SparkSession,
        base: str,
        grid: RegularGrid,
        as_of=None,
        mode: str = "latest",
    ) -> "RasterReader":
        """Bind a checkpointed tiled sink (write_tiles_checkpointed /
        RasterWriter.export output) as a register: each committed tile
        canvas becomes an image row placed at its tile origin, so the
        full select/read chain — including windows that span tiles —
        works over exported mosaics.  ``as_of`` / ``mode`` are
        read_tiles' snapshot controls (time travel, latest vs all
        generations)."""
        from pyspark.sql import functions as F

        from veranda_spark.io.lineage import read_tiles

        t = read_tiles(spark, base, as_of=as_of, mode=mode)
        fmt = F.col("fmt") if "fmt" in t.columns else F.lit("raw")
        reg = t.select(
            F.col("run_id").alias("image_id"),
            F.col("tile_id"),
            F.col("var"),
            F.col("layer_id"),
            F.col("bytes"),
            F.col("h"),
            F.col("w"),
            F.col("channels"),
            F.col("dtype"),
            fmt.alias("fmt"),
            (F.col("tile_row") * grid.tile_rows).alias("px_row0"),
            (F.col("tile_col") * grid.tile_cols).alias("px_col0"),
        )
        return cls(reg, grid)

    # ---- select_* family (copy-on-write chaining) ------------------------

    def _with(self, df: DataFrame) -> "RasterReader":
        return RasterReader(df, self.grid, self._mask)

    def select_tiles(self, tile_ids: Sequence[str]) -> "RasterReader":
        return self._with(_sel.select_tiles(self._df, tile_ids))

    def select_layers(self, layer_ids: Sequence) -> "RasterReader":
        return self._with(_sel.select_layers(self._df, layer_ids))

    def select_px_window(self, row: int, col: int, height: int, width: int) -> "RasterReader":
        return self._with(_sel.select_px_window(self._df, row, col, height, width))

    def select_xy(self, x: float, y: float) -> "RasterReader":
        return self._with(_sel.select_xy(self._df, self.grid, x, y))

    def select_bbox(self, bbox: tuple[float, float, float, float]) -> "RasterReader":
        return self._with(_sel.select_bbox(self._df, self.grid, bbox))

    def select_polygon(
        self, polygon: Sequence[tuple[float, float]], apply_mask: bool = True
    ) -> "RasterReader":
        """P7: prune the register; with apply_mask the polygon also nulls
        out-of-polygon pixels at read time (base.py:510-557)."""
        out = RasterReader(
            _sel.select_polygon(self._df, self.grid, polygon),
            self.grid,
            polygon if apply_mask else self._mask,
        )
        return out

    def select(self, cmds: Sequence) -> "RasterReader":
        """P1: replay a serialized command list."""
        return self._with(_sel.select(self._df, self.grid, cmds))

    # ---- execution --------------------------------------------------------

    @property
    def file_register(self) -> DataFrame:
        """The pruned register (veranda's .file_register property)."""
        return self._df

    def n_tiles(self) -> int:
        from veranda_spark.operators.select import with_tile_id

        return with_tile_id(self._df, self.grid).select("tile_id").distinct().count()

    def read(
        self,
        row: int = 0,
        col: int = 0,
        height: int | None = None,
        width: int | None = None,
        auto_decode: bool = False,
        decoder=None,
        nodata: float = -9999.0,
    ) -> DataFrame:
        """Stitched read of a pixel window (defaults to the full bounded
        grid) — one output row per (var, layer)."""
        if height is None:
            height = self.grid.tile_rows * max(self.grid.n_tile_rows, 1) - row
        if width is None:
            width = self.grid.tile_cols * max(self.grid.n_tile_cols, 1) - col
        return read_window(
            self._df, self.grid, row, col, height, width,
            auto_decode=auto_decode, decoder=decoder,
            mask_polygon=self._mask, nodata=nodata,
        )

    def read_numpy(self, **kw) -> dict:
        """Small-data convenience: {(var, layer_id): ndarray} — the test/
        client-side materialization (never used in pipelines)."""
        out = {}
        for r in self.read(**kw).collect():
            ch = r["channels"] if "channels" in r.__fields__ else 1
            shape = (r["h"], r["w"]) if ch == 1 else (r["h"], r["w"], ch)
            out[(r["var"], r["layer_id"])] = np.frombuffer(
                r["bytes"], dtype=r["dtype"]
            ).reshape(shape)
        return out


class RasterWriter:
    """Tiled-write entry point (GeoTiffWriter/NetCdfWriter analog):
    data rows × mosaic → per-tile outputs (EP3)."""

    def __init__(self, register: DataFrame, grid: RegularGrid):
        self._df = register
        self.grid = grid

    def select_layers(self, layer_ids: Sequence) -> "RasterWriter":
        return RasterWriter(_sel.select_layers(self._df, layer_ids), self.grid)

    def select_polygon(self, polygon) -> "RasterWriter":
        return RasterWriter(_sel.select_polygon(self._df, self.grid, polygon), self.grid)

    def write(self, nodata: float = -9999.0, encoder=None, per_layer: bool = True) -> DataFrame:
        """Burn the register into tiles (use_mosaic=True semantics,
        mosaic/geotiff.py:558-618); returns the tile DataFrame."""
        return burn_in(
            self._df, self.grid, nodata=nodata, encoder=encoder, per_layer=per_layer
        )

    def export(self, path: str, run_id: str | None = None, **kw) -> dict:
        """write + checkpointed persist with lineage (export analog,
        mosaic/geotiff.py:620-641 + north-rule resume)."""
        from veranda_spark.io.lineage import write_tiles_checkpointed

        return write_tiles_checkpointed(self.write(**kw), path, run_id=run_id)
