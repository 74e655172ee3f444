"""Regular mosaic grid math as pure Spark Column expressions.

Reproduces veranda's regular-mosaic tile-assignment contract
(SURVEY.md §1.4; reference: /root/reference/src/veranda/raster/mosaic/base.py
and /root/reference/src/veranda/raster/native/geotiff.py:33-41):

- geotransform ``(ul_x, psx, 0, ul_y, 0, -psy)`` with north-up negative y
  pixel size (native/geotiff.py:33-41, native/netcdf.py:85-93)
- pixel-center coords ``x = ul_x + (0.5+col)*psx``,
  ``y = ul_y - (0.5+row)*psy`` (native/netcdf.py:225-227, 241-243)
- point→tile by floor division (base.py:471-477 xy2tile/xy2rc semantics):
  ``tile_col = floor((x-ul_x)/x_tile_size)``,
  ``tile_row = floor((ul_y-y)/y_tile_size)``
- world→pixel windows with inclusive ``max+1`` slices
  (RasterAccess, base.py:44-73)
- canonical ``tile_id = f"{tile_row}_{tile_col}"`` with a pluggable namer
  (geospade's exact string format is unverifiable offline — SURVEY.md §1.4 #4)

All arithmetic is done on INTEGER pixel indices wherever possible
(SURVEY.md §7 hard-part #1): joins never compare rounded floats.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _floordiv(a: Column, b: int) -> Column:
    """Floor division for possibly-negative integer columns."""
    return F.floor(a / F.lit(b)).cast("long")


@dataclass(frozen=True)
class RegularGrid:
    """A regular, axis-aligned mosaic of equally sized tiles.

    Equivalent of geospade's RegularMosaicGeometry as used by veranda
    (docs/notebooks/mosaic.ipynb cell 35: 2x2 mosaic of 30x25-px tiles over
    a 60x50-px 1-degree-pixel LatLon grid).

    Attributes
    ----------
    ul_x, ul_y : world coords of the grid origin (upper-left corner).
    psx, psy   : pixel sizes (both positive; y decreases southwards).
    tile_cols, tile_rows : tile size in pixels.
    n_tile_cols, n_tile_rows : mosaic dimensions in tiles (bounds checks);
        <=0 means unbounded.
    """

    ul_x: float = 0.0
    ul_y: float = 0.0
    psx: float = 1.0
    psy: float = 1.0
    tile_cols: int = 30
    tile_rows: int = 25
    n_tile_cols: int = 0
    n_tile_rows: int = 0
    #: GDAL geotransform rotation/shear terms (SURVEY §1.4 #1; reference
    #: native/netcdf.py:225-227 carries geotrans[2]/geotrans[4]):
    #: rot_x = gt2 (x change per ROW step), rot_y = gt4 (y change per COL
    #: step).  The full affine is
    #:   x = ul_x + col*psx + row*rot_x
    #:   y = ul_y + col*rot_y - row*psy
    #: Zero (the default) keeps every formula on the exact north-up fast
    #: path used by rounds 1-4.
    rot_x: float = 0.0
    rot_y: float = 0.0
    namer: Callable[[Column, Column], Column] | None = None
    #: declared spatial reference (WKT or "EPSG:xxxx"); the reference
    #: carries sref on every raster object (base.py:98-100) — here it is
    #: grid metadata asserted against the register's sref column on every
    #: join/burn-in (mismatched CRS = loud error, never silent garbage)
    sref: str | None = None

    # ---- world <-> pixel ------------------------------------------------

    @property
    def is_rotated(self) -> bool:
        return self.rot_x != 0.0 or self.rot_y != 0.0

    def _inv_affine(self, dx, dy):
        """(x-ul_x, y-ul_y) → continuous (col, row) for the general
        geotransform: inverts [[psx, rot_x], [rot_y, -psy]].  Works on
        Columns AND numpy arrays (plain arithmetic).  A singular
        geotransform (rot_x·rot_y = −psx·psy — the pixel axes collapse
        onto one line) raises loudly instead of emitting inf/garbage
        tile ids (review r5 pass-2 #5)."""
        det = -(self.psx * self.psy + self.rot_x * self.rot_y)
        scale = abs(self.psx * self.psy) + abs(self.rot_x * self.rot_y)
        if not (abs(det) > 1e-12 * max(scale, 1e-300)):
            raise ValueError(
                f"singular geotransform: psx={self.psx}, psy={self.psy}, "
                f"rot_x={self.rot_x}, rot_y={self.rot_y} has determinant "
                "~0 — the pixel axes are collinear"
            )
        col = (-self.psy * dx - self.rot_x * dy) / det
        row = (-self.rot_y * dx + self.psx * dy) / det
        return col, row

    def px_col(self, x: Column, y: Column | None = None) -> Column:
        """World x → global pixel column (floor; base.py:44-73 rel_extent).
        A rotated grid needs BOTH coordinates (the affine mixes axes)."""
        if not self.is_rotated:
            return F.floor((x - F.lit(self.ul_x)) / F.lit(self.psx)).cast("long")
        if y is None:
            raise ValueError("px_col on a rotated grid needs both x and y")
        col, _ = self._inv_affine(x - F.lit(self.ul_x), y - F.lit(self.ul_y))
        return F.floor(col).cast("long")

    def px_row(self, y: Column, x: Column | None = None) -> Column:
        """World y → global pixel row (y axis points down: ul_y at row 0)."""
        if not self.is_rotated:
            return F.floor((F.lit(self.ul_y) - y) / F.lit(self.psy)).cast("long")
        if x is None:
            raise ValueError("px_row on a rotated grid needs both x and y")
        _, row = self._inv_affine(x - F.lit(self.ul_x), y - F.lit(self.ul_y))
        return F.floor(row).cast("long")

    def x_center(self, col: Column, row: Column | None = None) -> Column:
        """Pixel col → center x (native/netcdf.py:225-227: geotrans[0] +
        (0.5+col)*geotrans[1] + (0.5+row)*geotrans[2])."""
        base = F.lit(self.ul_x) + (col + F.lit(0.5)) * F.lit(self.psx)
        if not self.is_rotated:
            return base
        if row is None:
            raise ValueError("x_center on a rotated grid needs both col and row")
        return base + (row + F.lit(0.5)) * F.lit(self.rot_x)

    def y_center(self, row: Column, col: Column | None = None) -> Column:
        """Pixel row → center y (native/netcdf.py:241-243, psy<0 north-up)."""
        base = F.lit(self.ul_y) - (row + F.lit(0.5)) * F.lit(self.psy)
        if not self.is_rotated:
            return base
        if col is None:
            raise ValueError("y_center on a rotated grid needs both col and row")
        return base + (col + F.lit(0.5)) * F.lit(self.rot_y)

    # numpy twins (same formulas, array execution — used by the pixel
    # kernels in operators/raster.py; one formula set, two backends, the
    # same pattern as functions/crs.py)

    def px_center_world_np(self, col, row):
        """Continuous pixel (col, row) CENTERS → world (x, y)."""
        import numpy as np

        col = np.asarray(col, dtype="float64")
        row = np.asarray(row, dtype="float64")
        x = self.ul_x + (col + 0.5) * self.psx + (row + 0.5) * self.rot_x
        y = self.ul_y + (col + 0.5) * self.rot_y - (row + 0.5) * self.psy
        return x, y

    def world_to_px_np(self, x, y):
        """World (x, y) → CONTINUOUS (col, row); floor for indices.
        Exact inverse of the general affine (north-up fast path keeps the
        round-1 formula bit-for-bit)."""
        import numpy as np

        x = np.asarray(x, dtype="float64")
        y = np.asarray(y, dtype="float64")
        if not self.is_rotated:
            return (x - self.ul_x) / self.psx, (self.ul_y - y) / self.psy
        return self._inv_affine(x - self.ul_x, y - self.ul_y)

    # ---- pixel -> tile ---------------------------------------------------

    def tile_row_of(self, px_row: Column) -> Column:
        return _floordiv(px_row, self.tile_rows)

    def tile_col_of(self, px_col: Column) -> Column:
        return _floordiv(px_col, self.tile_cols)

    def tile_id_of(self, tile_row: Column, tile_col: Column) -> Column:
        """Canonical tile name; pluggable (SURVEY.md §1.4 #4)."""
        if self.namer is not None:
            return self.namer(tile_row, tile_col)
        return F.concat_ws("_", tile_row.cast("string"), tile_col.cast("string"))

    def tile_of_xy(self, x: Column, y: Column) -> Column:
        """mosaic.xy2tile(x, y) analog (base.py:471-477)."""
        return self.tile_id_of(
            self.tile_row_of(self.px_row(y, x)), self.tile_col_of(self.px_col(x, y))
        )

    # pixel position inside the tile (tile.xy2rc analog)
    def in_tile_row(self, px_row: Column) -> Column:
        return px_row - self.tile_row_of(px_row) * F.lit(self.tile_rows)

    def in_tile_col(self, px_col: Column) -> Column:
        return px_col - self.tile_col_of(px_col) * F.lit(self.tile_cols)

    # ---- footprint -> covered tiles (the tiling join key) ----------------

    def covered_tiles(
        self, px_row0: Column, px_col0: Column, h: Column, w: Column
    ) -> Column:
        """Array of (tile_row, tile_col) structs covered by a pixel-window
        footprint.  Inclusive max+1 window semantics (base.py:56-73): the
        footprint spans rows [px_row0, px_row0+h-1].

        Returns array<struct<tile_row:long, tile_col:long>> — explode it to
        get one row per (image, tile) pair.  This is veranda's write-side
        tile intersection (mosaic/geotiff.py:594-596) as a column expr.
        """
        tr0 = _floordiv(px_row0, self.tile_rows)
        tr1 = _floordiv(px_row0 + h - 1, self.tile_rows)
        tc0 = _floordiv(px_col0, self.tile_cols)
        tc1 = _floordiv(px_col0 + w - 1, self.tile_cols)
        rows = F.sequence(tr0, tr1)
        cols = F.sequence(tc0, tc1)
        return F.flatten(
            F.transform(
                rows,
                lambda r: F.transform(
                    cols, lambda c: F.struct(r.alias("tile_row"), c.alias("tile_col"))
                ),
            )
        )

    def explode_cover(
        self,
        df: DataFrame,
        px_row0: str = "px_row0",
        px_col0: str = "px_col0",
        h: str = "h",
        w: str = "w",
    ) -> DataFrame:
        """One output row per (input row × covered tile), with tile_row,
        tile_col, tile_id and the per-tile overlap window columns:

        - src_row0/src_col0: window origin inside the image
        - dst_row0/dst_col0: window origin inside the tile
        - win_h/win_w: window size

        This is RasterAccess (base.py:24-73) as column arithmetic: src and
        dst windows share the world origin so offsets are differences of
        integer pixel indices — no float rounding (SURVEY.md §7 #1).
        """
        cover = self.covered_tiles(F.col(px_row0), F.col(px_col0), F.col(h), F.col(w))
        out = df.withColumn("_t", F.explode(cover))
        out = out.withColumn("tile_row", F.col("_t.tile_row")).withColumn(
            "tile_col", F.col("_t.tile_col")
        ).drop("_t")
        if self.n_tile_rows > 0:
            out = out.filter(
                (F.col("tile_row") >= 0) & (F.col("tile_row") < self.n_tile_rows)
            )
        if self.n_tile_cols > 0:
            out = out.filter(
                (F.col("tile_col") >= 0) & (F.col("tile_col") < self.n_tile_cols)
            )
        tile_r0 = F.col("tile_row") * F.lit(self.tile_rows)
        tile_c0 = F.col("tile_col") * F.lit(self.tile_cols)
        ov_r0 = F.greatest(F.col(px_row0), tile_r0)
        ov_r1 = F.least(F.col(px_row0) + F.col(h), tile_r0 + F.lit(self.tile_rows))
        ov_c0 = F.greatest(F.col(px_col0), tile_c0)
        ov_c1 = F.least(F.col(px_col0) + F.col(w), tile_c0 + F.lit(self.tile_cols))
        return (
            out.withColumn("tile_id", self.tile_id_of(F.col("tile_row"), F.col("tile_col")))
            .withColumn("src_row0", ov_r0 - F.col(px_row0))
            .withColumn("src_col0", ov_c0 - F.col(px_col0))
            .withColumn("dst_row0", ov_r0 - tile_r0)
            .withColumn("dst_col0", ov_c0 - tile_c0)
            .withColumn("win_h", ov_r1 - ov_r0)
            .withColumn("win_w", ov_c1 - ov_c0)
        )

    # ---- tile dimension table -------------------------------------------

    def tiles_df(self, spark: SparkSession) -> DataFrame:
        """Small broadcastable tile-dimension DataFrame (the 'mosaic'):
        tile_id, tile_row, tile_col, pixel origin, world extent.
        Requires a bounded grid (n_tile_rows/cols > 0).
        """
        if self.n_tile_rows <= 0 or self.n_tile_cols <= 0:
            raise ValueError("tiles_df needs a bounded grid")
        df = (
            spark.range(self.n_tile_rows)
            .withColumnRenamed("id", "tile_row")
            .crossJoin(
                spark.range(self.n_tile_cols).withColumnRenamed("id", "tile_col")
            )
        )
        if self.is_rotated:
            # world bbox of a rotated tile = min/max over its 4 affine
            # corners (axis-aligned formulas below would under-cover)
            c0 = F.col("tile_col") * F.lit(self.tile_cols)
            r0 = F.col("tile_row") * F.lit(self.tile_rows)
            corners = [
                (c0 + dc, r0 + dr)
                for dc in (F.lit(0), F.lit(self.tile_cols))
                for dr in (F.lit(0), F.lit(self.tile_rows))
            ]
            cx = [
                F.lit(self.ul_x) + c * F.lit(self.psx) + r * F.lit(self.rot_x)
                for c, r in corners
            ]
            cy = [
                F.lit(self.ul_y) + c * F.lit(self.rot_y) - r * F.lit(self.psy)
                for c, r in corners
            ]
            xmin, xmax = F.least(*cx), F.greatest(*cx)
            ymin, ymax = F.least(*cy), F.greatest(*cy)
            return df.select(
                self.tile_id_of(F.col("tile_row"), F.col("tile_col")).alias("tile_id"),
                "tile_row",
                "tile_col",
                (F.col("tile_row") * self.tile_rows).alias("px_row0"),
                (F.col("tile_col") * self.tile_cols).alias("px_col0"),
                xmin.alias("xmin"),
                xmax.alias("xmax"),
                ymin.alias("ymin"),
                ymax.alias("ymax"),
                F.lit(self.tile_rows).alias("n_rows"),
                F.lit(self.tile_cols).alias("n_cols"),
                *([F.lit(self.sref).alias("sref")] if self.sref is not None else []),
            )
        xmin = F.lit(self.ul_x) + F.col("tile_col") * F.lit(self.tile_cols * self.psx)
        ymax = F.lit(self.ul_y) - F.col("tile_row") * F.lit(self.tile_rows * self.psy)
        return df.select(
            self.tile_id_of(F.col("tile_row"), F.col("tile_col")).alias("tile_id"),
            "tile_row",
            "tile_col",
            (F.col("tile_row") * self.tile_rows).alias("px_row0"),
            (F.col("tile_col") * self.tile_cols).alias("px_col0"),
            xmin.alias("xmin"),
            (xmin + F.lit(self.tile_cols * self.psx)).alias("xmax"),
            (ymax - F.lit(self.tile_rows * self.psy)).alias("ymin"),
            ymax.alias("ymax"),
            F.lit(self.tile_rows).alias("n_rows"),
            F.lit(self.tile_cols).alias("n_cols"),
            *([F.lit(self.sref).alias("sref")] if self.sref is not None else []),
        )

    # ---- CRS guard --------------------------------------------------------

    def sref_guard(self, df: DataFrame) -> DataFrame:
        """Loud CRS check (reference carries sref on every raster object,
        base.py:98-100; WKT round-trip test test_gdal.py:21-49): when both
        the grid and the register declare a spatial reference, any row
        whose sref differs raises at scan time.  Embedded as a filter so
        Catalyst cannot prune it away; NULL register sref is treated as
        'inherit the grid CRS' and passes."""
        if self.sref is None or "sref" not in df.columns:
            return df
        ok = F.col("sref").isNull() | (F.col("sref") == F.lit(self.sref))
        msg = F.concat(
            F.lit("CRS mismatch: register sref="),
            F.col("sref"),
            F.lit(f" != grid sref={self.sref!r}"),
        )
        return df.filter(F.assert_true(ok, msg).isNull())

    # geotransform of one tile (for parity with native/geotiff.py:33-41)
    def tile_geotrans(self, tile_row: int, tile_col: int) -> tuple:
        c0 = tile_col * self.tile_cols
        r0 = tile_row * self.tile_rows
        return (
            self.ul_x + c0 * self.psx + r0 * self.rot_x,
            self.psx,
            self.rot_x,
            self.ul_y + c0 * self.rot_y - r0 * self.psy,
            self.rot_y,
            -self.psy,
        )


def reproject_footprints(
    df: DataFrame, src: "RegularGrid", dst: "RegularGrid"
) -> DataFrame:
    """Re-map integer footprints from one grid's pixel frame to another's.

    Same CRS (or undeclared): pure affine — px indices recompute from the
    world origin, extents scale by the pixel-size ratio (ceil, so the new
    footprint always covers the old one).

    Different CRSs: real coordinate transform (round-3).  When both srefs
    are in the supported set (EPSG:4326, EPSG:3857, UTM EPSG:326xx/327xx;
    functions/crs.py — the reference gets the same transforms from
    GDAL/osr, gdalport.py:58-101), all four footprint corners transform
    src→lon/lat→dst as JVM Column expressions and the new footprint is
    the ceil'd bounding box of the warped corners (covers the original;
    nonlinear warp means corners, not just origin).  Pixel payloads are
    NOT resampled — this is register/footprint math, the metadata half of
    a warp; resampling stays with read_window's target grid.  Unsupported
    CRS pairs still raise loudly.

    Rotated grids (round 5c): same-CRS remaps route the four corners
    through the full affine and its inverse (covering bbox in the DST
    pixel frame — min/max must happen in pixel space under rotation);
    the cross-CRS path converts every boundary sample to dst pixel
    coords the same way.  On north-up grids both reduce bit-identically
    to the round-3 formulas (division by a positive pixel size commutes
    with min/max exactly)."""

    def _dst_px(x, y):
        if not dst.is_rotated:
            return (
                (x - F.lit(dst.ul_x)) / F.lit(dst.psx),
                (F.lit(dst.ul_y) - y) / F.lit(dst.psy),
            )
        return dst._inv_affine(x - F.lit(dst.ul_x), y - F.lit(dst.ul_y))

    same = src.sref is None or dst.sref is None or src.sref == dst.sref
    if same and (src.is_rotated or dst.is_rotated):
        c0, r0 = F.col("px_col0"), F.col("px_row0")
        corners = [
            (c0, r0), (c0 + F.col("w"), r0),
            (c0, r0 + F.col("h")), (c0 + F.col("w"), r0 + F.col("h")),
        ]
        pcs, prs = [], []
        for c, r in corners:
            x = F.lit(src.ul_x) + c * F.lit(src.psx) + r * F.lit(src.rot_x)
            y = F.lit(src.ul_y) + c * F.lit(src.rot_y) - r * F.lit(src.psy)
            pc, pr = _dst_px(x, y)
            pcs.append(pc)
            prs.append(pr)
        new_col0 = F.floor(F.least(*pcs)).cast("long")
        new_row0 = F.floor(F.least(*prs)).cast("long")
        return (
            df.withColumn("_nc", new_col0)
            .withColumn("_nr", new_row0)
            .withColumn("_nw", F.ceil(F.greatest(*pcs)) - F.col("_nc"))
            .withColumn("_nh", F.ceil(F.greatest(*prs)) - F.col("_nr"))
            .withColumn("w", F.col("_nw").cast(dict(df.dtypes)["w"]))
            .withColumn("h", F.col("_nh").cast(dict(df.dtypes)["h"]))
            .withColumn("px_col0", F.col("_nc"))
            .withColumn("px_row0", F.col("_nr"))
            .drop("_nc", "_nr", "_nw", "_nh")
        )
    if same:
        x0 = F.lit(src.ul_x) + F.col("px_col0") * F.lit(src.psx)
        y0 = F.lit(src.ul_y) - F.col("px_row0") * F.lit(src.psy)
        return (
            df.withColumn("_new_col0", F.floor((x0 - F.lit(dst.ul_x)) / F.lit(dst.psx)).cast("long"))
            .withColumn("_new_row0", F.floor((F.lit(dst.ul_y) - y0) / F.lit(dst.psy)).cast("long"))
            .withColumn("w", F.ceil(F.col("w") * F.lit(src.psx / dst.psx)).cast(dict(df.dtypes)["w"]))
            .withColumn("h", F.ceil(F.col("h") * F.lit(src.psy / dst.psy)).cast(dict(df.dtypes)["h"]))
            .withColumn("px_col0", F.col("_new_col0"))
            .withColumn("px_row0", F.col("_new_row0"))
            .drop("_new_col0", "_new_row0")
        )

    from veranda_spark.functions.crs import SPARK, transform

    def world(col_px, row_px):
        return (
            F.lit(src.ul_x) + col_px * F.lit(src.psx)
            + row_px * F.lit(src.rot_x),
            F.lit(src.ul_y) + col_px * F.lit(src.rot_y)
            - row_px * F.lit(src.psy),
        )

    # Projected edges bow outward between corners (a constant-northing
    # UTM edge peaks in latitude at the central meridian), so a
    # corner-only bbox can CLIP the original.  Boundary sample: corners
    # + quarter/half/three-quarter points of every edge, PLUS — when the
    # source is UTM — the exact central-meridian crossing of the top and
    # bottom edges (clamped into the edge), where the latitude extremum
    # actually sits.  Residual bow between samples for exotic cross-zone
    # pairs is bounded by the quarter-spacing curvature; the CM points
    # make the dominant UTM→geographic case exact.
    from veranda_spark.functions.crs import (
        UTM_FALSE_EASTING,
        parse_sref,
    )

    c0, r0 = F.col("px_col0"), F.col("px_row0")
    zero, w_, h_ = F.lit(0), F.col("w"), F.col("h")
    fracs = (0.25, 0.5, 0.75)
    offs = [(zero, zero), (w_, zero), (zero, h_), (w_, h_)]
    offs += [(w_ * f, dr) for f in fracs for dr in (zero, h_)]
    offs += [(dc, h_ * f) for f in fracs for dc in (zero, w_)]
    src_kind = parse_sref(src.sref)
    if src_kind and src_kind["kind"] == "utm":
        # the central-meridian crossing of each horizontal edge: solve
        # x(c) = FE along that edge.  With rot_x the crossing column
        # depends on the edge's ROW (x = ul_x + c·psx + r·rot_x), so
        # top and bottom edges get their own clamped offsets (review r5
        # pass-4 #3: a shared row-free offset would miss the latitude
        # extremum on rotated UTM sources)
        def _cm_dc(row_px):
            return F.greatest(
                F.lit(0.0),
                F.least(
                    (
                        (F.lit(UTM_FALSE_EASTING - src.ul_x)
                         - row_px * F.lit(src.rot_x)) / F.lit(src.psx)
                        - c0
                    ).cast("double"),
                    w_.cast("double"),
                ),
            )
        offs += [(_cm_dc(r0), zero), (_cm_dc(r0 + h_), h_)]
    boundary = [(c0 + dc, r0 + dr) for dc, dr in offs]
    txy = [
        transform(SPARK, src.sref, dst.sref, *world(c, r)) for c, r in boundary
    ]
    pxy = [_dst_px(x, y) for x, y in txy]
    pc_min = F.least(*[pc for pc, _ in pxy])
    pc_max = F.greatest(*[pc for pc, _ in pxy])
    pr_min = F.least(*[pr for _, pr in pxy])
    pr_max = F.greatest(*[pr for _, pr in pxy])
    new_col0 = F.floor(pc_min).cast("long")
    new_row0 = F.floor(pr_min).cast("long")
    # ALL four outputs are computed into temp columns while the ORIGINAL
    # w/h/px_* columns are still intact: xmin/ymax/... reference
    # F.col("w")/F.col("h"), so replacing w before computing h would make
    # ymin silently evaluate against the new dst-frame width (a column
    # self-reference bug the UTM coverage test caught)
    return (
        df.withColumn("_new_col0", new_col0)
        .withColumn("_new_row0", new_row0)
        .withColumn("_new_w", F.ceil(pc_max) - F.col("_new_col0"))
        .withColumn("_new_h", F.ceil(pr_max) - F.col("_new_row0"))
        .withColumn("w", F.col("_new_w").cast(dict(df.dtypes)["w"]))
        .withColumn("h", F.col("_new_h").cast(dict(df.dtypes)["h"]))
        .withColumn("px_col0", F.col("_new_col0"))
        .withColumn("px_row0", F.col("_new_row0"))
        .drop("_new_col0", "_new_row0", "_new_w", "_new_h")
    )


def congruent_tile_ids(df: DataFrame, geom_cols: list[str]) -> DataFrame:
    """Tile identity by congruence + layer assignment (base.py:748-797):
    rows whose geometry columns (sref/geotrans/shape) are equal share a
    tile id; layer_id = 1-based running count within a tile in file order.

    Spark-first at scale: dense tile ids come from a DISTINCT geometry-key
    dimension (cardinality = #tiles, bounded small) numbered with a window
    over that dim only, broadcast-joined back to the register — the
    register itself never funnels through a single partition (round 1 ran
    dense_rank over an unpartitioned window on the full table, a
    single-task bottleneck at 100 TB).  layer_id = row_number within each
    tile in file order (partitioned window — scales).
    """
    from pyspark.sql import Window as W

    key = [F.col(c) for c in geom_cols]
    dim = (
        df.select(*geom_cols)
        .distinct()
        .withColumn("tile_nr", F.row_number().over(W.orderBy(*key)) - 1)
    )
    wl = W.partitionBy(*key).orderBy(F.col("_file_order"))
    return (
        df.withColumn("_file_order", F.monotonically_increasing_id())
        .join(F.broadcast(dim), geom_cols)
        .withColumn("layer_id", F.row_number().over(wl))
        .drop("_file_order")
    )
