"""NTv2 grid-shift datum transformations, from scratch in numpy.

The reference delegates grid-based datum shifts to GDAL/osr (PROJ loads
``.gsb`` grids under the covers, e.g. NAD27→NAD83 or OSGB36→ETRS89
where a 7-parameter Helmert is too coarse).  This module implements the
public NTv2 binary container (Canadian Geodetic Survey "National
Transformation v2 Developer's Guide") directly:

- overview header: 11 records of 16 bytes (8-char key + 8-byte value),
  NUM_OREC / NUM_SREC / NUM_FILE ints, GS_TYPE "SECONDS", ellipsoid
  semi-major/minor for the FROM and TO datums;
- per sub-grid: 11-record header (SUB_NAME, PARENT, CREATED, UPDATED,
  S_LAT, N_LAT, E_LONG, W_LONG, LAT_INC, LONG_INC, GS_COUNT) with all
  extents in arc-seconds and **longitudes positive WEST** (the NTv2
  convention), then GS_COUNT nodes of 4 float32s (lat shift, lon shift,
  lat accuracy, lon accuracy) in arc-seconds, positive-west lon shift,
  ordered from the south-EAST corner, west along each row, then north
  row by row;
- endianness is file-dependent (the spec is platform-native); readers
  detect it from the NUM_OREC value like GDAL does.

In-memory sub-grids use the unambiguous EAST-POSITIVE raster layout:
``lon_min``/``lon_max`` degree extents, (nrows, ncols) shift planes
with row 0 at ``s_lat`` (south) and col 0 at ``lon_min`` (west),
east-positive ``lon_shift`` arc-seconds.  The writer flips columns and
negates the lon plane into the file's convention; the reader flips
back, so write∘read is the identity.

Application semantics (forward = source datum → target datum):
``lat' = lat + Δlat``, ``lon' = lon + Δlon`` with Δ bilinearly
interpolated at the SOURCE position.  The inverse iterates the forward
shift (the standard fixed-point scheme; real shifts are tiny relative
to the grid spacing, so four iterations close to ≪1e-9°).

Points outside every sub-grid pass through UNCHANGED by default (the
GDAL behavior — real grids cover one country); ``strict=True`` raises
instead.  Where several sub-grids contain a point the DENSEST one wins
(children refine parents in real NTv2 files).
"""

from __future__ import annotations

import struct
from functools import lru_cache
from typing import Any

import numpy as np
import pandas as pd

__all__ = ["read_ntv2", "write_ntv2", "apply_ntv2", "ntv2_shift_np"]

_OVERVIEW_KEYS = ("NUM_OREC", "NUM_SREC", "NUM_FILE", "GS_TYPE ",
                  "VERSION ", "SYSTEM_F", "SYSTEM_T", "MAJOR_F ",
                  "MINOR_F ", "MAJOR_T ", "MINOR_T ")
_SUB_KEYS = ("SUB_NAME", "PARENT  ", "CREATED ", "UPDATED ", "S_LAT   ",
             "N_LAT   ", "E_LONG  ", "W_LONG  ", "LAT_INC ", "LONG_INC",
             "GS_COUNT")
_INT_KEYS = ("NUM_OREC", "NUM_SREC", "NUM_FILE", "GS_COUNT")
_DBL_KEYS = ("S_LAT   ", "N_LAT   ", "E_LONG  ", "W_LONG  ", "LAT_INC ",
             "LONG_INC", "MAJOR_F ", "MINOR_F ", "MAJOR_T ", "MINOR_T ")


def _rec_int(value: int, little: bool) -> bytes:
    # int32 + 4 pad bytes fills the 8-byte value slot
    return struct.pack("<i4x" if little else ">i4x", value)


def _rec_dbl(value: float, little: bool) -> bytes:
    return struct.pack("<d" if little else ">d", value)


def write_ntv2(path: str, sub_grids: list[dict], *,
               system_f: str = "SOURCE", system_t: str = "TARGET",
               major_f: float = 6378137.0, minor_f: float = 6356752.3142,
               major_t: float = 6378137.0, minor_t: float = 6356752.3142,
               little_endian: bool = True) -> None:
    """Write a spec-conformant ``.gsb``.  Each sub-grid dict:

    - ``name`` (≤8 chars), optional ``parent`` ("NONE" for top-level);
    - ``s_lat``, ``n_lat``, ``lat_inc`` — DEGREES, north-positive;
    - ``lon_min``, ``lon_max``, ``lon_inc`` — DEGREES, east-positive;
    - ``lat_shift``, ``lon_shift`` — (nrows, ncols) float arrays in
      ARC-SECONDS, east-positive ``lon_shift``, row 0 at ``s_lat``,
      col 0 at ``lon_min`` (numpy-natural south→north, west→east);
    - optional ``lat_acc``/``lon_acc`` accuracy planes (default 0).
    """
    lt = little_endian
    out = bytearray()
    for key, val in zip(_OVERVIEW_KEYS, (
        _rec_int(11, lt), _rec_int(11, lt), _rec_int(len(sub_grids), lt),
        b"SECONDS ", b"NTV2.0  ",
        system_f[:8].ljust(8).encode(), system_t[:8].ljust(8).encode(),
        _rec_dbl(major_f, lt), _rec_dbl(minor_f, lt),
        _rec_dbl(major_t, lt), _rec_dbl(minor_t, lt),
    )):
        out += key.encode() + val
    for g in sub_grids:
        lat_shift = np.asarray(g["lat_shift"], dtype=np.float64)
        lon_shift = np.asarray(g["lon_shift"], dtype=np.float64)
        nrows, ncols = lat_shift.shape
        if lon_shift.shape != (nrows, ncols):
            raise ValueError("lat_shift and lon_shift shapes differ")
        s_lat, n_lat = g["s_lat"] * 3600.0, g["n_lat"] * 3600.0
        lat_inc = g["lat_inc"] * 3600.0
        # east-positive degrees → positive-west arc-seconds: the file's
        # E_LONG edge is the EASTERNMOST point (our lon_max)
        e_long = -g["lon_max"] * 3600.0
        w_long = -g["lon_min"] * 3600.0
        lon_inc = g["lon_inc"] * 3600.0
        if round((n_lat - s_lat) / lat_inc) + 1 != nrows:
            raise ValueError("lat extent inconsistent with nrows")
        if round((w_long - e_long) / lon_inc) + 1 != ncols:
            raise ValueError("lon extent inconsistent with ncols")
        for key, val in zip(_SUB_KEYS, (
            str(g["name"])[:8].ljust(8).encode(),
            str(g.get("parent", "NONE"))[:8].ljust(8).encode(),
            b"NOW     ", b"NOW     ",
            _rec_dbl(s_lat, lt), _rec_dbl(n_lat, lt),
            _rec_dbl(e_long, lt), _rec_dbl(w_long, lt),
            _rec_dbl(lat_inc, lt), _rec_dbl(lon_inc, lt),
            _rec_int(nrows * ncols, lt),
        )):
            out += key.encode() + val
        # node order: SE corner first, walking WEST along each row —
        # the reverse of our west→east columns — then north row by row;
        # the lon plane flips sign into the positive-west convention
        lat_acc = np.asarray(g.get("lat_acc", np.zeros_like(lat_shift)),
                             dtype=np.float64)
        lon_acc = np.asarray(g.get("lon_acc", np.zeros_like(lon_shift)),
                             dtype=np.float64)
        nodes = np.empty((nrows, ncols, 4), dtype=np.float32)
        nodes[:, :, 0] = lat_shift[:, ::-1]
        nodes[:, :, 1] = -lon_shift[:, ::-1]
        nodes[:, :, 2] = lat_acc[:, ::-1]
        nodes[:, :, 3] = lon_acc[:, ::-1]
        if not lt:
            nodes = nodes.astype(nodes.dtype.newbyteorder(">"))
        out += nodes.tobytes()
    # trailing end-of-file record (per spec appendix)
    out += b"END     " + b"\x00" * 8
    with open(path, "wb") as f:
        f.write(bytes(out))


def _read_headers(buf: bytes, offset: int, keys: tuple, little: bool):
    vals = {}
    for i, key in enumerate(keys):
        rec = buf[offset + 16 * i: offset + 16 * (i + 1)]
        name = rec[:8].decode("ascii", "replace")
        if name.rstrip() != key.rstrip():
            raise ValueError(
                f"malformed NTv2 header: expected {key!r} record, got "
                f"{name!r} at offset {offset + 16 * i}"
            )
        if key in _INT_KEYS:
            vals[key.strip()] = struct.unpack_from(
                "<i" if little else ">i", rec, 8)[0]
        elif key in _DBL_KEYS:
            vals[key.strip()] = struct.unpack_from(
                "<d" if little else ">d", rec, 8)[0]
        else:
            vals[key.strip()] = rec[8:].decode("ascii", "replace").strip()
    return vals, offset + 16 * len(keys)


def read_ntv2(path: str) -> dict:
    """Parse a ``.gsb`` → {"sub_grids": [...], "system_f", "system_t"}.

    Sub-grids come back in the east-positive raster layout documented in
    the module docstring — exactly what :func:`write_ntv2` takes, so
    write∘read is the identity.
    """
    with open(path, "rb") as f:
        buf = f.read()
    if len(buf) < 16 * 11 or buf[:8] != b"NUM_OREC":
        raise ValueError(f"{path}: not an NTv2 .gsb file (bad magic)")
    # endianness detection, GDAL-style: NUM_OREC must equal 11
    little = struct.unpack_from("<i", buf, 8)[0] == 11
    if not little and struct.unpack_from(">i", buf, 8)[0] != 11:
        raise ValueError(f"{path}: NUM_OREC is neither 11 LE nor 11 BE")
    ov, off = _read_headers(buf, 0, _OVERVIEW_KEYS, little)
    if ov["GS_TYPE"].strip().upper() != "SECONDS":
        # the spec also allows MINUTES/DEGREES units; nobody ships such
        # files but silently misreading one by 60-3600x would be worse
        # than refusing it
        raise ValueError(
            f"{path}: GS_TYPE {ov['GS_TYPE']!r} not supported (only "
            "SECONDS grids are readable)"
        )
    subs = []
    for _ in range(ov["NUM_FILE"]):
        h, off = _read_headers(buf, off, _SUB_KEYS, little)
        n = h["GS_COUNT"]
        nrows = round((h["N_LAT"] - h["S_LAT"]) / h["LAT_INC"]) + 1
        ncols = round((h["W_LONG"] - h["E_LONG"]) / h["LONG_INC"]) + 1
        if nrows * ncols != n:
            raise ValueError(
                f"{path}: GS_COUNT {n} != {nrows}x{ncols} from extents"
            )
        dt = np.dtype("<f4" if little else ">f4")
        nodes = np.frombuffer(buf, dtype=dt, count=4 * n, offset=off)
        nodes = nodes.reshape(nrows, ncols, 4).astype(np.float64)
        off += 16 * n
        subs.append({
            "name": h["SUB_NAME"], "parent": h["PARENT"],
            "s_lat": h["S_LAT"] / 3600.0, "n_lat": h["N_LAT"] / 3600.0,
            "lon_min": -h["W_LONG"] / 3600.0,
            "lon_max": -h["E_LONG"] / 3600.0,
            "lat_inc": h["LAT_INC"] / 3600.0,
            "lon_inc": h["LONG_INC"] / 3600.0,
            # file cols run east→west: flip back to col 0 = lon_min and
            # the lon plane back to east-positive
            "lat_shift": np.ascontiguousarray(nodes[:, ::-1, 0]),
            "lon_shift": np.ascontiguousarray(-nodes[:, ::-1, 1]),
            "lat_acc": np.ascontiguousarray(nodes[:, ::-1, 2]),
            "lon_acc": np.ascontiguousarray(nodes[:, ::-1, 3]),
        })
    return {"sub_grids": subs,
            "system_f": ov["SYSTEM_F"], "system_t": ov["SYSTEM_T"]}


@lru_cache(maxsize=16)
def _cached_grid(path: str) -> dict:
    return read_ntv2(path)


def _interp_sub(g: dict, lon, lat):
    """Bilinear (Δlon°, Δlat°) of one sub-grid at east-positive degree
    positions; callers guarantee containment."""
    fy = (lat - g["s_lat"]) / g["lat_inc"]
    fx = (lon - g["lon_min"]) / g["lon_inc"]
    nrows, ncols = g["lat_shift"].shape
    # clip so points ON the north/east edge use the last interior cell
    # (the edge node then carries full weight)
    iy = np.clip(np.floor(fy).astype(np.int64), 0, nrows - 2)
    ix = np.clip(np.floor(fx).astype(np.int64), 0, ncols - 2)
    wy = fy - iy
    wx = fx - ix
    out = []
    for plane in (g["lon_shift"], g["lat_shift"]):
        v = (plane[iy, ix] * (1 - wy) * (1 - wx)
             + plane[iy, ix + 1] * (1 - wy) * wx
             + plane[iy + 1, ix] * wy * (1 - wx)
             + plane[iy + 1, ix + 1] * wy * wx)
        out.append(v / 3600.0)
    return out[0], out[1]


def _forward_delta(grid: dict, lon, lat, strict: bool):
    dlon = np.zeros_like(lon)
    dlat = np.zeros_like(lat)
    # densest containing sub-grid wins: visit coarse→fine so finer
    # grids overwrite the parents' values
    subs = sorted(grid["sub_grids"],
                  key=lambda g: -(g["lat_inc"] * g["lon_inc"]))
    covered = np.zeros(lon.shape, dtype=bool)
    for g in subs:
        m = ((lat >= g["s_lat"]) & (lat <= g["n_lat"])
             & (lon >= g["lon_min"]) & (lon <= g["lon_max"]))
        if not m.any():
            continue
        dx, dy = _interp_sub(g, lon[m], lat[m])
        dlon[m] = dx
        dlat[m] = dy
        covered |= m
    if strict and not covered.all():
        blon = np.atleast_1d(lon[~covered])[0]
        blat = np.atleast_1d(lat[~covered])[0]
        raise ValueError(
            f"NTv2 grid does not cover point (lon={blon:.6f}, "
            f"lat={blat:.6f}) and strict=True"
        )
    return dlon, dlat


def ntv2_shift_np(grid: dict, lon, lat, *, inverse: bool = False,
                  strict: bool = False):
    """numpy forward/inverse grid shift.  ``grid`` is :func:`read_ntv2`
    output.  Outside-coverage points pass through unchanged unless
    ``strict``."""
    lon = np.atleast_1d(np.asarray(lon, dtype=np.float64))
    lat = np.atleast_1d(np.asarray(lat, dtype=np.float64))
    if inverse:
        # fixed-point: source = target − shift(source), seeded at target
        src_lon, src_lat = lon.copy(), lat.copy()
        for _ in range(4):
            dlon, dlat = _forward_delta(grid, src_lon, src_lat, strict)
            src_lon = lon - dlon
            src_lat = lat - dlat
        return src_lon, src_lat
    dlon, dlat = _forward_delta(grid, lon, lat, strict)
    return lon + dlon, lat + dlat


def apply_ntv2(mt: Any, path: str, lon, lat, *, inverse: bool = False,
               strict: bool = False):
    """Backend-dispatching grid shift: numpy arrays go straight through
    :func:`ntv2_shift_np`; Spark Columns go through ONE Arrow-batched
    pandas UDF returning a (lon, lat) struct — the path (not the grid)
    rides in the closure and each executor process parses the file once
    via the lru_cache."""
    from pyspark.sql import Column

    if not isinstance(lon, Column):
        return ntv2_shift_np(_cached_grid(path), lon, lat,
                             inverse=inverse, strict=strict)

    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType([StructField("lon", DoubleType()),
                         StructField("lat", DoubleType())])

    @F.pandas_udf(schema)
    def _shift(lon_s: pd.Series, lat_s: pd.Series) -> pd.DataFrame:
        g = _cached_grid(path)
        lo, la = ntv2_shift_np(g, lon_s.to_numpy(), lat_s.to_numpy(),
                               inverse=inverse, strict=strict)
        return pd.DataFrame({"lon": lo, "lat": la})

    s = _shift(lon, lat)
    return s.getField("lon"), s.getField("lat")
