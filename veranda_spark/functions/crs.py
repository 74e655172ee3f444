"""Pure-math CRS transforms: WGS84 lon/lat ↔ Web Mercator / UTM.

The reference delegates coordinate transforms to GDAL/osr
(gdalport.py:58-101; tests/test_gdal.py:21-49 round-trips Equi7).  This
engine implements the two projection families a web-scale image corpus
actually uses — spherical Web Mercator (EPSG:3857) and WGS84 UTM zones
(EPSG:326xx/327xx, Snyder transverse-Mercator series, sub-mm in-zone) —
as plain math over a swappable backend:

- backend ``F`` (pyspark.sql.functions): every transform is a JVM
  Column expression — whole-stage codegen, no Python in the hot path,
  reproducible in ANSI SQL for the DuckDB oracle;
- backend ``numpy``: the *same code* runs driver-side for tests and
  small fixtures.

One implementation, two execution targets — the numpy twin validates
the Column twin because they are literally the same formulas.
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
WGS84_E2 = WGS84_F * (2.0 - WGS84_F)
UTM_K0 = 0.9996
UTM_FALSE_EASTING = 500_000.0
UTM_FALSE_NORTHING_S = 10_000_000.0
#: spherical Web Mercator world half-extent (at lon=180)
WEBMERC_MAX = WGS84_A * math.pi


class _NumpyBackend:
    sin = staticmethod(np.sin)
    cos = staticmethod(np.cos)
    tan = staticmethod(np.tan)
    atan = staticmethod(np.arctan)
    sqrt = staticmethod(np.sqrt)
    log = staticmethod(np.log)
    exp = staticmethod(np.exp)
    radians = staticmethod(np.radians)
    degrees = staticmethod(np.degrees)


class _SparkBackend:
    def __getattr__(self, name: str):
        from pyspark.sql import functions as F

        return getattr(F, {"atan": "atan"}.get(name, name))


NP = _NumpyBackend()
SPARK = _SparkBackend()


# ---- Web Mercator (EPSG:3857, spherical) -----------------------------------


def lonlat_to_webmerc(mt: Any, lon, lat):
    """(lon°, lat°) → (x, y) meters.  x = R·λ, y = R·ln tan(π/4 + φ/2)."""
    x = mt.radians(lon) * WGS84_A
    y = mt.log(mt.tan(mt.radians(lat) / 2.0 + math.pi / 4.0)) * WGS84_A
    return x, y


def webmerc_to_lonlat(mt: Any, x, y):
    lon = mt.degrees(x / WGS84_A)
    lat = mt.degrees(mt.atan(mt.exp(y / WGS84_A)) * 2.0 - math.pi / 2.0)
    return lon, lat


# ---- UTM (WGS84 ellipsoid, Snyder 1987 series) -----------------------------


def utm_central_meridian(zone: int) -> float:
    if not 1 <= zone <= 60:
        raise ValueError(f"UTM zone must be 1-60, got {zone}")
    return -183.0 + 6.0 * zone


def _meridian_arc(mt: Any, phi):
    e2 = WGS84_E2
    e4, e6 = e2 * e2, e2 * e2 * e2
    return WGS84_A * (
        (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * mt.sin(2 * phi)
        + (15 * e4 / 256 + 45 * e6 / 1024) * mt.sin(4 * phi)
        - (35 * e6 / 3072) * mt.sin(6 * phi)
    )


def lonlat_to_utm(mt: Any, lon, lat, zone: int, south: bool = False):
    """(lon°, lat°) → UTM (easting, northing) in zone ``zone``."""
    e2 = WGS84_E2
    ep2 = e2 / (1 - e2)
    phi = mt.radians(lat)
    lam = mt.radians(lon - utm_central_meridian(zone))
    sin_phi, cos_phi, tan_phi = mt.sin(phi), mt.cos(phi), mt.tan(phi)
    n = WGS84_A / mt.sqrt(1 - e2 * sin_phi * sin_phi)
    t = tan_phi * tan_phi
    c = ep2 * cos_phi * cos_phi
    a_ = lam * cos_phi
    m = _meridian_arc(mt, phi)
    a2, a3 = a_ * a_, a_ * a_ * a_
    a4, a5, a6 = a2 * a2, a2 * a3, a3 * a3
    x = UTM_K0 * n * (
        a_
        + (1 - t + c) * a3 / 6
        + (5 - 18 * t + t * t + 72 * c - 58 * ep2) * a5 / 120
    ) + UTM_FALSE_EASTING
    y = UTM_K0 * (
        m
        + n * tan_phi * (
            a2 / 2
            + (5 - t + 9 * c + 4 * c * c) * a4 / 24
            + (61 - 58 * t + t * t + 600 * c - 330 * ep2) * a6 / 720
        )
    )
    if south:
        y = y + UTM_FALSE_NORTHING_S
    return x, y


def utm_to_lonlat(mt: Any, x, y, zone: int, south: bool = False):
    """UTM (easting, northing) in zone ``zone`` → (lon°, lat°)."""
    e2 = WGS84_E2
    ep2 = e2 / (1 - e2)
    e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
    x_ = x - UTM_FALSE_EASTING
    y_ = (y - UTM_FALSE_NORTHING_S) if south else y
    m = y_ / UTM_K0
    mu = m / (WGS84_A * (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2**3 / 256))
    phi1 = (
        mu
        + (3 * e1 / 2 - 27 * e1**3 / 32) * mt.sin(2 * mu)
        + (21 * e1**2 / 16 - 55 * e1**4 / 32) * mt.sin(4 * mu)
        + (151 * e1**3 / 96) * mt.sin(6 * mu)
        + (1097 * e1**4 / 512) * mt.sin(8 * mu)
    )
    sin1, cos1, tan1 = mt.sin(phi1), mt.cos(phi1), mt.tan(phi1)
    c1 = ep2 * cos1 * cos1
    t1 = tan1 * tan1
    n1 = WGS84_A / mt.sqrt(1 - e2 * sin1 * sin1)
    r1 = WGS84_A * (1 - e2) / (1 - e2 * sin1 * sin1) ** 1.5
    d = x_ / (n1 * UTM_K0)
    d2, d3 = d * d, d * d * d
    d4, d5, d6 = d2 * d2, d2 * d3, d3 * d3
    phi = phi1 - (n1 * tan1 / r1) * (
        d2 / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * ep2) * d4 / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * ep2 - 3 * c1 * c1)
        * d6 / 720
    )
    lam = (
        d
        - (1 + 2 * t1 + c1) * d3 / 6
        + (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * ep2 + 24 * t1 * t1)
        * d5 / 120
    ) / cos1
    lon = utm_central_meridian(zone) + mt.degrees(lam)
    lat = mt.degrees(phi)
    return lon, lat


# ---- sref parsing + lon/lat hub --------------------------------------------


def parse_sref(sref: str) -> dict | None:
    """'EPSG:4326' / 'EPSG:3857' / 'EPSG:326xx' / 'EPSG:327xx' →
    {'kind': ..., 'zone': ..., 'south': ...}; None when unknown."""
    if not sref or not sref.upper().startswith("EPSG:"):
        return None
    try:
        code = int(sref.split(":", 1)[1])
    except ValueError:
        return None
    if code == 4326:
        return {"kind": "lonlat"}
    if code == 3857:
        return {"kind": "webmerc"}
    if 32601 <= code <= 32660:
        return {"kind": "utm", "zone": code - 32600, "south": False}
    if 32701 <= code <= 32760:
        return {"kind": "utm", "zone": code - 32700, "south": True}
    return None


def to_lonlat(mt: Any, sref: dict, x, y):
    if sref["kind"] == "lonlat":
        return x, y
    if sref["kind"] == "webmerc":
        return webmerc_to_lonlat(mt, x, y)
    if sref["kind"] == "utm":
        return utm_to_lonlat(mt, x, y, sref["zone"], sref["south"])
    raise ValueError(f"unsupported sref {sref}")


def from_lonlat(mt: Any, sref: dict, lon, lat):
    if sref["kind"] == "lonlat":
        return lon, lat
    if sref["kind"] == "webmerc":
        return lonlat_to_webmerc(mt, lon, lat)
    if sref["kind"] == "utm":
        return lonlat_to_utm(mt, lon, lat, sref["zone"], sref["south"])
    raise ValueError(f"unsupported sref {sref}")


def transform(mt: Any, src_sref: str, dst_sref: str, x, y):
    """World coords in ``src_sref`` → ``dst_sref`` via the lon/lat hub.
    Raises when either sref is outside the supported set."""
    s, d = parse_sref(src_sref), parse_sref(dst_sref)
    if s is None or d is None:
        raise ValueError(
            f"unsupported CRS pair {src_sref!r} → {dst_sref!r}: supported "
            "are EPSG:4326, EPSG:3857, EPSG:326xx/327xx (UTM)"
        )
    lon, lat = to_lonlat(mt, s, x, y)
    return from_lonlat(mt, d, lon, lat)


def utm_zone_of(lon: float) -> int:
    """UTM zone containing longitude ``lon`` (degrees, [-180, 180))."""
    return int((lon + 180.0) // 6.0) % 60 + 1


def utm_epsg(lon: float, lat: float) -> str:
    """EPSG code string of the WGS84 UTM zone containing (lon, lat) —
    convenience for picking a dst sref from data extent."""
    zone = utm_zone_of(lon)
    return f"EPSG:{(32600 if lat >= 0 else 32700) + zone}"
